"""Polynomial field + QAP transforms.

``polynomial`` is the exact host parity path (reference: r1csqap/r1csqap.go);
``float_qap`` is the didactic float twin (reference: r1csqapFloat/).  The
n·log n evaluation-form fast path for large circuits is built on
:mod:`go_snark_study_tpu.ops.ntt` and lives in ``qap_fast``.
"""

from .polynomial import PolynomialField, array_of_zeros, arrays_equal, transpose

__all__ = ["PolynomialField", "array_of_zeros", "arrays_equal", "transpose"]
