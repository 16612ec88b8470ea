"""Shared kernel instances for the two BN128 moduli.

``fq_kernels()`` — base field (point coordinates); ``fr_kernels()`` — scalar
field (witness, polynomials, NTT).
"""

from __future__ import annotations

from ..bn128 import constants as C
from .limbs import FieldKernels

_FQ = None
_FR = None


def fq_kernels() -> FieldKernels:
    global _FQ
    if _FQ is None:
        _FQ = FieldKernels(C.Q)
    return _FQ


def fr_kernels() -> FieldKernels:
    global _FR
    if _FR is None:
        _FR = FieldKernels(C.R)
    return _FR
