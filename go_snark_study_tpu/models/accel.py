"""Opt-in TPU acceleration for the standard (parity-path) protocols.

``enable_tpu_msm()`` installs the Pippenger engines as the MSM backend of the
default protocol context, so ``pinocchio.generate_proofs`` /
``groth16.generate_proofs`` run their Σ wᵢ·Pᵢ sums on the chip while keeping
reference-exact artifacts.  Pass a mesh for the multi-chip engines.
"""

from __future__ import annotations

from typing import Optional

from ..bn128 import constants as C
from ..ops.curve_ops import G1Batch, G2Batch
from ..ops.fields import fq_kernels
from ..ops.msm import MSMEngine
from .context import default_context, set_msm_backend

__all__ = ["enable_tpu_msm", "disable_tpu_msm"]

_ENGINES = {}


def enable_tpu_msm(mesh=None, min_size: int = 64) -> None:
    ctx = default_context()
    key = ("sharded", id(mesh)) if mesh is not None else ("local",)
    if key not in _ENGINES:
        Kq = fq_kernels()
        if mesh is None:
            g1e = MSMEngine(G1Batch(Kq), ctx.bn.g1, C.R)
            g2e = MSMEngine(G2Batch(Kq), ctx.bn.g2, C.R)
        else:
            from ..parallel.sharded_msm import ShardedMSMEngine

            g1e = ShardedMSMEngine(G1Batch(Kq), ctx.bn.g1, C.R, mesh)
            g2e = ShardedMSMEngine(G2Batch(Kq), ctx.bn.g2, C.R, mesh)
        _ENGINES[key] = (g1e, g2e)
    g1e, g2e = _ENGINES[key]

    def g1_backend(points, scalars):
        if len(points) < min_size:
            return None  # context falls back to the host loop
        return g1e.msm(points, scalars)

    def g2_backend(points, scalars):
        if len(points) < min_size:
            return None
        return g2e.msm(points, scalars)

    set_msm_backend(g1_backend, g2_backend)


def enable_tpu_setup(min_size: int = 64) -> None:
    """Route the trusted setups' fixed-base commitment batches through the
    TPU windowed engine (:mod:`..ops.fixed_base`)."""
    from ..ops.curve_ops import G1Batch, G2Batch
    from ..ops.fixed_base import FixedBaseEngine

    ctx = default_context()
    if "fb" not in _ENGINES:
        Kq = fq_kernels()
        _ENGINES["fb"] = (
            FixedBaseEngine(G1Batch(Kq), ctx.bn.g1, ctx.bn.g1.g, C.R),
            FixedBaseEngine(G2Batch(Kq), ctx.bn.g2, ctx.bn.g2.g, C.R),
        )
    fb1, fb2 = _ENGINES["fb"]
    ctx._batch_g1_backend = lambda s: fb1.batch_mul(s) if len(s) >= min_size else None
    ctx._batch_g2_backend = lambda s: fb2.batch_mul(s) if len(s) >= min_size else None


def disable_tpu_setup() -> None:
    ctx = default_context()
    ctx._batch_g1_backend = None
    ctx._batch_g2_backend = None


def disable_tpu_msm() -> None:
    set_msm_backend(None, None)
