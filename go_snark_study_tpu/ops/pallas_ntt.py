"""Fused Pallas TPU kernel for the NTT butterfly.

One radix-2 Cooley-Tukey stage computes, lane-wise,

    t  = odd * tw            (Montgomery mul)
    lo = even + t            (mod p)
    hi = even - t            (mod p)

As separate XLA ops that is 3 kernel dispatches and ~9 HBM passes over
(32, N) arrays per stage — which is why the measured 2^20 transform sat at
~3% butterfly MFU (BENCH_r02).  This kernel fuses the whole butterfly: the
CIOS product and both canonical add/sub run on VMEM-resident rows, HBM
traffic drops to 3 reads + 2 writes, and the dispatch cost is paid once per
stage.

The arithmetic is the same `_RowField` row-list forms as the fused point
kernels (:mod:`.pallas_curve`), so results are bit-identical to the XLA
path in :mod:`.limbs`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMBS, LIMB_BITS
from .pallas_curve import _RowField

__all__ = ["make_pallas_butterfly"]

SUBLANES = 8
TILE = SUBLANES * 128


def _butterfly_kernel(even_ref, odd_ref, tw_ref, lo_ref, hi_ref, *, p_rows, n0):
    F = _RowField(p_rows, n0)
    even = [even_ref[j] for j in range(LIMBS)]
    odd = [odd_ref[j] for j in range(LIMBS)]
    tw = [tw_ref[j] for j in range(LIMBS)]
    t = F.mul(odd, tw)
    lo_ref[:] = jnp.stack(F.add(even, t))
    hi_ref[:] = jnp.stack(F.sub(even, t))


def make_pallas_butterfly(p: int, tile: int = TILE):
    """Returns ``butterfly(even, odd, tw) -> (lo, hi)`` over (32, N) int32
    Montgomery arrays, N a multiple of ``tile`` (callers pad)."""
    assert tile % 128 == 0
    S = tile // 128
    p_limbs = np.frombuffer(int(p).to_bytes(LIMBS, "little"), dtype=np.uint8)
    kernel = functools.partial(
        _butterfly_kernel,
        p_rows=tuple(int(x) for x in p_limbs),
        n0=int((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)),
    )
    spec = pl.BlockSpec((LIMBS, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    def butterfly(even, odd, tw):
        n = even.shape[1]
        assert n % tile == 0, f"batch {n} not a multiple of tile {tile}"
        shape3 = (LIMBS, n // 128, 128)
        lo, hi = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[spec] * 3,
            out_specs=[spec] * 2,
            out_shape=[jax.ShapeDtypeStruct(shape3, jnp.int32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=4300 * n, bytes_accessed=5 * LIMBS * 4 * n, transcendentals=0
            ),
        )(even.reshape(shape3), odd.reshape(shape3), tw.reshape(shape3))
        return lo.reshape(LIMBS, n), hi.reshape(LIMBS, n)

    return butterfly
