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

__all__ = ["make_pallas_butterfly", "make_pallas_small_ntt"]

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


def _small_ntt_kernel(x_ref, o_ref, *, p_rows, n0, g, stage_tws):
    """Complete g-point DIT NTT along the row axis, all log2(g) stages
    VMEM-resident: rows are read bit-reversed, every butterfly's twiddle is
    a trace constant, and the only HBM traffic is one read + one write of
    the (32, g, S, 128) block — versus one read/write PER STAGE for the
    stage-at-a-time path."""
    F = _RowField(p_rows, n0)
    k = g.bit_length() - 1

    def rev(i):
        r = 0
        for b in range(k):
            r |= ((i >> b) & 1) << (k - 1 - b)
        return r

    rows = [[x_ref[j, rev(i)] for j in range(LIMBS)] for i in range(g)]
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        tws = stage_tws[s - 1]  # tuple of `half` 32-limb int tuples
        nxt = list(rows)
        for blk in range(0, g, m):
            for j in range(half):
                e = rows[blk + j]
                o = rows[blk + half + j]
                # j == 0 is the unit twiddle: Montgomery one * o = o
                t = o if j == 0 else F.mul(o, list(tws[j]))
                nxt[blk + j] = F.add(e, t)
                nxt[blk + half + j] = F.sub(e, t)
        rows = nxt
    for i in range(g):
        o_ref[:, i] = jnp.stack(rows[i])


def make_pallas_small_ntt(
    p: int, g: int, stage_tws, tile: int = TILE, interpret: bool = False
):
    """Build ``f(x) -> y`` computing a natural-order g-point NTT along
    axis 1 of (32, g, L) int32 Montgomery arrays (L a multiple of ``tile``),
    with all stages fused in one kernel.  ``stage_tws``: per-stage tuples of
    32-limb twiddle constants (from ``NTTEngine.master_np``), so one kernel
    per (g, direction).  g <= 16 keeps the unrolled CIOS count comparable to
    the fused G2 point kernels."""
    assert g & (g - 1) == 0 and 2 <= g <= 16
    assert tile % 128 == 0
    S = tile // 128
    p_limbs = np.frombuffer(int(p).to_bytes(LIMBS, "little"), dtype=np.uint8)
    kernel = functools.partial(
        _small_ntt_kernel,
        p_rows=tuple(int(x) for x in p_limbs),
        n0=int((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)),
        g=g,
        stage_tws=stage_tws,
    )
    spec = pl.BlockSpec(
        (LIMBS, g, S, 128), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )
    # muls per lane column: sum over stages of (g/2 - g/2^s)
    n_muls = sum((g // 2) - (g >> s) // 1 for s in range(1, g.bit_length())) or 1

    def small_ntt(x):
        lanes = x.shape[2]
        assert x.shape[:2] == (LIMBS, g) and lanes % tile == 0, x.shape
        shape4 = (LIMBS, g, lanes // 128, 128)
        (out,) = pl.pallas_call(
            kernel,
            grid=(lanes // tile,),
            in_specs=[spec],
            out_specs=[spec],
            out_shape=[jax.ShapeDtypeStruct(shape4, jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=4300 * n_muls * lanes,
                bytes_accessed=2 * g * LIMBS * 4 * lanes,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x.reshape(shape4))
        return out.reshape(LIMBS, g, lanes)

    return small_ntt


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
