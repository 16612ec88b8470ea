"""Fused Pallas TPU kernel for batched Montgomery multiplication.

The XLA formulation in :mod:`.limbs` round-trips the (32, N) accumulator
through HBM on every loop step, so it runs memory-bound at a fraction of the
VPU's int32 rate.  This kernel keeps the accumulator in VMEM/vector registers
for a lane tile and fuses schoolbook + Montgomery reduction + carry
normalisation + conditional subtract into one pass.

Two measured-on-v5e design rules shape the kernel:

  * **3-D ``(LIMBS, S, 128)`` blocks.**  TPU vector registers are (8, 128);
    a 2-D ``(LIMBS, T)`` block makes every per-limb row op a (1, T) slice
    that uses 1/8 of the sublanes.  Reshaping the lane tile to ``(S, 128)``
    with S >= 8 makes every row op a full-register op — measured 85 -> 150
    M muls/s on a v5e chip.
  * **List-of-rows accumulator, no concatenate.**  The CIOS "shift" is done
    by renaming rows (python-level list rotation at trace time) instead of a
    ``jnp.concatenate``, so Mosaic sees pure elementwise dataflow and keeps
    rows in registers.

Layout at the boundary matches :mod:`.limbs`: (32, N) int32, limbs on
sublanes, batch on lanes; the wrapper reshapes to (32, N/128, 128) and tiles
S block-rows per grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMBS, LIMB_BITS, MASK

__all__ = ["make_pallas_mont_mul", "DEFAULT_TILE"]

DEFAULT_SUBLANES = 16  # S: block rows per 128-lane group (measured best on v5e)
DEFAULT_TILE = DEFAULT_SUBLANES * 128


def _mont_mul_kernel(a_ref, b_ref, out_ref, *, p_rows: tuple, n0: int):
    """CIOS Montgomery multiply on (LIMBS, S, 128) blocks.

    The accumulator is a python list of (S, 128) rows; the per-step limb
    shift is a list rotation, and the modulus enters as per-row immediate
    scalars (Pallas kernels cannot capture array constants).
    """
    a = a_ref[:]  # (LIMBS, S, 128)
    b = [b_ref[j] for j in range(LIMBS)]  # rows (S, 128)
    S, L = a.shape[1], a.shape[2]
    zero = jnp.zeros((S, L), jnp.int32)

    acc = [zero] * LIMBS
    for i in range(LIMBS):
        a_i = a[i]
        t = acc[0] + a_i * b[0]
        m = ((t & MASK) * n0) & MASK
        carry = (t + m * p_rows[0]) >> LIMB_BITS
        nacc = [zero] * LIMBS
        for j in range(1, LIMBS):
            nacc[j - 1] = acc[j] + a_i * b[j] + m * p_rows[j]
        nacc[0] = nacc[0] + carry
        acc = nacc

    # carry-propagate the lazy rows
    c = zero
    rows = []
    for i in range(LIMBS):
        v = acc[i] + c
        rows.append(v & MASK)
        c = v >> LIMB_BITS

    # conditional subtract p
    c2 = zero
    rows2 = []
    for i in range(LIMBS):
        v = rows[i] - p_rows[i] + c2
        rows2.append(v & MASK)
        c2 = v >> LIMB_BITS
    ge = c2 == 0  # no final borrow => rows >= p
    out_ref[:] = jnp.stack([jnp.where(ge, r2, r1) for r1, r2 in zip(rows, rows2)])


def make_pallas_mont_mul(p: int, tile: int = DEFAULT_TILE):
    """Returns mul(a, b) for (32, N) int32 Montgomery operands, N a multiple
    of ``tile`` (callers pad).  ``tile`` must be a multiple of 128."""
    assert tile % 128 == 0
    S = tile // 128
    p_limbs = np.frombuffer(int(p).to_bytes(LIMBS, "little"), dtype=np.uint8).astype(
        np.int32
    )
    kernel = functools.partial(
        _mont_mul_kernel, p_rows=tuple(int(x) for x in p_limbs), n0=int(
            (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        )
    )
    spec = pl.BlockSpec((LIMBS, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        n = a.shape[1]
        assert n % tile == 0, f"batch {n} not a multiple of tile {tile}"
        a3 = a.reshape(LIMBS, n // 128, 128)
        b3 = b.reshape(LIMBS, n // 128, 128)
        out = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=4300 * n, bytes_accessed=3 * LIMBS * 4 * n, transcendentals=0
            ),
        )(a3, b3)
        return out.reshape(LIMBS, n)

    return mul
