"""Fused Pallas TPU kernel for batched Montgomery multiplication.

The XLA formulation in :mod:`.limbs` round-trips the (64, N) accumulator
through HBM on every loop step (~16 reads+writes of the full array per
multiply), so it runs memory-bound at a fraction of the VPU's int32 rate.
This kernel keeps the whole accumulator in VMEM/vector registers for a lane
tile and fuses schoolbook + Montgomery reduction + carry normalisation +
conditional subtract into one pass: per element it reads 2x128 B and writes
128 B — decisively compute-bound.

Layout matches :mod:`.limbs`: (32, N) int32, limbs on sublanes, batch on
lanes; tiles of TILE lanes are mapped over a 1-D grid.
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

DEFAULT_TILE = 512


def _mont_mul_kernel(a_ref, b_ref, out_ref, *, p_rows: tuple, n0: int):
    # NB: Pallas kernels may not capture array constants; the modulus enters
    # as a tuple of python ints and is applied as per-row scalar multiplies.
    a = a_ref[:]
    b = b_ref[:]
    t_lanes = a.shape[1]

    # CIOS with a shifting (32, T) accumulator — static offsets only.
    acc = jnp.zeros((LIMBS, t_lanes), jnp.int32)
    for _i in range(LIMBS):
        acc = acc + a[_i][None, :] * b
        t = acc[0]
        m = ((t & MASK) * n0) & MASK
        acc = acc + jnp.stack([m * pi for pi in p_rows])
        carry = acc[0] >> LIMB_BITS
        # shift down one limb and fold the carry into the new bottom row
        # (no .at[].add — Mosaic has no scatter-add)
        acc = jnp.concatenate(
            [(acc[1] + carry)[None, :], acc[2:], jnp.zeros((1, t_lanes), jnp.int32)]
        )

    # carry-propagate the lazy rows
    rows = []
    c = jnp.zeros((t_lanes,), jnp.int32)
    for i in range(LIMBS):
        v = acc[i] + c
        rows.append(v & MASK)
        c = v >> LIMB_BITS
    res = jnp.stack(rows)

    # conditional subtract p (row-wise scalar constants)
    rows2 = []
    c2 = jnp.zeros((t_lanes,), jnp.int32)
    for i in range(LIMBS):
        v = res[i] - p_rows[i] + c2
        rows2.append(v & MASK)
        c2 = v >> LIMB_BITS
    sub = jnp.stack(rows2)
    out_ref[:] = jnp.where((c2 == 0)[None, :], sub, res)


def make_pallas_mont_mul(p: int, tile: int = DEFAULT_TILE):
    """Returns mul(a, b) for (32, N) int32 Montgomery operands, N a multiple
    of ``tile`` (callers pad)."""
    p_limbs = np.frombuffer(int(p).to_bytes(LIMBS, "little"), dtype=np.uint8).astype(
        np.int32
    )
    n0 = int((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
    kernel = functools.partial(
        _mont_mul_kernel, p_rows=tuple(int(x) for x in p_limbs), n0=n0
    )

    def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        n = a.shape[1]
        assert n % tile == 0, f"batch {n} not a multiple of tile {tile}"
        grid = (n // tile,)
        spec = pl.BlockSpec((LIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=4300 * n, bytes_accessed=3 * LIMBS * 4 * n, transcendentals=0
            ),
        )(a, b)

    return mul
