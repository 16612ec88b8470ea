"""Batched fixed-base scalar multiplication on TPU.

The trusted-setup loops are thousands of scalar multiplications of the SAME
base point (G1 or G2 generators, snark.go:181-218, groth16.go:151-219,
plus the powers-of-tau ladders).  The reference does a full 254-step
double-and-add per scalar; here we precompute the classic windowed table

    table[w][d] = d * 2^(8w) * G      (32 windows x 256 digits)

once per base on the host (±8k group adds), upload it as a packed limb array,
and then every scalar costs one gather + a 5-level tree of batched Jacobian
adds — fully parallel over the scalar batch.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .curve_ops import jacobian_add
from .msm import NUM_WINDOWS, WINDOW_BITS, scalars_to_windows

__all__ = ["FixedBaseEngine"]

DIGITS = 1 << WINDOW_BITS


class FixedBaseEngine:
    """Windowed fixed-base multiplier for one base point in one group."""

    def __init__(self, batch_group, host_group, base_point, scalar_modulus: int):
        self.bg = batch_group
        self.host_group = host_group
        self.r = scalar_modulus
        self._table_dev = self._build_table(base_point)
        self._jit = jax.jit(self._batch_mul_impl)

    def _build_table(self, base):
        g = self.host_group
        table: List = []
        window_base = base
        for _ in range(NUM_WINDOWS):
            row = [g.zero()]
            for _ in range(DIGITS - 1):
                row.append(g.add(row[-1], window_base))
            table.extend(row)
            for _ in range(WINDOW_BITS):
                window_base = g.double(window_base)
        # pack flat: index w*256 + d
        return self.bg.pack(table)

    def _batch_mul_impl(self, windows):
        """windows: (32, N) digits -> batched points (N lanes).

        fori_loop over windows (one gather + one batched add per step) so the
        trace contains a single point-add — unrolled 31-add trees make XLA
        compile times explode."""
        n = windows.shape[1]
        F = self.bg.F
        table = self._table_dev

        def body(w, acc):
            idx = windows[w] + w * DIGITS
            pt = jax.tree.map(lambda c: c[..., idx], table)
            return self.bg.jadd(acc, pt)

        return jax.lax.fori_loop(0, NUM_WINDOWS, body, self.bg.zeros(n))

    def batch_mul(self, scalars: Sequence[int]):
        """[k_i] -> [k_i * G] as host Jacobian points."""
        n = len(scalars)
        if n == 0:
            return []
        pad = (-n) % 128
        scs = [s % self.r for s in scalars] + [0] * pad
        windows = scalars_to_windows(scs, self.r)
        out = self.bg.unpack(self._jit(windows))
        return out[:n]

    def batch_mul_device(self, windows):
        """Device-level entry: (32, N) digits -> batched point pytree."""
        return self._jit(windows)
