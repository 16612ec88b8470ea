"""Batched fixed-base scalar multiplication on TPU.

The trusted-setup loops are thousands of scalar multiplications of the SAME
base point (G1 or G2 generators, snark.go:181-218, groth16.go:151-219,
plus the powers-of-tau ladders).  The reference does a full 254-step
double-and-add per scalar; here we precompute the classic windowed table

    table[w][d] = d * 2^(8w) * G      (32 windows x 256 digits)

once per base on the host (±8k group adds), upload it as a packed limb array,
and then every scalar costs one gather + a fori_loop of batched Jacobian
adds — fully parallel over the scalar batch.

Compile-time discipline (the hot constraint on the remote TPU backend):

  * the table is passed to the jitted program as an ARGUMENT, not closed
    over — closed-over device arrays are baked into the HLO as literal
    constants, which balloons the program (25 MB for the G2 table), the
    remote-compile transport, and the persistent-cache entries;
  * lanes are processed in FIXED tiles of ``tile`` (default 8192), so one
    compiled executable serves every scalar count — the trusted setup at
    any circuit size reuses a single compile (and later processes reuse
    the persistent cache entry).  Zero-padded lanes gather table digit 0
    (the identity) and stay exact.
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


def default_tile() -> int:
    """Fixed lane width of the compiled program: sized for the TPU's vector
    units; small on the CPU backend (tests), where execution is the cost and
    a wide tile only burns time on padding lanes."""
    try:
        import jax

        return 8192 if jax.default_backend() in ("tpu", "axon") else 512
    except Exception:
        return 512


class FixedBaseEngine:
    """Windowed fixed-base multiplier for one base point in one group."""

    def __init__(
        self,
        batch_group,
        host_group,
        base_point,
        scalar_modulus: int,
        tile: int | None = None,
    ):
        self.bg = batch_group
        self.host_group = host_group
        self.r = scalar_modulus
        self.tile = tile or default_tile()
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

    def _batch_mul_impl(self, windows, table):
        """windows: (32, tile) digits; table: packed point pytree ->
        batched points (tile lanes).

        fori_loop over windows (one gather + one batched add per step) so the
        trace contains a single point-add — unrolled 31-add trees make XLA
        compile times explode."""
        n = windows.shape[1]

        def body(w, acc):
            idx = windows[w] + w * DIGITS
            pt = jax.tree.map(lambda c: c[..., idx], table)
            return self.bg.jadd(acc, pt)

        return jax.lax.fori_loop(0, NUM_WINDOWS, body, self.bg.zeros(n))

    def batch_mul_device(self, windows):
        """Device-level entry: (32, N) digits -> batched point pytree with N
        lanes, computed in fixed ``tile``-lane slices (one executable for
        every N)."""
        n = windows.shape[1]
        t = self.tile
        if n < t <= 1024:
            # CPU-sized tiles only (see curve_ops.to_affine_tiled): quantize
            # small batches to the next power of two; on TPU the one hot
            # 8192-lane compile is always reused instead
            t = max(128, 1 << (n - 1).bit_length())
        pad = (-n) % t
        if pad:
            windows = jnp.pad(windows, ((0, 0), (0, pad)))
        parts = [
            self._jit(
                jax.lax.dynamic_slice_in_dim(windows, i, t, 1), self._table_dev
            )
            for i in range(0, n + pad, t)
        ]
        out = (
            parts[0]
            if len(parts) == 1
            else jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=-1), *parts)
        )
        return jax.tree.map(lambda c: c[..., :n], out) if pad else out

    def batch_mul(self, scalars: Sequence[int]):
        """[k_i] -> [k_i * G] as host Jacobian points."""
        n = len(scalars)
        if n == 0:
            return []
        scs = [s % self.r for s in scalars]
        windows = scalars_to_windows(scs, self.r)
        out = self.bg.unpack(self.batch_mul_device(windows))
        return out[:n]
