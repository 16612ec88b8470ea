"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference prover's serial Σ wᵢ·Pᵢ loops (snark.go:265-286,
groth16/groth16.go:243-275; SURVEY §2.9 row 2) with a bucket MSM shaped for
SIMD hardware:

  1. **window decomposition** — scalars are split into 32 radix-2^8 digits
     (one byte per window); windows are processed by a ``lax.scan`` so the
     trace stays small and points are reused across windows.
  2. **bucket accumulation** — the data-dependent scatter becomes
     sort-by-digit + a segmented Hillis-Steele inclusive scan: after sorting,
     every bucket is a contiguous run, and ``log2(N)`` masked batched point
     additions reduce each run; the run's tail element is scattered into its
     bucket slot.  No serial dependency on N anywhere.
  3. **bucket reduction** — the classic double-running-sum
     Σ b·B_b = Σ (running suffix sums), scanned over the 256 bucket index
     with all 32 windows batched in the lane dimension.
  4. **window combination** — 32 window sums (tiny) are combined with 8
     doublings per window on the host in exact arithmetic.

On a device mesh, points are sharded along the batch axis and each shard's
window sums are combined with ``all_gather`` + the same reduction — see
:mod:`go_snark_study_tpu.parallel.sharded_msm`.

All point math is the branchless Jacobian kernel (:mod:`.curve_ops`), so
equal points / identities inside buckets are handled correctly — cases the
reference's serial loop never encounters.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .curve_ops import G1Batch, G2Batch, jacobian_add
from .limbs import LIMBS

__all__ = ["MSMEngine", "scalars_to_windows", "WINDOW_BITS", "NUM_WINDOWS"]

WINDOW_BITS = 8
NUM_WINDOWS = 32  # ceil(254 / 8)
NUM_BUCKETS = 1 << WINDOW_BITS  # digit range; bucket 0 unused


def scalars_to_windows(scalars: Sequence[int], modulus: int) -> jnp.ndarray:
    """Scalars -> (NUM_WINDOWS, N) int32 byte digits, little-endian windows."""
    buf = b"".join((s % modulus).to_bytes(NUM_WINDOWS, "little") for s in scalars)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), NUM_WINDOWS)
    return jnp.asarray(arr.T.astype(np.int32))


def _tree_map_point(fn, *pts):
    return jax.tree.map(fn, *pts)


class MSMEngine:
    """MSM over one group (G1Batch or G2Batch) with its host group for the
    final exact combination step."""

    def __init__(
        self,
        batch_group,
        host_group,
        scalar_modulus: int,
        tile_threshold: int = 8192,
        tile_steps: int = 64,
    ):
        self.bg = batch_group
        self.host_group = host_group
        self.r = scalar_modulus
        self.tile_threshold = tile_threshold
        self.tile_steps = tile_steps
        self._window_sums_jit = jax.jit(self._window_sums)

    # ------------------------------------------------------------------
    # device pipeline
    # ------------------------------------------------------------------
    def _seg_scan_runs(self, sorted_points, sdig):
        """Segmented Hillis-Steele inclusive scan over contiguous runs of
        equal ``sdig``; negative digits are sentinels (still scanned, but
        excluded from buckets later).  Returns scanned points."""
        n = sdig.shape[0]
        F = self.bg.F
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
        steps = max(1, (n - 1).bit_length())

        def scan_step(s, acc):
            d = jnp.int32(1) << s
            rolled_dig = jnp.roll(sdig, d)
            same = jnp.logical_and(lane >= d, rolled_dig == sdig)
            prev = _tree_map_point(lambda c: jnp.roll(c, d, axis=1), acc)
            summed = jacobian_add(F, acc, prev)
            return _tree_map_point(
                lambda s_, a_: jnp.where(same[None, :], s_, a_), summed, acc
            )

        return jax.lax.fori_loop(0, steps, scan_step, sorted_points)

    @staticmethod
    def _runs_to_buckets(acc, sdig):
        """Scatter each run's tail element into its bucket slot."""
        nxt = jnp.concatenate([sdig[1:], jnp.full((1,), -2, dtype=sdig.dtype)])
        is_last = jnp.logical_and(sdig != nxt, sdig >= 0)
        slot = jnp.where(is_last, sdig, NUM_BUCKETS)
        return _tree_map_point(
            lambda c: jnp.zeros((c.shape[0], NUM_BUCKETS + 1), c.dtype)
            .at[:, slot]
            .set(c)[:, :NUM_BUCKETS],
            acc,
        )

    def _segmented_bucket_sums(self, points, digits):
        """points: pytree of (32, N) coords; digits: (N,) int32 bucket ids.
        Returns per-bucket sums as a pytree with leaves (32, NUM_BUCKETS).

        Small N: sort + one segmented scan (N log N adds).  Large N: the
        TILED variant — split the sorted stream into tiles of K elements,
        serially accumulate within tiles (K steps of N/K-wide adds = N adds
        total), compact the per-tile run partials (at most 256 + N/K of
        them), and run the log-scan only on that small compacted stream.
        This cuts per-window work from ~log2(N)·N to ~N point adds."""
        n = digits.shape[0]
        order = jnp.argsort(digits)
        sdig = digits[order]
        spts = _tree_map_point(lambda c: c[:, order], points)

        K = self.tile_steps
        if n < self.tile_threshold or n % K:
            acc = self._seg_scan_runs(spts, sdig)
            return self._runs_to_buckets(acc, sdig)

        F = self.bg.F
        m = n // K  # tiles = lanes of the serial pass
        sd = sdig.reshape(m, K)  # tile t, step j = sorted[t*K + j]
        steps_dig = jnp.transpose(sd)  # (K, m)
        steps_pts = _tree_map_point(
            lambda c: jnp.transpose(c.reshape(c.shape[0], m, K), (2, 0, 1)), spts
        )  # leaves (K, 32, m)

        zero_pt = self.bg.zeros(m)

        def tile_step(carry, xs):
            acc, prev_dig, j = carry
            dig, pt = xs
            boundary_in = jnp.logical_or(j == 0, dig != prev_dig)
            added = jacobian_add(F, acc, pt)
            acc = _tree_map_point(
                lambda p_, a_: jnp.where(boundary_in[None, :], p_, a_), pt, added
            )
            # closed if the NEXT element (step j+1) starts a new run; emit now
            return (acc, dig, j + 1), (acc, dig)

        (acc, _, _), (accs, digs) = jax.lax.scan(
            tile_step,
            (zero_pt, jnp.full((m,), -9, jnp.int32), jnp.int32(0)),
            (steps_dig, steps_pts),
        )
        # an emitted (acc, dig) at step j is a FINAL partial iff step j+1
        # opens a new run or j == K-1
        nxt_dig = jnp.concatenate([steps_dig[1:], jnp.full((1, m), -8, jnp.int32)])
        closed = nxt_dig != steps_dig  # (K, m)

        # flatten back to sorted-stream order: (K, m) -> (m, K) -> (n,)
        flat_closed = jnp.transpose(closed).reshape(n)
        flat_dig = jnp.where(flat_closed, jnp.transpose(digs).reshape(n), -1)
        flat_pts = _tree_map_point(
            lambda c: jnp.transpose(c, (1, 2, 0)).reshape(c.shape[1], n), accs
        )

        # compact the partials (order-preserving): at most 256 + m of them
        p_cap = NUM_BUCKETS + m
        p_cap += (-p_cap) % 128
        pos = jnp.cumsum(flat_closed.astype(jnp.int32)) - 1
        idx = jnp.where(flat_closed, pos, p_cap)
        comp_dig = jnp.full((p_cap + 1,), -3, jnp.int32).at[idx].set(flat_dig)[:p_cap]
        comp_pts = _tree_map_point(
            lambda c: jnp.zeros((c.shape[0], p_cap + 1), c.dtype)
            .at[:, idx]
            .set(c)[:, :p_cap],
            flat_pts,
        )

        acc2 = self._seg_scan_runs(comp_pts, comp_dig)
        return self._runs_to_buckets(acc2, comp_dig)

    def _window_sums(self, points, windows):
        """points: batched point pytree (N lanes); windows: (W, N) digits.
        Returns window-sum points with W lanes (window w in lane w)."""
        F = self.bg.F
        w = windows.shape[0]

        def per_window(_, digits):
            return None, self._segmented_bucket_sums(points, digits)

        _, buckets = jax.lax.scan(per_window, None, windows)
        # leaves (W, 32, NUM_BUCKETS) -> (NUM_BUCKETS, 32, W): bucket index on
        # the scan axis, windows batched in lanes
        buckets = _tree_map_point(lambda c: jnp.transpose(c, (2, 1, 0)), buckets)
        # b = 255 .. 1 (bucket 0 contributes nothing)
        buckets = _tree_map_point(lambda c: jnp.flip(c[1:], axis=0), buckets)

        zero = self.bg.zeros(w)

        def reduce_body(state, bucket_b):
            running, total = state
            running = jacobian_add(F, running, bucket_b)
            total = jacobian_add(F, total, running)
            return (running, total), None

        (_, total), _ = jax.lax.scan(reduce_body, (zero, zero), buckets)
        return total

    # ------------------------------------------------------------------
    # host entry
    # ------------------------------------------------------------------
    def msm(self, host_points, host_scalars: Sequence[int]):
        """Σ sᵢ·Pᵢ.  host_points: reference-style Jacobian points;
        returns one host Jacobian point (projectively equal to the
        reference's serial result)."""
        assert len(host_points) == len(host_scalars)
        n = len(host_points)
        if n == 0:
            return self.host_group.zero()
        # pad to a multiple of 128 lanes with identity points / zero scalars
        pad = (-n) % 128
        pts = list(host_points) + [self.host_group.zero()] * pad
        scs = [s % self.r for s in host_scalars] + [0] * pad

        dev_pts = self.bg.pack(pts)
        windows = scalars_to_windows(scs, self.r)
        sums = self._window_sums_jit(dev_pts, windows)
        window_pts = self.bg.unpack(sums)  # W host points, LSB window first

        g = self.host_group
        total = g.zero()
        for wp in reversed(window_pts):
            for _ in range(WINDOW_BITS):
                total = g.double(total)
            total = g.add(total, wp)
        return total
