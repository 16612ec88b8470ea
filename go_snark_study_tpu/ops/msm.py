"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference prover's serial Σ wᵢ·Pᵢ loops (snark.go:265-286,
groth16/groth16.go:243-275; SURVEY §2.9 row 2) with a bucket MSM shaped for
SIMD hardware:

  1. **adaptive window decomposition** — scalars are split into W = ⌈254/c⌉
     radix-2^c digits with c chosen from the point count (c=8 small →
     c=13 at 2^20): larger windows mean fewer passes over the points, and
     the extra bucket-reduction cost is kept parallel (see 4).  Digits are
     extracted ON DEVICE from the base-2^8 limb representation of the
     scalars, so scalars never round-trip through python ints.
  2. **bucket accumulation** — the data-dependent scatter becomes
     sort-by-digit + run accumulation.  Windows are processed in GROUPS that
     ride in the lane dimension (one sort / one scan for the whole group):
     per sorted stream, tiles of the stream are accumulated serially
     (K steps of Wg·N/K-wide MIXED Jacobian adds — the incoming points are
     affine-normalised once per key, so each add is 7M+4S instead of
     11M+5S), then the per-tile run partials are compacted and merged with a
     log-step segmented scan, and each run's tail lands in its bucket slot.
  3. **no serial dependency on N anywhere**; lane widths stay in the
     10^4-10^5 range where the Pallas Montgomery kernel runs at full rate.
  4. **parallel bucket reduction** — Σ b·B_b is NOT the classic serial
     double-running-sum over 2^c buckets (useless at c=13): buckets are
     chunked b = q·D + j; Σ b·B_b = D·Σ_q q·S_q + Σ_q T_q where the chunk
     scans run D steps at W·Q-wide lanes and Σ_q q·S_q is a bit-sliced
     tree reduction — everything wide, nothing O(2^c) serial.
  5. **window combination** — W window sums (tiny) are combined with c
     doublings per window on the host in exact arithmetic.

On a device mesh, points are sharded along the batch axis and each shard's
window sums are combined with ``all_gather`` + tree adds — see
:mod:`go_snark_study_tpu.parallel.sharded_msm`.

All point math is branchless (:mod:`.curve_ops`), so equal points /
identities inside buckets are handled correctly — cases the reference's
serial loop never encounters.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .curve_ops import jacobian_add, jacobian_add_mixed, jacobian_double
from .limbs import LIMBS

__all__ = [
    "MSMEngine",
    "scalars_to_limbs",
    "scalars_to_windows",
    "digits_from_limbs",
    "num_windows",
    "choose_window_bits",
    "combine_window_sums",
    "WINDOW_BITS",
    "NUM_WINDOWS",
]

# legacy 8-bit constants — still the fixed-base table radix (ops/fixed_base)
WINDOW_BITS = 8
NUM_WINDOWS = 32

SCALAR_BITS = 254  # BN128 r bit length


def scalars_to_limbs(scalars: Sequence[int], modulus: int) -> jnp.ndarray:
    """Scalars -> (32, N) int32 base-2^8 little-endian limbs (plain, not
    Montgomery) — the device-side source for window digit extraction."""
    buf = b"".join((s % modulus).to_bytes(LIMBS, "little") for s in scalars)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), LIMBS)
    return jnp.asarray(arr.T.astype(np.int32))


# historical name: with 8-bit limbs the limb rows ARE the 8-bit windows
scalars_to_windows = scalars_to_limbs


def num_windows(c: int) -> int:
    return -(-SCALAR_BITS // c)


def choose_window_bits(n: int) -> int:
    """Window width minimising W·N mixed adds + bucket/compaction overhead
    (tuned on v5e; the break-evens are flat so coarse steps suffice)."""
    if n >= 1 << 19:
        return 13
    if n >= 1 << 17:
        return 12
    if n >= 1 << 15:
        return 11
    if n >= 1 << 13:
        return 10
    return 8


def digits_from_limbs(limbs: jnp.ndarray, c: int) -> jnp.ndarray:
    """(32, N) base-256 limbs -> (W, N) int32 radix-2^c digits, on device.

    Window w covers scalar bits [w*c, (w+1)*c) and spans at most three 8-bit
    limbs; rows are assembled with static shifts (trace-time unrolled, W is
    small)."""
    mask = (1 << c) - 1
    rows = []
    for w in range(num_windows(c)):
        lo_bit = w * c
        b0, sh = lo_bit // 8, lo_bit % 8
        d = limbs[b0] >> sh
        got = 8 - sh
        j = 1
        while got < c and b0 + j < LIMBS:
            d = d | (limbs[b0 + j] << got)
            got += 8
            j += 1
        rows.append(d & mask)
    return jnp.stack(rows)


def combine_window_sums(host_group, window_pts, c: int):
    """Exact host combination: Σ_w 2^(c·w) · S_w, MSB window first."""
    total = host_group.zero()
    for wp in reversed(window_pts):
        for _ in range(c):
            total = host_group.double(total)
        total = host_group.add(total, wp)
    return total


def _tree_map_point(fn, *pts):
    return jax.tree.map(fn, *pts)


class MSMEngine:
    """MSM over one group (G1Batch or G2Batch) with its host group for the
    final exact combination step.

    ``tile_threshold``: point counts below this use the simple (sort + one
    log-scan) path; above it the tiled group pipeline.
    ``tile_steps``: explicit serial step count K for the tiled path (tests);
    default sizes tiles so each window contributes ``tile_lanes`` lanes.
    ``group_bytes``: memory budget for one window group's partial-sum
    emission, which bounds how many windows share a pass.
    """

    def __init__(
        self,
        batch_group,
        host_group,
        scalar_modulus: int,
        window_bits: int | None = None,
        tile_threshold: int = 8192,
        tile_steps: int | None = None,
        tile_lanes: int = 4096,
        group_bytes: int = 3 << 30,
        chunk_lanes: int | None = None,
    ):
        self.bg = batch_group
        self.host_group = host_group
        self.r = scalar_modulus
        self.window_bits = window_bits
        self.tile_threshold = tile_threshold
        self.tile_steps = tile_steps
        self.tile_lanes = tile_lanes
        self.group_bytes = group_bytes
        if chunk_lanes is None:
            # canonical chunking only on the TPU backend, where remote
            # compiles (30-300 s per shape) dominate — the CPU backend
            # (tests) keeps the per-shape path, whose compiles are cheap
            # and whose execution cost scales with the padded lanes
            try:
                if jax.default_backend() in ("tpu", "axon"):
                    chunk_lanes = 1 << 17
            except Exception:
                pass
        self.chunk_lanes = chunk_lanes
        self._jits = {}

    # ------------------------------------------------------------------
    # parameter selection
    # ------------------------------------------------------------------
    def _canonical(self, n: int) -> bool:
        """Whether n runs through the fixed-shape chunked pipeline: every
        such MSM pads to a multiple of ``chunk_lanes`` and uses c=13, so
        ONE compiled (digits, group, reduce) family serves all sizes — the
        decisive property on the remote TPU backend, where each new shape
        costs a multi-minute compile but warm chunks run in ~0.5 s."""
        return self.chunk_lanes is not None and n >= self.tile_threshold

    def window_bits_for(self, n: int) -> int:
        if self.window_bits:
            return self.window_bits
        if self._canonical(n):
            return 13
        return choose_window_bits(n)

    def pad_quantum(self, n: int) -> int:
        if self._canonical(n):
            return self.chunk_lanes
        if n >= self.tile_threshold:
            return self.tile_steps if self.tile_steps else self.tile_lanes
        return 128

    def _coord_bytes(self) -> int:
        # bytes per point-lane: 3 coords x arity x 32 limbs x 4 B
        return 3 * self.bg._arity * LIMBS * 4

    def _group_size(self, n: int, w: int) -> int:
        by_mem = max(1, self.group_bytes // (n * self._coord_bytes()))
        return max(1, min(w, by_mem))

    # ------------------------------------------------------------------
    # device pipeline (pure traced functions of device arrays)
    # ------------------------------------------------------------------
    def _seg_scan_runs(self, pts, sdig):
        """Segmented Hillis-Steele inclusive scan over contiguous runs of
        equal ``sdig`` along the LAST axis (windows ride in leading batch
        axes; rolls never cross them).  Negative digits are sentinels."""
        F = self.bg.F
        P = sdig.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, sdig.shape, sdig.ndim - 1)
        steps = max(1, (P - 1).bit_length())

        def scan_step(s, acc):
            d = jnp.int32(1) << s
            rolled_dig = jnp.roll(sdig, d, axis=-1)
            same = jnp.logical_and(lane >= d, rolled_dig == sdig)
            prev = _tree_map_point(lambda c_: jnp.roll(c_, d, axis=-1), acc)
            summed = self.bg.jadd(acc, prev)
            return _tree_map_point(
                lambda s_, a_: jnp.where(same[None], s_, a_), summed, acc
            )

        return jax.lax.fori_loop(0, steps, scan_step, pts)

    @staticmethod
    def _runs_to_buckets(acc, sdig, m_buckets: int):
        """Scatter each run's tail element into its bucket slot.
        acc leaves (32, Wg, P) [or (32, P)], sdig (Wg, P) [or (P,)]."""
        nxt = jnp.concatenate(
            [sdig[..., 1:], jnp.full(sdig.shape[:-1] + (1,), -2, sdig.dtype)],
            axis=-1,
        )
        is_last = jnp.logical_and(sdig != nxt, sdig >= 0)
        slot = jnp.where(is_last, sdig, m_buckets)
        if sdig.ndim == 1:
            return _tree_map_point(
                lambda c_: jnp.zeros((c_.shape[0], m_buckets + 1), c_.dtype)
                .at[:, slot]
                .set(c_)[:, :m_buckets],
                acc,
            )
        wg = sdig.shape[0]
        widx = jnp.broadcast_to(jnp.arange(wg)[:, None], slot.shape)
        return _tree_map_point(
            lambda c_: jnp.zeros((c_.shape[0], wg, m_buckets + 1), c_.dtype)
            .at[:, widx, slot]
            .set(c_)[:, :, :m_buckets],
            acc,
        )

    def _group_buckets(self, points, dig_g, m_buckets: int):
        """Tiled accumulation for one window group.

        points: affine point pytree, leaves (32, N); dig_g: (Wg, N) digits.
        Returns bucket sums, leaves (32, Wg, m_buckets)."""
        F = self.bg.F
        wg, n = dig_g.shape
        if self.tile_steps:
            k = self.tile_steps
        else:
            k = max(2, n // self.tile_lanes)
        m = n // k  # lanes (tiles) per window

        order = jnp.argsort(dig_g, axis=1)
        sdig = jnp.take_along_axis(dig_g, order, axis=1)
        # sorted position t*K + j  ->  scan step j, lane (w, t)
        ord3 = jnp.transpose(order.reshape(wg, m, k), (2, 0, 1))  # (K, Wg, m)
        dig3 = jnp.transpose(sdig.reshape(wg, m, k), (2, 0, 1))

        zero_pt = self.bg.zeros(wg * m)

        def tile_step(carry, xs):
            acc, prev_dig = carry
            idx, dig = xs  # (Wg, m)
            fid = idx.reshape(-1)
            pt = _tree_map_point(lambda c_: c_[:, fid], points)
            dflat = dig.reshape(-1)
            boundary = dflat != prev_dig
            added = self.bg.madd(acc, pt)
            acc = _tree_map_point(
                lambda p_, a_: jnp.where(boundary[None], p_, a_), pt, added
            )
            return (acc, dflat), acc

        (_, _), accs = jax.lax.scan(
            tile_step,
            (zero_pt, jnp.full((wg * m,), -9, jnp.int32)),
            (ord3, dig3),
        )  # leaves (K, 32, Wg*m)

        # a partial emitted at step j is FINAL iff step j+1 (same tile)
        # opens a new run, or j == K-1 (runs spanning tiles are merged by
        # the segmented scan below — compaction preserves sorted order)
        nxt_dig = jnp.concatenate(
            [dig3[1:], jnp.full((1, wg, m), -8, jnp.int32)], axis=0
        )
        closed = nxt_dig != dig3  # (K, Wg, m)

        # per-window compacted positions (sorted-stream order = (t, j))
        flat_closed = jnp.transpose(closed, (1, 2, 0)).reshape(wg, n)
        p_cap = m_buckets + m
        p_cap += (-p_cap) % 1024  # keep Wg·P lanes on the Pallas tile grid
        pos = jnp.cumsum(flat_closed.astype(jnp.int32), axis=1) - 1
        idx_flat = jnp.where(flat_closed, pos, p_cap)
        idx3 = jnp.transpose(idx_flat.reshape(wg, m, k), (2, 0, 1))  # (K,Wg,m)
        widx = jnp.broadcast_to(jnp.arange(wg)[None, :, None], idx3.shape)

        comp_dig = (
            jnp.full((wg, p_cap + 1), -3, jnp.int32)
            .at[widx, idx3]
            .set(dig3)[:, :p_cap]
        )
        comp_pts = _tree_map_point(
            lambda c_: jnp.zeros((c_.shape[1], wg, p_cap + 1), c_.dtype)
            .at[:, widx, idx3]
            .set(jnp.moveaxis(c_.reshape(k, c_.shape[1], wg, m), 0, 1))[
                :, :, :p_cap
            ],
            accs,
        )

        scanned = self._seg_scan_runs(comp_pts, comp_dig)
        return self._runs_to_buckets(scanned, comp_dig, m_buckets)

    def _small_buckets(self, points, digits, m_buckets: int):
        """Small-N path: all windows in lanes, one sort + one segmented
        scan over the raw sorted stream (no tiling)."""
        order = jnp.argsort(digits, axis=1)
        sdig = jnp.take_along_axis(digits, order, axis=1)
        spts = _tree_map_point(lambda c_: c_[:, order], points)  # (32, W, N)
        scanned = self._seg_scan_runs(spts, sdig)
        return self._runs_to_buckets(scanned, sdig, m_buckets)

    def _reduce_buckets(self, buckets, c: int):
        """Σ_b b·B_b per window, parallel: chunk b = q·D + j, run the
        double-running-sum over j only (D steps, W·Q-wide lanes — never the
        classic O(2^c) serial scan), then combine the Q chunk aggregates
        with a second (short, Q-step) double-running scan:
        Σ_b b·B_b = D·Σ_q q·S_q + Σ_q T_q.  buckets leaves (32, W, M);
        returns leaves (32, W)."""
        F = self.bg.F
        m_buckets = 1 << c
        w = jax.tree.leaves(buckets)[0].shape[1]
        d_chunk = 64 if m_buckets >= 4096 else min(16, m_buckets)
        q_chunk = m_buckets // d_chunk

        # (32, W, M) -> (D, 32, W, Q) with j (minor bucket index) on scan axis
        def to_scan(c_):
            return jnp.moveaxis(
                c_.reshape(c_.shape[0], w, q_chunk, d_chunk), -1, 0
            )

        b4 = _tree_map_point(to_scan, buckets)
        b4 = _tree_map_point(lambda c_: jnp.flip(c_, 0), b4)  # j = D-1 first

        zero = _tree_map_point(
            lambda c_: jnp.zeros_like(c_[0]), b4
        )  # (32, W, Q)

        def body(carry, bj):
            running, tacc = carry
            running = self.bg.jadd(running, bj)
            tacc = self.bg.jadd(tacc, running)
            return (running, tacc), None

        upper = _tree_map_point(lambda c_: c_[: d_chunk - 1], b4)  # j=D-1..1
        (running, t_sum), _ = jax.lax.scan(body, (zero, zero), upper)
        b0 = _tree_map_point(lambda c_: c_[d_chunk - 1], b4)  # j = 0
        s_sum = self.bg.jadd(running, b0)  # S_q, leaves (32, W, Q)

        # combine chunks: Σ_q q·S_q (double-running over q) and Σ_q T_q
        # (plain running), both in ONE Q-step scan at W lanes
        def chunk_scan(c_):
            return jnp.flip(jnp.moveaxis(c_, -1, 0), 0)  # (Q, 32, W), q desc

        sq = _tree_map_point(chunk_scan, s_sum)
        tq = _tree_map_point(chunk_scan, t_sum)
        zero_w = _tree_map_point(lambda c_: jnp.zeros_like(c_[0]), sq)

        def body2(carry, xs):
            s_j, t_j = xs
            run_s, inner, tot_t = carry
            run_s = self.bg.jadd(run_s, s_j)
            inner = self.bg.jadd(inner, run_s)
            tot_t = self.bg.jadd(tot_t, t_j)
            return (run_s, inner, tot_t), None

        upper_s = _tree_map_point(lambda c_: c_[: q_chunk - 1], sq)  # q desc
        (_, inner, tot_t), _ = jax.lax.scan(
            body2, (zero_w, zero_w, zero_w), (upper_s, _tree_map_point(lambda c_: c_[: q_chunk - 1], tq))
        )
        # q = 0 contributes only to Σ T_q
        tot_t = self.bg.jadd(
            tot_t, _tree_map_point(lambda c_: c_[q_chunk - 1], tq)
        )
        for _ in range(d_chunk.bit_length() - 1):  # × D
            inner = jacobian_double(F, inner)
        return self.bg.jadd(inner, tot_t)

    def _window_sums(self, points, digits, c: int):
        """points: AFFINE batched point pytree (N lanes, z ∈ {0, 1});
        digits: (W, N) radix-2^c digits.  Returns window-sum points with W
        lanes (window w in lane w)."""
        w, n = digits.shape
        m_buckets = 1 << c
        if n < self.tile_threshold:
            buckets = self._small_buckets(points, digits, m_buckets)
        else:
            wg = self._group_size(n, w)
            parts = []
            for g0 in range(0, w, wg):
                parts.append(
                    self._group_buckets(points, digits[g0 : g0 + wg], m_buckets)
                )
            buckets = _tree_map_point(
                lambda *xs: jnp.concatenate(xs, axis=1), *parts
            )
        return self._reduce_buckets(buckets, c)

    def window_sums_device(self, aff_points, limbs, c: int):
        """Traced device entry for fused programs: affine points + (32, N)
        base-256 scalar limbs -> window sums, leaves (32, W)."""
        return self._window_sums(aff_points, digits_from_limbs(limbs, c), c)

    # ------------------------------------------------------------------
    # eager (host-orchestrated, device-resident) pipeline
    #
    # The single-jit form above compiles every window group inline, so the
    # 2^20 program took ~300 s to build and the prover's five-MSM monolith
    # >20 min.  Splitting at group boundaries keeps all data device-resident
    # (the host only sequences calls) while XLA compiles ONE group program
    # and ONE reduction program per (c, shape) — identical windows groups
    # reuse the same executable, and the persistent compile cache makes
    # later processes start warm.
    # ------------------------------------------------------------------
    def _piece_jit(self, kind: str, c: int):
        key = (kind, c)
        if key not in self._jits:
            m_buckets = 1 << c
            if kind == "digits":
                self._jits[key] = jax.jit(lambda l: digits_from_limbs(l, c))
            elif kind == "group":
                self._jits[key] = jax.jit(
                    lambda p, d: self._group_buckets(p, d, m_buckets)
                )
            elif kind == "small":
                self._jits[key] = jax.jit(
                    lambda p, d: self._reduce_buckets(
                        self._small_buckets(p, d, m_buckets), c
                    )
                )
            elif kind == "reduce":
                self._jits[key] = jax.jit(lambda b: self._reduce_buckets(b, c))
            elif kind == "badd":
                self._jits[key] = jax.jit(self.bg.jadd)
            elif kind == "affine":
                self._jits[key] = jax.jit(self.bg._to_affine_impl)
        return self._jits[key]

    def _window_sums_chunked(self, aff_points, limbs, c: int):
        """Canonical fixed-shape pipeline: the point stream is processed in
        ``chunk_lanes``-wide slices (identity-padded to a multiple), each
        chunk runs the SAME compiled (digits, group) programs, and per-chunk
        bucket arrays are summed elementwise (buckets are additive across
        point subsets) before one reduction.  Identity pad lanes carry
        digit 0 and weight 0, so padding is exact."""
        ch = self.chunk_lanes
        n = jax.tree.leaves(aff_points)[0].shape[-1]
        pad = (-n) % ch
        if pad:
            aff_points = _tree_map_point(
                lambda c_: jnp.pad(c_, ((0, 0),) * (c_.ndim - 1) + ((0, pad),)),
                aff_points,
            )
            limbs = jnp.pad(limbs, ((0, 0), (0, pad)))
        w = num_windows(c)
        wg = self._group_size(ch, w)
        wpad = (-w) % wg
        dfn = self._piece_jit("digits", c)
        gfn = self._piece_jit("group", c)
        bfn = self._piece_jit("badd", c)
        buckets = None
        for c0 in range(0, n + pad, ch):
            pts = _tree_map_point(
                lambda c_: jax.lax.dynamic_slice_in_dim(c_, c0, ch, c_.ndim - 1),
                aff_points,
            )
            digits = dfn(jax.lax.dynamic_slice_in_dim(limbs, c0, ch, 1))
            if wpad:
                digits = jnp.concatenate(
                    [digits, jnp.zeros((wpad, ch), digits.dtype)]
                )
            parts = [
                gfn(pts, jax.lax.dynamic_slice_in_dim(digits, g0, wg, 0))
                for g0 in range(0, w + wpad, wg)
            ]
            b = _tree_map_point(lambda *xs: jnp.concatenate(xs, axis=1), *parts)
            buckets = b if buckets is None else bfn(buckets, b)
        sums = self._piece_jit("reduce", c)(buckets)
        if wpad:
            sums = _tree_map_point(lambda c_: c_[:, :w], sums)
        return sums

    def window_sums_eager(self, aff_points, limbs, c: int):
        """Affine point pytree (N lanes) + (32, N) base-256 scalar limbs ->
        window sums, leaves (32, W).  Device-resident throughout; host code
        only sequences per-group jitted calls (see note above)."""
        n = jax.tree.leaves(aff_points)[0].shape[-1]
        if self._canonical(n):
            return self._window_sums_chunked(aff_points, limbs, c)
        digits = self._piece_jit("digits", c)(limbs)
        w, n = digits.shape
        if n < self.tile_threshold:
            return self._piece_jit("small", c)(aff_points, digits)
        wg = self._group_size(n, w)
        # pad with zero-digit windows so every group has identical shape
        # (bucket 0 carries weight 0 in the reduction, so the padded
        # window sums are exact identities and are sliced off below)
        wpad = (-w) % wg
        if wpad:
            digits = jnp.concatenate(
                [digits, jnp.zeros((wpad, n), digits.dtype)]
            )
        gfn = self._piece_jit("group", c)
        parts = [
            gfn(aff_points, jax.lax.dynamic_slice_in_dim(digits, g0, wg, 0))
            for g0 in range(0, w + wpad, wg)
        ]
        buckets = _tree_map_point(
            lambda *xs: jnp.concatenate(xs, axis=1), *parts
        )
        sums = self._piece_jit("reduce", c)(buckets)
        if wpad:
            sums = _tree_map_point(lambda c_: c_[:, :w], sums)
        return sums

    def msm_device(self, dev_points, limbs):
        """Device entry: Jacobian point pytree + scalar limbs -> one host
        Jacobian point.  Affine-normalises, runs the eager pipeline, and
        combines the W window sums exactly on host."""
        n = jax.tree.leaves(dev_points)[0].shape[-1]
        c = self.window_bits_for(n)
        aff = self.bg.to_affine_tiled(dev_points)
        sums = self.window_sums_eager(aff, limbs, c)
        window_pts = self.bg.unpack(sums)
        return combine_window_sums(self.host_group, window_pts, c)

    def msm(self, host_points, host_scalars: Sequence[int]):
        """Σ sᵢ·Pᵢ.  host_points: reference-style Jacobian points; returns
        one host Jacobian point (projectively equal to the reference's
        serial result, snark.go:265-286)."""
        assert len(host_points) == len(host_scalars)
        n = len(host_points)
        if n == 0:
            return self.host_group.zero()
        pad = (-n) % self.pad_quantum(n)
        pts = list(host_points) + [self.host_group.zero()] * pad
        scs = [s % self.r for s in host_scalars] + [0] * pad
        dev_pts = self.bg.pack(pts)
        limbs = scalars_to_limbs(scs, self.r)
        return self.msm_device(dev_pts, limbs)
