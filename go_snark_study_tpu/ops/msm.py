"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference prover's serial Σ wᵢ·Pᵢ loops (snark.go:265-286,
groth16/groth16.go:243-275; SURVEY §2.9 row 2) with a bucket MSM shaped for
SIMD hardware:

  1. **signed (balanced) window digits** — scalars are split into
     W = ⌈254/c⌉ radix-2^c digits and re-coded on device into the balanced
     range [-(2^(c-1)-1), 2^(c-1)] with carry propagation, so only
     2^(c-1)+1 buckets exist per window (half the unsigned count: smaller
     compaction streams, half the bucket-reduction tail).  The digit sign
     is folded into the point by negating y during the gather (one cheap
     field negation per lane).
  2. **plan / apply split** — the data-dependent part of bucket
     accumulation (sort by |digit|, run-boundary detection, compaction
     indices) is computed once per scalar vector as a device-resident
     *plan*; applying a plan to a point set is pure gather + accumulate.
     The Groth16 prover's three same-witness MSMs (At, BACGamma G1 and G2)
     share one plan, paying the sort once.
  3. **bucket accumulation** — per sorted stream, tiles are accumulated
     serially (K steps of wide mixed Jacobian adds), per-tile run partials
     are compacted and merged with a log-step segmented scan, and each
     run's tail lands in its bucket slot.
  4. **incomplete formulas + degeneracy flag** — accumulation uses the
     doubling-branch-free add formulas (7M+4S mixed / 11M+5S full, ~40%
     cheaper than the branchless-complete forms).  Every piece also emits
     a "degenerate case hit" flag (masked to lanes whose result is
     actually consumed); the host checks the OR of the flags with the
     result fetch and transparently re-runs through the complete-formula
     engine if it ever fires — cryptographically never for honest inputs,
     and exactly correct for adversarial / duplicate-point inputs.
  5. **parallel bucket reduction** — Σ b·B_b via chunked double-running
     scans (never the classic O(2^c) serial scan), then W window sums are
     combined with c doublings per window on the host in exact arithmetic.

On a device mesh, points are sharded along the batch axis and each shard's
window sums are combined with ``all_gather`` + tree adds — see
:mod:`go_snark_study_tpu.parallel.sharded_msm`.

Compile-cost discipline (the axon TPU backend charges 30-300 s per program
shape): point streams are processed in fixed-size chunks — a 2^17-lane
"big" family (c=13) for large MSMs and a 2^14-lane "small" family (c=11)
for small ones — so ONE compiled (digits, plan, apply, reduce) family per
tier serves every circuit size in a process, and the persistent cache
serves later processes.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .curve_ops import jacobian_add
from .limbs import LIMBS

__all__ = [
    "MSMEngine",
    "scalars_to_limbs",
    "scalars_to_windows",
    "digits_from_limbs",
    "signed_digits_from_limbs",
    "num_windows",
    "bucket_count",
    "choose_window_bits",
    "combine_window_sums",
    "WINDOW_BITS",
    "NUM_WINDOWS",
]

# legacy 8-bit constants — still the fixed-base table radix (ops/fixed_base)
WINDOW_BITS = 8
NUM_WINDOWS = 32

SCALAR_BITS = 254  # BN128 r bit length

# canonical chunk families (TPU backends); overridable for experiments
_BIG_CHUNK = int(os.environ.get("GOSNARK_MSM_CHUNK", 1 << 17))
_SMALL_CHUNK = int(os.environ.get("GOSNARK_MSM_SMALL_CHUNK", 1 << 14))
_BIG_C = 13
_SMALL_C = 11
_TILE_LANES = int(os.environ.get("GOSNARK_MSM_TILE_LANES", 2048))


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


def bucket_count(c: int) -> tuple:
    """(m_buckets, d_chunk) for signed windows of width c: magnitudes span
    0..2^(c-1), padded up so the reduction's power-of-two chunk width
    divides the bucket count (padding slots hold identities with zero
    weight — exact)."""
    m0 = (1 << (c - 1)) + 1
    dc = 64 if m0 > 1024 else 16 if m0 > 64 else 8 if m0 > 8 else 4
    return -(-m0 // dc) * dc, dc


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
    """(32, N) base-256 limbs -> (W, N) int32 UNSIGNED radix-2^c digits,
    on device.

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


def signed_digits_from_limbs(limbs: jnp.ndarray, c: int) -> jnp.ndarray:
    """(32, N) base-256 limbs -> (W, N) int32 SIGNED radix-2^c digits in
    the balanced range [-(2^(c-1)-1), 2^(c-1)], via carry recoding of the
    unsigned digits.  Valid for scalars < 2^254 with c >= 5 (the top window
    absorbs the final carry without overflow — W·c >= 254+2 headroom bits
    for every c used here)."""
    # the top window must absorb the final carry without flipping again:
    # scalars < 2^254 and W·c >= 255 guarantee top_digit + carry <= 2^(c-1)
    assert num_windows(c) * c >= SCALAR_BITS + 1, (
        f"window width {c} leaves no carry headroom above {SCALAR_BITS} bits"
    )
    raw = digits_from_limbs(limbs, c)
    half = 1 << (c - 1)
    full = 1 << c
    rows = []
    carry = jnp.zeros_like(raw[0])
    for w in range(raw.shape[0]):
        d = raw[w] + carry
        flip = d > half
        rows.append(jnp.where(flip, d - full, d))
        carry = flip.astype(jnp.int32)
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


_FALSE = lambda: jnp.zeros((), jnp.bool_)


class MSMEngine:
    """MSM over one group (G1Batch or G2Batch) with its host group for the
    final exact combination step.

    ``tile_threshold``: point counts below this use the simple (sort + one
    log-scan) path; above it the tiled group pipeline.
    ``tile_steps``: explicit serial step count K for the tiled path (tests);
    default sizes tiles so each window contributes ``tile_lanes`` lanes.
    ``group_bytes``: memory budget for one window group's partial-sum
    emission, which bounds how many windows share a pass.
    ``complete``: use the (slower) branchless-complete group law instead of
    the incomplete+flag fast path — the automatic fallback target.
    """

    def __init__(
        self,
        batch_group,
        host_group,
        scalar_modulus: int,
        window_bits: int | None = None,
        tile_threshold: int = 8192,
        tile_steps: int | None = None,
        tile_lanes: int = _TILE_LANES,
        group_bytes: int = 3 << 30,
        chunk_lanes: int | None = None,
        small_chunk_lanes: int | None = None,
        small_chunk_max: int | None = None,
        complete: bool = False,
    ):
        self.bg = batch_group
        self.host_group = host_group
        self.r = scalar_modulus
        self.window_bits = window_bits
        self.tile_threshold = tile_threshold
        self.tile_steps = tile_steps
        self.tile_lanes = tile_lanes
        self.group_bytes = group_bytes
        self.complete = complete
        if chunk_lanes is None:
            # canonical chunking only on the TPU backend, where remote
            # compiles (30-300 s per shape) dominate — the CPU backend
            # (tests) keeps the per-shape path, whose compiles are cheap
            # and whose execution cost scales with the padded lanes.
            # small_chunk_lanes=0 explicitly disables the small family
            # (used for G2: its compile family is expensive and the small
            # tiers' G2 MSM is cheap enough through the big chunks).
            try:
                if jax.default_backend() in ("tpu", "axon"):
                    chunk_lanes = _BIG_CHUNK
                    if small_chunk_lanes is None and _SMALL_CHUNK:
                        small_chunk_lanes = _SMALL_CHUNK
                        small_chunk_max = 2 * _SMALL_CHUNK
            except Exception:
                pass
        if small_chunk_lanes == 0:
            small_chunk_lanes = None
        self.chunk_lanes = chunk_lanes
        self.small_chunk_lanes = small_chunk_lanes
        self.small_chunk_max = small_chunk_max or (
            2 * small_chunk_lanes if small_chunk_lanes else 0
        )
        self._jits = {}
        self._jit_lock = threading.Lock()
        self._fallback = None
        self.fallback_hits = 0  # degeneracy-flag re-runs (observability)

    # ------------------------------------------------------------------
    # parameter selection
    # ------------------------------------------------------------------
    def _chunk_for(self, n: int) -> Optional[int]:
        """The fixed chunk width n runs through (None = unchunked path):
        every chunked MSM pads to a multiple of the chunk and uses the
        family's window width, so ONE compiled (digits, plan, apply,
        reduce) family serves all sizes — the decisive property on the
        remote TPU backend, where each new shape costs a multi-minute
        compile but warm chunks run in ~0.5 s."""
        if self.chunk_lanes is None or n < self.tile_threshold:
            return None
        if self.small_chunk_lanes and n <= self.small_chunk_max:
            return self.small_chunk_lanes
        return self.chunk_lanes

    def _canonical(self, n: int) -> bool:
        return self._chunk_for(n) is not None

    def window_bits_for(self, n: int) -> int:
        if self.window_bits:
            return self.window_bits
        ch = self._chunk_for(n)
        if ch is not None:
            return _SMALL_C if ch == self.small_chunk_lanes else _BIG_C
        return choose_window_bits(n)

    def pad_quantum(self, n: int) -> int:
        ch = self._chunk_for(n)
        if ch is not None:
            return ch
        if n >= self.tile_threshold:
            return self.tile_steps if self.tile_steps else self.tile_lanes
        return 128

    def _coord_bytes(self) -> int:
        # bytes per point-lane: 3 coords x arity x 32 limbs x 4 B
        return 3 * self.bg._arity * LIMBS * 4

    def _group_size(self, n: int, w: int) -> int:
        by_mem = max(1, self.group_bytes // (n * self._coord_bytes()))
        return max(1, min(w, by_mem))

    def _tile_split(self, n: int):
        """(K serial steps, m lanes per window) for an n-lane stream."""
        if self.tile_steps:
            k = self.tile_steps
        else:
            k = max(2, n // self.tile_lanes)
        return k, n // k

    # ------------------------------------------------------------------
    # flagged group-law helpers (complete mode returns a constant flag)
    # ------------------------------------------------------------------
    def _jadd_f(self, a, b):
        if self.complete:
            return self.bg.jadd(a, b), _FALSE()
        pt, bad = self.bg.jadd_flagged(a, b)
        return pt, jnp.any(bad)

    # ------------------------------------------------------------------
    # device pipeline (pure traced functions of device arrays)
    # ------------------------------------------------------------------
    def _plan_impl(self, dig_g: jnp.ndarray, c: int) -> dict:
        """Sort/compaction plan for one window group of SIGNED digits
        (wg, N): everything data-dependent that does not involve points.
        Shared across point sets with the same scalars (and across G1/G2
        engines — the plan is group-independent)."""
        wg, n = dig_g.shape
        k, m = self._tile_split(n)
        m_buckets, _ = bucket_count(c)
        mag = jnp.abs(dig_g)
        order = jnp.argsort(mag, axis=1)
        smag = jnp.take_along_axis(mag, order, axis=1)
        sneg = jnp.take_along_axis(dig_g, order, axis=1) < 0
        # sorted position t*K + j  ->  scan step j, lane (w, t)
        ord3 = jnp.transpose(order.reshape(wg, m, k), (2, 0, 1))  # (K, Wg, m)
        mag3 = jnp.transpose(smag.reshape(wg, m, k), (2, 0, 1))
        neg3 = jnp.transpose(sneg.reshape(wg, m, k), (2, 0, 1))
        # a partial emitted at step j is FINAL iff step j+1 (same tile)
        # opens a new run, or j == K-1 (runs spanning tiles are merged by
        # the segmented scan — compaction preserves sorted order)
        nxt = jnp.concatenate(
            [mag3[1:], jnp.full((1, wg, m), -8, jnp.int32)], axis=0
        )
        closed = nxt != mag3  # (K, Wg, m)
        flat_closed = jnp.transpose(closed, (1, 2, 0)).reshape(wg, n)
        # run count per window <= (distinct digits - 1 changes) + m tile
        # heads <= m_buckets + m; never more than n
        p_cap = min(n, m_buckets + m)
        p_cap += (-p_cap) % 128
        pos = jnp.cumsum(flat_closed.astype(jnp.int32), axis=1) - 1
        idx_flat = jnp.where(flat_closed, pos, p_cap)
        idx3 = jnp.transpose(idx_flat.reshape(wg, m, k), (2, 0, 1))
        widx = jnp.broadcast_to(jnp.arange(wg)[None, :, None], idx3.shape)
        comp_dig = (
            jnp.full((wg, p_cap + 1), -3, jnp.int32)
            .at[widx, idx3]
            .set(mag3)[:, :p_cap]
        )
        return {
            "ord3": ord3,
            "mag3": mag3,
            "neg3": neg3,
            "idx3": idx3,
            "comp_dig": comp_dig,
        }

    def _apply_impl(self, points, plan: dict, c: int):
        """Apply a group plan to an affine point set: tiled accumulation
        (K steps of wide mixed adds with sign folding), compaction, and
        the segmented merge scan.  Returns (buckets, bad) with bucket
        leaves (32, Wg, m_buckets)."""
        ord3, mag3, neg3 = plan["ord3"], plan["mag3"], plan["neg3"]
        k, wg, m = ord3.shape
        m_buckets, _ = bucket_count(c)
        zero_pt = self.bg.zeros(wg * m)

        def tile_step(carry, xs):
            acc, prev_mag, bad_acc = carry
            idx, mag, neg = xs  # (Wg, m)
            fid = idx.reshape(-1)
            pt = _tree_map_point(lambda c_: c_[:, fid], points)
            pt = self.bg.neg_y_where(pt, neg.reshape(-1))
            mflat = mag.reshape(-1)
            boundary = mflat != prev_mag
            if self.complete:
                added = self.bg.madd(acc, pt)
                bad = _FALSE()
            else:
                added, badm = self.bg.madd_flagged(acc, pt)
                # only flags whose result is consumed count: run interiors
                # of live (nonzero-magnitude) buckets
                bad = jnp.any(badm & ~boundary & (mflat > 0))
            acc = _tree_map_point(
                lambda p_, a_: jnp.where(boundary[None], p_, a_), pt, added
            )
            return (acc, mflat, bad_acc | bad), acc

        (_, _, bad), accs = jax.lax.scan(
            tile_step,
            (zero_pt, jnp.full((wg * m,), -9, jnp.int32), _FALSE()),
            (ord3, mag3, neg3),
        )  # leaves (K, 32, Wg*m)

        idx3, comp_dig = plan["idx3"], plan["comp_dig"]
        p_cap = comp_dig.shape[1]
        widx = jnp.broadcast_to(jnp.arange(wg)[None, :, None], idx3.shape)
        comp_pts = _tree_map_point(
            lambda c_: jnp.zeros((c_.shape[1], wg, p_cap + 1), c_.dtype)
            .at[:, widx, idx3]
            .set(jnp.moveaxis(c_.reshape(k, c_.shape[1], wg, m), 0, 1))[
                :, :, :p_cap
            ],
            accs,
        )
        scanned, bad2 = self._seg_scan_runs(comp_pts, comp_dig)
        return self._runs_to_buckets(scanned, comp_dig, m_buckets), bad | bad2

    def _seg_scan_runs(self, pts, sdig):
        """Segmented Hillis-Steele inclusive scan over contiguous runs of
        equal ``sdig`` along the LAST axis (windows ride in leading batch
        axes; rolls never cross them).  Negative digits are sentinels.
        Returns (scanned, bad)."""
        P = sdig.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, sdig.shape, sdig.ndim - 1)
        steps = max(1, (P - 1).bit_length())
        live = sdig > 0  # bucket-0 / sentinel results are discarded

        def scan_step(s, carry):
            acc, bad_acc = carry
            d = jnp.int32(1) << s
            rolled_dig = jnp.roll(sdig, d, axis=-1)
            same = jnp.logical_and(lane >= d, rolled_dig == sdig)
            prev = _tree_map_point(lambda c_: jnp.roll(c_, d, axis=-1), acc)
            if self.complete:
                summed = self.bg.jadd(acc, prev)
                bad = _FALSE()
            else:
                summed, badm = self.bg.jadd_flagged(acc, prev)
                bad = jnp.any(badm & same & live)
            acc = _tree_map_point(
                lambda s_, a_: jnp.where(same[None], s_, a_), summed, acc
            )
            return (acc, bad_acc | bad)

        return jax.lax.fori_loop(0, steps, scan_step, (pts, _FALSE()))

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

    def _plan_small_impl(self, digits: jnp.ndarray) -> dict:
        """Small-N plan: one sort over the raw (signed) digit matrix."""
        mag = jnp.abs(digits)
        order = jnp.argsort(mag, axis=1)
        smag = jnp.take_along_axis(mag, order, axis=1)
        sneg = jnp.take_along_axis(digits, order, axis=1) < 0
        return {"order": order, "smag": smag, "sneg": sneg}

    def _apply_small_impl(self, points, plan: dict, c: int):
        """Small-N path: all windows in lanes, one gather + one segmented
        scan over the raw sorted stream (no tiling), reduction included.
        Returns (window_sums, bad)."""
        m_buckets, _ = bucket_count(c)
        order, smag = plan["order"], plan["smag"]
        spts = _tree_map_point(lambda c_: c_[:, order], points)  # (32, W, N)
        spts = self.bg.neg_y_where(spts, plan["sneg"])
        scanned, bad = self._seg_scan_runs(spts, smag)
        buckets = self._runs_to_buckets(scanned, smag, m_buckets)
        sums, bad2 = self._reduce_buckets(buckets, c)
        return sums, bad | bad2

    def _reduce_buckets(self, buckets, c: int):
        """Σ_b b·B_b per window, parallel: chunk b = q·D + j, run the
        double-running-sum over j only (D steps, W·Q-wide lanes — never the
        classic O(2^c) serial scan), then combine the Q chunk aggregates
        with a second (short, Q-step) double-running scan:
        Σ_b b·B_b = D·Σ_q q·S_q + Σ_q T_q.  buckets leaves (32, W, M);
        returns (sums, bad) with sum leaves (32, W)."""
        from .curve_ops import jacobian_double

        F = self.bg.F
        m_buckets, d_chunk = bucket_count(c)
        w = jax.tree.leaves(buckets)[0].shape[1]
        q_chunk = m_buckets // d_chunk
        flags = []

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
            running, tacc, bad = carry
            running, b1 = self._jadd_f(running, bj)
            tacc, b2 = self._jadd_f(tacc, running)
            return (running, tacc, bad | b1 | b2), None

        upper = _tree_map_point(lambda c_: c_[: d_chunk - 1], b4)  # j=D-1..1
        (running, t_sum, bad), _ = jax.lax.scan(
            body, (zero, zero, _FALSE()), upper
        )
        b0 = _tree_map_point(lambda c_: c_[d_chunk - 1], b4)  # j = 0
        s_sum, b_ = self._jadd_f(running, b0)  # S_q, leaves (32, W, Q)
        bad = bad | b_

        # combine chunks: Σ_q q·S_q (double-running over q) and Σ_q T_q
        # (plain running), both in ONE Q-step scan at W lanes
        def chunk_scan(c_):
            return jnp.flip(jnp.moveaxis(c_, -1, 0), 0)  # (Q, 32, W), q desc

        sq = _tree_map_point(chunk_scan, s_sum)
        tq = _tree_map_point(chunk_scan, t_sum)
        zero_w = _tree_map_point(lambda c_: jnp.zeros_like(c_[0]), sq)

        def body2(carry, xs):
            s_j, t_j = xs
            run_s, inner, tot_t, bad2 = carry
            run_s, b1 = self._jadd_f(run_s, s_j)
            inner, b2 = self._jadd_f(inner, run_s)
            tot_t, b3 = self._jadd_f(tot_t, t_j)
            return (run_s, inner, tot_t, bad2 | b1 | b2 | b3), None

        upper_s = _tree_map_point(lambda c_: c_[: q_chunk - 1], sq)  # q desc
        (_, inner, tot_t, bad2), _ = jax.lax.scan(
            body2,
            (zero_w, zero_w, zero_w, _FALSE()),
            (upper_s, _tree_map_point(lambda c_: c_[: q_chunk - 1], tq)),
        )
        # q = 0 contributes only to Σ T_q
        tot_t, b_ = self._jadd_f(
            tot_t, _tree_map_point(lambda c_: c_[q_chunk - 1], tq)
        )
        bad = bad | bad2 | b_
        for _ in range(d_chunk.bit_length() - 1):  # × D
            inner = jacobian_double(F, inner)
        out, b_ = self._jadd_f(inner, tot_t)
        return out, bad | b_

    def _window_sums(self, points, digits, c: int):
        """points: AFFINE batched point pytree (N lanes, z ∈ {0, 1});
        digits: (W, N) SIGNED radix-2^c digits.  Returns (window-sums, bad)
        with W lanes (window w in lane w).  Fully traced (used inside
        larger jitted programs, e.g. the sharded prover)."""
        w, n = digits.shape
        if n < self.tile_threshold:
            return self._apply_small_impl(
                points, self._plan_small_impl(digits), c
            )
        wg = self._group_size(n, w)
        parts = []
        bad = _FALSE()
        for g0 in range(0, w, wg):
            dig_g = digits[g0 : g0 + wg]
            if dig_g.shape[0] < wg:  # ragged tail group: pad zero windows
                dig_g = jnp.concatenate(
                    [dig_g, jnp.zeros((wg - dig_g.shape[0], n), digits.dtype)]
                )
            b_g, f_g = self._apply_impl(points, self._plan_impl(dig_g, c), c)
            parts.append(b_g)
            bad = bad | f_g
        buckets = _tree_map_point(
            lambda *xs: jnp.concatenate(xs, axis=1), *parts
        )
        sums, bad2 = self._reduce_buckets(buckets, c)
        wpad = len(parts) * wg - w
        if wpad:
            sums = _tree_map_point(lambda c_: c_[:, :w], sums)
        return sums, bad | bad2

    def window_sums_device(self, aff_points, limbs, c: int):
        """Traced device entry for fused programs: affine points + (32, N)
        base-256 scalar limbs -> (window sums, bad), sum leaves (32, W)."""
        return self._window_sums(aff_points, signed_digits_from_limbs(limbs, c), c)

    # ------------------------------------------------------------------
    # eager (host-orchestrated, device-resident) pipeline
    #
    # The single-jit form above compiles every window group inline, so the
    # 2^20 program took ~300 s to build and the prover's five-MSM monolith
    # >20 min.  Splitting at piece boundaries keeps all data device-resident
    # (the host only sequences calls) while XLA compiles ONE program per
    # (piece, c, shape) — identical window groups and chunks reuse the same
    # executable, and the persistent compile cache makes later processes
    # start warm.
    # ------------------------------------------------------------------
    def _piece_jit(self, kind: str, c: int):
        key = (kind, c)
        fn = self._jits.get(key)
        if fn is None:
            with self._jit_lock:  # check-then-insert must be atomic: the
                # prover launches compile families from threads, and two
                # threads building separate jits for one key would each pay
                # the multi-minute remote compile
                fn = self._jits.get(key)
                if fn is not None:
                    return fn
                if kind == "digits":
                    fn = jax.jit(lambda l: signed_digits_from_limbs(l, c))
                elif kind == "plan":
                    fn = jax.jit(lambda d: self._plan_impl(d, c))
                elif kind == "apply":
                    fn = jax.jit(lambda p, pl: self._apply_impl(p, pl, c))
                elif kind == "plan_small":
                    fn = jax.jit(self._plan_small_impl)
                elif kind == "small":
                    fn = jax.jit(lambda p, pl: self._apply_small_impl(p, pl, c))
                elif kind == "reduce":
                    fn = jax.jit(lambda b: self._reduce_buckets(b, c))
                elif kind == "badd":
                    fn = jax.jit(self._jadd_f)
                elif kind == "or":
                    fn = jax.jit(jnp.logical_or)
                elif kind == "affine":
                    fn = jax.jit(self.bg._to_affine_impl)
                else:
                    raise KeyError(kind)
                self._jits[key] = fn
        return fn

    # ------------------------------------------------------------------
    def make_plans(self, limbs, c: int, n_lanes: Optional[int] = None) -> dict:
        """Build the device-resident sort/compaction plans for a scalar
        vector (32, N).  The result can be passed to ``window_sums_eager``
        of ANY engine with the same chunk configuration (plans contain no
        point or group data), so the prover's three same-witness MSMs —
        including the G2 one — pay the sort once."""
        n = int(limbs.shape[1]) if n_lanes is None else n_lanes
        assert limbs.shape[1] == n, (limbs.shape, n)
        ch = self._chunk_for(n)
        w = num_windows(c)
        dfn = self._piece_jit("digits", c)
        if ch is None and n < self.tile_threshold:
            plan = self._piece_jit("plan_small", c)(dfn(limbs))
            return {"mode": "small", "c": c, "n": n, "plan": plan}
        pfn = self._piece_jit("plan", c)
        span = ch if ch is not None else n
        wg = self._group_size(span, w)
        wpad = (-w) % wg
        pad = (-n) % span
        if pad:
            limbs = jnp.pad(limbs, ((0, 0), (0, pad)))
        chunks = []
        for c0 in range(0, n + pad, span):
            digits = dfn(jax.lax.dynamic_slice_in_dim(limbs, c0, span, 1))
            if wpad:
                digits = jnp.concatenate(
                    [digits, jnp.zeros((wpad, span), digits.dtype)]
                )
            chunks.append(
                [
                    pfn(jax.lax.dynamic_slice_in_dim(digits, g0, wg, 0))
                    for g0 in range(0, w + wpad, wg)
                ]
            )
        return {
            "mode": "chunk" if ch is not None else "tiled",
            "c": c,
            "n": n,
            "span": span,
            "wg": wg,
            "wpad": wpad,
            "chunks": chunks,
        }

    def window_sums_eager(self, aff_points, limbs, c: int, plans=None):
        """Affine point pytree (N lanes) + (32, N) base-256 scalar limbs ->
        (window sums, bad flag), sum leaves (32, W).  Device-resident
        throughout; host code only sequences per-piece jitted calls.
        ``plans`` (from :meth:`make_plans`, possibly of another engine)
        skips the digit/sort work.

        GOSNARK_MSM_PROFILE=1 fences and times each phase into
        ``profiling.PROFILER`` (changes the async dispatch pattern — for
        analysis runs only)."""
        prof = os.environ.get("GOSNARK_MSM_PROFILE") == "1"
        if prof:
            import time as _t

            from ..profiling import PROFILER

            def fence(label, t0, val):
                leaf = jax.tree.leaves(val)[0]
                np.asarray(leaf.ravel()[:1])
                PROFILER.record(f"msm.{label}", _t.time() - t0)

            _now = _t.time
        else:
            fence = lambda label, t0, val: None
            _now = lambda: 0.0

        n = jax.tree.leaves(aff_points)[0].shape[-1]
        t0 = _now()
        if plans is None:
            plans = self.make_plans(limbs, c, n)
            if prof and plans["mode"] != "small":
                fence("plan", t0, plans["chunks"])
        else:
            assert plans["c"] == c and plans["n"] == n, (plans["c"], plans["n"], c, n)
        if plans["mode"] == "small":
            return self._piece_jit("small", c)(aff_points, plans["plan"])
        span, wg, wpad = plans["span"], plans["wg"], plans["wpad"]
        w = num_windows(c)
        pad = (-n) % span
        if pad:
            aff_points = _tree_map_point(
                lambda c_: jnp.pad(
                    c_, ((0, 0),) * (c_.ndim - 1) + ((0, pad),)
                ),
                aff_points,
            )
        afn = self._piece_jit("apply", c)
        bfn = self._piece_jit("badd", c)
        ofn = self._piece_jit("or", c)
        buckets = None
        bad = None
        t0 = _now()
        for ci, c0 in enumerate(range(0, n + pad, span)):
            pts = _tree_map_point(
                lambda c_: jax.lax.dynamic_slice_in_dim(
                    c_, c0, span, c_.ndim - 1
                ),
                aff_points,
            )
            parts = []
            for plan in plans["chunks"][ci]:
                b_g, f_g = afn(pts, plan)
                parts.append(b_g)
                bad = f_g if bad is None else ofn(bad, f_g)
            b = (
                parts[0]
                if len(parts) == 1
                else _tree_map_point(
                    lambda *xs: jnp.concatenate(xs, axis=1), *parts
                )
            )
            if buckets is None:
                buckets = b
            else:
                buckets, f_b = bfn(buckets, b)
                bad = ofn(bad, f_b)
        fence("apply+badd", t0, buckets)
        t0 = _now()
        sums, f_r = self._piece_jit("reduce", c)(buckets)
        bad = ofn(bad, f_r)
        fence("reduce", t0, sums)
        if wpad:
            sums = _tree_map_point(lambda c_: c_[:, :w], sums)
        return sums, bad

    # ------------------------------------------------------------------
    def fallback_engine(self) -> "MSMEngine":
        """The complete-formula twin used when a degeneracy flag fires."""
        if self.complete:
            return self
        if self._fallback is None:
            self._fallback = MSMEngine(
                self.bg,
                self.host_group,
                self.r,
                window_bits=self.window_bits,
                tile_threshold=self.tile_threshold,
                tile_steps=self.tile_steps,
                tile_lanes=self.tile_lanes,
                group_bytes=self.group_bytes,
                chunk_lanes=self.chunk_lanes,
                small_chunk_lanes=self.small_chunk_lanes,
                small_chunk_max=self.small_chunk_max,
                complete=True,
            )
        return self._fallback

    def window_sums_checked(self, aff_points, limbs, c: int, plans=None):
        """window_sums_eager + host flag check + automatic complete-formula
        re-run.  Returns window sums only (exactly correct)."""
        sums, bad = self.window_sums_eager(aff_points, limbs, c, plans)
        if not self.complete and bool(np.asarray(bad)):
            self.fallback_hits += 1
            sums, _ = self.fallback_engine().window_sums_eager(
                aff_points, limbs, c, plans
            )
        return sums

    def msm_device(self, dev_points, limbs):
        """Device entry: Jacobian point pytree + scalar limbs -> one host
        Jacobian point.  Affine-normalises, runs the eager pipeline (with
        degeneracy fallback), and combines the W window sums exactly on
        host."""
        n = jax.tree.leaves(dev_points)[0].shape[-1]
        c = self.window_bits_for(n)
        aff = self.bg.to_affine_tiled(dev_points)
        sums = self.window_sums_checked(aff, limbs, c)
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
