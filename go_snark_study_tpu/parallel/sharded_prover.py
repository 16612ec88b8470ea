"""Production-shaped multi-chip Groth16 prover.

Round-4's ``prove_sharded`` re-packed the whole host proving key into device
arrays per MSM call per proof, and ran each shard's pipeline as ONE traced
program (the monolithic form whose multi-minute compile the single-chip
eager pipeline exists to avoid).  This module is the production shape:

  * **ShardedDevicePk** — the proving key is sharded ONCE (at setup/load):
    every point array is laid out ``(D, 32, local)`` with the device axis
    sharded over the (possibly 2-D ``(host, data)``) mesh and identity
    padding per shard, then lives on the devices until the key is dropped.
    Witness limbs take the same layout per proof (the only host->device
    traffic, plus the tiny window sums back).
  * **piecewise shard_map programs** — digits/plan/apply/bucket-add/reduce
    are separate compiled programs whose LOCAL shapes are the canonical
    chunk family (2^17-lane chunks on the TPU backend), so one family
    serves every circuit size per process, exactly like single-chip; the
    host only sequences piece calls over local chunks.
  * **plan sharing** — the witness scalars' sort/compaction plans are
    computed once per proof and reused by the At / BACGamma-G1 /
    BACGamma-G2 MSMs (plans carry no point data; SURVEY §2.9 row 2).
  * **hierarchical combine** — each shard emits W window-sum points
    (3 x 32 x W x 4 B ~ 10 KB); they are fetched and tree-added on the
    host: collectives are not needed for point addition, and per-host
    traffic over DCN stays at one window-sum payload — the layout
    BASELINE.json's 2^20-2^22 multi-host tiers assume.  (The NTT
    ``all_to_all`` path lives in :mod:`.sharded_ntt` and is exercised by
    :mod:`.prover_step`.)

Degenerate-case flags (incomplete group law, ops/msm.py) are ORed across
shards and trigger the complete-formula twin exactly like single-chip.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bn128 import constants as C
from ..ops.limbs import LIMBS
from ..ops.msm import combine_window_sums, num_windows, scalars_to_limbs
from ..models.groth16 import Pk, Proof

__all__ = ["ShardedDevicePk", "ShardedFastProver", "dry_shape_check"]


def dry_shape_check(n_log2: int = 22, mesh_shape=(2, 8)) -> dict:
    """Abstract-mesh validation of the sharded MSM piece chain at a tier
    beyond the available hardware (BASELINE's 2^22 multi-host tier on a
    (host, data) = (2, 8) grid by default): every piece — digits, plan,
    apply, cross-chunk bucket add, reduce — is shape-checked under
    ``shard_map`` on a ``jax.sharding.AbstractMesh`` with the CANONICAL
    TPU chunk configuration.  ``jax.eval_shape`` traces the full
    partitioned programs without allocating a byte, so this runs anywhere
    and proves the 2^22 layout (shard sizes, chunk counts, bucket/compact
    stream widths) is consistent end to end."""
    from jax.sharding import AbstractMesh

    from ..bn128 import default_bn128
    from ..ops.curve_ops import G1Batch
    from ..ops.fields import fq_kernels
    from ..ops.msm import (
        MSMEngine,
        bucket_count,
        num_windows,
        signed_digits_from_limbs,
    )

    bn = default_bn128()
    eng = MSMEngine(
        G1Batch(fq_kernels()),
        bn.g1,
        C.R,
        chunk_lanes=1 << 17,
        small_chunk_lanes=1 << 14,
    )
    d = int(np.prod(mesh_shape))
    mesh = AbstractMesh(tuple(mesh_shape), ("host", "data"))
    ax = ("host", "data")
    m = (1 << n_log2) + 3  # signals of the mul-chain tier instance
    ch = eng.chunk_lanes
    per = -(-m // d)
    local = -(-per // ch) * ch
    c = eng.window_bits_for(local)
    w = num_windows(c)
    wg = eng._group_size(ch, w)
    m_buckets, _ = bucket_count(c)
    SDS = jax.ShapeDtypeStruct
    i32 = jnp.int32

    def wrap(fn, *args):
        def local_f(*largs):
            sq = jax.tree.map(lambda x: x[0], largs)
            out = fn(*sq)
            return jax.tree.map(lambda x: x[None], out)

        sm = shard_map(
            local_f,
            mesh=mesh,
            in_specs=jax.tree.map(lambda _: P(ax), tuple(args)),
            out_specs=jax.tree.map(
                lambda _: P(ax), jax.eval_shape(local_f, *args)
            ),
            check_vma=False,
        )
        return jax.eval_shape(sm, *args)

    limb_chunk = SDS((d, LIMBS, ch), i32)
    digits = wrap(lambda l: signed_digits_from_limbs(l, c), limb_chunk)
    assert digits.shape == (d, w, ch), digits.shape
    dig_g = SDS((d, wg, ch), i32)
    plan = wrap(lambda dg: eng._plan_impl(dg, c), dig_g)
    pts = tuple(SDS((d, LIMBS, ch), i32) for _ in range(3))
    buckets, bad = wrap(lambda p, pl: eng._apply_impl(p, pl, c), pts, plan)
    assert buckets[0].shape == (d, LIMBS, wg, m_buckets), buckets[0].shape
    buckets2, _ = wrap(eng._jadd_f, buckets, buckets)
    sums, _ = wrap(lambda b: eng._reduce_buckets(b, c), buckets2)
    assert sums[0].shape == (d, LIMBS, wg), sums[0].shape
    return {
        "tier": f"2^{n_log2}",
        "mesh": dict(zip(("host", "data"), mesh_shape)),
        "devices": d,
        "local_lanes": local,
        "chunks_per_shard": local // ch,
        "window_bits": c,
        "windows": w,
        "buckets_per_window": m_buckets,
        "plan_p_cap": int(plan["comp_dig"].shape[-1]),
        "ok": True,
    }


@dataclass
class ShardedDevicePk:
    """Device-resident sharded proving key: leaves (D, 32[, comp], local)."""

    n: int
    m: int
    lo: int
    local_m: int  # per-shard lanes of at/b1/b2
    local_mp: int  # per-shard lanes of cdelta
    local_n: int  # per-shard lanes of ptau
    at: object = None
    b1: object = None
    b2: object = None
    cdelta: object = None
    ptau: object = None


class ShardedFastProver:
    """Multi-chip prover bound to one mesh; engines/jits shared with the
    ``FastGroth16`` instance it wraps (same chunk configuration)."""

    def __init__(self, fast, mesh: Mesh):
        self.fast = fast
        self.mesh = mesh
        self.axes = tuple(mesh.axis_names)
        self.ax = self.axes if len(self.axes) > 1 else self.axes[0]
        self.ndev = int(mesh.devices.size)
        self._jits: Dict = {}

    # ------------------------------------------------------------------
    # layout
    # ------------------------------------------------------------------
    def _local_lanes(self, n: int, eng) -> int:
        per = -(-n // self.ndev)
        q = eng.pad_quantum(per)
        return -(-per // q) * q

    def _sharding(self, rank: int):
        return NamedSharding(self.mesh, P(self.ax, *([None] * (rank - 1))))

    def _put(self, x: np.ndarray):
        return jax.device_put(jnp.asarray(x), self._sharding(x.ndim))

    def _shard_rows(self, rows: np.ndarray, local: int) -> np.ndarray:
        """(32, n) host limbs -> (D, 32, local), zero-padded per shard."""
        d = self.ndev
        out = np.zeros((d, rows.shape[0], local), rows.dtype)
        n = rows.shape[1]
        for i in range(d):
            lo = min(i * local, n)
            hi = min(lo + local, n)
            if hi > lo:
                out[i, :, : hi - lo] = rows[:, lo:hi]
        return out

    def _shard_points(self, bg, host_pts, local: int):
        """Host Jacobian points -> sharded affine leaves (D, 32, local)."""
        total = self.ndev * local
        zero = None
        pts = list(host_pts)
        if len(pts) < total:
            # identity padding (absorbed by the branchless law)
            if bg._arity == 1:
                zero = (0, 0, 0)
            else:
                zero = ((0, 0), (0, 0), (0, 0))
            pts = pts + [zero] * (total - len(pts))
        dev = bg.to_affine_tiled(bg.pack(pts))
        leaves = [np.asarray(leaf) for leaf in jax.tree.leaves(dev)]
        reshaped = [
            self._put(
                np.moveaxis(leaf.reshape(LIMBS, self.ndev, local), 1, 0)
            )
            for leaf in leaves
        ]
        return jax.tree.unflatten(jax.tree.structure(dev), reshaped)

    def shard_pk(self, pk: Pk, n: int, lo: int) -> ShardedDevicePk:
        """Build (once; cached on the Pk) the sharded device key from a
        host-materialised Pk.  This replaces the per-proof re-packing of
        the round-4 path."""
        cached = getattr(pk, "_sharded", None)
        if cached is not None and cached[0] is self.mesh:
            return cached[1]
        g1b, g2b = self.fast.g1b, self.fast.g2b
        eng = self.fast.msm_g1
        m = len(pk.g1.at)
        local_m = self._local_lanes(m, eng)
        local_mp = self._local_lanes(m - lo, eng)
        local_n = self._local_lanes(n, eng)
        spk = ShardedDevicePk(
            n=n,
            m=m,
            lo=lo,
            local_m=local_m,
            local_mp=local_mp,
            local_n=local_n,
            at=self._shard_points(g1b, pk.g1.at, local_m),
            b1=self._shard_points(g1b, pk.g1.bacgamma, local_m),
            b2=self._shard_points(g2b, pk.g2.bacgamma, local_m),
            cdelta=self._shard_points(g1b, pk.bacdelta[lo:], local_mp),
            ptau=self._shard_points(g1b, pk.powers_tau_delta[:n], local_n),
        )
        pk._sharded = (self.mesh, spk)
        return spk

    def shard_scalars(self, scalars, local: int):
        """Field scalars -> sharded base-256 limb layout (D, 32, local)."""
        rows = np.zeros((LIMBS, len(scalars)), np.int32)
        if scalars:
            rows = np.asarray(scalars_to_limbs(scalars, C.R))
        return self._put(self._shard_rows(rows, local))

    # ------------------------------------------------------------------
    # shard_map pieces (local fns ARE the single-chip piece impls)
    # ------------------------------------------------------------------
    def _piece(self, eng, kind: str, c: int):
        key = (kind, c, eng.bg._arity, eng.complete)
        fn = self._jits.get(key)
        if fn is not None:
            return fn

        from ..ops.msm import signed_digits_from_limbs

        if kind == "digits":
            local_fn = lambda l: signed_digits_from_limbs(l, c)
        elif kind == "plan":
            local_fn = lambda d: eng._plan_impl(d, c)
        elif kind == "apply":
            local_fn = lambda p, pl: eng._apply_impl(p, pl, c)
        elif kind == "badd":
            local_fn = eng._jadd_f
        elif kind == "reduce":
            local_fn = lambda b: eng._reduce_buckets(b, c)
        else:
            raise KeyError(kind)

        def local(*largs):
            sq = jax.tree.map(lambda x: x[0], largs)
            out = local_fn(*sq)
            return jax.tree.map(lambda x: x[None], out)

        state = {}

        def wrapped(*args):
            # the shard_map specs need the argument/output tree structure:
            # built once from the first call, then the cached jit serves
            # every later call (piece shapes are chunk-canonical)
            fn = state.get("fn")
            if fn is None:
                in_specs = jax.tree.map(lambda _: P(self.ax), tuple(args))
                out_shape = jax.eval_shape(local, *args)
                out_specs = jax.tree.map(lambda _: P(self.ax), out_shape)
                fn = state["fn"] = jax.jit(
                    shard_map(
                        local,
                        mesh=self.mesh,
                        in_specs=in_specs,
                        out_specs=out_specs,
                        check_vma=False,
                    )
                )
            return fn(*args)

        self._jits[key] = wrapped
        return wrapped

    # ------------------------------------------------------------------
    def make_plans(self, limbs_sharded, c: int, eng) -> dict:
        """Per-chunk sharded plans from (D, 32, local) scalar limbs."""
        local = int(jax.tree.leaves(limbs_sharded)[0].shape[-1])
        ch = eng._chunk_for(local) or local
        w = num_windows(c)
        wg = eng._group_size(ch, w)
        wpad = (-w) % wg
        dfn = self._piece(eng, "digits", c)
        pfn = self._piece(eng, "plan", c)
        chunks = []
        for c0 in range(0, local, ch):
            digits = dfn(
                jax.lax.dynamic_slice_in_dim(limbs_sharded, c0, ch, 2)
            )
            if wpad:
                digits = jnp.concatenate(
                    [digits, jnp.zeros(digits.shape[:1] + (wpad, ch), digits.dtype)],
                    axis=1,
                )
            chunks.append(
                [
                    pfn(jax.lax.dynamic_slice_in_dim(digits, g0, wg, 1))
                    for g0 in range(0, w + wpad, wg)
                ]
            )
        return {"c": c, "local": local, "ch": ch, "wg": wg, "wpad": wpad, "chunks": chunks}

    def window_sums(self, eng, points, plans: dict):
        """Sharded chunked pipeline -> (host window-sum points, bad flags).

        The per-shard sums (D, 32, W) are fetched (~10 KB/shard) and
        tree-added on the host — point addition is not a hardware
        collective, and this is exactly the one-payload-per-host combine
        the multi-host tiers assume."""
        c, ch, wpad = plans["c"], plans["ch"], plans["wpad"]
        w = num_windows(c)
        afn = self._piece(eng, "apply", c)
        bfn = self._piece(eng, "badd", c)
        buckets = None
        flags = []
        for ci, c0 in enumerate(range(0, plans["local"], ch)):
            pts = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, c0, ch, x.ndim - 1),
                points,
            )
            parts = []
            for plan in plans["chunks"][ci]:
                b_g, f_g = afn(pts, plan)
                parts.append(b_g)
                flags.append(f_g)
            b = (
                parts[0]
                if len(parts) == 1
                else jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=2), *parts)
            )
            if buckets is None:
                buckets = b
            else:
                buckets, f_b = bfn(buckets, b)
                flags.append(f_b)
        sums, f_r = self._piece(eng, "reduce", c)(buckets)
        flags.append(f_r)
        # host combine: per-shard W window sums -> one set of W points
        arr = [np.asarray(leaf) for leaf in jax.tree.leaves(sums)]
        host = eng.host_group
        combined = None
        for d in range(self.ndev):
            shard_leaves = [jnp.asarray(a[d][..., :w]) for a in arr]
            shard = jax.tree.unflatten(jax.tree.structure(sums), shard_leaves)
            pts = eng.bg.unpack(shard)
            if combined is None:
                combined = pts
            else:
                combined = [host.add(x, y) for x, y in zip(combined, pts)]
        bad = any(bool(np.asarray(f).any()) for f in flags)
        return combined, bad

    def _msm(self, eng, points, plans: dict):
        pts, bad = self.window_sums(eng, points, plans)
        if bad and not eng.complete:
            feng = eng.fallback_engine()
            pts, _ = self.window_sums(feng, points, plans)
        return combine_window_sums(eng.host_group, pts, plans["c"])

    # ------------------------------------------------------------------
    def prove(self, r1cs, pk: Pk, rng=None) -> Proof:
        """Same proof assembly as FastGroth16.prove (groth16.go:225-279);
        the five MSMs run data-parallel over the mesh from the sharded
        device key."""
        from ..models.groth16_fast import _next_pow2

        fast = self.fast
        ctx = fast.ctx
        r = C.R
        g1, g2 = ctx.bn.g1, ctx.bn.g2
        w = [x % r for x in r1cs.witness]
        n = _next_pow2(r1cs.n_constraints)
        lo = r1cs.n_public + 1
        spk = self.shard_pk(pk, n, lo)
        eng1, eng2 = fast.msm_g1, fast.msm_g2

        r_rand = ctx.rand_fr(rng)
        s_rand = ctx.rand_fr(rng)

        # window widths follow the LOCAL lane count — the chunk family the
        # shard-local pipeline actually runs (make_plans chunks per shard)
        c_m = eng1.window_bits_for(spk.local_m)
        c_p = eng1.window_bits_for(spk.local_mp)
        c_h = eng1.window_bits_for(spk.local_n)

        w_limbs = self.shard_scalars(w, spk.local_m)
        wp_limbs = self.shard_scalars(w[lo:], spk.local_mp)
        plans_w = self.make_plans(w_limbs, c_m, eng1)
        plans_p = self.make_plans(wp_limbs, c_p, eng1)

        pi_a = self._msm(eng1, spk.at, plans_w)
        pi_b_g1 = self._msm(eng1, spk.b1, plans_w)
        pi_b = self._msm(eng2, spk.b2, plans_w)
        pi_c = self._msm(eng1, spk.cdelta, plans_p)

        # H(x) via the coset NTT pipeline (single-stream program; the
        # all_to_all four-step NTT is exercised by parallel.prover_step),
        # then H digits re-laid-out into the shard layout for the ptau MSM
        a_e, b_e, c_e = r1cs.row_evals()
        pad = n - len(a_e)
        dev = lambda v: fast.Kr.pack(list(v) + [0] * pad)
        h_digits = fast._get_h_jit(n, n)(
            dev(a_e), dev(b_e), dev(c_e), *fast._ntt_args(n)
        )
        h_sharded = self._put(
            self._shard_rows(np.asarray(h_digits), spk.local_n)
        )
        plans_h = self.make_plans(h_sharded, c_h, eng1)
        pi_h = self._msm(eng1, spk.ptau, plans_h)

        pi_a = g1.add(pi_a, pk.g1.alpha)
        pi_a = g1.add(pi_a, g1.mul_scalar(pk.g1.delta, r_rand))
        pi_b_g1 = g1.add(pi_b_g1, pk.g1.beta)
        pi_b = g2.add(pi_b, pk.g2.beta)
        pi_b_g1 = g1.add(pi_b_g1, g1.mul_scalar(pk.g1.delta, s_rand))
        pi_b = g2.add(pi_b, g2.mul_scalar(pk.g2.delta, s_rand))

        pi_c = g1.add(pi_c, pi_h)
        pi_c = g1.add(pi_c, g1.mul_scalar(pi_a, s_rand))
        pi_c = g1.add(pi_c, g1.mul_scalar(pi_b_g1, r_rand))
        neg_rs = (-(r_rand * s_rand)) % r
        pi_c = g1.add(pi_c, g1.mul_scalar(pk.g1.delta, neg_rs))
        return Proof(pi_a=pi_a, pi_b=pi_b, pi_c=pi_c)
