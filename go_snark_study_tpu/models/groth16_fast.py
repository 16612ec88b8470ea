"""Groth16 fast path: evaluation-form QAP over a roots-of-unity domain,
fully device-resident.

This is the TPU-native prover for LARGE circuits (the reference's monomial
Lagrange path is O(n^2)-O(n^3) and numerically capped at ~20 constraints,
SURVEY §6).  Artifact SHAPES are identical to :mod:`.groth16` (same Pk/Vk/
Proof dataclasses, same verifier) — only the interpolation domain differs:

  * constraints live at the 2^k-th roots of unity, Z(x) = x^n - 1;
  * setup evaluates the QAP polynomials at tau via barycentric Lagrange
    values L_j(tau) (O(n) with one batched inversion), commits with the
    TPU fixed-base engine (:mod:`..ops.fixed_base`), and keeps the proving
    key ON DEVICE, affine-normalised (one tree batch-inversion), so every
    proof MSM runs mixed adds with zero host<->device traffic;
  * the prover is ONE fused jitted program: the four witness MSM window-sum
    pipelines, the H(x) coset-trick NTT pipeline (iNTT -> coset -> NTT ->
    pointwise a·b-c -> scale -> iNTT), the Montgomery-domain exit that turns
    H's coefficients into MSM digits, and the H MSM — the only host work per
    proof is packing the witness limbs and combining 5·W tiny window sums
    (reference loops replaced: groth16.go:243-275);
  * proofs verify under the UNCHANGED :func:`..models.groth16.verify_proof`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..bn128 import constants as C
from ..ops.curve_ops import G1Batch, G2Batch
from ..ops.fields import fq_kernels, fr_kernels
from ..ops.fixed_base import FixedBaseEngine
from ..ops.msm import MSMEngine, combine_window_sums, scalars_to_limbs
from ..ops.ntt import NTTEngine
from ..synthetic import SparseR1CS
from .context import ProtocolContext, default_context
from .groth16 import Pk, Proof, Setup, Toxic, Vk

__all__ = ["FastGroth16", "DevicePk"]

_COSET_G = 5  # multiplicative generator of Fr*, not in any 2^k subgroup


def _next_pow2(n: int) -> int:
    return 1 << max(1, (n - 1).bit_length())


@dataclass
class DevicePk:
    """Device-resident proving key: affine point pytrees, lane-padded.

    Identity padding lanes are (0, 0, 0) — absorbed by the branchless group
    law, so padded MSMs are exact."""

    n: int  # evaluation domain size (power of two)
    m: int  # signal count
    lo: int  # first private index (n_public + 1)
    m_pad: int
    mp_pad: int  # padded private count
    n_pad: int
    at: object = None  # G1 affine, m_pad lanes
    b1: object = None  # G1 affine, m_pad lanes
    b2: object = None  # G2 affine, m_pad lanes
    cdelta: object = None  # G1 affine, mp_pad lanes (private signals only)
    ptau: object = None  # G1 affine, n_pad lanes (tau^i Z(tau)/delta)


class FastGroth16:
    """Holds the (lazily built) TPU engines; one instance is reusable across
    circuits and proof calls."""

    def __init__(self, ctx: Optional[ProtocolContext] = None):
        self.ctx = ctx or default_context()
        self.Kq, self.Kr = fq_kernels(), fr_kernels()
        self.g1b, self.g2b = G1Batch(self.Kq), G2Batch(self.Kq)
        self.ntt = NTTEngine(self.Kr)
        self._fb_g1: Optional[FixedBaseEngine] = None
        self._fb_g2: Optional[FixedBaseEngine] = None
        self._msm_g1: Optional[MSMEngine] = None
        self._msm_g2: Optional[MSMEngine] = None
        self._prove_jits = {}

    # -- engines (built on first use) ---------------------------------
    @property
    def fb_g1(self) -> FixedBaseEngine:
        if self._fb_g1 is None:
            bn = self.ctx.bn
            self._fb_g1 = FixedBaseEngine(self.g1b, bn.g1, bn.g1.g, C.R)
        return self._fb_g1

    @property
    def fb_g2(self) -> FixedBaseEngine:
        if self._fb_g2 is None:
            bn = self.ctx.bn
            self._fb_g2 = FixedBaseEngine(self.g2b, bn.g2, bn.g2.g, C.R)
        return self._fb_g2

    @property
    def msm_g1(self) -> MSMEngine:
        if self._msm_g1 is None:
            self._msm_g1 = MSMEngine(self.g1b, self.ctx.bn.g1, C.R)
        return self._msm_g1

    @property
    def msm_g2(self) -> MSMEngine:
        if self._msm_g2 is None:
            # no small-chunk family for G2: one more compile family is not
            # worth it for the (cheap) small-tier b2 MSM, which pads into
            # the big chunks instead
            self._msm_g2 = MSMEngine(
                self.g2b, self.ctx.bn.g2, C.R, small_chunk_lanes=0
            )
        return self._msm_g2

    # ------------------------------------------------------------------
    def warmup(
        self,
        families=("big",),
        domains=(),
        g2: bool = True,
        fixed_base: bool = False,
    ):
        """Precompile the canonical program families so later setup/prove
        calls only dispatch (the remote TPU backend charges 30-300 s per
        program shape; a cold process otherwise pays that inside its first
        proof).  ``families``: "big" (2^17-lane chunks, c=13 — all MSMs at
        2^16+ tiers) and/or "small" (2^14-lane chunks, c=11).  ``domains``:
        iterable of evaluation-domain sizes whose per-domain H-pipeline
        programs should also compile.  Compiles are launched from threads —
        XLA releases the GIL and the backend compiles families
        concurrently.  Idempotent and cheap when everything is cached."""
        import logging
        import time as _time

        import numpy as np
        from concurrent.futures import ThreadPoolExecutor

        _logger = logging.getLogger(__name__)
        eng = self.msm_g1
        jobs = []

        def timed(label, fn):
            def run():
                t0 = _time.time()
                fn()
                _logger.info("warmup %s: %.1fs", label, _time.time() - t0)

            return run

        def msm_family(msm, bgroup, lanes, c):
            tag = f"msm[arity{msm.bg._arity},c{c}]"

            def run():
                # piece by piece (apply, then cross-chunk badd, then
                # reduce) with per-piece timing — identity points + zero
                # scalars keep execution trivial; compiles dominate
                aff = bgroup.zeros(lanes)
                limbs = jnp.zeros((32, lanes), jnp.int32)
                plans = eng.make_plans(limbs, c, lanes)
                plan0 = plans["chunks"][0][0]
                t0 = _time.time()
                b, bad = msm._piece_jit("apply", c)(aff, plan0)
                np.asarray(jax.tree.leaves(b)[0].ravel()[:1])
                _logger.info("warmup %s apply: %.1fs", tag, _time.time() - t0)
                t0 = _time.time()
                b2, _f = msm._piece_jit("badd", c)(b, b)
                np.asarray(jax.tree.leaves(b2)[0].ravel()[:1])
                _logger.info("warmup %s badd: %.1fs", tag, _time.time() - t0)
                t0 = _time.time()
                sums, _f = msm._piece_jit("reduce", c)(b2)
                msm._piece_jit("or", c)(bad, bad)
                np.asarray(jax.tree.leaves(sums)[0].ravel()[:1])
                _logger.info("warmup %s reduce: %.1fs", tag, _time.time() - t0)

            return timed(tag, run)

        fams = []
        if "big" in families and eng.chunk_lanes:
            fams.append((eng.chunk_lanes, eng.window_bits_for(eng.chunk_lanes)))
        if "small" in families and eng.small_chunk_lanes:
            fams.append(
                (
                    eng.small_chunk_lanes,
                    eng.window_bits_for(eng.small_chunk_lanes),
                )
            )
        if not fams and eng._chunk_for(1 << 16) is None:
            # CPU/test backend: nothing canonical to precompile
            fams = []
        for lanes, c in fams:
            # plan/digit pieces compile on the main thread first (shared by
            # both groups); then G1 and G2 applies go wide
            dummy = jnp.zeros((32, lanes), jnp.int32)
            eng._piece_jit("plan", c)(eng._piece_jit("digits", c)(dummy))
            jobs.append(msm_family(self.msm_g1, self.g1b, lanes, c))
            # G2 only compiles families it actually routes to (no small
            # family there — see msm_g2)
            if g2 and self.msm_g2._chunk_for(lanes) == lanes:
                jobs.append(msm_family(self.msm_g2, self.g2b, lanes, c))

        def h_family(nd):
            def run():
                n_pad = self._pad_for(nd)
                coeff = jnp.zeros((32, nd), jnp.int32)
                out = self._get_h_jit(nd, n_pad)(
                    coeff, coeff, coeff, *self._ntt_args(nd)
                )
                np.asarray(out[:1, :1])

            return timed(f"h[2^{nd.bit_length()-1}]", run)

        for nd in domains:
            jobs.append(h_family(int(nd)))

        if fixed_base:
            jobs.append(timed("fb_g1", lambda: self.fb_g1.batch_mul([1])))
            if g2:
                jobs.append(timed("fb_g2", lambda: self.fb_g2.batch_mul([1])))
            # the affine-normalise tile program (setup + MSM point prep)
            jobs.append(
                timed(
                    "affine_g1",
                    lambda: np.asarray(
                        jax.tree.leaves(
                            self.g1b.to_affine_tiled(self.g1b.zeros(8192))
                        )[0][:1, :1]
                    ),
                )
            )

        if not jobs:
            return
        # modest concurrency: the remote compile service overlaps a few
        # requests well, but a dozen at once risks wedging the tunnel
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [pool.submit(j) for j in jobs]
            for f in futs:
                f.result()

    # ------------------------------------------------------------------
    def _lagrange_at_tau(self, n: int, tau: int):
        """L_j(tau) = w^j (tau^n - 1) / (n (tau - w^j)) for j = 0..n-1,
        via one batched inversion (Montgomery's trick)."""
        r = C.R
        w = self.ntt.root_of_unity(n)
        pw = [1] * n
        for j in range(1, n):
            pw[j] = pw[j - 1] * w % r
        denoms = [(tau - pw[j]) % r for j in range(n)]
        # batch invert
        prefix = [1] * (n + 1)
        for j in range(n):
            prefix[j + 1] = prefix[j] * denoms[j] % r
        inv_all = pow(prefix[n], -1, r)
        invs = [0] * n
        for j in range(n - 1, -1, -1):
            invs[j] = inv_all * prefix[j] % r
            inv_all = inv_all * denoms[j] % r
        zt = (pow(tau, n, r) - 1) % r
        ninv = pow(n, -1, r)
        scale = zt * ninv % r
        return [pw[j] * scale % r * invs[j] % r for j in range(n)]

    # ------------------------------------------------------------------
    def _pad_for(self, n: int) -> int:
        return n + ((-n) % self.msm_g1.pad_quantum(n))

    def _device_pk_from_scalars(
        self, n: int, m: int, lo: int, ats, bts, cdelta_priv, ladder
    ) -> DevicePk:
        """Commit scalar vectors with the fixed-base engines, keeping every
        result on device, then affine-normalise once."""
        from ..ops.msm import scalars_to_windows

        m_pad = self._pad_for(m)
        mp_pad = self._pad_for(m - lo)
        n_pad = self._pad_for(n)

        def commit(fb, bg, scalars, lanes):
            scs = list(scalars) + [0] * (lanes - len(scalars))
            windows = scalars_to_windows(scs, C.R)
            jac = fb.batch_mul_device(windows)
            return bg.to_affine_tiled(jac)

        return DevicePk(
            n=n,
            m=m,
            lo=lo,
            m_pad=m_pad,
            mp_pad=mp_pad,
            n_pad=n_pad,
            at=commit(self.fb_g1, self.g1b, ats, m_pad),
            b1=commit(self.fb_g1, self.g1b, bts, m_pad),
            b2=commit(self.fb_g2, self.g2b, bts, m_pad),
            cdelta=commit(self.fb_g1, self.g1b, cdelta_priv, mp_pad),
            ptau=commit(self.fb_g1, self.g1b, ladder[:n], n_pad),
        )

    # ------------------------------------------------------------------
    def setup(
        self, r1cs: SparseR1CS, rng=None, materialize_host: bool = True
    ) -> Setup:
        """Evaluation-form trusted setup; same artifact shapes as
        groth16.generate_trusted_setup (groth16.go:94-222).  The proving key
        stays device-resident (``pk._device``); host lists are materialised
        only when ``materialize_host`` (needed for JSON serialization)."""
        ctx = self.ctx
        r = C.R
        n = _next_pow2(r1cs.n_constraints)
        m = r1cs.n_signals

        tox = Toxic(
            t=ctx.rand_fr(rng),
            kalpha=ctx.rand_fr(rng),
            kbeta=ctx.rand_fr(rng),
            kgamma=ctx.rand_fr(rng),
            kdelta=ctx.rand_fr(rng),
        )
        setup = Setup(toxic=tox)
        pk, vk = setup.pk, setup.vk

        L = self._lagrange_at_tau(n, tox.t)

        def col_evals(rows):
            out = [0] * m
            for j, row in enumerate(rows):
                lj = L[j]
                for i, coeff in row.items():
                    out[i] = (out[i] + coeff * lj) % r
            return out

        ats = col_evals(r1cs.A)
        bts = col_evals(r1cs.B)
        cts = col_evals(r1cs.C)

        # Z(x) = x^n - 1
        pk.z = [r - 1] + [0] * (n - 1) + [1]
        zt = (pow(tox.t, n, r) - 1) % r
        inv_delta = pow(tox.kdelta, -1, r)
        inv_gamma = pow(tox.kgamma, -1, r)

        # powers-of-tau ladder (pre-scaled by Z(t)/delta like the reference,
        # groth16.go:139-149), length n+1 = len(z); H has degree <= n-2 so
        # the device key keeps the first n entries
        ztd = zt * inv_delta % r
        ladder = [ztd]
        acc = tox.t
        for _ in range(1, len(pk.z)):
            ladder.append(acc * ztd % r)
            acc = acc * tox.t % r

        lo = r1cs.n_public + 1
        bac = [
            (ats[i] * tox.kbeta + bts[i] * tox.kalpha + cts[i]) % r
            for i in range(m)
        ]
        cdelta_priv = [x * inv_delta % r for x in bac[lo:]]

        pk._device = self._device_pk_from_scalars(
            n, m, lo, ats, bts, cdelta_priv, ladder
        )

        g1, g2 = ctx.bn.g1, ctx.bn.g2
        pk.g1.alpha = g1.mul_scalar(g1.g, tox.kalpha)
        pk.g1.beta = g1.mul_scalar(g1.g, tox.kbeta)
        pk.g1.delta = g1.mul_scalar(g1.g, tox.kdelta)
        pk.g2.beta = g2.mul_scalar(g2.g, tox.kbeta)
        pk.g2.gamma = g2.mul_scalar(g2.g, tox.kgamma)
        pk.g2.delta = g2.mul_scalar(g2.g, tox.kdelta)
        vk.g1.alpha = pk.g1.alpha
        vk.g2.beta = pk.g2.beta
        vk.g2.gamma = pk.g2.gamma
        vk.g2.delta = pk.g2.delta
        vk.ic = self.fb_g1.batch_mul([x * inv_gamma % r for x in bac[:lo]])

        if materialize_host:
            dpk = pk._device
            pk.g1.at = self.g1b.unpack(
                jax.tree.map(lambda x: x[..., :m], dpk.at)
            )
            pk.g1.bacgamma = self.g1b.unpack(
                jax.tree.map(lambda x: x[..., :m], dpk.b1)
            )
            pk.g2.bacgamma = self.g2b.unpack(
                jax.tree.map(lambda x: x[..., :m], dpk.b2)
            )
            pk.bacdelta = [g1.zero()] * lo + self.g1b.unpack(
                jax.tree.map(lambda x: x[..., : m - lo], dpk.cdelta)
            )
            pk.powers_tau_delta = self.g1b.unpack(
                jax.tree.map(lambda x: x[..., :n], dpk.ptau)
            ) + self.fb_g1.batch_mul(ladder[n:])
        return setup

    # ------------------------------------------------------------------
    def _device_pk(self, pk: Pk, n: int, lo: int) -> DevicePk:
        """Device key from a host Pk (packs + affine-normalises once,
        cached on the Pk object)."""
        if getattr(pk, "_device", None) is not None:
            return pk._device
        m = len(pk.g1.at)
        m_pad = self._pad_for(m)
        mp_pad = self._pad_for(m - lo)
        n_pad = self._pad_for(n)
        zero1, zero2 = self.ctx.bn.g1.zero(), self.ctx.bn.g2.zero()

        def packa(bg, pts, lanes, zero):
            arr = list(pts) + [zero] * (lanes - len(pts))
            return bg.to_affine_tiled(bg.pack(arr))

        pk._device = DevicePk(
            n=n,
            m=m,
            lo=lo,
            m_pad=m_pad,
            mp_pad=mp_pad,
            n_pad=n_pad,
            at=packa(self.g1b, pk.g1.at, m_pad, zero1),
            b1=packa(self.g1b, pk.g1.bacgamma, m_pad, zero1),
            b2=packa(self.g2b, pk.g2.bacgamma, m_pad, zero2),
            cdelta=packa(self.g1b, pk.bacdelta[lo:], mp_pad, zero1),
            ptau=packa(self.g1b, pk.powers_tau_delta[:n], n_pad, zero1),
        )
        return pk._device

    def _ntt_args(self, n: int):
        """Device-resident NTT tables for domain n, passed as jit ARGUMENTS
        (baking them as trace constants overflows the remote-compile
        transport at 2^20 — 4 data-sized arrays ~ 0.4 GB)."""
        ntt = self.ntt
        return (
            ntt.table(n, False),
            ntt.table(n, True),
            ntt.coset_powers(n, _COSET_G, False),
            ntt.coset_powers(n, _COSET_G, True),
        )

    def _h_pipeline(self, n: int):
        """Traced H(x) pipeline: evaluation-form a, b, c (32, n) Montgomery
        + the four NTT table args -> H coefficients (32, n) Montgomery, via
        the coset trick (Z = g^n - 1 is a nonzero constant off the
        subgroup)."""
        r = C.R
        K, ntt = self.Kr, self.ntt
        g = _COSET_G
        zinv = pow((pow(g, n, r) - 1) % r, -1, r)
        zinv_l = K.pack_np([zinv])
        ninv_l = K.pack_np([pow(n, -1, r)])

        def pipeline(a, b, c, t_fwd, t_inv, cs, cs_inv):
            intt = lambda x: K._mul_const_impl(
                ntt.transform(x, t_inv, True), jnp.asarray(ninv_l)
            )
            to_coset = lambda x: ntt.transform(
                K._mul_impl(intt(x), cs), t_fwd, False
            )
            ac, bc, cc = to_coset(a), to_coset(b), to_coset(c)
            p = K._sub_impl(K._mul_impl(ac, bc), cc)
            hc = K._mul_const_impl(p, jnp.asarray(zinv_l))
            return K._mul_impl(intt(hc), cs_inv)

        return pipeline

    def _get_h_jit(self, n: int, n_pad: int):
        """Jitted H(x) program: evaluation-form a, b, c -> canonical
        base-256 H-coefficient limbs, padded to the ptau lane count (the
        MSM digit source).  One moderate program instead of a member of the
        former five-MSM monolith, whose single-XLA-program form took >20 min
        to compile at 2^16 — the MSMs now run through the eager per-group
        pipeline (:meth:`..ops.msm.MSMEngine.window_sums_eager`)."""
        key = ("h", n, n_pad)
        if key in self._prove_jits:
            return self._prove_jits[key]
        h_pipe = self._h_pipeline(n)
        Kr = self.Kr
        pad = n_pad - n

        def h_digits(a_e, b_e, c_e, *ntt_args):
            h_mont = h_pipe(a_e, b_e, c_e, *ntt_args)
            h_plain = Kr._from_mont_impl(h_mont)  # canonical base-256 limbs
            if pad:
                h_plain = jnp.pad(h_plain, ((0, 0), (0, pad)))
            return h_plain

        self._prove_jits[key] = jax.jit(h_digits)
        return self._prove_jits[key]

    # ------------------------------------------------------------------
    def prove_sharded(self, r1cs: SparseR1CS, pk: Pk, mesh, rng=None) -> Proof:
        """Multi-chip prove via the production sharded prover
        (:mod:`..parallel.sharded_prover`): the proving key is sharded
        ONCE onto the mesh (device-resident, cached on the Pk), the five
        MSMs run data-parallel through chunk-canonical shard_map pieces
        with the witness sort plan shared across the three same-scalar
        MSMs, and per-shard window sums (~10 KB each) combine
        hierarchically on the host.  Proof assembly is identical to
        :meth:`prove` and verifies under the unchanged verifier."""
        from ..parallel.sharded_prover import ShardedFastProver

        key = ("sharded", id(mesh))
        if not hasattr(self, "_sharded_provers"):
            self._sharded_provers = {}
        if key not in self._sharded_provers:
            self._sharded_provers[key] = ShardedFastProver(self, mesh)
        return self._sharded_provers[key].prove(r1cs, pk, rng=rng)

    # ------------------------------------------------------------------
    def prove(self, r1cs: SparseR1CS, pk: Pk, rng=None) -> Proof:
        """TPU Groth16 prover: same assembly as groth16.generate_proofs
        (groth16.go:225-279) with NTT H(x) and fused device MSMs."""
        ctx = self.ctx
        r = C.R
        g1, g2 = ctx.bn.g1, ctx.bn.g2
        w = [x % r for x in r1cs.witness]
        n = _next_pow2(r1cs.n_constraints)
        lo = r1cs.n_public + 1
        dpk = self._device_pk(pk, n, lo)

        r_rand = ctx.rand_fr(rng)
        s_rand = ctx.rand_fr(rng)

        # host -> device: witness limbs + evaluation-form row combinations
        w_limbs = scalars_to_limbs(w + [0] * (dpk.m_pad - len(w)), r)
        wp_limbs = scalars_to_limbs(
            w[lo:] + [0] * (dpk.mp_pad - (len(w) - lo)), r
        )
        a_e, b_e, c_e = r1cs.row_evals()
        pad = n - len(a_e)
        dev = lambda v: self.Kr.pack(list(v) + [0] * pad)

        c_m = self.msm_g1.window_bits_for(dpk.m_pad)
        c_p = self.msm_g1.window_bits_for(dpk.mp_pad)
        c_h = self.msm_g1.window_bits_for(dpk.n_pad)
        # G2 has no small-chunk family; at small tiers its window width /
        # chunk span differ from G1's and the plan cannot be shared there
        c_m2 = self.msm_g2.window_bits_for(dpk.m_pad)
        # ONE sort/compaction plan for the witness scalars, shared by the
        # three same-scalar MSMs (at, b1 in G1 AND b2 in G2 — plans carry no
        # group data), built on the main thread so its jits exist before the
        # workers race (MSMEngine._piece_jit is also lock-guarded).
        plans_w = self.msm_g1.make_plans(w_limbs, c_m)
        plans_w2 = plans_w if c_m2 == c_m else None
        # Five MSMs + the H pipeline, all device-resident: at/b1 share one
        # compiled apply program (same shapes, same engine), the H digits
        # feed the ptau MSM without leaving the device.  The G1 side, the
        # G2 side, and the H pipeline are DISJOINT compile families, so the
        # first (cold) proof launches them from three threads: XLA compiles
        # release the GIL, and the remote TPU backend compiles them
        # concurrently — on a warm process the threads just dispatch.
        from concurrent.futures import ThreadPoolExecutor

        def g1_side():
            s_at = self.msm_g1.window_sums_eager(dpk.at, w_limbs, c_m, plans_w)
            s_b1 = self.msm_g1.window_sums_eager(dpk.b1, w_limbs, c_m, plans_w)
            s_cd = self.msm_g1.window_sums_eager(dpk.cdelta, wp_limbs, c_p)
            return s_at, s_b1, s_cd

        def g2_side():
            return self.msm_g2.window_sums_eager(
                dpk.b2, w_limbs, c_m2, plans_w2
            )

        def h_side():
            h_digits = self._get_h_jit(n, dpk.n_pad)(
                dev(a_e), dev(b_e), dev(c_e), *self._ntt_args(n)
            )
            return (
                self.msm_g1.window_sums_eager(dpk.ptau, h_digits, c_h),
                h_digits,
            )

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_g1 = pool.submit(g1_side)
            f_g2 = pool.submit(g2_side)
            f_h = pool.submit(h_side)
            s_at, s_b1, s_cd = f_g1.result()
            s_b2 = f_g2.result()
            s_h, h_digits = f_h.result()

        # degeneracy-flag check: incomplete-formula MSMs re-run through the
        # complete-engine twin if their flag fired (cryptographically never
        # for honest keys; exact always — see ops.msm module docstring)
        import numpy as _np

        def chk1(sf, pts, limbs, c, plans=None):
            sums, bad = sf
            if bool(_np.asarray(bad)):
                self.msm_g1.fallback_hits += 1
                sums, _ = self.msm_g1.fallback_engine().window_sums_eager(
                    pts, limbs, c, plans
                )
            return sums

        s_at = chk1(s_at, dpk.at, w_limbs, c_m, plans_w)
        s_b1 = chk1(s_b1, dpk.b1, w_limbs, c_m, plans_w)
        s_cd = chk1(s_cd, dpk.cdelta, wp_limbs, c_p)
        s_h = chk1(s_h, dpk.ptau, h_digits, c_h)
        sums_b2, bad_b2 = s_b2
        if bool(_np.asarray(bad_b2)):
            self.msm_g2.fallback_hits += 1
            sums_b2, _ = self.msm_g2.fallback_engine().window_sums_eager(
                dpk.b2, w_limbs, c_m2, plans_w2
            )

        comb1 = lambda sums, c: combine_window_sums(
            g1, self.g1b.unpack(sums), c
        )
        pi_a = comb1(s_at, c_m)
        pi_b_g1 = comb1(s_b1, c_m)
        pi_b = combine_window_sums(g2, self.g2b.unpack(sums_b2), c_m2)
        pi_c = comb1(s_cd, c_p)
        pi_h = comb1(s_h, c_h)

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
