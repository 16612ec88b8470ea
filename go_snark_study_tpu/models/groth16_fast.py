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
            self._msm_g2 = MSMEngine(self.g2b, self.ctx.bn.g2, C.R)
        return self._msm_g2

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
        """Multi-chip prove: the witness/H MSMs run data-parallel over the
        mesh (points sharded, window sums combined with all_gather + tree
        adds — :mod:`..parallel.sharded_msm`); H(x) comes from the same NTT
        coset pipeline.  Proof assembly is identical to :meth:`prove` and
        verifies under the unchanged verifier.  Requires a host-materialised
        Pk (the sharded engines pack per call)."""
        from ..parallel.sharded_msm import ShardedMSMEngine

        ctx = self.ctx
        r = C.R
        g1, g2 = ctx.bn.g1, ctx.bn.g2
        w = [x % r for x in r1cs.witness]
        n = _next_pow2(r1cs.n_constraints)
        lo = r1cs.n_public + 1

        key = ("sharded", id(mesh))
        if not hasattr(self, "_sharded_engines"):
            self._sharded_engines = {}
        if key not in self._sharded_engines:
            self._sharded_engines[key] = (
                ShardedMSMEngine(self.g1b, g1, C.R, mesh),
                ShardedMSMEngine(self.g2b, g2, C.R, mesh),
            )
        msm1, msm2 = self._sharded_engines[key]

        r_rand = ctx.rand_fr(rng)
        s_rand = ctx.rand_fr(rng)

        pi_a = msm1.msm(pk.g1.at, w)
        pi_b_g1 = msm1.msm(pk.g1.bacgamma, w)
        pi_b = msm2.msm(pk.g2.bacgamma, w)
        pi_c = msm1.msm(pk.bacdelta[lo:], w[lo:])

        # H(x) on device (single-program NTT pipeline), digits -> sharded MSM
        a_e, b_e, c_e = r1cs.row_evals()
        pad = n - len(a_e)
        dev = lambda v: self.Kr.pack(list(v) + [0] * pad)
        h_pipe = jax.jit(self._h_pipeline(n))
        hx = self.Kr.unpack(
            h_pipe(dev(a_e), dev(b_e), dev(c_e), *self._ntt_args(n))
        )
        pi_h = msm1.msm(pk.powers_tau_delta[: len(hx)], hx)

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
        # Five MSMs + the H pipeline, all device-resident: at/b1 share one
        # compiled group program (same shapes, same engine), the H digits
        # feed the ptau MSM without leaving the device.  The G1 side, the
        # G2 side, and the H pipeline are DISJOINT compile families, so the
        # first (cold) proof launches them from three threads: XLA compiles
        # release the GIL, and the remote TPU backend compiles them
        # concurrently — on a warm process the threads just dispatch.
        from concurrent.futures import ThreadPoolExecutor

        def g1_side():
            s_at = self.msm_g1.window_sums_eager(dpk.at, w_limbs, c_m)
            s_b1 = self.msm_g1.window_sums_eager(dpk.b1, w_limbs, c_m)
            s_cd = self.msm_g1.window_sums_eager(dpk.cdelta, wp_limbs, c_p)
            return s_at, s_b1, s_cd

        def g2_side():
            return self.msm_g2.window_sums_eager(dpk.b2, w_limbs, c_m)

        def h_side():
            h_digits = self._get_h_jit(n, dpk.n_pad)(
                dev(a_e), dev(b_e), dev(c_e), *self._ntt_args(n)
            )
            return self.msm_g1.window_sums_eager(dpk.ptau, h_digits, c_h)

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_g1 = pool.submit(g1_side)
            f_g2 = pool.submit(g2_side)
            f_h = pool.submit(h_side)
            s_at, s_b1, s_cd = f_g1.result()
            s_b2 = f_g2.result()
            s_h = f_h.result()

        comb1 = lambda sums, c: combine_window_sums(
            g1, self.g1b.unpack(sums), c
        )
        pi_a = comb1(s_at, c_m)
        pi_b_g1 = comb1(s_b1, c_m)
        pi_b = combine_window_sums(g2, self.g2b.unpack(s_b2), c_m)
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
