"""Groth16 fast path: evaluation-form QAP over a roots-of-unity domain.

This is the TPU-native prover for LARGE circuits (the reference's monomial
Lagrange path is O(n^2)-O(n^3) and numerically capped at ~20 constraints,
SURVEY §6).  Artifact SHAPES are identical to :mod:`.groth16` (same Pk/Vk/
Proof dataclasses, same verifier) — only the interpolation domain differs:

  * constraints live at the 2^k-th roots of unity, Z(x) = x^n - 1;
  * setup evaluates the QAP polynomials at tau via barycentric Lagrange
    values L_j(tau) (O(n) with one batched inversion) and commits with the
    TPU fixed-base engine (:mod:`..ops.fixed_base`);
  * the prover gets H(x) by the classic coset trick — iNTT the witness-
    combined row evaluations, shift to the coset gH where Z = g^n - 1 is a
    nonzero constant, pointwise a*b - c, scale, iNTT back — all on device
    (:mod:`..ops.ntt`);
  * the three proof MSMs run on the TPU Pippenger engine.

Proofs verify under the UNCHANGED :func:`..models.groth16.verify_proof`.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..bn128 import constants as C
from ..ops.curve_ops import G1Batch, G2Batch
from ..ops.fields import fq_kernels, fr_kernels
from ..ops.fixed_base import FixedBaseEngine
from ..ops.msm import MSMEngine
from ..ops.ntt import NTTEngine
from ..synthetic import SparseR1CS
from .context import ProtocolContext, default_context
from .groth16 import Pk, Proof, Setup, Toxic, Vk

__all__ = ["FastGroth16"]

_COSET_G = 5  # multiplicative generator of Fr*, not in any 2^k subgroup


def _next_pow2(n: int) -> int:
    return 1 << max(1, (n - 1).bit_length())


class FastGroth16:
    """Holds the (lazily built) TPU engines; one instance is reusable across
    circuits and proof calls."""

    def __init__(self, ctx: Optional[ProtocolContext] = None):
        self.ctx = ctx or default_context()
        bn = self.ctx.bn
        self.Kq, self.Kr = fq_kernels(), fr_kernels()
        self.g1b, self.g2b = G1Batch(self.Kq), G2Batch(self.Kq)
        self.ntt = NTTEngine(self.Kr)
        self._fb_g1: Optional[FixedBaseEngine] = None
        self._fb_g2: Optional[FixedBaseEngine] = None
        self._msm_g1: Optional[MSMEngine] = None
        self._msm_g2: Optional[MSMEngine] = None

    # -- engines (built on first use; the G2 table costs ~8k host adds) ----
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
    def setup(self, r1cs: SparseR1CS, rng=None) -> Setup:
        """Evaluation-form trusted setup; same artifact shapes as
        groth16.generate_trusted_setup (groth16.go:94-222)."""
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
        # groth16.go:139-149), length n+1 = len(z)
        ztd = zt * inv_delta % r
        ladder = [ztd]
        acc = tox.t
        for _ in range(1, len(pk.z)):
            ladder.append(acc * ztd % r)
            acc = acc * tox.t % r
        pk.powers_tau_delta = self.fb_g1.batch_mul(ladder)

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

        pk.g1.at = self.fb_g1.batch_mul(ats)
        pk.g1.bacgamma = self.fb_g1.batch_mul(bts)
        pk.g2.bacgamma = self.fb_g2.batch_mul(bts)

        l_pub = r1cs.n_public + 1
        bac = [
            (ats[i] * tox.kbeta + bts[i] * tox.kalpha + cts[i]) % r for i in range(m)
        ]
        pk.bacdelta = [g1.zero()] * l_pub + self.fb_g1.batch_mul(
            [x * inv_delta % r for x in bac[l_pub:]]
        )
        vk.ic = self.fb_g1.batch_mul([x * inv_gamma % r for x in bac[:l_pub]])
        return setup

    # ------------------------------------------------------------------
    def _h_coeffs(self, r1cs: SparseR1CS, n: int):
        """H(x) = (A B - C)/Z on device via the coset trick; returns the n
        coefficient ints of H (degree <= n-2)."""
        r = C.R
        a_e, b_e, c_e = r1cs.row_evals()
        pad = n - len(a_e)
        K, ntt = self.Kr, self.ntt

        dev = lambda v: K.pack(v + [0] * pad)
        za, zb, zc = dev(a_e), dev(b_e), dev(c_e)

        g = _COSET_G
        zinv = pow((pow(g, n, r) - 1) % r, -1, r)
        zinv_l = K.pack([zinv])

        def pipeline(a, b, c):
            to_coset = lambda x: ntt._get_jit(n, False)(
                ntt.coset_shift(ntt._get_jit(n, True)(x), g=g)
            )
            ac, bc, cc = to_coset(a), to_coset(b), to_coset(c)
            p = K._sub_impl(K._mul_impl(ac, bc), cc)
            hc = K._mul_const_impl(p, zinv_l)
            return ntt.coset_shift(ntt._get_jit(n, True)(hc), g=g, inverse=True)

        return K.unpack(pipeline(za, zb, zc))

    def prove(self, r1cs: SparseR1CS, pk: Pk, rng=None) -> Proof:
        """TPU Groth16 prover: same assembly as groth16.generate_proofs
        (groth16.go:225-279) with NTT H(x) and Pippenger MSMs."""
        ctx = self.ctx
        r = C.R
        g1, g2 = ctx.bn.g1, ctx.bn.g2
        w = [x % r for x in r1cs.witness]
        n = _next_pow2(r1cs.n_constraints)
        lo = r1cs.n_public + 1

        r_rand = ctx.rand_fr(rng)
        s_rand = ctx.rand_fr(rng)

        pi_a = self.msm_g1.msm(pk.g1.at, w)
        pi_b_g1 = self.msm_g1.msm(pk.g1.bacgamma, w)
        pi_b = self.msm_g2.msm(pk.g2.bacgamma, w)
        pi_c = self.msm_g1.msm(pk.bacdelta[lo:], w[lo:])

        pi_a = g1.add(pi_a, pk.g1.alpha)
        pi_a = g1.add(pi_a, g1.mul_scalar(pk.g1.delta, r_rand))
        pi_b_g1 = g1.add(pi_b_g1, pk.g1.beta)
        pi_b = g2.add(pi_b, pk.g2.beta)
        pi_b_g1 = g1.add(pi_b_g1, g1.mul_scalar(pk.g1.delta, s_rand))
        pi_b = g2.add(pi_b, g2.mul_scalar(pk.g2.delta, s_rand))

        hx = self._h_coeffs(r1cs, n)
        pi_c = g1.add(pi_c, self.msm_g1.msm(pk.powers_tau_delta[: len(hx)], hx))
        pi_c = g1.add(pi_c, g1.mul_scalar(pi_a, s_rand))
        pi_c = g1.add(pi_c, g1.mul_scalar(pi_b_g1, r_rand))
        neg_rs = (-(r_rand * s_rand)) % r
        pi_c = g1.add(pi_c, g1.mul_scalar(pk.g1.delta, neg_rs))
        return Proof(pi_a=pi_a, pi_b=pi_b, pi_c=pi_c)
