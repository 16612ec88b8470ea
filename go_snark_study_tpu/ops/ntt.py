"""Radix-2 NTT over the BN128 scalar field Fr on TPU.

Replaces the reference's O(n^2) Lagrange interpolation / schoolbook
polynomial multiplication (r1csqap/r1csqap.go:57-158; SURVEY §2.9 row 4)
with n·log n butterflies for the large-circuit fast path.  Fr has 2-adicity
28 (r - 1 = 2^28 · odd), so power-of-two domains up to 2^28 are supported.

Implementation: decimation-in-time Cooley-Tukey on the (32, N) Montgomery
limb layout.  Each stage is one batched Montgomery multiply of the odd lanes
by per-position twiddles plus an add/sub pair — 3 limb-kernels per stage, all
full-width on the lane dimension.  Stage structure (bit-reversal permutation
and per-stage twiddle vectors) is precomputed on host per domain size and
cached.

The multi-chip four-step (transpose / all_to_all) decomposition lives in
:mod:`go_snark_study_tpu.parallel.sharded_ntt`.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bn128 import constants as C
from .fields import fr_kernels
from .limbs import FieldKernels

__all__ = ["NTTEngine"]


def _bit_reverse_perm(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


class NTTEngine:
    """Forward/inverse NTT + coset helpers over Fr."""

    def __init__(self, K: FieldKernels | None = None):
        self.K = K or fr_kernels()
        self.r = self.K.p
        self._plans: Dict[Tuple[int, bool], tuple] = {}
        self._fwd_jit: Dict[int, callable] = {}

    # ------------------------------------------------------------------
    def root_of_unity(self, n: int) -> int:
        assert n & (n - 1) == 0 and n.bit_length() - 1 <= C.TWO_ADICITY
        return pow(C.ROOT_OF_UNITY, 1 << (C.TWO_ADICITY - (n.bit_length() - 1)), self.r)

    def _plan(self, n: int, inverse: bool):
        key = (n, inverse)
        if key in self._plans:
            return self._plans[key]
        w = self.root_of_unity(n)
        if inverse:
            w = pow(w, -1, self.r)
        k = n.bit_length() - 1
        rev = _bit_reverse_perm(n)  # numpy: trace constant
        # per-stage twiddle vectors of length n/2, aligned with the butterfly
        # pairing used below (even lanes paired with odd lanes at stride m/2)
        stage_tw = []
        for s in range(1, k + 1):
            m = 1 << s
            wm = pow(w, n // m, self.r)
            tw = []
            for blk in range(n // m):
                acc = 1
                for j in range(m // 2):
                    tw.append(acc)
                    acc = acc * wm % self.r
            stage_tw.append(self.K.pack_np(tw))  # (32, n/2) Montgomery, numpy
        ninv = self.K.pack_np([pow(n, -1, self.r)])
        plan = (rev, stage_tw, ninv)
        self._plans[key] = plan
        return plan

    # ------------------------------------------------------------------
    def _transform(self, x: jnp.ndarray, rev, stage_tw, length: int | None = None):
        """x: (32, n) Montgomery limbs -> transformed, natural order.
        ``length``: per-transform length for row-batched use (stages run only
        up to length; blocks never cross row boundaries)."""
        K = self.K
        n = x.shape[1]
        k = (length or n).bit_length() - 1
        x = x[:, rev]
        for s in range(1, k + 1):
            m = 1 << s
            half = m // 2
            # view lanes as (blocks, m): evens = [:, :half], odds = [:, half:]
            xr = x.reshape(32, n // m, m)
            even = xr[:, :, :half].reshape(32, n // 2)
            odd = xr[:, :, half:].reshape(32, n // 2)
            t = K._mul_impl(odd, stage_tw[s - 1])
            lo = K._add_impl(even, t)
            hi = K._sub_impl(even, t)
            x = jnp.concatenate(
                [
                    lo.reshape(32, n // m, half),
                    hi.reshape(32, n // m, half),
                ],
                axis=2,
            ).reshape(32, n)
        return x

    # ------------------------------------------------------------------
    # row-batched transforms (for the four-step sharded NTT): x holds
    # ``rows`` independent length-n transforms in consecutive lane blocks.
    # No 1/n scaling — callers compose scales themselves.
    # ------------------------------------------------------------------
    def _plan_batched(self, n: int, rows: int, inverse: bool):
        key = (n, rows, inverse)
        if key in self._plans:
            return self._plans[key]
        rev, stage_tw, _ = self._plan(n, inverse)
        rev_t = (np.arange(rows)[:, None] * n + rev[None, :]).reshape(-1)
        tw_t = [np.tile(tw, rows) for tw in stage_tw]
        plan = (rev_t, tw_t)
        self._plans[key] = plan
        return plan

    def _transform_batched(self, x: jnp.ndarray, n: int, rows: int, inverse: bool):
        """x: (32, rows*n) -> per-row transform (no scaling)."""
        rev_t, tw_t = self._plan_batched(n, rows, inverse)
        return self._transform(x, rev_t, tw_t, length=n)

    def _get_jit(self, n: int, inverse: bool):
        key = (n, inverse)
        if key not in self._fwd_jit:
            rev, stage_tw, ninv = self._plan(n, inverse)

            def run(x):
                y = self._transform(x, rev, stage_tw)
                if inverse:
                    y = self.K._mul_const_impl(y, ninv)
                return y

            self._fwd_jit[key] = jax.jit(run)
        return self._fwd_jit[key]

    # ------------------------------------------------------------------
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Coefficients -> evaluations on the size-n subgroup domain."""
        return self._get_jit(x.shape[1], False)(x)

    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        """Evaluations -> coefficients (includes the 1/n scale)."""
        return self._get_jit(x.shape[1], True)(x)

    # ------------------------------------------------------------------
    # coset helpers (for vanishing-polynomial division: on the coset g·H,
    # Z(g w^i) = g^n - 1 is a nonzero constant)
    # ------------------------------------------------------------------
    @lru_cache(maxsize=None)
    def _coset_powers(self, n: int, g: int, inverse: bool):
        if inverse:
            g = pow(g, -1, self.r)
        pows, acc = [], 1
        for _ in range(n):
            pows.append(acc)
            acc = acc * g % self.r
        return self.K.pack_np(pows)

    def coset_shift(self, x: jnp.ndarray, g: int = 5, inverse: bool = False):
        """Multiply coefficient i by g^i (or g^-i): maps evaluations between
        the subgroup domain H and the coset gH."""
        n = x.shape[1]
        return self.K._mul_impl(x, self._coset_powers(n, g, inverse))

    # ------------------------------------------------------------------
    # host conveniences
    # ------------------------------------------------------------------
    def ntt_ints(self, coeffs: List[int]) -> List[int]:
        n = len(coeffs)
        return self.K.unpack(self.forward(self.K.pack(coeffs)))

    def intt_ints(self, evals: List[int]) -> List[int]:
        return self.K.unpack(self.inverse(self.K.pack(evals)))
