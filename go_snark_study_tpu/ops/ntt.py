"""Radix-2 NTT over the BN128 scalar field Fr on TPU.

Replaces the reference's O(n^2) Lagrange interpolation / schoolbook
polynomial multiplication (r1csqap/r1csqap.go:57-158; SURVEY §2.9 row 4)
with n·log n butterflies for the large-circuit fast path.  Fr has 2-adicity
28 (r - 1 = 2^28 · odd), so power-of-two domains up to 2^28 are supported.

Implementation: decimation-in-time Cooley-Tukey on the (32, N) Montgomery
limb layout.  Each stage is one batched Montgomery multiply of the odd lanes
by per-position twiddles plus an add/sub pair — 3 limb-kernels per stage, all
full-width on the lane dimension.

**No data-sized trace constants.**  Stage twiddles are strided gathers of a
single master table T[j] = w^j (j < n/2) which is passed as a device
ARGUMENT, and the bit-reversal permutation is computed on device from an
iota — a 2^20-domain program embeds kilobytes, not the ~1.3 GB that baking
per-stage tables would cost (which overflows the remote-compile transport).

The multi-chip four-step (transpose / all_to_all) decomposition lives in
:mod:`go_snark_study_tpu.parallel.sharded_ntt`.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bn128 import constants as C
from .fields import fr_kernels
from .limbs import LIMBS, FieldKernels

__all__ = ["NTTEngine"]

# lane tile of the fused Pallas butterfly kernel; the dispatch check and the
# kernel construction must agree, so it lives in exactly one place
PALLAS_BF_TILE = 2048


class NTTEngine:
    """Forward/inverse NTT + coset helpers over Fr."""

    def __init__(self, K: FieldKernels | None = None):
        self.K = K or fr_kernels()
        self.r = self.K.p
        self._masters_np: Dict[Tuple[int, bool], np.ndarray] = {}
        self._masters_dev: Dict[Tuple[int, bool], jnp.ndarray] = {}
        self._coset_np: Dict[Tuple[int, int, bool], np.ndarray] = {}
        self._coset_dev: Dict[Tuple[int, int, bool], jnp.ndarray] = {}
        self._jits: Dict[Tuple[int, bool], callable] = {}
        self._pl_bf = None  # fused Pallas butterfly (lazily built)
        self._pl_small: Dict[Tuple[int, bool], callable] = {}  # fused g-point NTTs

    # ------------------------------------------------------------------
    def _butterfly(self, even, odd, tw):
        """(lo, hi) = (even + odd·tw, even - odd·tw), any shape with limbs
        leading.  On TPU, tiled lane counts dispatch to the fused Pallas
        butterfly kernel (:mod:`.pallas_ntt` — one pass instead of three);
        small/off-tile shapes use the XLA limb kernels.  Bit-identical."""
        K = self.K
        shape = even.shape
        lanes = 1
        for d in shape[1:]:
            lanes *= d
        if K._use_pallas() and lanes % PALLAS_BF_TILE == 0:
            if self._pl_bf is None:
                from .pallas_ntt import make_pallas_butterfly

                self._pl_bf = make_pallas_butterfly(self.r, PALLAS_BF_TILE)
            flat = lambda x: jnp.broadcast_to(x, shape).reshape(LIMBS, lanes)
            lo, hi = self._pl_bf(flat(even), flat(odd), flat(tw))
            return lo.reshape(shape), hi.reshape(shape)
        t = K._mul_impl(odd, jnp.broadcast_to(tw, odd.shape))
        return K._add_impl(even, t), K._sub_impl(even, t)

    # ------------------------------------------------------------------
    def root_of_unity(self, n: int) -> int:
        assert n & (n - 1) == 0 and n.bit_length() - 1 <= C.TWO_ADICITY
        return pow(C.ROOT_OF_UNITY, 1 << (C.TWO_ADICITY - (n.bit_length() - 1)), self.r)

    def master_np(self, n: int, inverse: bool) -> np.ndarray:
        """Master twiddle table T[j] = w^±j, j < max(1, n/2), Montgomery
        numpy limbs.  Stage s of a length-n transform uses the strided
        slice T[j * (n >> s)]."""
        key = (n, inverse)
        if key not in self._masters_np:
            w = self.root_of_unity(n)
            if inverse:
                w = pow(w, -1, self.r)
            half = max(1, n // 2)
            vals, acc = [], 1
            for _ in range(half):
                vals.append(acc)
                acc = acc * w % self.r
            self._masters_np[key] = self.K.pack_np(vals)
        return self._masters_np[key]

    def master(self, n: int, inverse: bool) -> jnp.ndarray:
        key = (n, inverse)
        if key not in self._masters_dev:
            self._masters_dev[key] = jnp.asarray(self.master_np(n, inverse))
        return self._masters_dev[key]

    # ------------------------------------------------------------------
    @staticmethod
    def _bitrev_gather_idx(n_t: int, total: int) -> jnp.ndarray:
        """Device bit-reversal indices for row-batched length-n_t
        transforms over ``total`` lanes (rows contiguous)."""
        k = n_t.bit_length() - 1
        g = jax.lax.iota(jnp.int32, total)
        pos = g & (n_t - 1)
        row = g - pos
        rev = jnp.zeros_like(pos)
        for b in range(k):
            rev = rev | (((pos >> b) & 1) << (k - 1 - b))
        return row + rev

    def _transform(
        self, x: jnp.ndarray, T: jnp.ndarray, length: int | None = None
    ) -> jnp.ndarray:
        """x: (32, total) Montgomery limbs -> transformed, natural order
        per row.  ``T``: master twiddles for the per-row length (forward or
        inverse); ``length``: per-transform length for row-batched use
        (blocks never cross row boundaries)."""
        K = self.K
        total = x.shape[1]
        n_t = length or total
        k = n_t.bit_length() - 1
        if k == 0:
            return x
        x = x[:, self._bitrev_gather_idx(n_t, total)]
        half_iota = jax.lax.iota(jnp.int32, total // 2)
        for s in range(1, k + 1):
            m = 1 << s
            half = m // 2
            stride = n_t // m
            xr = x.reshape(LIMBS, total // m, m)
            even = xr[:, :, :half].reshape(LIMBS, total // 2)
            odd = xr[:, :, half:].reshape(LIMBS, total // 2)
            tw = T[:, (half_iota & (half - 1)) * stride]
            lo, hi = self._butterfly(even, odd, tw)
            x = jnp.concatenate(
                [
                    lo.reshape(LIMBS, total // m, half),
                    hi.reshape(LIMBS, total // m, half),
                ],
                axis=2,
            ).reshape(LIMBS, total)
        return x

    def _transform_batched(
        self, x: jnp.ndarray, n: int, rows: int, inverse: bool
    ) -> jnp.ndarray:
        """x: (32, rows*n) -> per-row transform (no scaling).  The master
        table here is a trace constant — callers (the four-step sharded NTT)
        use per-row lengths of at most a few thousand lanes."""
        T = jnp.asarray(self.master_np(n, inverse))
        return self._transform(x, T, length=n)

    # ------------------------------------------------------------------
    # single-chip four-step path: every butterfly keeps the minor axis at
    # n2 (or n1) >= ~1000 lanes.  The radix-2 path's early stages move
    # sub-128-lane granules (the lane dim is 128-wide on TPU), which is
    # what made a 2^20 transform memory-granularity-bound (~550 ms); the
    # four-step form runs the same butterflies batched over a wide minor
    # axis (measured ~10x faster at 2^20).
    # ------------------------------------------------------------------
    FOURSTEP_MIN = 1 << 14

    @staticmethod
    def split(n: int) -> Tuple[int, int]:
        k = n.bit_length() - 1
        n1 = 1 << (k // 2)
        return n1, n // n1

    def step_table_np(self, n: int, inverse: bool) -> np.ndarray:
        """(32, n) twiddle table W[i1*n2 + i2] = w^(±i1·i2) for the middle
        scaling step — data-sized, so ALWAYS passed as a jit argument."""
        key = ("step", n, inverse)
        if key not in self._coset_np:
            n1, n2 = self.split(n)
            w = self.root_of_unity(n)
            if inverse:
                w = pow(w, -1, self.r)
            r = self.r
            vals = []
            for i1 in range(n1):
                acc = 1
                step = pow(w, i1, r)
                for _ in range(n2):
                    vals.append(acc)
                    acc = acc * step % r
            self._coset_np[key] = self.K.pack_np(vals)
        return self._coset_np[key]

    # -- fused multi-stage column transform (TPU) -----------------------
    RADIX = 16  # rows per fused kernel: 17 CIOS muls traced, like a G2 add

    def _small_ntt(self, g: int, inverse: bool, interpret: bool = False):
        """Fused g-point NTT kernel (g <= RADIX), cached per direction."""
        key = (g, inverse)
        if key not in self._pl_small or interpret:
            from .pallas_ntt import make_pallas_small_ntt

            w = self.root_of_unity(g)
            if inverse:
                w = pow(w, -1, self.r)
            k = g.bit_length() - 1
            stage_tws = tuple(
                tuple(
                    tuple(
                        int(v)
                        for v in self.K.pack_np([pow(w, j * (g >> s), self.r)])[
                            :, 0
                        ]
                    )
                    for j in range(1 << (s - 1))
                )
                for s in range(1, k + 1)
            )
            fn = make_pallas_small_ntt(self.r, g, stage_tws, interpret=interpret)
            if interpret:
                return fn
            self._pl_small[key] = fn
        return self._pl_small[key]

    def _fused_tw_np(self, n_len: int, inverse: bool, a: int) -> np.ndarray:
        """(32, a, b) table w^{±k1·i2} for the inner four-step twiddle —
        n_len <= 1024 here, so it is a small trace constant."""
        key = ("fused_tw", n_len, inverse, a)
        if key not in self._coset_np:
            b = n_len // a
            w = self.root_of_unity(n_len)
            if inverse:
                w = pow(w, -1, self.r)
            vals = [pow(w, k1 * i2, self.r) for k1 in range(a) for i2 in range(b)]
            self._coset_np[key] = self.K.pack_np(vals).reshape(LIMBS, a, b)
        return self._coset_np[key]

    def _col_fused(self, x3: jnp.ndarray, n_len: int, inverse: bool):
        """Recursive four-step column transform with fused radix-16
        kernels: a length-1024 column NTT is 3 kernel passes + 2 twiddle
        muls instead of 10 stage passes — the VMEM-resident multi-stage
        form.  Natural order along axis 1 in and out, like
        :meth:`_col_transform` (the identity w_{n}^{a} = w_{n/a} makes the
        recursive sub-transforms use their canonical roots)."""
        K = self.K
        b_lanes = x3.shape[2]
        if n_len <= self.RADIX:
            return self._small_ntt(n_len, inverse)(x3)
        a = self.RADIX
        b = n_len // a
        y = self._col_fused(
            x3.reshape(LIMBS, a, b * b_lanes), a, inverse
        ).reshape(LIMBS, a, b, b_lanes)
        tw = jnp.asarray(self._fused_tw_np(n_len, inverse, a))[..., None]
        y = K._mul_impl(y, jnp.broadcast_to(tw, y.shape))
        y = jnp.swapaxes(y, 1, 2)  # (32, b, a, B)
        y = self._col_fused(
            y.reshape(LIMBS, b, a * b_lanes), b, inverse
        ).reshape(LIMBS, b, a, b_lanes)
        return y.reshape(LIMBS, n_len, b_lanes)

    def _col_transform(self, x3: jnp.ndarray, n_len: int, inverse: bool):
        """Length-``n_len`` NTTs along axis 1 of (32, n_len, B), batched
        over the (wide) minor axis.  Master twiddles for n_len are tiny and
        baked as constants.  On TPU with tile-aligned lanes this dispatches
        to the fused multi-stage path (:meth:`_col_fused`); the XLA
        stage-at-a-time loop below is the bit-identical fallback."""
        K = self.K
        b_lanes = x3.shape[2]
        k = n_len.bit_length() - 1
        if k == 0:
            return x3
        import os as _os

        if (
            K._use_pallas()
            and _os.environ.get("GOSNARK_NTT_FUSED", "1") != "0"
            and (n_len * b_lanes) % (self.RADIX * 1024) == 0
        ):
            return self._col_fused(x3, n_len, inverse)
        t_np = self.master_np(n_len, inverse)  # (32, n_len/2), small
        # bit-reverse rows (moves whole B-lane rows: efficient)
        idx = np.zeros(n_len, dtype=np.int64)
        for b in range(k):
            idx |= ((np.arange(n_len) >> b) & 1) << (k - 1 - b)
        x3 = x3[:, idx, :]
        for s in range(1, k + 1):
            m = 1 << s
            half = m // 2
            stride = n_len // m
            xr = x3.reshape(LIMBS, n_len // m, m, b_lanes)
            even = xr[:, :, :half, :]
            odd = xr[:, :, half:, :]
            tw = t_np[:, (np.arange(half) * stride)]  # (32, half) constant
            twb = jnp.asarray(tw)[:, None, :, None]
            lo, hi = self._butterfly(even, odd, twb)
            x3 = jnp.concatenate([lo, hi], axis=2).reshape(
                LIMBS, n_len, b_lanes
            )
        return x3

    def _transform_fourstep(
        self, x: jnp.ndarray, w_table: jnp.ndarray, inverse: bool
    ) -> jnp.ndarray:
        """(32, n) -> (32, n) NTT in NATURAL order (no scaling):
        column NTTs over i1 -> W[i1·i2] twiddle -> transpose -> column NTTs
        over i2 -> flatten (result index k2·n1 + k1 lands at lane
        k2·n1 + k1)."""
        n = x.shape[1]
        n1, n2 = self.split(n)
        x3 = x.reshape(LIMBS, n1, n2)
        x3 = self._col_transform(x3, n1, inverse)  # [k1, i2]
        x3 = self.K._mul_impl(
            x3.reshape(LIMBS, n), w_table
        ).reshape(LIMBS, n1, n2)
        x3 = jnp.swapaxes(x3, 1, 2)  # [i2, k1]
        x3 = self._col_transform(x3, n2, inverse)  # [k2, k1]
        return x3.reshape(LIMBS, n)

    # -- unified traced entry -------------------------------------------
    def table(self, n: int, inverse: bool) -> jnp.ndarray:
        """The data-sized table ``transform`` needs for domain n (master
        twiddles for the radix-2 path, the W[i1·i2] step table for the
        four-step path), device-cached."""
        if n >= self.FOURSTEP_MIN:
            key = ("step", n, inverse)
            if key not in self._coset_dev:
                self._coset_dev[key] = jnp.asarray(self.step_table_np(n, inverse))
            return self._coset_dev[key]
        return self.master(n, inverse)

    def transform(self, x: jnp.ndarray, table: jnp.ndarray, inverse: bool):
        """Traced NTT (no 1/n scaling), natural order in and out; ``table``
        must come from :meth:`table` for the same (n, inverse)."""
        n = x.shape[1]
        if n >= self.FOURSTEP_MIN:
            return self._transform_fourstep(x, table, inverse)
        return self._transform(x, table)

    def _get_jit(self, n: int, inverse: bool):
        key = (n, inverse)
        if key not in self._jits:
            ninv = self.K.pack_np([pow(n, -1, self.r)])

            def run(x, T):
                y = self.transform(x, T, inverse)
                if inverse:
                    y = self.K._mul_const_impl(y, jnp.asarray(ninv))
                return y

            self._jits[key] = jax.jit(run)
        return self._jits[key]

    # ------------------------------------------------------------------
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Coefficients -> evaluations on the size-n subgroup domain."""
        n = x.shape[1]
        return self._get_jit(n, False)(x, self.table(n, False))

    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        """Evaluations -> coefficients (includes the 1/n scale)."""
        n = x.shape[1]
        return self._get_jit(n, True)(x, self.table(n, True))

    # ------------------------------------------------------------------
    # coset helpers (for vanishing-polynomial division: on the coset g·H,
    # Z(g w^i) = g^n - 1 is a nonzero constant)
    # ------------------------------------------------------------------
    def coset_powers_np(self, n: int, g: int, inverse: bool) -> np.ndarray:
        key = (n, g, inverse)
        if key not in self._coset_np:
            gg = pow(g, -1, self.r) if inverse else g
            pows, acc = [], 1
            for _ in range(n):
                pows.append(acc)
                acc = acc * gg % self.r
            self._coset_np[key] = self.K.pack_np(pows)
        return self._coset_np[key]

    def coset_powers(self, n: int, g: int, inverse: bool) -> jnp.ndarray:
        key = (n, g, inverse)
        if key not in self._coset_dev:
            self._coset_dev[key] = jnp.asarray(self.coset_powers_np(n, g, inverse))
        return self._coset_dev[key]

    def coset_shift(
        self,
        x: jnp.ndarray,
        g: int = 5,
        inverse: bool = False,
        powers: jnp.ndarray | None = None,
    ):
        """Multiply coefficient i by g^i (or g^-i): maps evaluations between
        the subgroup domain H and the coset gH.  Pass ``powers`` explicitly
        inside large jitted programs (an argument, not a baked constant)."""
        if powers is None:
            powers = jnp.asarray(self.coset_powers_np(x.shape[1], g, inverse))
        return self.K._mul_impl(x, powers)

    # ------------------------------------------------------------------
    # host conveniences
    # ------------------------------------------------------------------
    def ntt_ints(self, coeffs: List[int]) -> List[int]:
        return self.K.unpack(self.forward(self.K.pack(coeffs)))

    def intt_ints(self, evals: List[int]) -> List[int]:
        return self.K.unpack(self.inverse(self.K.pack(evals)))
