"""Batched 254-bit modular arithmetic for TPU: 8-bit limbs in int32 lanes.

This is the TPU-native replacement for the reference's ``math/big`` core
(fields/fq.go) — the layer every hot kernel (NTT butterflies, Jacobian point
ops, Pippenger MSM) is built on.

Design (why these choices map to TPU hardware):

  * **32 limbs x 8 bits, int32 storage.**  TPUs have no 64-bit integer
    multiply; 8-bit limb products (<= 255^2 = 65025 < 2^16) accumulate
    exactly in int32 with huge headroom: a full schoolbook column plus the
    Montgomery-reduction column tops out near 2^22, so the whole
    multiply+reduce runs carry-free until one final normalisation pass.
  * **Limbs-first layout ``(L, N)``** — limb index on sublanes, batch on the
    128-wide lane dimension, so every per-limb operation is a full-width VPU
    vector op and the sequential carry/REDC chains are chains of *row*
    operations, each (N,)-wide.
  * **Montgomery domain** (R = 2^256): products cost one schoolbook pass
    (32 row-MACs of shape (32, N)) + one REDC pass (32 steps, one row-MAC
    each) + carry normalisation.  No trial division, no wide compares.
  * Everything is pure jnp (int32) — bit-exact on CPU and TPU backends; a
    fused Pallas kernel with VMEM-resident accumulators is layered on top in
    :mod:`go_snark_study_tpu.ops.pallas_field` for the large-batch path.

Host bridge: ``pack``/``unpack`` convert python-int vectors <-> limb arrays
via numpy byte views (no per-limb python loops).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LIMBS", "LIMB_BITS", "FieldKernels"]

LIMBS = 32
LIMB_BITS = 8
MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(x: int) -> np.ndarray:
    return np.frombuffer(int(x).to_bytes(LIMBS, "little"), dtype=np.uint8).astype(
        np.int32
    )


class FieldKernels:
    """Batched kernels for one prime modulus p < 2^255.

    All element arrays have shape ``(32, N)`` int32 with canonical 8-bit limbs
    in the Montgomery domain unless stated otherwise.  N (the lane/batch dim)
    should be a multiple of 128 for full VPU utilisation but any N works.
    """

    def __init__(self, p: int):
        assert p % 2 == 1 and p.bit_length() <= 255
        self.p = p
        self.R = (1 << (LIMBS * LIMB_BITS)) % p
        self.R2 = self.R * self.R % p
        self.n0 = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # IMPORTANT: trace-captured constants are kept as NUMPY arrays.  A
        # captured jax.Array constant forces a device read during lowering
        # (mlir ir_constant -> array._value), which can block for minutes
        # under the axon/TPU plugin; numpy constants fold in host memory.
        _pl = _int_to_limbs(p)
        self.p_limbs = _pl  # (32,) np.int32
        self.p0 = int(_pl[0])
        self.r2_limbs = _int_to_limbs(self.R2)
        self.one_mont = _int_to_limbs(self.R)  # 1 in Mont domain
        # exponent bits for Fermat inversion, LSB first
        e = p - 2
        self._inv_bits = np.asarray(
            [(e >> i) & 1 for i in range(e.bit_length())], dtype=np.int32
        )
        # jit the public ops (shapes cache per batch size); the _impl
        # versions stay available for tracing inside larger jitted programs.
        self.add = jax.jit(self._add_impl)
        self.sub = jax.jit(self._sub_impl)
        self.neg = jax.jit(self._neg_impl)
        self.double = jax.jit(self._double_impl)
        self.mul = jax.jit(self._mul_impl)
        self._use_pallas_cached = None  # lazily resolved (backend-dependent)
        self._pallas_muls = {}
        self.square = jax.jit(self._square_impl)
        self.mul_const = jax.jit(self._mul_const_impl)
        self.to_mont = jax.jit(self._to_mont_impl)
        self.from_mont = jax.jit(self._from_mont_impl)
        self.inverse = jax.jit(self._inverse_impl)

    # ------------------------------------------------------------------
    # host <-> device
    # ------------------------------------------------------------------
    def _native(self):
        """Lazily bind the C++ host runtime for conversions (optional)."""
        if not hasattr(self, "_native_field"):
            self._native_field = None
            try:
                from .. import native

                if native.available():
                    self._native_field = native.NativeField(self.p)
            except Exception:
                pass
        return self._native_field

    def pack_np(self, xs: Sequence[int], mont: bool = True) -> np.ndarray:
        """python ints -> (32, N) numpy limb array.  Use THIS form for values
        captured as constants inside jitted closures (twiddles, generator
        tables): numpy constants lower without device reads."""
        nf = self._native()
        if nf is not None:
            return nf.pack_ints([int(x) for x in xs], mont=mont)
        if mont:
            p, R = self.p, self.R
            xs = [x % p * R % p for x in xs]
        else:
            xs = [x % self.p for x in xs]
        buf = b"".join(int(x).to_bytes(LIMBS, "little") for x in xs)
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), LIMBS)
        return arr.T.astype(np.int32)

    def pack(self, xs: Sequence[int], mont: bool = True) -> jnp.ndarray:
        """python ints -> (32, N) device limb array (Montgomery by default)."""
        return jnp.asarray(self.pack_np(xs, mont=mont))

    def unpack(self, arr, mont: bool = True) -> List[int]:
        """(32, N) limb array -> python ints (out of Montgomery domain)."""
        nf = self._native()
        if nf is not None:
            return nf.unpack_ints(np.asarray(arr), mont=mont)
        a = np.asarray(arr).astype(np.uint8).T.copy()  # (N, 32)
        out = [int.from_bytes(row.tobytes(), "little") for row in a]
        if mont:
            rinv = pow(self.R, -1, self.p)
            out = [x * rinv % self.p for x in out]
        return out

    # ------------------------------------------------------------------
    # normalisation helpers (pure functions of (32,N) / (64,N) arrays)
    # ------------------------------------------------------------------
    @staticmethod
    def _carry(rows: jnp.ndarray) -> jnp.ndarray:
        """Sequential carry propagation over the limb axis.  Accepts signed
        lazy columns; ``& MASK`` / arithmetic ``>> 8`` handle borrows
        correctly in two's complement.  The final carry must be zero by the
        caller's range invariant (asserted in tests, not at runtime).

        A lax.scan over the limb rows (NOT an unrolled chain): compile time
        must stay flat no matter how many kernel call sites a composite graph
        has — a batched point-add contains ~25 of these."""

        def body(c, row):
            v = row + c
            return v >> LIMB_BITS, v & MASK

        _, out = jax.lax.scan(body, jnp.zeros(rows.shape[1:], jnp.int32), rows)
        return out

    def _cond_sub_p(self, x: jnp.ndarray) -> jnp.ndarray:
        """x in [0, 2p) canonical limbs -> x mod p."""
        d = x - self.p_limbs[:, None]

        def body(c, row):
            v = row + c
            return v >> LIMB_BITS, v & MASK

        c, y = jax.lax.scan(body, jnp.zeros(x.shape[1:], jnp.int32), d)
        ge = c == 0  # no final borrow => x >= p
        return jnp.where(ge[None, :], y, x)

    # ------------------------------------------------------------------
    # arithmetic
    # ------------------------------------------------------------------
    @staticmethod
    def _nd(fn, *arrays):
        """Run a 2-D (32, N) kernel on arrays of any trailing rank by
        flattening the batch axes (the MSM pipeline carries (32, W, P)
        leaves; every op here is lane-independent)."""
        shape = arrays[0].shape
        if len(shape) == 2:
            return fn(*arrays)
        flat = [x.reshape(LIMBS, -1) for x in arrays]
        return fn(*flat).reshape(shape)

    def _add_impl(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._nd(
            lambda x, y: self._cond_sub_p(self._carry(x + y)), a, b
        )

    def _sub_impl(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._nd(
            lambda x, y: self._cond_sub_p(
                self._carry(x - y + self.p_limbs[:, None])
            ),
            a,
            b,
        )

    def _neg_impl(self, a: jnp.ndarray) -> jnp.ndarray:
        def neg2(x):
            z = jnp.zeros_like(x)
            return jnp.where(
                self.is_zero(x)[None, :],
                z,
                self._cond_sub_p(self._carry(self.p_limbs[:, None] - x)),
            )

        return self._nd(neg2, a)

    def _double_impl(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._add_impl(a, a)

    # -- Pallas fast path ---------------------------------------------------
    def _use_pallas(self) -> bool:
        if self._use_pallas_cached is None:
            import os

            flag = os.environ.get("GOSNARK_PALLAS", "auto")
            if flag in ("0", "false"):
                self._use_pallas_cached = False
            elif flag in ("1", "true"):
                self._use_pallas_cached = True
            else:
                try:
                    self._use_pallas_cached = jax.default_backend() in ("tpu", "axon")
                except Exception:
                    self._use_pallas_cached = False
        return self._use_pallas_cached

    def _pallas_mul_tile(self, tile: int):
        if tile not in self._pallas_muls:
            from .pallas_field import make_pallas_mont_mul

            self._pallas_muls[tile] = make_pallas_mont_mul(self.p, tile)
        return self._pallas_muls[tile]

    def _pallas_for(self, n: int):
        """Fused Pallas multiplier for batch n, or None (fallback to the
        XLA scan — bit-identical results either way).

        Pallas blocks are (LIMBS, S, 128) with S >= 8 (sublane rule), so
        tiles are multiples of 1024 lanes; off-tile batches >= 512 are
        padded up (cheaper than the 32-step XLA scan), smaller ones use
        the XLA scan."""
        if n < 512 or not self._use_pallas():
            return None
        tile = 2048 if n >= 2048 else 1024
        pmul = self._pallas_mul_tile(tile)
        pad = (-n) % tile
        if pad == 0:
            return pmul
        return lambda a, b: pmul(
            jnp.pad(a, ((0, 0), (0, pad))), jnp.pad(b, ((0, 0), (0, pad)))
        )[:, :n]

    def _mul_impl(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product  a*b*R^-1 mod p.

        On TPU backends, batches that tile into 128-lane blocks dispatch to
        the fused Pallas kernel (:mod:`.pallas_field`); everything else uses
        the XLA CIOS scan below.  Both produce identical bits."""
        if a.ndim > 2:
            return self._nd(self._mul_impl, a, b)
        pmul = self._pallas_for(a.shape[1])
        if pmul is not None:
            return pmul(a, b)
        return self._mul_xla(a, b)

    def _mul_xla(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product  a*b*R^-1 mod p  — CIOS (coarsely integrated
        operand scanning) with lazy int32 columns.

        One ``lax.scan`` over a's limb rows; per step: accumulate a_i * b,
        compute the Montgomery quotient digit m from the bottom column, add
        m * p, then shift the accumulator down one limb.  Every slice is at a
        static offset (scan-friendly: no dynamic-update-slice copies, tiny
        trace regardless of how many muls a composite graph contains).

        Column bound: a row lives <= 32 steps, gaining <= 255^2 from each MAC
        pair per step -> < 2^23, far inside int32.  After the scan the lazy
        rows represent a value < 2p; one carry pass + conditional subtract
        canonicalises."""
        n = a.shape[1]
        p_col = self.p_limbs[:, None]  # (32, 1)

        def step(acc, a_i):
            acc = acc + a_i[None, :] * b
            t = acc[0]
            m = ((t & MASK) * self.n0) & MASK
            acc = acc + m[None, :] * p_col
            carry = acc[0] >> LIMB_BITS  # bottom column is now 0 mod 256
            acc = jnp.concatenate([acc[1:], jnp.zeros((1, n), jnp.int32)])
            acc = acc.at[0].add(carry)
            return acc, None

        acc, _ = jax.lax.scan(step, jnp.zeros((LIMBS, n), jnp.int32), a)
        return self._cond_sub_p(self._carry(acc))

    def _square_impl(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._mul_impl(a, a)

    def _mul_const_impl(self, a: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """a * k where k is a single element ((32,) or (32,1) limbs)."""
        k = k.reshape((LIMBS,) + (1,) * (a.ndim - 1))
        return self._mul_impl(a, jnp.broadcast_to(k, a.shape))

    # ------------------------------------------------------------------
    # domain conversion / predicates / constants
    # ------------------------------------------------------------------
    def _to_mont_impl(self, x: jnp.ndarray) -> jnp.ndarray:
        r2 = jnp.broadcast_to(self.r2_limbs[:, None], x.shape)
        return self._mul_impl(x, r2)

    def _from_mont_impl(self, x: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(x).at[0].set(1)
        return self._mul_impl(x, one)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=0)

    def equal(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=0)

    def zeros(self, n: int) -> jnp.ndarray:
        return jnp.zeros((LIMBS, n), dtype=jnp.int32)

    def ones_mont(self, n: int) -> jnp.ndarray:
        return jnp.broadcast_to(self.one_mont[:, None], (LIMBS, n)).astype(jnp.int32)

    # ------------------------------------------------------------------
    # inversion (Fermat) — used for batched affine conversion on-device
    # ------------------------------------------------------------------
    def batch_inverse(self, a: jnp.ndarray) -> jnp.ndarray:
        """Tree-structured batched inversion: ~3N Montgomery muls total
        (product tree up, one Fermat inversion of the root, unwind down)
        vs ~380N for per-element Fermat.  Zero inputs invert to zero.
        Used once per proving key to normalise device points to affine."""
        n = a.shape[1]
        zero_mask = self.is_zero(a)
        one = self.ones_mont(n)
        x = jnp.where(zero_mask[None, :], one, a)
        # pad lanes to a power of two with Montgomery ones
        n2 = 1 << (n - 1).bit_length()
        if n2 != n:
            x = jnp.concatenate([x, self.ones_mont(n2 - n)], axis=1)
        levels = []
        cur = x
        while cur.shape[1] > 1:
            h = cur.shape[1] // 2
            pair = cur.reshape(LIMBS, h, 2)
            lo, hi = pair[:, :, 0], pair[:, :, 1]
            levels.append((lo, hi))
            cur = self._mul_impl(lo, hi)
        inv = self._inverse_impl(cur)  # (32, 1) Fermat on the root
        for lo, hi in reversed(levels):
            inv_lo = self._mul_impl(inv, hi)
            inv_hi = self._mul_impl(inv, lo)
            h = inv_lo.shape[1]
            inv = jnp.stack([inv_lo, inv_hi], axis=2).reshape(LIMBS, 2 * h)
        inv = inv[:, :n]
        return jnp.where(zero_mask[None, :], jnp.zeros_like(inv), inv)

    def _inverse_impl(self, a: jnp.ndarray) -> jnp.ndarray:
        """a^(p-2) (Fermat).  Structured as a fori_loop over the exponent's
        bits so the trace stays small (one square + one select-multiply);
        runtime ~2*254 Montgomery muls per batch — use for batched affine
        conversion, not single elements (host inversion wins there)."""
        nbits = int(self._inv_bits.shape[0])

        inv_bits = jnp.asarray(self._inv_bits)

        def body(i, carry):
            acc, base = carry
            bit = inv_bits[i]
            mul_acc = self._mul_impl(acc, base)
            acc = jnp.where(bit != 0, mul_acc, acc)
            base = self._mul_impl(base, base)
            return acc, base

        acc0 = self.ones_mont(a.shape[1])
        acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, a))
        return acc
