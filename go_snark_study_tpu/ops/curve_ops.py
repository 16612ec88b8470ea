"""Batched, branchless Jacobian point arithmetic on TPU.

The TPU replacement for the reference's per-point, branchy group law
(bn128/g1.go:32-155, g2.go:32-181; SURVEY §2.9 row 1).  Same EFD formulas
(add-2007-bl / dbl-2009-l) but vectorised over N points with all control flow
turned into lane masks (``jnp.where``), because a warp... a *vector* of 128
lanes can't branch per point:

  * identity handling: Z == 0 selects the other operand;
  * equal-point handling: the affine-equal case (h == 0, s1 == s2) routes to
    the doubling result — the serial reference never hits this case in its
    double-and-add loop, but Pippenger bucket accumulation does;
  * inverse-point case (h == 0, s1 != s2) yields the identity.

Field elements are (32, N) Montgomery limb arrays (:mod:`.limbs`); G2 runs
the identical formulas over a batched Fq2 adapter (Karatsuba mul, beta = -1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .limbs import FieldKernels

__all__ = [
    "BatchFq",
    "BatchFq2",
    "jacobian_add",
    "jacobian_add_mixed",
    "jacobian_add_incomplete",
    "jacobian_add_mixed_incomplete",
    "jacobian_double",
    "G1Batch",
    "G2Batch",
]


class BatchFq:
    """Adapter presenting FieldKernels as the generic field interface the
    Jacobian formulas consume.  Elements: (32, N) int32 arrays."""

    def __init__(self, K: FieldKernels):
        self.K = K

    def add(self, a, b):
        return self.K._add_impl(a, b)

    def sub(self, a, b):
        return self.K._sub_impl(a, b)

    def mul(self, a, b):
        return self.K._mul_impl(a, b)

    def square(self, a):
        return self.K._mul_impl(a, a)

    def double(self, a):
        return self.K._add_impl(a, a)

    def is_zero(self, a):
        return self.K.is_zero(a)

    def equal(self, a, b):
        return self.K.equal(a, b)

    def select(self, mask, a, b):
        """mask: (N,) bool; picks a where true."""
        return jnp.where(mask[None, :], a, b)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def neg(self, a):
        return self.K._neg_impl(a)

    def inverse(self, a):
        """Batched tree inversion (zero -> zero)."""
        return self.K.batch_inverse(a)

    def one(self, n: int):
        return self.K.ones_mont(n)


class BatchFq2:
    """Batched Fq2 with beta = -1 (BN128's non-residue: bn128.go:86).
    Elements: pairs (c0, c1) of (32, N) arrays."""

    def __init__(self, K: FieldKernels):
        self.K = K

    def add(self, a, b):
        return (self.K._add_impl(a[0], b[0]), self.K._add_impl(a[1], b[1]))

    def sub(self, a, b):
        return (self.K._sub_impl(a[0], b[0]), self.K._sub_impl(a[1], b[1]))

    def mul(self, a, b):
        K = self.K
        v0 = K._mul_impl(a[0], b[0])
        v1 = K._mul_impl(a[1], b[1])
        t = K._mul_impl(K._add_impl(a[0], a[1]), K._add_impl(b[0], b[1]))
        return (
            K._sub_impl(v0, v1),  # beta = -1
            K._sub_impl(t, K._add_impl(v0, v1)),
        )

    def square(self, a):
        # complex squaring for beta=-1: (a0^2 - a1^2, 2 a0 a1)
        K = self.K
        t = K._mul_impl(K._add_impl(a[0], a[1]), K._sub_impl(a[0], a[1]))
        m = K._mul_impl(a[0], a[1])
        return (t, K._add_impl(m, m))

    def double(self, a):
        return (self.K._add_impl(a[0], a[0]), self.K._add_impl(a[1], a[1]))

    def is_zero(self, a):
        return jnp.logical_and(self.K.is_zero(a[0]), self.K.is_zero(a[1]))

    def equal(self, a, b):
        return jnp.logical_and(self.K.equal(a[0], b[0]), self.K.equal(a[1], b[1]))

    def select(self, mask, a, b):
        m = mask[None, :]
        return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))

    def zeros_like(self, a):
        return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))

    def neg(self, a):
        return (self.K._neg_impl(a[0]), self.K._neg_impl(a[1]))

    def inverse(self, a):
        """(a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2 + a1^2) for beta = -1
        (eprint 2010/354 alg 8, batched; zero -> zero)."""
        K = self.K
        norm = K._add_impl(K._mul_impl(a[0], a[0]), K._mul_impl(a[1], a[1]))
        ninv = K.batch_inverse(norm)
        return (K._mul_impl(a[0], ninv), K._neg_impl(K._mul_impl(a[1], ninv)))

    def one(self, n: int):
        return (self.K.ones_mont(n), self.K.zeros(n))


def jacobian_double(F, p):
    """dbl-2009-l, branchless (identity doubles to identity for free since
    Z=0 gives Z3 = 2*Y*Z = 0)."""
    x, y, z = p
    a = F.square(x)
    b = F.square(y)
    c = F.square(b)
    t = F.square(F.add(x, b))
    d = F.double(F.sub(F.sub(t, a), c))
    e = F.add(F.double(a), a)
    f = F.square(e)
    x3 = F.sub(f, F.double(d))
    c8 = F.double(F.double(F.double(c)))
    y3 = F.sub(F.mul(e, F.sub(d, x3)), c8)
    z3 = F.double(F.mul(y, z))
    return (x3, y3, z3)


def jacobian_add(F, p1, p2):
    """add-2007-bl with full case analysis via masks."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    p1_zero = F.is_zero(z1)
    p2_zero = F.is_zero(z2)

    z1z1 = F.square(z1)
    z2z2 = F.square(z2)
    u1 = F.mul(x1, z2z2)
    u2 = F.mul(x2, z1z1)
    s1 = F.mul(y1, F.mul(z2, z2z2))
    s2 = F.mul(y2, F.mul(z1, z1z1))
    h = F.sub(u2, u1)
    r_ = F.double(F.sub(s2, s1))

    h_zero = F.is_zero(h)
    r_zero = F.is_zero(r_)

    i = F.square(F.double(h))
    j = F.mul(h, i)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.square(r_), j), F.double(v))
    y3 = F.sub(F.mul(r_, F.sub(v, x3)), F.double(F.mul(s1, j)))
    z3 = F.mul(F.sub(F.sub(F.square(F.add(z1, z2)), z1z1), z2z2), h)
    added = (x3, y3, z3)

    doubled = jacobian_double(F, p1)

    # case selection (order matters: identity cases first)
    same_x_same_y = jnp.logical_and(h_zero, r_zero)
    same_x_diff_y = jnp.logical_and(h_zero, jnp.logical_not(r_zero))

    sel = lambda m, a, b: tuple(F.select(m, ca, cb) for ca, cb in zip(a, b))
    zero_pt = tuple(F.zeros_like(c) for c in added)

    out = sel(same_x_same_y, doubled, added)  # p1 == p2 -> double
    out = sel(same_x_diff_y, zero_pt, out)  # p1 == -p2 -> infinity
    out = sel(p2_zero, p1, out)
    out = sel(p1_zero, p2, out)
    return out


def jacobian_add_mixed(F, p1, p2):
    """madd-2007-bl: p1 Jacobian + p2 AFFINE (z2 must be the field one for
    live points, zero for identity padding).  7M+4S vs the full add's 11M+5S
    — the workhorse of the MSM accumulation phase, where the incoming stream
    is the affine-normalised point table (reference work replaced:
    snark.go:265-286 / groth16.go:243-275 inner loops)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    p1_zero = F.is_zero(z1)
    p2_zero = F.is_zero(z2)

    z1z1 = F.square(z1)
    u2 = F.mul(x2, z1z1)
    s2 = F.mul(y2, F.mul(z1, z1z1))
    h = F.sub(u2, x1)
    r_ = F.double(F.sub(s2, y1))
    h_zero = F.is_zero(h)
    r_zero = F.is_zero(r_)

    hh = F.square(h)
    i = F.double(F.double(hh))
    j = F.mul(h, i)
    v = F.mul(x1, i)
    x3 = F.sub(F.sub(F.square(r_), j), F.double(v))
    y3 = F.sub(F.mul(r_, F.sub(v, x3)), F.double(F.mul(y1, j)))
    z3 = F.sub(F.sub(F.square(F.add(z1, h)), z1z1), hh)
    added = (x3, y3, z3)

    doubled = jacobian_double(F, p1)

    same_x_same_y = jnp.logical_and(h_zero, r_zero)
    same_x_diff_y = jnp.logical_and(h_zero, jnp.logical_not(r_zero))

    sel = lambda m, a, b: tuple(F.select(m, ca, cb) for ca, cb in zip(a, b))
    zero_pt = tuple(F.zeros_like(c) for c in added)

    out = sel(same_x_same_y, doubled, added)
    out = sel(same_x_diff_y, zero_pt, out)
    out = sel(p2_zero, p1, out)
    out = sel(p1_zero, p2, out)
    return out


def jacobian_add_incomplete(F, p1, p2):
    """add-2007-bl WITHOUT the doubling branch: 11M+5S instead of the
    complete form's ~24 muls (add + shadow double).  Returns
    ``(point, bad)`` where ``bad`` marks lanes that hit the degenerate
    case h == 0 with both operands live (equal or inverse points) — there
    the emitted point is the identity, which is WRONG, so callers must OR
    the (suitably masked) flags and re-run through the complete formulas
    when any fires.  For MSM bucket accumulation over honest inputs the
    degenerate case has cryptographically negligible probability; the flag
    plus fallback makes the pipeline exactly correct anyway (adversarial
    or duplicate-point inputs included).  Identity operands are still
    handled branchlessly (selects, no extra muls)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    p1_zero = F.is_zero(z1)
    p2_zero = F.is_zero(z2)

    z1z1 = F.square(z1)
    z2z2 = F.square(z2)
    u1 = F.mul(x1, z2z2)
    u2 = F.mul(x2, z1z1)
    s1 = F.mul(y1, F.mul(z2, z2z2))
    s2 = F.mul(y2, F.mul(z1, z1z1))
    h = F.sub(u2, u1)
    r_ = F.double(F.sub(s2, s1))
    h_zero = F.is_zero(h)

    i = F.square(F.double(h))
    j = F.mul(h, i)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.square(r_), j), F.double(v))
    y3 = F.sub(F.mul(r_, F.sub(v, x3)), F.double(F.mul(s1, j)))
    z3 = F.mul(F.sub(F.sub(F.square(F.add(z1, z2)), z1z1), z2z2), h)

    sel = lambda m, a, b: tuple(F.select(m, ca, cb) for ca, cb in zip(a, b))
    out = sel(p2_zero, p1, (x3, y3, z3))
    out = sel(p1_zero, p2, out)
    live = jnp.logical_not(jnp.logical_or(p1_zero, p2_zero))
    return out, jnp.logical_and(h_zero, live)


def jacobian_add_mixed_incomplete(F, p1, p2):
    """madd-2007-bl without the doubling branch: 7M+4S (vs ~19 muls
    complete).  Same flag contract as :func:`jacobian_add_incomplete`."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    p1_zero = F.is_zero(z1)
    p2_zero = F.is_zero(z2)

    z1z1 = F.square(z1)
    u2 = F.mul(x2, z1z1)
    s2 = F.mul(y2, F.mul(z1, z1z1))
    h = F.sub(u2, x1)
    r_ = F.double(F.sub(s2, y1))
    h_zero = F.is_zero(h)

    hh = F.square(h)
    i = F.double(F.double(hh))
    j = F.mul(h, i)
    v = F.mul(x1, i)
    x3 = F.sub(F.sub(F.square(r_), j), F.double(v))
    y3 = F.sub(F.mul(r_, F.sub(v, x3)), F.double(F.mul(y1, j)))
    z3 = F.sub(F.sub(F.square(F.add(z1, h)), z1z1), hh)

    sel = lambda m, a, b: tuple(F.select(m, ca, cb) for ca, cb in zip(a, b))
    out = sel(p2_zero, p1, (x3, y3, z3))
    out = sel(p1_zero, p2, out)
    live = jnp.logical_not(jnp.logical_or(p1_zero, p2_zero))
    return out, jnp.logical_and(h_zero, live)


class _BatchGroup:
    def __init__(self, F, K: FieldKernels, coord_arity: int):
        self.F = F
        self.K = K
        self._arity = coord_arity
        self._fused = None
        self.add = jax.jit(lambda p1, p2: jacobian_add(self.F, p1, p2))
        self.double = jax.jit(lambda p: jacobian_double(self.F, p))
        self.to_affine = jax.jit(self._to_affine_impl)
        self._affine_tile_jit = jax.jit(self._to_affine_impl)

    # -- fused Pallas whole-point ops (TPU; XLA formula fallback) -------
    def _fused_ops(self):
        if self._fused is None:
            self._fused = {}
            if self.K._use_pallas():
                from .pallas_curve import make_pallas_point_op

                self._fused["madd"] = make_pallas_point_op(
                    self.K.p, jacobian_add_mixed, arity=self._arity
                )
                self._fused["jadd"] = make_pallas_point_op(
                    self.K.p, jacobian_add, arity=self._arity
                )
                self._fused["madd_f"] = make_pallas_point_op(
                    self.K.p,
                    jacobian_add_mixed_incomplete,
                    arity=self._arity,
                    flagged=True,
                )
                self._fused["jadd_f"] = make_pallas_point_op(
                    self.K.p,
                    jacobian_add_incomplete,
                    arity=self._arity,
                    flagged=True,
                )
        return self._fused

    def _dispatch(self, kind: str, formula, p1, p2):
        fused = self._fused_ops().get(kind)
        leaves = jax.tree.leaves(p1)
        shape = leaves[0].shape
        lanes = 1
        for d in shape[1:]:
            lanes *= d
        if fused is None or lanes < 256:
            return formula(self.F, p1, p2)
        pad = (-lanes) % 1024

        def prep(c):
            c = c.reshape(c.shape[0], lanes)
            if pad:
                c = jnp.pad(c, ((0, 0), (0, pad)))  # zero lanes = identities
            return c

        out = fused(
            tuple(prep(c) for c in jax.tree.leaves(p1)),
            tuple(prep(c) for c in jax.tree.leaves(p2)),
        )
        return jax.tree.unflatten(
            jax.tree.structure(p1),
            [c[:, :lanes].reshape(shape) for c in out],
        )

    def madd(self, p1, p2):
        """Mixed add p1 (Jacobian) + p2 (affine, z in {0, 1}) — fused on TPU."""
        return self._dispatch("madd", jacobian_add_mixed, p1, p2)

    def jadd(self, p1, p2):
        """Full Jacobian add — fused on TPU."""
        return self._dispatch("jadd", jacobian_add, p1, p2)

    def _dispatch_flagged(self, kind: str, formula, p1, p2):
        """Like :meth:`_dispatch` but for incomplete formulas returning
        ``(point, bad_mask)``; the fused kernel emits the mask as an extra
        int32 plane.  Zero pad lanes are identities -> never flagged."""
        fused = self._fused_ops().get(kind)
        leaves = jax.tree.leaves(p1)
        shape = leaves[0].shape
        lanes = 1
        for d in shape[1:]:
            lanes *= d
        if fused is None or lanes < 256:
            return formula(self.F, p1, p2)
        pad = (-lanes) % 1024

        def prep(c):
            c = c.reshape(c.shape[0], lanes)
            if pad:
                c = jnp.pad(c, ((0, 0), (0, pad)))
            return c

        out, bad = fused(
            tuple(prep(c) for c in jax.tree.leaves(p1)),
            tuple(prep(c) for c in jax.tree.leaves(p2)),
        )
        pt = jax.tree.unflatten(
            jax.tree.structure(p1),
            [c[:, :lanes].reshape(shape) for c in out],
        )
        return pt, bad[:lanes].reshape(shape[1:]) != 0

    def madd_flagged(self, p1, p2):
        """Incomplete mixed add: ``(p1 + p2, degenerate_mask)``."""
        return self._dispatch_flagged(
            "madd_f", jacobian_add_mixed_incomplete, p1, p2
        )

    def jadd_flagged(self, p1, p2):
        """Incomplete full Jacobian add: ``(p1 + p2, degenerate_mask)``."""
        return self._dispatch_flagged(
            "jadd_f", jacobian_add_incomplete, p1, p2
        )

    def neg_y_where(self, p, mask):
        """Conditionally negate points laneswise: where ``mask`` is true the
        point's y coordinate is replaced by -y (identity lanes stay identity
        since -0 = 0).  Used by the signed-digit MSM to fold the digit sign
        into the accumulated point."""
        x, y, z = p
        return (x, self.F.select(mask, self.F.neg(y), y), z)

    def is_zero(self, p):
        return self.F.is_zero(p[2])

    def _to_affine_impl(self, p):
        """Jacobian -> affine (x/z^2, y/z^3, 1) batched; identities map to
        (0, 0, 0).  ~7 muls/point via the tree batch inversion — run once per
        proving key so every MSM accumulation add is the cheap mixed add."""
        F = self.F
        x, y, z = p
        is_id = F.is_zero(z)
        zinv = F.inverse(z)
        zi2 = F.square(zinv)
        zi3 = F.mul(zi2, zinv)
        ax = F.mul(x, zi2)
        ay = F.mul(y, zi3)
        one = self.one_coord(z)
        zero = F.zeros_like(z)
        nz = jnp.logical_not(is_id)
        return (
            F.select(nz, ax, zero),
            F.select(nz, ay, zero),
            F.select(nz, one, zero),
        )

    def to_affine_tiled(self, p, tile: int | None = None):
        """Jacobian -> affine in fixed ``tile``-lane slices: one compiled
        executable serves every lane count (identity-padded lanes map to
        (0, 0, 0) and are sliced off).  Use for proving-key normalisation,
        where lane counts vary per circuit but compiles through the remote
        backend are the dominant cost."""
        if tile is None:
            from .fixed_base import default_tile

            tile = default_tile()
        leaves = jax.tree.leaves(p)
        n = leaves[0].shape[-1]
        if n < tile <= 1024:
            # CPU-sized tiles: small inputs quantize to the next power of two
            # (bounded shape set, compiles are cheap there) instead of paying
            # tile-width execution.  TPU-sized tiles (8192) are NOT quantized:
            # reusing the one hot compiled tile beats a fresh remote compile.
            tile = max(128, 1 << (n - 1).bit_length())
        if n == tile:
            return self._affine_tile_jit(p)
        pad = (-n) % tile

        def prep(c):
            return jnp.pad(c, ((0, 0),) * (c.ndim - 1) + ((0, pad),)) if pad else c

        pp = jax.tree.map(prep, p)
        parts = [
            self._affine_tile_jit(
                jax.tree.map(
                    lambda c: jax.lax.dynamic_slice_in_dim(c, i, tile, c.ndim - 1),
                    pp,
                )
            )
            for i in range(0, n + pad, tile)
        ]
        out = (
            parts[0]
            if len(parts) == 1
            else jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=-1), *parts)
        )
        return jax.tree.map(lambda c: c[..., :n], out) if pad else out

    def one_coord(self, like):
        """Field one broadcast to the lane count of ``like``."""
        n = like.shape[1] if not isinstance(like, tuple) else like[0].shape[1]
        return self.F.one(n)


class G1Batch(_BatchGroup):
    """Batched G1.  Host bridge: points are reference-style Jacobian int
    triples (curve.py); device layout is ((32,N),)*3 Montgomery limbs."""

    def __init__(self, K: FieldKernels):
        super().__init__(BatchFq(K), K, 1)

    def pack(self, points):
        xs = [p[0] for p in points]
        ys = [p[1] for p in points]
        zs = [p[2] for p in points]
        return (self.K.pack(xs), self.K.pack(ys), self.K.pack(zs))

    def unpack(self, p):
        xs = self.K.unpack(p[0])
        ys = self.K.unpack(p[1])
        zs = self.K.unpack(p[2])
        return list(zip(xs, ys, zs))

    def zeros(self, n: int):
        z = self.K.zeros(n)
        return (z, z, z)


class G2Batch(_BatchGroup):
    """Batched G2 over Fq2.  Device layout: 3 coords x 2 components."""

    def __init__(self, K: FieldKernels):
        super().__init__(BatchFq2(K), K, 2)

    def pack(self, points):
        def comp(ci, cj):
            return self.K.pack([p[ci][cj] for p in points])

        return (
            (comp(0, 0), comp(0, 1)),
            (comp(1, 0), comp(1, 1)),
            (comp(2, 0), comp(2, 1)),
        )

    def unpack(self, p):
        c = [[self.K.unpack(p[i][j]) for j in range(2)] for i in range(3)]
        n = len(c[0][0])
        return [
            ((c[0][0][k], c[0][1][k]), (c[1][0][k], c[1][1][k]), (c[2][0][k], c[2][1][k]))
            for k in range(n)
        ]

    def zeros(self, n: int):
        z = self.K.zeros(n)
        return ((z, z), (z, z), (z, z))
