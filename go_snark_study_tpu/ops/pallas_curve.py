"""Fused Pallas TPU kernels for whole Jacobian point operations over Fq.

A point add is ~11-16 Montgomery muls plus ~10 add/sub passes.  Issued as
separate XLA ops (the :mod:`.curve_ops` path), each op costs a kernel
dispatch and an HBM round-trip of its (32, N) operands — measured ~50 us of
fixed overhead per op on v5e, which dominates the MSM's serial accumulation
steps.  These kernels run the ENTIRE group law in one ``pallas_call``: all
intermediates live in VMEM/vector registers, HBM traffic drops to the 6-9
coordinate arrays in/out, and the dispatch overhead is paid once per point
op instead of ~21 times.

The group-law formulas are THE SAME functions as the XLA path
(:func:`..ops.curve_ops.jacobian_add_mixed` / ``jacobian_add``) — they are
re-traced inside the kernel over a row-list field adapter, so the Pallas and
XLA paths cannot diverge.  Results are bit-identical.

Field values inside the kernel are python lists of 32 (S, 128) int32 rows
(limb index unrolled at trace time), exactly like :mod:`.pallas_field`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMBS, LIMB_BITS, MASK

__all__ = ["make_pallas_point_op"]

SUBLANES = 8  # (8, 128) = one vector register per row; keeps VMEM ~2 MB
TILE = SUBLANES * 128


class _RowField:
    """The curve_ops field interface over list-of-(S,128)-rows values,
    traced inside a Pallas kernel.  All ops produce canonical (< p) limbs."""

    def __init__(self, p_rows, n0: int):
        self.p_rows = p_rows  # tuple of 32 python ints
        self.n0 = n0

    # -- normalisation ------------------------------------------------
    def _carry(self, rows):
        c = jnp.zeros_like(rows[0])
        out = []
        for i in range(LIMBS):
            v = rows[i] + c
            out.append(v & MASK)
            c = v >> LIMB_BITS
        return out

    def _cond_sub_p(self, rows):
        c = jnp.zeros_like(rows[0])
        sub = []
        for i in range(LIMBS):
            v = rows[i] - self.p_rows[i] + c
            sub.append(v & MASK)
            c = v >> LIMB_BITS
        ge = c == 0  # no final borrow => rows >= p
        return [jnp.where(ge, s, r) for s, r in zip(sub, rows)]

    # -- arithmetic ----------------------------------------------------
    def add(self, a, b):
        return self._cond_sub_p(self._carry([x + y for x, y in zip(a, b)]))

    def sub(self, a, b):
        return self._cond_sub_p(
            self._carry([x - y + p for x, y, p in zip(a, b, self.p_rows)])
        )

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """CIOS Montgomery product, rows-resident (same recurrence as
        pallas_field._mont_mul_kernel)."""
        zero = jnp.zeros_like(a[0])
        acc = [zero] * LIMBS
        for i in range(LIMBS):
            a_i = a[i]
            t = acc[0] + a_i * b[0]
            m = ((t & MASK) * self.n0) & MASK
            carry = (t + m * self.p_rows[0]) >> LIMB_BITS
            nacc = [zero] * LIMBS
            for j in range(1, LIMBS):
                nacc[j - 1] = acc[j] + a_i * b[j] + m * self.p_rows[j]
            nacc[0] = nacc[0] + carry
            acc = nacc
        return self._cond_sub_p(self._carry(acc))

    def square(self, a):
        return self.mul(a, a)

    # -- predicates / selection ----------------------------------------
    def is_zero(self, a):
        m = a[0] == 0
        for r in a[1:]:
            m = jnp.logical_and(m, r == 0)
        return m

    def equal(self, a, b):
        m = a[0] == b[0]
        for x, y in zip(a[1:], b[1:]):
            m = jnp.logical_and(m, x == y)
        return m

    def select(self, mask, a, b):
        return [jnp.where(mask, x, y) for x, y in zip(a, b)]

    def zeros_like(self, a):
        z = jnp.zeros_like(a[0])
        return [z] * LIMBS


class _RowField2:
    """Fq2 over _RowField with beta = -1 (bn128.go:86), Karatsuba mul —
    the in-kernel twin of curve_ops.BatchFq2.  Values: (c0, c1) row-lists."""

    def __init__(self, base: _RowField):
        self.b = base

    def add(self, a, b):
        return (self.b.add(a[0], b[0]), self.b.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.b.sub(a[0], b[0]), self.b.sub(a[1], b[1]))

    def mul(self, a, b):
        F = self.b
        v0 = F.mul(a[0], b[0])
        v1 = F.mul(a[1], b[1])
        t = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        return (F.sub(v0, v1), F.sub(t, F.add(v0, v1)))

    def square(self, a):
        F = self.b
        t = F.mul(F.add(a[0], a[1]), F.sub(a[0], a[1]))
        m = F.mul(a[0], a[1])
        return (t, F.add(m, m))

    def double(self, a):
        return (self.b.add(a[0], a[0]), self.b.add(a[1], a[1]))

    def is_zero(self, a):
        return jnp.logical_and(self.b.is_zero(a[0]), self.b.is_zero(a[1]))

    def equal(self, a, b):
        return jnp.logical_and(self.b.equal(a[0], b[0]), self.b.equal(a[1], b[1]))

    def select(self, mask, a, b):
        return (self.b.select(mask, a[0], b[0]), self.b.select(mask, a[1], b[1]))

    def zeros_like(self, a):
        return (self.b.zeros_like(a[0]), self.b.zeros_like(a[1]))


def _point_kernel(*refs, formula, p_rows, n0: int, arity: int, flagged: bool):
    """refs = 3*arity input coord refs for p1, 3*arity for p2, 3*arity
    outputs (+ one (S, 128) int32 flag output when ``flagged``); coord refs
    are (LIMBS, S, 128)."""
    base = _RowField(p_rows, n0)
    F = base if arity == 1 else _RowField2(base)
    nin = 3 * arity

    def val(ref):
        return [ref[j] for j in range(LIMBS)]

    if arity == 1:
        p1 = tuple(val(refs[k]) for k in range(nin))
        p2 = tuple(val(refs[nin + k]) for k in range(nin))
        out = formula(F, p1, p2)
        if flagged:
            out, bad = out
        flat_out = out
    else:
        group = lambda off: tuple(
            (val(refs[off + 2 * c]), val(refs[off + 2 * c + 1])) for c in range(3)
        )
        p1, p2 = group(0), group(nin)
        out = formula(F, p1, p2)
        if flagged:
            out, bad = out
        flat_out = tuple(comp for coord in out for comp in coord)
    for k in range(nin):
        refs[2 * nin + k][:] = jnp.stack(flat_out[k])
    if flagged:
        refs[2 * nin + nin][:] = bad.astype(jnp.int32)


_FORMULA_MULS = {
    "jacobian_add": 16 + 8,  # complete forms also trace the shadow double
    "jacobian_add_mixed": 11 + 8,
    "jacobian_add_incomplete": 16,
    "jacobian_add_mixed_incomplete": 11,
}


def make_pallas_point_op(
    p: int, formula, arity: int = 1, tile: int = TILE, flagged: bool = False
):
    """Build a fused point-op ``f(p1, p2) -> p3`` over coordinate pytrees
    with leaves (32, N), N a multiple of ``tile``.  ``formula`` is one of the
    curve_ops group-law functions taking (F, p1, p2); ``arity`` is the field
    extension degree of the coordinates (1 = G1/Fq, 2 = G2/Fq2).  With
    ``flagged``, the formula returns ``(point, bad_mask)`` (the incomplete
    variants) and the op returns ``(coords_tuple, bad)`` with bad int32
    (N,)."""
    assert tile % 128 == 0
    S = tile // 128
    p_limbs = np.frombuffer(int(p).to_bytes(LIMBS, "little"), dtype=np.uint8)
    kernel = functools.partial(
        _point_kernel,
        formula=formula,
        p_rows=tuple(int(x) for x in p_limbs),
        n0=int((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)),
        arity=arity,
        flagged=flagged,
    )
    spec = pl.BlockSpec((LIMBS, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((S, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_muls = _FORMULA_MULS.get(formula.__name__, 24) * (3 if arity == 2 else 1)
    nin = 3 * arity

    def op(p1, p2):
        leaves1 = jax.tree.leaves(p1)
        leaves2 = jax.tree.leaves(p2)
        n = leaves1[0].shape[1]
        assert n % tile == 0, f"batch {n} not a multiple of tile {tile}"
        shape3 = (LIMBS, n // 128, 128)
        args = [c.reshape(shape3) for c in (*leaves1, *leaves2)]
        out_specs = [spec] * nin
        out_shape = [jax.ShapeDtypeStruct(shape3, jnp.int32)] * nin
        if flagged:
            out_specs = out_specs + [flag_spec]
            out_shape = out_shape + [
                jax.ShapeDtypeStruct((n // 128, 128), jnp.int32)
            ]
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[spec] * (2 * nin),
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=4300 * n_muls * n,
                bytes_accessed=3 * nin * LIMBS * 4 * n,
                transcendentals=0,
            ),
        )(*args)
        coords = tuple(o.reshape(LIMBS, n) for o in outs[:nin])
        if flagged:
            return coords, outs[nin].reshape(n)
        return coords

    return op
