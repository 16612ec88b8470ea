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


def _point_kernel(*refs, formula, p_rows, n0: int, arity: int):
    """refs = 3*arity input coord refs for p1, 3*arity for p2, 3*arity
    outputs; each (LIMBS, S, 128)."""
    F = _RowField(p_rows, n0)
    nin = 3 * arity

    def val(ref):
        return [ref[j] for j in range(LIMBS)]

    p1 = tuple(val(refs[k]) for k in range(nin))
    p2 = tuple(val(refs[nin + k]) for k in range(nin))
    out = formula(F, p1, p2)
    for k in range(nin):
        refs[2 * nin + k][:] = jnp.stack(out[k])


def make_pallas_point_op(p: int, formula, tile: int = TILE):
    """Build a fused point-op ``f(p1, p2) -> p3`` over Fq coordinate pytrees
    with leaves (32, N), N a multiple of ``tile``.  ``formula`` is one of the
    curve_ops group-law functions taking (F, p1, p2)."""
    assert tile % 128 == 0
    S = tile // 128
    p_limbs = np.frombuffer(int(p).to_bytes(LIMBS, "little"), dtype=np.uint8)
    kernel = functools.partial(
        _point_kernel,
        formula=formula,
        p_rows=tuple(int(x) for x in p_limbs),
        n0=int((-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)),
        arity=1,
    )
    spec = pl.BlockSpec((LIMBS, S, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    n_muls = 16 if formula.__name__ == "jacobian_add" else 14  # incl. double

    def op(p1, p2):
        n = p1[0].shape[1]
        assert n % tile == 0, f"batch {n} not a multiple of tile {tile}"
        shape3 = (LIMBS, n // 128, 128)
        args = [c.reshape(shape3) for c in (*p1, *p2)]
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[spec] * 6,
            out_specs=[spec] * 3,
            out_shape=[jax.ShapeDtypeStruct(shape3, jnp.int32)] * 3,
            cost_estimate=pl.CostEstimate(
                flops=4300 * n_muls * n,
                bytes_accessed=9 * LIMBS * 4 * n,
                transcendentals=0,
            ),
        )(*args)
        return tuple(o.reshape(LIMBS, n) for o in outs)

    return op
