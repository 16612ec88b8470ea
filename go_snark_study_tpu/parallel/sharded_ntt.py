"""Four-step (Bailey) NTT sharded over a device mesh.

For domain sizes past one chip's comfortable tile, the size-n transform is
decomposed as an (n1 x n2) matrix algorithm (SURVEY §2.9 row 4: "butterfly
stages exchanged all-to-all"):

  A. distributed transpose (``all_to_all`` over the mesh axis) so original
     columns become local rows,
  B. local batched row-NTTs of length n1,
  C. twiddle scaling by w^(k1*i2) (the table is data-sized, so it is passed
     as a sharded input, never a trace constant),
  D. distributed transpose back,
  E. local batched row-NTTs of length n2.

The output is the standard four-step **permuted order**: lane (k1, k2) holds
X[k2*n1 + k1].  ``inverse`` runs the exact mirrored steps (E^-1 .. A^-1 with
inverse roots and one 1/n scale), so forward -> pointwise -> inverse is an
identity and the permutation never needs materialising; ``permutation()``
exposes it for host-side checks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.limbs import LIMBS
from ..ops.ntt import NTTEngine

__all__ = ["FourStepNTT"]


class FourStepNTT:
    """Sharded NTT over Fr.

    On a 1-D mesh the transposes ride the single "data" axis; on the 2-D
    ("host", "data") hierarchy the collective axis is the flattened tuple,
    so each ``all_to_all`` exchanges within hosts over ICI and across hosts
    over DCN in one collective."""

    def __init__(self, mesh: Mesh, engine: Optional[NTTEngine] = None):
        self.mesh = mesh
        names = tuple(mesh.axis_names)
        self.axis = names if len(names) > 1 else names[0]
        self.eng = engine or NTTEngine()
        self.K = self.eng.K
        self._jits = {}
        self._tw_cache = {}

    # ------------------------------------------------------------------
    def split(self, n: int) -> Tuple[int, int]:
        k = n.bit_length() - 1
        n1 = 1 << (k // 2)
        n2 = n // n1
        d = self.mesh.devices.size
        assert n1 % d == 0 and n2 % d == 0, (
            f"four-step NTT needs device count {d} to divide both factors "
            f"({n1}, {n2}) of n={n}"
        )
        return n1, n2

    def _twiddle_table(self, n: int, inverse: bool) -> np.ndarray:
        """(32, n2, n1) limb table, T[i2, k1] = w^(+-k1*i2), matching the
        step-C local layout (rows = i2, cols = k1)."""
        key = (n, inverse)
        if key not in self._tw_cache:
            n1, n2 = self.split(n)
            w = self.eng.root_of_unity(n)
            if inverse:
                w = pow(w, -1, self.K.p)
            r = self.K.p
            vals = []
            for i2 in range(n2):
                acc = 1
                step = pow(w, i2, r)
                for _ in range(n1):
                    vals.append(acc)
                    acc = acc * step % r
            self._tw_cache[key] = self.K.pack_np(vals).reshape(LIMBS, n2, n1)
        return self._tw_cache[key]

    # ------------------------------------------------------------------
    def _build(self, n: int, inverse: bool):
        key = (n, inverse)
        if key in self._jits:
            return self._jits[key]
        n1, n2 = self.split(n)
        d = self.mesh.devices.size
        axis = self.axis
        eng, K = self.eng, self.K

        def a2a_transpose(x):
            """local block (32, R/d, C) of a global (R, C) matrix ->
            (32, C/d, R) block of the transposed matrix."""
            y = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)
            return jnp.swapaxes(y, 1, 2)

        def row_ntt(x, length, rows, inv):
            flat = x.reshape(LIMBS, rows * length)
            return eng._transform_batched(flat, length, rows, inv).reshape(
                LIMBS, rows, length
            )

        def tw_mul(x, tw):
            return K._mul_impl(
                x.reshape(LIMBS, -1), tw.reshape(LIMBS, -1)
            ).reshape(x.shape)

        if not inverse:

            def body(x, tw):
                # x: (32, n1/d, n2) natural rows
                x = a2a_transpose(x)  # (32, n2/d, n1)
                x = row_ntt(x, n1, n2 // d, False)  # B
                x = tw_mul(x, tw)  # C
                x = a2a_transpose(x)  # (32, n1/d, n2)
                x = row_ntt(x, n2, n1 // d, False)  # E
                return x

        else:
            ninv = self.K.pack_np([pow(n, -1, self.K.p)])

            def body(y, tw):
                # y: (32, n1/d, n2) permuted evals out[k1, k2]
                y = row_ntt(y, n2, n1 // d, True)  # E^-1 (unscaled)
                y = a2a_transpose(y)  # (32, n2/d, n1)
                y = tw_mul(y, tw)  # C^-1 (inverse table)
                y = row_ntt(y, n1, n2 // d, True)  # B^-1 (unscaled)
                y = a2a_transpose(y)  # (32, n1/d, n2)
                y = K._mul_const_impl(
                    y.reshape(LIMBS, -1), jnp.asarray(ninv)
                ).reshape(y.shape)
                return y

        fn = jax.jit(
            shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(None, axis, None), P(None, axis, None)),
                out_specs=P(None, axis, None),
                check_vma=False,
            )
        )
        self._jits[key] = fn
        return fn

    # ------------------------------------------------------------------
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (32, n) natural-order coefficients -> permuted evaluations
        (lane k1*n2+k2 holds X[k2*n1+k1])."""
        n = x.shape[1]
        n1, n2 = self.split(n)
        tw = jnp.asarray(self._twiddle_table(n, False))
        out = self._build(n, False)(x.reshape(LIMBS, n1, n2), tw)
        return out.reshape(LIMBS, n)

    def inverse(self, y: jnp.ndarray) -> jnp.ndarray:
        """Exact inverse of ``forward`` (permutation included)."""
        n = y.shape[1]
        n1, n2 = self.split(n)
        tw = jnp.asarray(self._twiddle_table(n, True))
        out = self._build(n, True)(y.reshape(LIMBS, n1, n2), tw)
        return out.reshape(LIMBS, n)

    def permutation(self, n: int) -> np.ndarray:
        """perm[j] = natural-order index held by output lane j."""
        n1, n2 = self.split(n)
        lanes = np.arange(n)
        k1, k2 = lanes // n2, lanes % n2
        return k2 * n1 + k1
