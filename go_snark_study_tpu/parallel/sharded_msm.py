"""Data-parallel Pippenger MSM over a device mesh.

Points and scalar limbs are sharded along the batch axis; every device runs
the full local bucket pipeline (affine normalise + sort + run accumulation +
parallel bucket reduction) on its shard, producing per-shard window sums.
Window sums are *points*, so the cross-device combine is an ``all_gather``
over the mesh axis followed by a tree of batched Jacobian adds — point
addition is not a hardware reduction, which is why this is not a bare
``psum`` (SURVEY §2.9 row 2 maps the reference's serial MSM loops here).

Communication volume per device: 3 coords x 32 limbs x W windows x 4 B ~
10 KB — negligible against the local compute, so scaling is embarrassingly
parallel until the bucket-reduction tail dominates.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.curve_ops import jacobian_add
from ..ops.msm import MSMEngine, combine_window_sums, scalars_to_limbs

__all__ = ["ShardedMSMEngine"]


class ShardedMSMEngine(MSMEngine):
    """MSMEngine whose device pipeline runs under shard_map on a 1-D mesh."""

    def __init__(self, batch_group, host_group, scalar_modulus: int, mesh: Mesh, **kw):
        super().__init__(batch_group, host_group, scalar_modulus, **kw)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]

    def _build(self, c: int):
        key = ("sharded", c)
        if key in self._jits:
            return self._jits[key]
        F = self.bg.F
        axis = self.axis
        ndev = self.mesh.devices.size

        point_spec = jax.tree.map(lambda _: P(None, axis), self.bg.zeros(1))

        def local(points, limbs):
            aff = self.bg._to_affine_impl(points)
            sums = self.window_sums_device(aff, limbs, c)  # local shard
            # combine across devices: gather per-device window sums, tree-add
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis), sums
            )  # leaves (D, 32, W)
            total = jax.tree.map(lambda x: x[0], gathered)
            for d in range(1, ndev):
                total = jacobian_add(
                    F, total, jax.tree.map(lambda x: x[d], gathered)
                )
            return total

        self._jits[key] = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(point_spec, P(None, axis)),
                out_specs=jax.tree.map(lambda _: P(), self.bg.zeros(1)),
                check_vma=False,
            )
        )
        return self._jits[key]

    def msm(self, host_points, host_scalars: Sequence[int]):
        n = len(host_points)
        if n == 0:
            return self.host_group.zero()
        ndev = self.mesh.devices.size
        # pad so each shard gets an equal multiple of the lane quantum
        lane_quantum = self.pad_quantum(max(1, n // ndev)) * ndev
        pad = (-n) % lane_quantum
        pts = list(host_points) + [self.host_group.zero()] * pad
        scs = [s % self.r for s in host_scalars] + [0] * pad

        c = self.window_bits_for((n + pad) // ndev)
        dev_pts = self.bg.pack(pts)
        limbs = scalars_to_limbs(scs, self.r)
        sums = self._build(c)(dev_pts, limbs)
        window_pts = self.bg.unpack(sums)
        return combine_window_sums(self.host_group, window_pts, c)
