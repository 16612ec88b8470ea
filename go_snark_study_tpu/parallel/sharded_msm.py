"""Data-parallel Pippenger MSM over a device mesh.

Points and scalar windows are sharded along the batch axis; every device runs
the full local bucket pipeline (sort + segmented scan + bucket reduction) on
its shard, producing per-shard window sums.  Window sums are *points*, so the
cross-device combine is an ``all_gather`` over the mesh axis followed by a
tree of batched Jacobian adds — point addition is not a hardware reduction,
which is why this is not a bare ``psum`` (SURVEY §2.9 row 2 maps the
reference's serial MSM loops here).

Communication volume per device: 3 coords x 32 limbs x 32 windows x 4 B ~
12 KB — negligible against the local compute, so scaling is embarrassingly
parallel until the bucket-reduction tail dominates.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.curve_ops import jacobian_add
from ..ops.msm import MSMEngine, scalars_to_windows, WINDOW_BITS

__all__ = ["ShardedMSMEngine"]


class ShardedMSMEngine(MSMEngine):
    """MSMEngine whose device pipeline runs under shard_map on a 1-D mesh."""

    def __init__(self, batch_group, host_group, scalar_modulus: int, mesh: Mesh):
        super().__init__(batch_group, host_group, scalar_modulus)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self._sharded_jit = None

    def _build(self):
        if self._sharded_jit is not None:
            return self._sharded_jit
        F = self.bg.F
        axis = self.axis
        ndev = self.mesh.devices.size

        point_spec = jax.tree.map(lambda _: P(None, axis), self.bg.zeros(1))

        def local(points, windows):
            sums = self._window_sums(points, windows)  # local shard pipeline
            # combine across devices: gather per-device window sums, tree-add
            gathered = jax.tree.map(
                lambda c: jax.lax.all_gather(c, axis), sums
            )  # leaves (D, 32, W)
            total = jax.tree.map(lambda c: c[0], gathered)
            for d in range(1, ndev):
                total = jacobian_add(
                    F, total, jax.tree.map(lambda c: c[d], gathered)
                )
            return total

        self._sharded_jit = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(point_spec, P(None, axis)),
                out_specs=jax.tree.map(lambda _: P(), self.bg.zeros(1)),
                check_vma=False,
            )
        )
        return self._sharded_jit

    def msm(self, host_points, host_scalars: Sequence[int]):
        n = len(host_points)
        if n == 0:
            return self.host_group.zero()
        ndev = self.mesh.devices.size
        # pad so each shard gets an equal multiple of 128 lanes
        lane_quantum = 128 * ndev
        pad = (-n) % lane_quantum
        pts = list(host_points) + [self.host_group.zero()] * pad
        scs = [s % self.r for s in host_scalars] + [0] * pad

        dev_pts = self.bg.pack(pts)
        windows = scalars_to_windows(scs, self.r)
        sums = self._build()(dev_pts, windows)
        window_pts = self.bg.unpack(sums)

        g = self.host_group
        total = g.zero()
        for wp in reversed(window_pts):
            for _ in range(WINDOW_BITS):
                total = g.double(total)
            total = g.add(total, wp)
        return total
