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
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.curve_ops import jacobian_add
from ..ops.msm import MSMEngine, combine_window_sums, scalars_to_limbs

__all__ = ["ShardedMSMEngine"]


class ShardedMSMEngine(MSMEngine):
    """MSMEngine whose device pipeline runs under shard_map.

    Works on a 1-D ("data",) mesh or the 2-D ("host", "data") hierarchy
    (:func:`..parallel.mesh.hier_mesh`): lanes shard over the flattened
    grid, and the window-sum combine is HIERARCHICAL — gather + tree-add
    over the innermost ("data") axis first, which rides ICI within a host,
    then over the "host" axis, so only one window-sum payload per host
    (~10 KB) crosses DCN."""

    def __init__(self, batch_group, host_group, scalar_modulus: int, mesh: Mesh, **kw):
        super().__init__(batch_group, host_group, scalar_modulus, **kw)
        self.mesh = mesh
        self.axes = tuple(mesh.axis_names)
        self.axis = self.axes if len(self.axes) > 1 else self.axes[0]

    def _gather_tree_add(self, sums, axis, n: int):
        """all_gather window sums over ``axis``, combine with a log-depth
        tree of batched Jacobian adds (leaves (D, 32, W) -> (32, W))."""
        F = self.bg.F
        g = jax.tree.map(lambda x: jax.lax.all_gather(x, axis), sums)
        # slice the gathered axis back off so every add sees the kernels'
        # (32, W) limb-major layout, then reduce in log depth
        parts = [jax.tree.map(lambda x: x[i], g) for i in range(n)]
        while len(parts) > 1:
            nxt = [
                jacobian_add(F, parts[i], parts[i + 1])
                for i in range(0, len(parts) - 1, 2)
            ]
            if len(parts) % 2:
                nxt.append(parts[-1])
            parts = nxt
        return parts[0]

    def _build(self, c: int):
        key = ("sharded", c)
        if key in self._jits:
            return self._jits[key]
        axes = self.axes
        shape = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))

        point_spec = jax.tree.map(lambda _: P(None, self.axis), self.bg.zeros(1))

        def local(points, limbs):
            aff = self.bg._to_affine_impl(points)
            sums, bad = self.window_sums_device(aff, limbs, c)  # local shard
            # any shard's degeneracy flag poisons the whole result: OR via
            # an integer all-reduce over every mesh axis
            bad = jax.lax.psum(bad.astype(jnp.int32), tuple(axes)) > 0
            # hierarchical combine: innermost axis (ICI) first, outer last
            for ax in reversed(axes):
                sums = self._gather_tree_add(sums, ax, shape[ax])
            return sums, bad

        self._jits[key] = jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(point_spec, P(None, self.axis)),
                out_specs=(
                    jax.tree.map(lambda _: P(), self.bg.zeros(1)),
                    P(),
                ),
                check_vma=False,
            )
        )
        return self._jits[key]

    def fallback_engine(self) -> "ShardedMSMEngine":
        if self.complete:
            return self
        if self._fallback is None:
            self._fallback = ShardedMSMEngine(
                self.bg,
                self.host_group,
                self.r,
                self.mesh,
                window_bits=self.window_bits,
                tile_threshold=self.tile_threshold,
                tile_steps=self.tile_steps,
                tile_lanes=self.tile_lanes,
                group_bytes=self.group_bytes,
                chunk_lanes=self.chunk_lanes,
                small_chunk_lanes=self.small_chunk_lanes,
                small_chunk_max=self.small_chunk_max,
                complete=True,
            )
        return self._fallback

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
        sums, bad = self._build(c)(dev_pts, limbs)
        if not self.complete and bool(np.asarray(bad)):
            sums, _ = self.fallback_engine()._build(c)(dev_pts, limbs)
        window_pts = self.bg.unpack(sums)
        return combine_window_sums(self.host_group, window_pts, c)
