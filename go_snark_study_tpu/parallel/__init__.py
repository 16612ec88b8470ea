"""Multi-chip scaling: device meshes, sharded MSM, four-step sharded NTT.

The reference has no distributed backend at all (SURVEY §2.9, §5.8); this
package is its TPU-native counterpart, built on ``jax.sharding.Mesh`` +
``shard_map`` with XLA collectives riding ICI:

  mesh.py          mesh construction helpers (works on 1..N real chips and on
                   the 8-virtual-device CPU test harness)
  sharded_msm.py   data-parallel Pippenger: points sharded over the mesh,
                   per-shard bucket accumulation, window sums combined with
                   all_gather + tree point-adds
  sharded_ntt.py   four-step NTT: local column transforms, twiddle scaling,
                   all_to_all transpose, local row transforms
  sharded_prover.py  production multi-chip Groth16 prover: device-resident
                   sharded proving key, chunk-canonical shard_map pieces,
                   host hierarchical window-sum combine
"""

from .mesh import data_mesh, hier_mesh

__all__ = ["data_mesh", "hier_mesh", "ShardedFastProver"]


def __getattr__(name):
    if name == "ShardedFastProver":
        from .sharded_prover import ShardedFastProver

        return ShardedFastProver
    raise AttributeError(name)
