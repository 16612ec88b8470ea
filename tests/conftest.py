"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so that the multi-chip
sharding paths (mesh/pjit/shard_map in ``parallel/``) are exercised without
TPU hardware; the int32 limb kernels are backend-exact, so CPU results match
TPU bit-for-bit.  Real-chip execution is covered by ``bench.py`` and the
driver's compile checks.
"""

import os
import sys

# must be set before jax is imported anywhere
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
