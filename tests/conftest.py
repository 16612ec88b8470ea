"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding paths (mesh/pjit/shard_map in ``parallel/``) are exercised without
TPU hardware; the int32 limb kernels are backend-exact, so CPU results match
TPU bit-for-bit.  Real-chip execution is covered by ``bench.py`` and the
driver's compile checks.

This environment tunnels the TPU through the "axon" PJRT relay plugin, which
``sitecustomize`` registers in EVERY python process (and jax is already
imported by the time any conftest runs, so env vars alone are too late).
With the relay registered, ``jax._src.xla_bridge.backends()`` initialises the
axon factory — dialing the relay — and the first device->host transfer then
stalls for minutes EVEN ON CPU ARRAYS.  The tests never need the relay, so we
force the platform list to cpu post-import and drop the axon factory before
any backend initialises.
"""

import os
import sys

# XLA flags are read at backend *initialisation*, which has not happened yet
# even though jax may already be imported by sitecustomize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compile cache: CPU-backend entries are keyed separately from the
# TPU ones, so repeated test runs (locally and in the driver) skip every XLA
# compile after the first run.
from go_snark_study_tpu.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
