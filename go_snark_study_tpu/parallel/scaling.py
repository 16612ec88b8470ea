"""Weak-scaling report for the sharded MSM: fixed per-device work on
1/2/4/8 devices.

Run with virtual CPU devices (no multi-chip hardware needed):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m go_snark_study_tpu.parallel.scaling [per_dev_points]

Caveat printed with the table: virtual CPU devices SHARE the host's cores,
so wall-time "efficiency" on this rig measures sharding/communication
overhead, not real parallel speedup — on separate physical chips the local
pipelines run concurrently and the only serial cost is the all_gather +
log2(D) tree adds of W window-sum points (~10 KB/device).  The report's
purpose is (a) correctness at every mesh size and (b) showing the
communication volume stays flat as devices scale.
"""

from __future__ import annotations

import random
import sys
import time


def run(per_dev: int = 2048, devices=(1, 2, 4, 8, "2x4")) -> list:
    import jax

    from ..bn128 import constants as C, default_bn128
    from ..ops.curve_ops import G1Batch
    from ..ops.fields import fq_kernels
    from ..ops.msm import scalars_to_limbs
    from . import data_mesh, hier_mesh
    from .sharded_msm import ShardedMSMEngine

    bn = default_bn128()
    g1b = G1Batch(fq_kernels())
    rng = random.Random(17)
    rows = []
    for spec in devices:
        if isinstance(spec, str):  # "HxD" -> 2-D (host, data) hierarchy
            h, d = (int(x) for x in spec.split("x"))
            ndev = h * d
            if ndev > len(jax.devices()):
                break
            mesh = hier_mesh(h, d)
        else:
            ndev = spec
            if ndev > len(jax.devices()):
                break
            mesh = data_mesh(ndev)
        eng = ShardedMSMEngine(g1b, bn.g1, C.R, mesh)
        n = per_dev * ndev
        scalars = [rng.randrange(C.R) for _ in range(n)]
        pts_dev = g1b.pack([bn.g1.g] * n)
        limbs = scalars_to_limbs(scalars, C.R)
        c = eng.window_bits_for(per_dev)
        fn = eng._build(c)
        sums, _bad = fn(pts_dev, limbs)  # compile + first run
        jax.block_until_ready(sums)
        t0 = time.time()
        sums, _bad = fn(pts_dev, limbs)
        jax.block_until_ready(sums)
        dt = time.time() - t0
        # broadcast points share every bucket: the incomplete-formula flag
        # fires by construction here — combine through the complete twin
        import numpy as _np

        if bool(_np.asarray(_bad)):
            sums, _ = eng.fallback_engine()._build(c)(pts_dev, limbs)
        from ..ops.msm import combine_window_sums

        total = combine_window_sums(bn.g1, g1b.unpack(sums), c)
        ok = bn.g1.equal(total, bn.g1.mul_scalar(bn.g1.g, sum(scalars) % C.R))
        rows.append(
            {
                "devices": ndev,
                "layout": spec if isinstance(spec, str) else "1d",
                "points": n,
                "seconds": dt,
                "correct": bool(ok),
            }
        )
    return rows


def _force_cpu_if_requested() -> None:
    """JAX_PLATFORMS=cpu alone is too late in this image (sitecustomize
    registers the axon TPU relay before any user code; see tests/conftest.py)
    — drop the axon factory and pin the platform post-import."""
    import os

    if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax._src.xla_bridge as xb

        xb._backend_factories.pop("axon", None)
    except Exception:
        pass


def main(argv=None) -> int:
    _force_cpu_if_requested()
    per_dev = int((argv or sys.argv[1:] or ["2048"])[0])
    rows = run(per_dev)
    t1 = rows[0]["seconds"]
    print(f"weak scaling, {per_dev} points/device (virtual-device caveat in module docstring)")
    print(
        f"{'devices':>8}{'layout':>8}{'points':>10}{'wall s':>10}"
        f"{'efficiency':>12}{'correct':>9}"
    )
    for r in rows:
        eff = t1 / r["seconds"]
        print(
            f"{r['devices']:>8}{r['layout']:>8}{r['points']:>10}"
            f"{r['seconds']:>10.3f}{eff:>12.2f}{str(r['correct']):>9}"
        )
    return 0 if all(r["correct"] for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
