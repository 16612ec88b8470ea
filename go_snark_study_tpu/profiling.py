"""Per-kernel profiling and speed-of-light accounting.

The reference has no profiling at all (SURVEY §5.1 — ad-hoc time prints in
tests).  This module provides:

  * ``timed(label)`` — context manager accumulating wall times per label
    (device work is fenced with ``block_until_ready``);
  * ``kernel_cost`` — the analytic int32-op/byte cost model of the limb
    kernels, from which ``speed_of_light_report`` derives attainable-rate
    efficiency on a given chip;
  * ``report()`` — a table of measured times vs model.

Used by bench.py; import-safe everywhere (no jax import at module load).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Dict, Optional

__all__ = ["Profiler", "PROFILER", "timed", "CHIP_MODELS", "kernel_cost"]


@dataclass
class ChipModel:
    name: str
    int32_tops: float  # attainable int32 ops/s on the VPU (both mul and add)
    hbm_gbps: float  # HBM bandwidth bytes/s


# VPU int32 attainable rate: the (8, 128)-lane VPU with 4 ALU ports at
# ~1.4 GHz gives ~5.7e12 int32 ops/s; the measured Pallas Montgomery kernel
# sustains 602 M muls/s x 4300 ops = 2.6e12 ops/s = 45% of this model on a
# real v5e chip (BENCH_r02), which validates the order of magnitude.  (The
# round-1 figure of 0.9e12 was wrong — the same kernel measurably exceeds
# it.)
CHIP_MODELS: Dict[str, ChipModel] = {
    "v5e": ChipModel("TPU v5e", int32_tops=5.7e12, hbm_gbps=819e9),
    "cpu": ChipModel("host CPU", int32_tops=0.1e12, hbm_gbps=50e9),
}


def kernel_cost(kind: str, n: int) -> dict:
    """Analytic per-call cost of the limb kernels at batch n.

    mont_mul: CIOS = 32 steps x (2 MACs of 32 rows) = 4096 int32 mul+add per
    element, + ~200 normalisation ops; reads 2x(32,n), writes (32,n) int32.
    point_add: full Jacobian add-2007-bl = 11M + 5S = 16 muls + ~10 cheap
    add/sub row passes; point_add_mixed: madd-2007-bl = 7M + 4S = 11 muls
    (the MSM accumulation workhorse, curve_ops.jacobian_add_mixed).
    """
    if kind == "mont_mul":
        return {"int32_ops": 4300 * n, "bytes": 3 * 32 * 4 * n}
    if kind == "mont_add":
        return {"int32_ops": 200 * n, "bytes": 3 * 32 * 4 * n}
    if kind == "point_add":
        c = kernel_cost("mont_mul", n)["int32_ops"]
        a = kernel_cost("mont_add", n)["int32_ops"]
        return {"int32_ops": 16 * c + 10 * a, "bytes": 9 * 32 * 4 * n}
    if kind == "point_add_mixed":
        c = kernel_cost("mont_mul", n)["int32_ops"]
        a = kernel_cost("mont_add", n)["int32_ops"]
        return {"int32_ops": 11 * c + 10 * a, "bytes": 8 * 32 * 4 * n}
    raise KeyError(kind)


class Profiler:
    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextmanager
    def timed(self, label: str, sync=None):
        """sync: optional value/pytree to block_until_ready before stopping
        the clock."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.times[label] += time.perf_counter() - t0
        self.calls[label] += 1

    def record(self, label: str, seconds: float) -> None:
        self.times[label] += seconds
        self.calls[label] += 1

    def report(self, chip: str = "v5e") -> str:
        """Tabulate recorded timings; labels registered with a kernel kind
        (``label@kind:n``) also get their speed-of-light efficiency on
        ``chip``."""
        lines = [f"{'label':<36}{'calls':>6}{'total s':>10}{'per call':>12}"]
        for label in sorted(self.times):
            t, c = self.times[label], self.calls[label]
            row = f"{label:<36}{c:>6}{t:>10.3f}{t / c:>11.4f}s"
            if "@" in label:
                try:
                    kind, n = label.rsplit("@", 1)[1].split(":")
                    sol = self.speed_of_light(label, kind, int(n), chip)
                    row += f"  {100 * sol['efficiency']:5.1f}% SoL ({sol['bound']}-bound, {chip})"
                except (KeyError, ValueError):
                    pass
            lines.append(row)
        return "\n".join(lines)

    def speed_of_light(self, label: str, kind: str, n: int, chip: str = "v5e") -> dict:
        """Efficiency of a measured kernel vs the chip's attainable rates."""
        model = CHIP_MODELS[chip]
        cost = kernel_cost(kind, n)
        t = self.times[label] / max(1, self.calls[label])
        t_compute = cost["int32_ops"] / model.int32_tops
        t_mem = cost["bytes"] / model.hbm_gbps
        t_sol = max(t_compute, t_mem)
        return {
            "measured_s": t,
            "sol_s": t_sol,
            "bound": "compute" if t_compute >= t_mem else "memory",
            "efficiency": t_sol / t if t > 0 else 0.0,
        }

    def reset(self) -> None:
        self.times.clear()
        self.calls.clear()


PROFILER = Profiler()
timed = PROFILER.timed
