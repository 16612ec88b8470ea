"""Mesh helpers.

A SNARK prover's natural parallel axes (SURVEY §2.9 last row): data-parallel
over MSM points / NTT coefficients ("data"), and — at multi-host scale —
a second axis for cross-host bucket reduction.  This module standardises on a
1-D "data" mesh for now; the sharded kernels only assume the axis name.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["data_mesh"]


def data_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all available) named "data"."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for "
                "virtual CPU devices)"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))
