"""Mesh helpers.

A SNARK prover's natural parallel axes (SURVEY §2.9 last row): data-parallel
over MSM points / NTT coefficients ("data"), and — at multi-host scale — a
"host" axis for hierarchical reduction: collectives over "data" ride ICI
within a slice, while the (much smaller) cross-host combines ride DCN.
``data_mesh`` builds the 1-D layout; ``hier_mesh`` the 2-D ("host", "data")
layout.  The sharded kernels only assume the axis names.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["data_mesh", "hier_mesh"]


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


def hier_mesh(
    n_hosts: int,
    chips_per_host: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D ("host", "data") mesh for the multi-host tiers (BASELINE
    2^20-2^22): point/coefficient lanes shard over the flattened grid, data-
    axis collectives stay within a host (ICI), host-axis combines cross DCN
    with only window-sum-sized payloads (~10 KB)."""
    if devices is None:
        devices = jax.devices()
    if chips_per_host is None:
        if len(devices) % n_hosts:
            raise ValueError(
                f"{len(devices)} devices do not split into {n_hosts} hosts"
            )
        chips_per_host = len(devices) // n_hosts
    need = n_hosts * chips_per_host
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices, have {len(devices)} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for "
            "virtual CPU devices)"
        )
    grid = np.asarray(devices[:need]).reshape(n_hosts, chips_per_host)
    return Mesh(grid, axis_names=("host", "data"))
