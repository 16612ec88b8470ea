"""Binary (NPZ) key format for the TPU fast path.

The reference persists every artifact as JSON-of-decimal-strings
(utils/base10parsers.go) — fine at its ~20-constraint scale, but a
2^20-circuit Groth16 proving key is ~2.7 GB of limb data; JSON-encoding it
multiplies the size and the CLI's load time.  ``trustedsetup --fast``
therefore writes the device proving key as ONE uncompressed ``.npz`` of
int32 limb arrays (zero-copy numpy round-trip) next to a small JSON header
carrying the verifying key and the handful of host points the prover needs.

The verifying key inside the header uses the reference's decimal wire
dialect, so ``verify`` interoperates with JSON-only consumers unchanged.
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from ..models import groth16 as g16

__all__ = ["save_fast_setup", "load_fast_setup", "KEYFILE"]

KEYFILE = "trustedsetup.npz"

# DevicePk array fields and their pytree shapes: G1 = (x, y, z) leaves,
# G2 = ((x0, x1), (y0, y1), (z0, z1))
_G1_FIELDS = ("at", "b1", "cdelta", "ptau")
_G2_FIELDS = ("b2",)


def _flatten(name: str, tree) -> Dict[str, np.ndarray]:
    out = {}
    if name in _G2_FIELDS:
        for ci, coord in enumerate(tree):
            for k, comp in enumerate(coord):
                out[f"{name}.{ci}.{k}"] = np.asarray(comp)
    else:
        for ci, coord in enumerate(tree):
            out[f"{name}.{ci}"] = np.asarray(coord)
    return out


def _unflatten(name: str, arrays) -> tuple:
    import jax.numpy as jnp

    if name in _G2_FIELDS:
        return tuple(
            tuple(jnp.asarray(arrays[f"{name}.{ci}.{k}"]) for k in range(2))
            for ci in range(3)
        )
    return tuple(jnp.asarray(arrays[f"{name}.{ci}"]) for ci in range(3))


def save_fast_setup(path: str, setup: g16.Setup) -> None:
    """Persist a fast-path setup (``pk._device`` REQUIRED) as NPZ.  Toxic
    waste is never written (the Setup passed in should already be
    stripped)."""
    from ..utils import base10

    dpk = getattr(setup.pk, "_device", None)
    if dpk is None:
        raise ValueError("setup has no device proving key (run the fast setup)")
    arrays: Dict[str, np.ndarray] = {}
    for f in _G1_FIELDS + _G2_FIELDS:
        arrays.update(_flatten(f, getattr(dpk, f)))
    header = {
        "format": "gosnark-fast-setup-v1",
        "n": dpk.n,
        "m": dpk.m,
        "lo": dpk.lo,
        "m_pad": dpk.m_pad,
        "mp_pad": dpk.mp_pad,
        "n_pad": dpk.n_pad,
        "vk": base10.groth_vk_to_dict(setup.vk),
        "pk_g1": {
            "alpha": base10.p3(setup.pk.g1.alpha),
            "beta": base10.p3(setup.pk.g1.beta),
            "delta": base10.p3(setup.pk.g1.delta),
        },
        "pk_g2": {
            "beta": base10.p32(setup.pk.g2.beta),
            "gamma": base10.p32(setup.pk.g2.gamma),
            "delta": base10.p32(setup.pk.g2.delta),
        },
    }
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def load_fast_setup(path: str) -> g16.Setup:
    """NPZ -> Setup with a device-resident proving key (``pk._device``)
    ready for :meth:`..models.groth16_fast.FastGroth16.prove` — no host
    point materialisation, no re-packing."""
    from ..models.groth16_fast import DevicePk
    from ..utils import base10

    data = np.load(path)
    header = json.loads(bytes(data["header"]).decode())
    if header.get("format") != "gosnark-fast-setup-v1":
        raise ValueError(f"not a fast-setup keyfile: {path}")
    setup = g16.Setup()
    setup.vk = base10.groth_vk_from_dict(header["vk"])
    pk = setup.pk
    pk.g1.alpha = base10.p3_i(header["pk_g1"]["alpha"])
    pk.g1.beta = base10.p3_i(header["pk_g1"]["beta"])
    pk.g1.delta = base10.p3_i(header["pk_g1"]["delta"])
    pk.g2.beta = base10.p32_i(header["pk_g2"]["beta"])
    pk.g2.gamma = base10.p32_i(header["pk_g2"]["gamma"])
    pk.g2.delta = base10.p32_i(header["pk_g2"]["delta"])
    n = int(header["n"])
    from ..bn128 import constants as C

    pk.z = [C.R - 1] + [0] * (n - 1) + [1]  # Z(x) = x^n - 1
    pk._device = DevicePk(
        n=n,
        m=int(header["m"]),
        lo=int(header["lo"]),
        m_pad=int(header["m_pad"]),
        mp_pad=int(header["mp_pad"]),
        n_pad=int(header["n_pad"]),
        at=_unflatten("at", data),
        b1=_unflatten("b1", data),
        b2=_unflatten("b2", data),
        cdelta=_unflatten("cdelta", data),
        ptau=_unflatten("ptau", data),
    )
    return setup
