"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import random

import jax
import numpy as np
import pytest

from go_snark_study_tpu.bn128 import constants as C, default_bn128
from go_snark_study_tpu.ops.curve_ops import G1Batch
from go_snark_study_tpu.ops.fields import fq_kernels
from go_snark_study_tpu.ops.ntt import NTTEngine
from go_snark_study_tpu.parallel import data_mesh
from go_snark_study_tpu.parallel.sharded_msm import ShardedMSMEngine
from go_snark_study_tpu.parallel.sharded_ntt import FourStepNTT

R = C.R


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return data_mesh(8)


def test_mesh_has_eight_devices(mesh):
    assert mesh.devices.size == 8


def test_four_step_ntt_matches_direct(mesh):
    eng = NTTEngine()
    fs = FourStepNTT(mesh, eng)
    n = 64
    rng = random.Random(1)
    coeffs = [rng.randrange(R) for _ in range(n)]
    w = eng.root_of_unity(n)
    direct = [
        sum(c * pow(w, i * j, R) for j, c in enumerate(coeffs)) % R for i in range(n)
    ]
    out = eng.K.unpack(fs.forward(eng.K.pack(coeffs)))
    perm = fs.permutation(n)
    assert out == [direct[p] for p in perm]


def test_four_step_ntt_roundtrip(mesh):
    eng = NTTEngine()
    fs = FourStepNTT(mesh, eng)
    n = 64
    rng = random.Random(2)
    coeffs = [rng.randrange(R) for _ in range(n)]
    x = eng.K.pack(coeffs)
    back = eng.K.unpack(fs.inverse(fs.forward(x)))
    assert back == coeffs


def test_sharded_msm_matches_serial(mesh):
    bn = default_bn128()
    g1b = G1Batch(fq_kernels())
    rng = random.Random(3)
    n = 40
    pts = [bn.g1.mul_scalar(bn.g1.g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    eng = ShardedMSMEngine(g1b, bn.g1, R, mesh)
    got = eng.msm(pts, scalars)
    want = bn.g1.zero()
    for p, s in zip(pts, scalars):
        want = bn.g1.add(want, bn.g1.mul_scalar(p, s))
    assert bn.g1.equal(got, want)
