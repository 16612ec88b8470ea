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


@pytest.mark.slow
def test_sharded_msm_larger(mesh):
    """Beyond toy sizes: 2048 points through the tiled group pipeline on the
    8-device mesh (each shard runs the full bucket pipeline on 256 lanes)."""
    bn = default_bn128()
    g1b = G1Batch(fq_kernels())
    rng = random.Random(8)
    base_pts = [bn.g1.mul_scalar(bn.g1.g, k + 1) for k in range(16)]
    n = 2048
    pts = [base_pts[i % 16] for i in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    eng = ShardedMSMEngine(g1b, bn.g1, R, mesh)
    got = eng.msm(pts, scalars)
    # oracle via per-base scalar aggregation (16 scalar muls, not 2048)
    agg = [0] * 16
    for i, s in enumerate(scalars):
        agg[i % 16] = (agg[i % 16] + s) % R
    want = bn.g1.zero()
    for p, s in zip(base_pts, agg):
        want = bn.g1.add(want, bn.g1.mul_scalar(p, s))
    assert bn.g1.equal(got, want)


@pytest.mark.slow
def test_sharded_prove_verify_end_to_end(mesh):
    """Full multi-chip prove -> verify: witness + H MSMs data-parallel over
    the 8-device mesh, proof verifies under the unchanged host verifier
    (the sharded replacement for groth16.go:243-275 end to end)."""
    from go_snark_study_tpu.models import groth16
    from go_snark_study_tpu.models.groth16_fast import FastGroth16
    from go_snark_study_tpu.synthetic import mul_chain_r1cs

    fast = FastGroth16()
    sys_ = mul_chain_r1cs(96, seed=11)
    setup = fast.setup(sys_, rng=random.Random(1))
    proof = fast.prove_sharded(sys_, setup.pk, mesh, rng=random.Random(2))
    publics = sys_.witness[1 : sys_.n_public + 1]
    assert groth16.verify_proof(setup.vk, proof, publics)
    assert not groth16.verify_proof(setup.vk, proof, [publics[0] + 1])


@pytest.fixture(scope="module")
def mesh2d():
    """2-D (2 hosts x 4 chips) hierarchy on the 8 virtual devices."""
    from go_snark_study_tpu.parallel import hier_mesh

    return hier_mesh(2, 4)


def test_hier_mesh_shape(mesh2d):
    assert mesh2d.axis_names == ("host", "data")
    assert mesh2d.devices.shape == (2, 4)


@pytest.mark.slow
def test_sharded_msm_hierarchical_matches_serial(mesh2d):
    """Hierarchical window-sum combine (ICI gather + tree-add within the
    data axis, then one combine per host across the host axis) must equal
    the serial result."""
    bn = default_bn128()
    g1b = G1Batch(fq_kernels())
    rng = random.Random(12)
    n = 48
    pts = [bn.g1.mul_scalar(bn.g1.g, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    eng = ShardedMSMEngine(g1b, bn.g1, R, mesh2d)
    got = eng.msm(pts, scalars)
    want = bn.g1.zero()
    for p, s in zip(pts, scalars):
        want = bn.g1.add(want, bn.g1.mul_scalar(p, s))
    assert bn.g1.equal(got, want)


def test_four_step_ntt_2d_roundtrip(mesh2d):
    """Flattened-axis all_to_all transposes on the 2-D mesh: forward ->
    inverse is an identity (n=64: both factors divisible by 8 devices)."""
    eng = NTTEngine()
    fs = FourStepNTT(mesh2d, eng)
    n = 64
    rng = random.Random(13)
    coeffs = [rng.randrange(R) for _ in range(n)]
    x = eng.K.pack(coeffs)
    back = eng.K.unpack(fs.inverse(fs.forward(x)))
    assert back == coeffs


def test_dry_shape_check_2pow22():
    """BASELINE's 2^22 multi-host tier as an abstract-mesh shape check of
    the production sharded piece chain on a (host, data) = (2, 8) grid —
    no allocation, full partitioned trace (sharded_prover.dry_shape_check)."""
    from go_snark_study_tpu.parallel.sharded_prover import dry_shape_check

    info = dry_shape_check(22, (2, 8))
    assert info["ok"]
    assert info["devices"] == 16
    assert info["chunks_per_shard"] == (info["local_lanes"] >> 17)
    assert info["window_bits"] == 13


@pytest.mark.slow
def test_sharded_prover_2pow14_hier(mesh2d):
    """Production sharded prover at a 2^14-constraint instance on the 2x4
    (host, data) mesh: device-resident sharded key, chunk-canonical
    shard_map pieces, shared witness plans, host hierarchical combine —
    the path the real multi-chip tiers run (VERDICT r4 item 4)."""
    from go_snark_study_tpu.models import groth16
    from go_snark_study_tpu.models.groth16_fast import FastGroth16
    from go_snark_study_tpu.parallel.sharded_prover import ShardedFastProver
    from go_snark_study_tpu.synthetic import mul_chain_r1cs

    fast = FastGroth16()
    sys_ = mul_chain_r1cs(1 << 14, seed=21)
    setup = fast.setup(sys_, rng=random.Random(4))
    prover = ShardedFastProver(fast, mesh2d)
    proof = prover.prove(sys_, setup.pk, rng=random.Random(5))
    publics = sys_.witness[1 : sys_.n_public + 1]
    assert groth16.verify_proof(setup.vk, proof, publics)
    # second proof: sharded key + piece jits all cached
    proof2 = prover.prove(sys_, setup.pk, rng=random.Random(6))
    assert groth16.verify_proof(setup.vk, proof2, publics)
