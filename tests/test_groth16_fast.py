"""Fast-path (NTT-domain, TPU) Groth16: proofs must verify under the
standard verifier, and the synthetic R1CS generator must be sound."""

import random

import pytest

from go_snark_study_tpu.bn128 import constants as C
from go_snark_study_tpu.models import groth16
from go_snark_study_tpu.models.groth16_fast import FastGroth16
from go_snark_study_tpu.synthetic import mul_chain_r1cs


def test_synthetic_r1cs_satisfiable():
    sys_ = mul_chain_r1cs(64, seed=3)
    assert sys_.check()
    assert len(sys_.A) == 64
    a, b, c = sys_.row_evals()
    assert all((x * y - z) % C.R == 0 for x, y, z in zip(a, b, c))


@pytest.fixture(scope="module")
def fast():
    return FastGroth16()


def test_fast_groth16_end_to_end(fast):
    sys_ = mul_chain_r1cs(30, seed=1)  # domain pads to 32
    rng = random.Random(42)
    setup = fast.setup(sys_, rng=rng)
    proof = fast.prove(sys_, setup.pk, rng=rng)
    publics = sys_.witness[1 : sys_.n_public + 1]
    assert groth16.verify_proof(setup.vk, proof, publics)
    # negative: wrong public must fail
    assert not groth16.verify_proof(setup.vk, proof, [publics[0] + 1])


def test_fast_groth16_larger_domain(fast):
    sys_ = mul_chain_r1cs(256, seed=2)
    rng = random.Random(7)
    setup = fast.setup(sys_, rng=rng)
    proof = fast.prove(sys_, setup.pk, rng=rng)
    publics = sys_.witness[1 : sys_.n_public + 1]
    assert groth16.verify_proof(setup.vk, proof, publics)


def test_fixed_base_matches_host():
    from go_snark_study_tpu.bn128 import default_bn128
    from go_snark_study_tpu.ops.curve_ops import G1Batch
    from go_snark_study_tpu.ops.fields import fq_kernels
    from go_snark_study_tpu.ops.fixed_base import FixedBaseEngine

    bn = default_bn128()
    fb = FixedBaseEngine(G1Batch(fq_kernels()), bn.g1, bn.g1.g, C.R)
    rng = random.Random(9)
    scalars = [0, 1, 2, 255, 256, C.R - 1] + [rng.randrange(C.R) for _ in range(10)]
    got = fb.batch_mul(scalars)
    for s, p in zip(scalars, got):
        assert bn.g1.equal(p, bn.g1.mul_scalar(bn.g1.g, s))
