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


@pytest.mark.slow
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


def test_fast_groth16_from_dsl_circuit(fast):
    """DSL-compiled cubic circuit (README.md:54-66's y = x^3 + x + 5)
    through the Circuit -> SparseR1CS bridge and the TPU fast prover;
    verifies under the unchanged groth16 verifier (cli/main.go:455-505's
    flow, fast-path variant)."""
    import random

    from go_snark_study_tpu.circuitcompiler import parse_source
    from go_snark_study_tpu.synthetic import SparseR1CS

    src = (
        "func main(private s0, public s1):\n"
        "\ts2 = s0 * s0\n"
        "\ts3 = s2 * s0\n"
        "\ts4 = s3 + s0\n"
        "\ts5 = s4 + 5\n"
        "\tequals(s1, s5)\n"
        "\tout = 1 * 1\n"
    )
    circuit = parse_source(src)
    w = circuit.calculate_witness([3], [35])
    circuit.generate_r1cs()
    sparse = SparseR1CS.from_circuit(circuit, witness=w)
    assert sparse.check()

    rng = random.Random(5)
    setup = fast.setup(sparse, rng=rng)
    proof = fast.prove(sparse, setup.pk, rng=rng)
    publics = sparse.witness[1 : sparse.n_public + 1]
    assert groth16.verify_proof(setup.vk, proof, publics)
    assert not groth16.verify_proof(setup.vk, proof, [publics[0] + 1])


def test_fast_prove_from_host_pk_roundtrip(fast):
    """A host-materialised Pk (e.g. loaded from trustedsetup.json) must
    rebuild its device key and prove identically."""
    import random

    sys_ = mul_chain_r1cs(30, seed=4)
    setup = fast.setup(sys_, rng=random.Random(1))
    # simulate a serialization round-trip: drop the device key
    setup.pk._device = None
    proof = fast.prove(sys_, setup.pk, rng=random.Random(2))
    publics = sys_.witness[1 : sys_.n_public + 1]
    assert groth16.verify_proof(setup.vk, proof, publics)
