"""End-to-end protocol tests mirroring snark_test.go and
groth16/groth16_test.go: full parse -> witness -> R1CS -> QAP -> setup ->
prove -> verify flows, including the negative (wrong public input) cases."""

import random

import pytest

from go_snark_study_tpu.api import compile_circuit, groth16_flow, pinocchio_flow
from go_snark_study_tpu.models import groth16, pinocchio

CUBIC = """
func main(private s0, public s1):
	s2 = s0 * s0
	s3 = s2 * s0
	s4 = s3 + s0
	s5 = s4 + 5
	equals(s1, s5)
	out = 1 * 1
"""

MULTIPLICATION = """
func main(private a, private b, public c):
	d = a * b
	equals(c, d)
	out = 1 * 1
"""


@pytest.fixture(scope="module")
def cubic_bundle():
    return compile_circuit(source=CUBIC, private_inputs=[3], public_inputs=[35])


def test_groth16_minimal_flow(cubic_bundle):
    # groth16/groth16_test.go:16-107 / snark_test.go:17-108
    bundle = cubic_bundle
    # intermediate shape pins from the reference test: len(alphas)==8 signals,
    # px degree: constraints=7 -> interp degree 6 -> px len 13
    assert len(bundle.alphas) == 8
    assert len(bundle.px) == 13
    setup, proof, ok = groth16_flow(bundle, rng=random.Random(42))
    assert ok
    # negative: wrong public input must fail (groth16_test.go:104-106)
    assert not groth16.verify_proof(setup.vk, proof, [35 + 1])


def test_pinocchio_minimal_flow(cubic_bundle):
    # snark_test.go:353-440
    setup, proof, ok = pinocchio_flow(cubic_bundle, rng=random.Random(7))
    assert ok
    assert not pinocchio.verify_proof(setup.vk, proof, [35 + 1])


def test_pinocchio_multiplication_circuit():
    # snark_test.go:245-351
    bundle = compile_circuit(
        source=MULTIPLICATION, private_inputs=[42, 56], public_inputs=[2352]
    )
    setup, proof, ok = pinocchio_flow(bundle, rng=random.Random(3))
    assert ok
    assert not pinocchio.verify_proof(setup.vk, proof, [2353])


def test_pinocchio_with_func_calls():
    # snark_test.go:110-243 (function-call version of the cubic circuit)
    code = """
	func exp3(private a):
		b = a * a
		c = a * b
		return c
	func sum(private a, private b):
		c = a + b
		return c

	func main(private s0, public s1):
		s3 = exp3(s0)
		s4 = sum(s3, s0)
		s5 = s4 + 5
		equals(s1, s5)
		out = 1 * 1
	"""
    bundle = compile_circuit(source=code, private_inputs=[3], public_inputs=[35])
    setup, proof, ok = pinocchio_flow(bundle, rng=random.Random(9))
    assert ok


def test_groth16_proof_deterministic_with_seed(cubic_bundle):
    # seeded-randomness mode: same seed -> identical artifacts (SURVEY §7.2
    # determinism hook)
    s1, p1, _ = groth16_flow(cubic_bundle, rng=random.Random(1234))
    s2, p2, _ = groth16_flow(cubic_bundle, rng=random.Random(1234))
    assert p1.pi_a == p2.pi_a and p1.pi_b == p2.pi_b and p1.pi_c == p2.pi_c


def test_groth16_cross_setup_proof_fails(cubic_bundle):
    # a proof under one setup must not verify under another
    setup_a, proof_a, _ = groth16_flow(cubic_bundle, rng=random.Random(1))
    setup_b, _, _ = groth16_flow(cubic_bundle, rng=random.Random(2))
    assert not groth16.verify_proof(setup_b.vk, proof_a, [35])
