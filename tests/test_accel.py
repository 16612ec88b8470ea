"""TPU acceleration hooks for the parity-path protocols: backend-equality and
native witness evaluation at scale."""

import random

import pytest

from go_snark_study_tpu.api import compile_circuit, groth16_flow, pinocchio_flow
from go_snark_study_tpu.bn128 import constants as C
from go_snark_study_tpu.models.accel import (
    disable_tpu_msm,
    disable_tpu_setup,
    enable_tpu_msm,
    enable_tpu_setup,
)

CUBIC = open("circuitexamples/test.circuit").read() if False else """
func main(private s0, public s1):
	s2 = s0 * s0
	s3 = s2 * s0
	s4 = s3 + s0
	s5 = s4 + 5
	equals(s1, s5)
	out = 1 * 1
"""


@pytest.fixture()
def accel():
    enable_tpu_msm(min_size=4)
    enable_tpu_setup(min_size=4)
    yield
    disable_tpu_msm()
    disable_tpu_setup()


@pytest.mark.slow
def test_accelerated_pinocchio_flow(accel):
    bundle = compile_circuit(source=CUBIC, private_inputs=[3], public_inputs=[35])
    setup, proof, ok = pinocchio_flow(bundle, rng=random.Random(8))
    assert ok


def test_accelerated_groth16_flow(accel):
    bundle = compile_circuit(source=CUBIC, private_inputs=[3], public_inputs=[35])
    setup, proof, ok = groth16_flow(bundle, rng=random.Random(9))
    assert ok


def test_native_witness_large_circuit():
    # a chain long enough to trip the native path (>=256 constraints)
    n = 300
    body = "\n".join(f"\ts{i+1} = s{i} * s0" for i in range(1, n))
    src = (
        "func main(private s0, public out1):\n"
        "\ts1 = s0 * s0\n" + body + f"\n\tequals(out1, s{n})\n\tout = 1 * 1\n"
    )
    from go_snark_study_tpu.circuitcompiler import parse_source

    circuit = parse_source(src)
    circuit.generate_r1cs()
    x = 3
    expect = pow(x, n + 1, C.R)
    w = circuit.calculate_witness([x], [expect], field_modulus=C.R)
    assert w[circuit.signals.index(f"s{n}")] == expect
    # python fallback agrees
    w2 = [0] * len(circuit.signals)
    import go_snark_study_tpu.circuitcompiler.circuit as cc

    native_result = circuit._witness_native(
        [1, expect, x] + [0] * (len(circuit.signals) - 3), C.R
    )
    if native_result is not None:
        assert native_result == w
