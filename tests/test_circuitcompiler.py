"""Compiler golden-vector tests, pinned to the reference
(circuitcompiler/circuit_test.go:13-248)."""

import os

import pytest

from go_snark_study_tpu.circuitcompiler import (
    CircuitError,
    ParseError,
    parse_file,
    parse_source,
)

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "circuitexamples")

CUBIC = """
func main(private s0, public s1):
	s2 = s0 * s0
	s3 = s2 * s0
	s4 = s3 + s0
	s5 = s4 + 5
	equals(s1, s5)
	out = 1 * 1
"""

# golden vectors for the inline cubic (circuit_test.go:38-68); signals
# ["one", "s1", "s0", "s2", "s3", "s4", "s5", "out"]
A_INLINE = [
    [0, 0, 1, 0, 0, 0, 0, 0],
    [0, 0, 0, 1, 0, 0, 0, 0],
    [0, 0, 1, 0, 1, 0, 0, 0],
    [5, 0, 0, 0, 0, 1, 0, 0],
    [0, 0, 0, 0, 0, 0, 1, 0],
    [0, 1, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
]
B_INLINE = [
    [0, 0, 1, 0, 0, 0, 0, 0],
    [0, 0, 1, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
]
# golden vectors for the func-call / import variants (circuit_test.go:119-151);
# signals ["one", "s1", "s0", "b0", "s3", "s4", "s5", "out"]
A_FN = [
    [0, 0, 1, 0, 0, 0, 0, 0],
    [0, 0, 1, 0, 0, 0, 0, 0],
    [0, 0, 1, 0, 1, 0, 0, 0],
    [5, 0, 0, 0, 0, 1, 0, 0],
    [0, 0, 0, 0, 0, 0, 1, 0],
    [0, 1, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
]
B_FN = [
    [0, 0, 1, 0, 0, 0, 0, 0],
    [0, 0, 0, 1, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
    [1, 0, 0, 0, 0, 0, 0, 0],
]
# C is identical in both variants (circuit_test.go:58-68, 147-157)
C_EXPECTED = [
    [0, 0, 0, 1, 0, 0, 0, 0],
    [0, 0, 0, 0, 1, 0, 0, 0],
    [0, 0, 0, 0, 0, 1, 0, 0],
    [0, 0, 0, 0, 0, 0, 1, 0],
    [0, 1, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 1, 0],
    [0, 0, 0, 0, 0, 0, 0, 1],
]
W_EXPECTED = [1, 35, 3, 9, 27, 30, 35, 1]


def test_cubic_inline():
    circuit = parse_source(CUBIC)
    a, b, c = circuit.generate_r1cs()
    assert circuit.private_inputs == ["s0"]
    assert circuit.public_inputs == ["s1"]
    assert circuit.signals == ["one", "s1", "s0", "s2", "s3", "s4", "s5", "out"]
    assert a == A_INLINE
    assert b == B_INLINE
    assert c == C_EXPECTED
    assert circuit.calculate_witness([3], [35]) == W_EXPECTED
    assert circuit.n_public == 1
    assert circuit.n_vars == 8 and circuit.n_signals == 8


def test_cubic_with_function_calls():
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
    circuit = parse_source(code)
    a, b, c = circuit.generate_r1cs()
    assert circuit.signals == ["one", "s1", "s0", "b0", "s3", "s4", "s5", "out"]
    assert a == A_FN
    assert b == B_FN
    assert c == C_EXPECTED
    assert circuit.calculate_witness([3], [35]) == W_EXPECTED


def test_cubic_from_file_with_imports():
    circuit = parse_file(os.path.join(EXAMPLES, "import-example.circuit"))
    a, b, c = circuit.generate_r1cs()
    assert circuit.signals == ["one", "s1", "s0", "b0", "s3", "s4", "s5", "out"]
    assert a == A_FN
    assert b == B_FN
    assert c == C_EXPECTED
    assert circuit.calculate_witness([3], [35]) == W_EXPECTED


def test_factor_circuit():
    circuit = parse_file(os.path.join(EXAMPLES, "factor.circuit"))
    circuit.generate_r1cs()
    w = circuit.calculate_witness([7, 6], [42])
    # witness layout: [one, c, a, b, d, out]
    assert w[0] == 1 and w[1] == 42 and w[2] == 7 and w[3] == 6 and w[4] == 42


def test_witness_satisfies_r1cs_mod_r():
    from go_snark_study_tpu.bn128 import constants as C

    circuit = parse_source(CUBIC)
    a, b, c = circuit.generate_r1cs()
    w = circuit.calculate_witness([3], [35])
    for ra, rb, rc in zip(a, b, c):
        lhs = sum(x * y for x, y in zip(ra, w)) * sum(x * y for x, y in zip(rb, w))
        rhs = sum(x * y for x, y in zip(rc, w))
        assert (lhs - rhs) % C.R == 0


def test_no_main_raises():
    with pytest.raises(ParseError):
        parse_source("func foo(private a):\n\tb = a * a\n\treturn b\n")


def test_use_before_set_raises():
    circuit = parse_source(
        "func main(private a, public b):\n\tc = a * zz\n\tequals(b, c)\n\tout = 1 * 1\n"
    )
    with pytest.raises(CircuitError):
        circuit.generate_r1cs()


def test_division_witness_euclidean():
    # '/' in witness calc is integer (Euclidean) division like Go's big.Int.Div
    circuit = parse_source(
        "func main(private a, public b):\n\tc = a / 3\n\tequals(b, c)\n\tout = 1 * 1\n"
    )
    circuit.generate_r1cs()
    assert circuit.calculate_witness([7], [2])[circuit.signals.index("c")] == 2


def test_field_semantics_mode():
    from go_snark_study_tpu.bn128 import constants as C

    circuit = parse_source(
        "func main(private a, public b):\n\tc = a / 3\n\tequals(b, c)\n\tout = 1 * 1\n"
    )
    circuit.generate_r1cs()
    inv3 = pow(3, -1, C.R)
    w = circuit.calculate_witness([7], [7 * inv3 % C.R], field_modulus=C.R)
    assert w[circuit.signals.index("c")] == 7 * inv3 % C.R
