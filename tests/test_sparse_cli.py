"""Sparse DSL->R1CS end-to-end: large flat-code circuits through the
compiler's O(nnz) row emission, the binary keyfile, and the CLI fast flow.

The reference's dense path materialises n_constraints x n_signals cells
(circuitcompiler/circuit.go:84-148) and its QAP caps out around 20
constraints (r1csqap/r1csqap.go:130-136); these tests pin down that the
flat-code frontend now scales to the BASELINE tier sizes."""

import json
import os
import random
import subprocess
import sys

import pytest

from go_snark_study_tpu.bn128.constants import R
from go_snark_study_tpu.circuitcompiler import parse_file, parse_source
from go_snark_study_tpu.synthetic import SparseR1CS

CUBIC = """
func main(private s0, public out):
    s1 = s0 * s0
    s2 = s0 * s1
    s3 = s2 + s0
    s4 = s3 + 5
    equals(out, s4)
    out = 1 * 1
"""


def _mul_chain_source(n_chain: int) -> tuple:
    """Flat-code mul chain: t_{k} = t_{k-1} * t_{k-2}; returns
    (source, private_inputs, public_inputs)."""
    rng = random.Random(7)
    s0, s1 = rng.randrange(2, R), rng.randrange(2, R)
    lines = ["func main(private s0, private s1, public out):"]
    a, b = "s0", "s1"
    va, vb = s0, s1
    for k in range(n_chain):
        t = f"t{k}"
        lines.append(f"{t} = {a} * {b}")
        a, b = b, t
        va, vb = vb, va * vb % R
    lines.append(f"out = {b} * 1")
    return "\n".join(lines) + "\n", [s0, s1], [vb]


def test_sparse_rows_match_dense_cubic():
    circuit = parse_source(CUBIC)
    circuit.calculate_witness([3], [35], field_modulus=R)
    dense = circuit.generate_r1cs()
    sa, sb, sc = circuit.generate_r1cs_sparse()
    for drows, srows in zip(dense, (sa, sb, sc)):
        assert len(drows) == len(srows)
        for drow, srow in zip(drows, srows):
            as_dense = [0] * len(drow)
            for i, ccoef in srow.items():
                as_dense[i] = ccoef
            assert as_dense == drow


def test_sparse_from_circuit_without_dense():
    src, priv, pub = _mul_chain_source(300)  # >256: C++ witness evaluator
    circuit = parse_source(src)
    w = circuit.calculate_witness(priv, pub, field_modulus=R)
    assert not circuit.r1cs.A  # dense never generated
    sparse = SparseR1CS.from_circuit(circuit, witness=w)
    assert sparse.n_constraints == 301
    assert sparse.check()
    # equivalence with the dense route on a fresh parse
    circuit2 = parse_source(src)
    circuit2.calculate_witness(priv, pub, field_modulus=R)
    circuit2.generate_r1cs()
    dense_sparse = SparseR1CS.from_circuit(circuit2, witness=w)
    assert sparse.A == dense_sparse.A
    assert sparse.B == dense_sparse.B
    assert sparse.C == dense_sparse.C


def test_fast_prove_from_dsl_circuit():
    """DSL source -> sparse -> FastGroth16 setup/prove/verify (CPU)."""
    from go_snark_study_tpu.models import groth16 as g16m
    from go_snark_study_tpu.models.groth16_fast import FastGroth16

    src, priv, pub = _mul_chain_source(500)
    circuit = parse_source(src)
    w = circuit.calculate_witness(priv, pub, field_modulus=R)
    sparse = SparseR1CS.from_circuit(circuit, witness=w)
    fast = FastGroth16()
    setup = fast.setup(sparse, rng=random.Random(5), materialize_host=False)
    proof = fast.prove(sparse, setup.pk, rng=random.Random(6))
    assert g16m.verify_proof(setup.vk, proof, pub)


def _run_cli(tmp, argv):
    from go_snark_study_tpu.cli.main import main

    old = os.getcwd()
    os.chdir(tmp)
    try:
        return main(argv)
    finally:
        os.chdir(old)


def test_cli_fast_flow_small(tmp_path):
    """compile --fast -> groth16 trustedsetup --fast -> genproofs --fast ->
    verify, via the binary keyfile, all in a temp CWD."""
    src, priv, pub = _mul_chain_source(300)
    cpath = tmp_path / "chain.circuit"
    cpath.write_text(src)
    (tmp_path / "privateInputs.json").write_text(json.dumps([str(x) for x in priv]))
    (tmp_path / "publicInputs.json").write_text(json.dumps([str(x) for x in pub]))
    assert _run_cli(tmp_path, ["compile", "--fast", str(cpath)]) == 0
    assert not (tmp_path / "px.json").exists()
    assert _run_cli(tmp_path, ["groth16", "trustedsetup", "--fast"]) == 0
    assert (tmp_path / "trustedsetup.npz").exists()
    assert not (tmp_path / "trustedsetup.json").exists()
    assert _run_cli(tmp_path, ["groth16", "genproofs", "--fast"]) == 0
    assert _run_cli(tmp_path, ["groth16", "verify"]) == 0
    # tampered public input must fail verification
    (tmp_path / "publicInputs.json").write_text(json.dumps([str(pub[0] + 1)]))
    assert _run_cli(tmp_path, ["groth16", "verify"]) == 1


@pytest.mark.slow
def test_cli_fast_flow_2pow16(tmp_path):
    """The VERDICT-mandated tier: a 2^16-constraint DSL circuit through the
    full CLI fast flow with the C++ witness path, peak memory O(nnz)."""
    n = (1 << 16) - 1
    src, priv, pub = _mul_chain_source(n)
    cpath = tmp_path / "big.circuit"
    cpath.write_text(src)
    (tmp_path / "privateInputs.json").write_text(json.dumps([str(x) for x in priv]))
    (tmp_path / "publicInputs.json").write_text(json.dumps([str(x) for x in pub]))
    assert _run_cli(tmp_path, ["compile", "--fast", str(cpath)]) == 0
    assert _run_cli(tmp_path, ["groth16", "trustedsetup", "--fast"]) == 0
    assert _run_cli(tmp_path, ["groth16", "genproofs", "--fast"]) == 0
    assert _run_cli(tmp_path, ["groth16", "verify"]) == 0


def test_keyfile_roundtrip(tmp_path):
    from go_snark_study_tpu.models import groth16 as g16m
    from go_snark_study_tpu.models.groth16_fast import FastGroth16
    from go_snark_study_tpu.synthetic import mul_chain_r1cs
    from go_snark_study_tpu.utils import keyfile

    r1cs = mul_chain_r1cs(128, seed=3)
    fast = FastGroth16()
    setup = fast.setup(r1cs, rng=random.Random(9), materialize_host=False)
    path = str(tmp_path / "key.npz")
    keyfile.save_fast_setup(path, setup.strip_toxic())
    loaded = keyfile.load_fast_setup(path)
    assert loaded.pk._device.n == setup.pk._device.n
    proof = FastGroth16().prove(r1cs, loaded.pk, rng=random.Random(10))
    assert g16m.verify_proof(loaded.vk, proof, r1cs.witness[1:2])
