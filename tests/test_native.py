"""Native C++ runtime vs python oracles (skipped if the .so isn't built)."""

import random

import numpy as np
import pytest

from go_snark_study_tpu.bn128 import constants as C

native = pytest.importorskip("go_snark_study_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@pytest.fixture(scope="module")
def nf():
    return native.NativeField(C.R)


def test_pack_matches_python(nf):
    from go_snark_study_tpu.ops.fields import fr_kernels

    K = fr_kernels()
    rng = random.Random(1)
    xs = [rng.randrange(C.R) for _ in range(300)] + [0, 1, C.R - 1]
    got = nf.pack_ints(xs)
    want = K.pack_np(xs)
    assert np.array_equal(got, want)
    # and raw (non-Montgomery) mode
    assert np.array_equal(nf.pack_ints(xs, mont=False), K.pack_np(xs, mont=False))


def test_unpack_roundtrip(nf):
    rng = random.Random(2)
    xs = [rng.randrange(C.R) for _ in range(257)]
    assert nf.unpack_ints(nf.pack_ints(xs)) == xs


def test_sparse_matvec_matches_python(nf):
    from go_snark_study_tpu.synthetic import mul_chain_r1cs

    sys_ = mul_chain_r1cs(100, seed=5)
    # build CSR for A with a few negative coefficients mixed in
    rows = sys_.A
    rows[3][0] = -7  # inject a negative and a constant column
    indptr, cols, vals = [0], [], []
    for row in rows:
        for i, v in row.items():
            cols.append(i)
            vals.append(v)
        indptr.append(len(cols))
    got = nf.sparse_matvec(
        np.array(indptr), np.array(cols), np.array(vals), sys_.witness
    )
    want = [
        sum(v * sys_.witness[i] for i, v in row.items()) % C.R for row in rows
    ]
    assert got == want


def test_witness_eval_matches_python(nf):
    from go_snark_study_tpu.circuitcompiler import parse_source

    src = (
        "func main(private a, public b):\n"
        "\tc = a * a\n"
        "\td = c + a\n"
        "\te = d - 3\n"
        "\tf = e / a\n"
        "\tequals(b, f)\n"
        "\tout = 1 * 1\n"
    )
    circuit = parse_source(src)
    circuit.generate_r1cs()
    a_val = 7
    f_val = (a_val * a_val + a_val - 3) * pow(a_val, -1, C.R) % C.R
    want = circuit.calculate_witness([a_val], [f_val], field_modulus=C.R)

    # encode constraints for the native evaluator
    OPS = {"+": 0, "-": 1, "*": 2, "/": 3, "in": 4}
    rows = []
    for cons in circuit.constraints:
        if cons.op not in OPS:
            continue
        enc = [OPS[cons.op], 0, 0, 0, 0, 0, 0]
        if cons.op != "in":
            for slot, name in ((1, cons.v1), (3, cons.v2)):
                if name.isdigit():
                    enc[slot], enc[slot + 1] = 0, int(name)
                else:
                    enc[slot], enc[slot + 1] = 1, circuit.signals.index(name)
            enc[5] = circuit.signals.index(cons.out)
        rows.append(enc)
    seeded = [0] * len(circuit.signals)
    seeded[0] = 1
    seeded[1] = f_val
    seeded[2] = a_val
    got = nf.witness_eval(np.array(rows), seeded)
    assert got == want
