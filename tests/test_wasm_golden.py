"""Golden-vector interop with the reference's wasm demo.

wasm/index.js in the reference embeds a COMPLETE serialized Pinocchio setup +
px vector for the cubic circuit (SURVEY §4: "usable as a deserialization /
prove / verify golden vector").  We parse those blobs straight out of the
read-only reference mount, deserialize with our codecs, prove with the
golden proving key, and verify with the golden verification key — proving
cross-implementation artifact compatibility end-to-end."""

import json
import os
import re

import pytest

from go_snark_study_tpu.models import pinocchio
from go_snark_study_tpu.utils import base10

WASM_JS = "/root/reference/wasm/index.js"

pytestmark = pytest.mark.skipif(
    not os.path.exists(WASM_JS), reason="reference wasm fixtures not mounted"
)


def _extract(name: str, text: str):
    m = re.search(rf"const {name} = (.*?);\n", text, re.DOTALL)
    assert m, f"const {name} not found"
    return json.loads(m.group(1))


@pytest.fixture(scope="module")
def golden():
    text = open(WASM_JS).read()
    # normalise the JS object-literal inputs ({Private: [3], ...}) to JSON
    inputs_m = re.search(r"const inputs = \{(.*?)\};", text, re.DOTALL)
    priv = json.loads(re.search(r"Private: (\[[^\]]*\])", inputs_m.group(1)).group(1))
    pub = json.loads(re.search(r"Public: (\[[^\]]*\])", inputs_m.group(1)).group(1))
    circuit = _extract("circuit", text)
    setup = _extract("setup", text)
    # two `const px` declarations exist; take the first JSON array
    px = json.loads(re.search(r"const px = (\[.*?\]);", text, re.DOTALL).group(1))
    return priv, pub, circuit, setup, px


def test_golden_circuit_deserializes_and_recompiles(golden):
    priv, pub, circuit_d, _, _ = golden
    c = base10.circuit_from_dict(circuit_d)
    assert c.signals == ["one", "s1", "s0", "s2", "s3", "s4", "s5", "out"]
    w = c.calculate_witness(priv, pub)
    assert w == [1, 35, 3, 9, 27, 30, 35, 1]
    a, b, cc = c.generate_r1cs()
    # R1CS regenerated from constraints must equal the embedded golden R1CS
    assert a == c.r1cs.A or base10.mat(a) == circuit_d["R1CS"]["A"]


def test_golden_setup_prove_verify(golden):
    priv, pub, circuit_d, setup_d, px_s = golden
    c = base10.circuit_from_dict(circuit_d)
    # the wasm demo predates the current SetupString layout: G1T sits at the
    # top level instead of inside Pk — normalise before deserializing
    if "G1T" in setup_d and "G1T" not in setup_d["Pk"]:
        setup_d = dict(setup_d)
        setup_d["Pk"] = dict(setup_d["Pk"], G1T=setup_d["G1T"])
    setup = base10.setup_from_dict(setup_d)
    px = base10.arr_i(px_s)
    w = c.calculate_witness(priv, pub)
    proof = pinocchio.generate_proofs(c, setup.pk, w, px)
    assert pinocchio.verify_proof(setup.vk, proof, pub)
    assert not pinocchio.verify_proof(setup.vk, proof, [36])
