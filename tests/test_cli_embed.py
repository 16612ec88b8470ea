"""CLI file-protocol tests (reference: cli/main.go flows) and the embeddable
wasm-analog API (reference: wasm/go-snark-wasm-wrapper.go)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "go_snark_study_tpu.cli", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    shutil.copy(os.path.join(REPO, "circuitexamples", "test.circuit"), d)
    (d / "privateInputs.json").write_text("[3]")
    (d / "publicInputs.json").write_text("[35]")
    return d


def test_cli_full_pinocchio_flow(workdir):
    r = _run_cli(["compile", "test.circuit"], workdir)
    assert r.returncode == 0, r.stderr
    assert (workdir / "compiledcircuit.json").exists()
    assert (workdir / "px.json").exists()

    r = _run_cli(["trustedsetup"], workdir)
    assert r.returncode == 0, r.stderr
    setup = json.loads((workdir / "trustedsetup.json").read_text())
    assert set(setup) == {"Pk", "Vk"}  # toxic never persisted

    r = _run_cli(["genproofs"], workdir)
    assert r.returncode == 0, r.stderr
    proof = json.loads((workdir / "proofs.json").read_text())
    assert set(proof) == {"PiA", "PiAp", "PiB", "PiBp", "PiC", "PiCp", "PiH", "PiKp"}

    r = _run_cli(["verify"], workdir)
    assert r.returncode == 0, r.stderr
    assert "verified: True" in r.stdout


def test_cli_full_groth16_flow(workdir):
    # compile artifacts already present from the pinocchio flow
    r = _run_cli(["groth16", "trustedsetup"], workdir)
    assert r.returncode == 0, r.stderr
    r = _run_cli(["groth16", "genproofs"], workdir)
    assert r.returncode == 0, r.stderr
    proof = json.loads((workdir / "proofs.json").read_text())
    assert set(proof) == {"PiA", "PiB", "PiC"}
    r = _run_cli(["groth16", "verify"], workdir)
    assert r.returncode == 0, r.stderr
    assert "verified: True" in r.stdout


def test_cli_verify_fails_on_wrong_public(workdir):
    # tamper publicInputs after proving
    (workdir / "publicInputs.json").write_text("[36]")
    r = _run_cli(["groth16", "verify"], workdir)
    assert r.returncode == 1
    assert "verified: False" in r.stdout
    (workdir / "publicInputs.json").write_text("[35]")


def test_cli_wasm_flag_writes_string_variants(workdir):
    r = _run_cli(["compile", "test.circuit", "wasm"], workdir)
    assert r.returncode == 0, r.stderr
    assert (workdir / "compiledcircuitString.json").exists()
    assert (workdir / "pxString.json").exists()
    d = json.loads((workdir / "compiledcircuitString.json").read_text())
    assert isinstance(d["Witness"][0], str)  # string dialect


def test_embed_api_roundtrip():
    import random

    from go_snark_study_tpu import embed
    from go_snark_study_tpu.api import compile_circuit, pinocchio_flow
    from go_snark_study_tpu.utils import base10

    CUBIC = open(os.path.join(REPO, "circuitexamples", "test.circuit")).read()
    bundle = compile_circuit(source=CUBIC, private_inputs=[3], public_inputs=[35])
    setup, _, _ = pinocchio_flow(bundle, rng=random.Random(5))
    circuit_json = json.dumps(base10.circuit_to_dict(bundle.circuit))
    setup_json = json.dumps(base10.setup_to_dict(setup.strip_toxic()))
    px_json = json.dumps(base10.arr(bundle.px))
    proof_json = embed.generate_proofs(circuit_json, setup_json, px_json, "[3]")
    out = embed.verify_proofs(proof_json, setup_json, "[35]")
    assert json.loads(out) == {"verified": True}
    out_bad = embed.verify_proofs(proof_json, setup_json, "[34]")
    assert json.loads(out_bad) == {"verified": False}


def test_embed_server():
    import random
    import threading
    import urllib.request

    from go_snark_study_tpu import server
    from go_snark_study_tpu.api import compile_circuit, groth16_flow
    from go_snark_study_tpu.utils import base10

    CUBIC = open(os.path.join(REPO, "circuitexamples", "test.circuit")).read()
    bundle = compile_circuit(source=CUBIC, private_inputs=[3], public_inputs=[35])
    setup, proof, _ = groth16_flow(bundle, rng=random.Random(6))

    srv = server.make_server(0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        payload = json.dumps(
            {
                "proof": base10.groth_proof_to_dict(proof),
                "setup": base10.groth_setup_to_dict(setup.strip_toxic()),
                "publicInputs": ["35"],
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/grothVerifyProofs",
            data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = json.loads(resp.read())
        assert body == {"verified": True}
    finally:
        srv.shutdown()


def test_demo_page_flow():
    """The browser-harness analog (wasm/index.html + index.js): GET the demo
    page and vectors, then drive the same prove -> verify POST flow the page
    JS performs.  Vectors are GENERATED (not copied from the reference's
    index.js) but follow the same cubic-circuit demo."""
    import threading
    import urllib.request

    from go_snark_study_tpu import server

    srv = server.make_server(0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/", timeout=60) as resp:
            page = resp.read().decode()
        assert "generateProofs" in page and "demo-vectors.json" in page

        with urllib.request.urlopen(base + "/demo-vectors.json", timeout=600) as resp:
            vectors = json.loads(resp.read())
        assert set(vectors) >= {"circuit", "setup", "px", "inputs", "publicInputs"}

        def post(path, obj):
            req = urllib.request.Request(
                base + path,
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as resp:
                return json.loads(resp.read())

        proof = post(
            "/generateProofs",
            {
                "circuit": vectors["circuit"],
                "setup": vectors["setup"],
                "px": vectors["px"],
                "inputs": vectors["inputs"],
            },
        )
        assert "PiA" in json.dumps(proof) or proof  # proof object round-trips
        verdict = post(
            "/verifyProofs",
            {
                "proof": proof,
                "setup": vectors["setup"],
                "publicInputs": vectors["publicInputs"],
            },
        )
        assert verdict == {"verified": True}
    finally:
        srv.shutdown()


def test_snark_js_served_and_demo_has_groth_vectors():
    """The client-side prover assets: /snark.js is served with the four
    wasm-wrapper-parity functions present, and the demo vectors carry a
    Groth16 setup alongside the Pinocchio one."""
    import threading
    import urllib.request

    from go_snark_study_tpu import server

    srv = server.make_server(0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/snark.js", timeout=30
        ) as resp:
            js = resp.read().decode()
        for fn in (
            "generateProofs",
            "verifyProofs",
            "grothGenerateProofs",
            "grothVerifyProofs",
        ):
            assert f"function {fn}(" in js
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/demo-vectors.json", timeout=120
        ) as resp:
            vectors = json.loads(resp.read())
        assert "grothSetup" in vectors and "setup" in vectors
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30) as resp:
            page = resp.read().decode()
        assert "/snark.js" in page and "prove in browser" in page
    finally:
        srv.shutdown()
