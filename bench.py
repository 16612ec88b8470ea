"""Benchmark driver — runs on the real TPU chip; prints ONE JSON line.

Headline metric: Pippenger MSM throughput over G1 (points/sec/chip), the
dominant cost of Groth16 proof generation and the BASELINE.json primary
metric.  Sub-metrics (modmul throughput, NTT wall time) go to stderr.

``vs_baseline``: the reference (arnaucube/go-snark-study) publishes no
numbers and its serial double-and-add MSM is the work we replace
(snark.go:265-286), so the baseline is a measured host-side serial MSM
(python-int Jacobian double-and-add, algorithmically identical to the
reference's math/big loop) extrapolated from a sample — reported as the
speedup multiple.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    t_start = time.time()
    log("devices:", jax.devices())

    from go_snark_study_tpu.bn128 import constants as C, default_bn128
    from go_snark_study_tpu.ops.curve_ops import G1Batch
    from go_snark_study_tpu.ops.fields import fq_kernels, fr_kernels
    from go_snark_study_tpu.ops.msm import MSMEngine, scalars_to_windows
    from go_snark_study_tpu.ops.ntt import NTTEngine

    bn = default_bn128()
    Kr, Kq = fr_kernels(), fq_kernels()
    rng = random.Random(0xBEEF)

    # ---------------- modmul throughput ----------------
    n = 1 << 16
    a = jnp.asarray(np.random.RandomState(0).randint(0, 256, (32, n), dtype=np.int32))

    def chain8(x):
        for _ in range(8):
            x = Kr._mul_impl(x, a)
        return x

    f = jax.jit(chain8)
    r = f(a)
    jax.block_until_ready(r)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        r = f(r)
    jax.block_until_ready(r)
    modmul_per_s = 8 * reps * n / (time.time() - t0)
    log(f"modmul throughput: {modmul_per_s/1e6:.1f} M/s @ batch {n}")

    # ---------------- NTT ----------------
    eng = NTTEngine(Kr)
    nd = int(os.environ.get("GOSNARK_BENCH_NTT", 1 << 16))
    x = jnp.asarray(np.random.RandomState(1).randint(0, 256, (32, nd), dtype=np.int32))
    y = eng.forward(x)
    jax.block_until_ready(y)
    t0 = time.time()
    y = eng.forward(x)
    jax.block_until_ready(y)
    ntt_ms = (time.time() - t0) * 1e3
    log(f"NTT 2^{nd.bit_length()-1} forward: {ntt_ms:.1f} ms")

    # ---------------- MSM ----------------
    n_points = int(os.environ.get("GOSNARK_BENCH_MSM", 1 << 16))
    g1b = G1Batch(Kq)
    msm = MSMEngine(g1b, bn.g1, C.R)
    scalars = [rng.randrange(C.R) for _ in range(n_points)]
    # identical points: correctness oracle is cheap (sum of scalars), and
    # bucket/sort behaviour depends on the scalars, not the points
    pts = g1b.pack([bn.g1.g] * n_points)
    windows = scalars_to_windows(scalars, C.R)
    sums = msm._window_sums_jit(pts, windows)
    jax.block_until_ready(sums)
    t0 = time.time()
    sums = msm._window_sums_jit(pts, windows)
    jax.block_until_ready(sums)
    msm_dev_s = time.time() - t0
    # window combine on host (tiny)
    window_pts = g1b.unpack(sums)
    total = bn.g1.zero()
    for wp in reversed(window_pts):
        for _ in range(8):
            total = bn.g1.double(total)
        total = bn.g1.add(total, wp)
    expect = bn.g1.mul_scalar(bn.g1.g, sum(scalars) % C.R)
    ok = bn.g1.equal(total, expect)
    msm_pts_per_s = n_points / msm_dev_s
    log(f"MSM 2^{n_points.bit_length()-1} G1: {msm_dev_s*1e3:.1f} ms "
        f"({msm_pts_per_s:.0f} pts/s) correct={ok}")

    # ---------------- end-to-end fast Groth16 prove ----------------
    from go_snark_study_tpu.models import groth16 as g16m
    from go_snark_study_tpu.models.groth16_fast import FastGroth16
    from go_snark_study_tpu.synthetic import mul_chain_r1cs

    n_cons = int(os.environ.get("GOSNARK_BENCH_PROVE", 1 << 12))
    r1cs = mul_chain_r1cs(n_cons, seed=1)
    fast = FastGroth16()
    t0 = time.time()
    fsetup = fast.setup(r1cs, rng=random.Random(1))
    t_setup = time.time() - t0
    t0 = time.time()
    fproof = fast.prove(r1cs, fsetup.pk, rng=random.Random(2))
    t_prove_cold = time.time() - t0
    t0 = time.time()
    fproof = fast.prove(r1cs, fsetup.pk, rng=random.Random(3))
    t_prove = time.time() - t0
    ver_ok = g16m.verify_proof(fsetup.vk, fproof, r1cs.witness[1:2])
    log(
        f"groth16-fast 2^{n_cons.bit_length()-1} constraints: setup {t_setup:.1f}s, "
        f"prove {t_prove:.2f}s (cold {t_prove_cold:.1f}s), verified={ver_ok}"
    )

    # ---------------- serial baseline (reference-equivalent) ----------------
    sample = 8
    t0 = time.time()
    accp = bn.g1.zero()
    for s in scalars[:sample]:
        accp = bn.g1.add(accp, bn.g1.mul_scalar(bn.g1.g, s))
    serial_pts_per_s = sample / (time.time() - t0)
    log(f"serial host MSM baseline: {serial_pts_per_s:.1f} pts/s")

    if not ok or not ver_ok:
        print(json.dumps({"metric": "msm_g1_points_per_sec", "value": 0,
                          "unit": "points/s", "vs_baseline": 0,
                          "error": "correctness check failed"}))
        return

    result = {
        "metric": f"msm_g1_points_per_sec_2^{n_points.bit_length()-1}",
        "value": round(msm_pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_pts_per_s / serial_pts_per_s, 2),
        "sub": {
            "modmul_mps": round(modmul_per_s / 1e6, 1),
            f"ntt_2^{nd.bit_length()-1}_ms": round(ntt_ms, 1),
            f"groth16_prove_2^{n_cons.bit_length()-1}_s": round(t_prove, 2),
            "groth16_setup_s": round(t_setup, 1),
        },
    }
    log(f"total bench wall time: {time.time()-t_start:.1f}s")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
