"""Benchmark driver — runs on the real TPU chip; prints ONE JSON line.

Headline metric: END-TO-END Pippenger MSM throughput over G1 (points/sec/
chip, pack amortised — the full ``window_sums`` device pipeline + host
window combine that the prover actually uses), the dominant cost of Groth16
proof generation and the BASELINE.json primary metric.

Sub-metrics: modmul throughput + MFU vs the v5e speed-of-light model, NTT
wall time at the target 2^20 domain, fused prove/setup wall times, pairing
verify latency.

``vs_baseline``: the reference (arnaucube/go-snark-study) publishes no
numbers and its serial double-and-add MSM is the work we replace
(snark.go:265-286), so the baseline is a measured host-side serial MSM
(python-int Jacobian double-and-add, algorithmically identical to the
reference's math/big loop) extrapolated from a sample — reported as the
speedup multiple.

Env overrides: GOSNARK_BENCH_MSM (default 2^20 points),
GOSNARK_BENCH_NTT (default 2^20), GOSNARK_BENCH_PROVE (default 2^16
constraints).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np

    log("devices:", jax.devices())

    from go_snark_study_tpu.bn128 import constants as C, default_bn128
    from go_snark_study_tpu.ops.curve_ops import G1Batch
    from go_snark_study_tpu.ops.fields import fq_kernels, fr_kernels
    from go_snark_study_tpu.ops.msm import (
        MSMEngine,
        combine_window_sums,
        scalars_to_limbs,
    )
    from go_snark_study_tpu.ops.ntt import NTTEngine
    from go_snark_study_tpu.profiling import CHIP_MODELS, kernel_cost

    bn = default_bn128()
    Kr, Kq = fr_kernels(), fq_kernels()
    rng = random.Random(0xBEEF)
    chip = CHIP_MODELS["v5e"]

    # ---------------- modmul throughput + MFU ----------------
    n = 1 << 20
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
    mm_cost = kernel_cost("mont_mul", 1)
    modmul_mfu = modmul_per_s * mm_cost["int32_ops"] / chip.int32_tops
    log(
        f"modmul: {modmul_per_s/1e6:.1f} M/s @ batch 2^20 "
        f"(MFU {100*modmul_mfu:.0f}% of {chip.int32_tops/1e12:.1f} int32 Tops)"
    )

    # ---------------- NTT at the 2^20 target ----------------
    eng = NTTEngine(Kr)
    nd = int(os.environ.get("GOSNARK_BENCH_NTT", 1 << 20))
    x = jnp.asarray(np.random.RandomState(1).randint(0, 256, (32, nd), dtype=np.int32))
    y = eng.forward(x)
    jax.block_until_ready(y)
    t0 = time.time()
    y = eng.forward(x)
    jax.block_until_ready(y)
    ntt_ms = (time.time() - t0) * 1e3
    nlog = nd.bit_length() - 1
    ntt_mfu = (
        (nd / 2 * nlog) * mm_cost["int32_ops"] / (ntt_ms / 1e3) / chip.int32_tops
    )
    log(f"NTT 2^{nlog} forward: {ntt_ms:.1f} ms (butterfly-mul MFU {100*ntt_mfu:.0f}%)")

    # ---------------- MSM end-to-end (device pipeline + combine) --------
    n_points = int(os.environ.get("GOSNARK_BENCH_MSM", 1 << 20))
    g1b = G1Batch(Kq)
    msm = MSMEngine(g1b, bn.g1, C.R)
    scalars = [rng.randrange(C.R) for _ in range(n_points)]
    # identical points: the correctness oracle is cheap (sum of scalars), and
    # bucket/sort behaviour depends on the scalars, not the points
    pts = g1b.pack([bn.g1.g] * n_points)
    c_bits = msm.window_bits_for(n_points)
    aff = jax.jit(g1b._to_affine_impl)(pts)
    jax.block_until_ready(aff)
    limbs = scalars_to_limbs(scalars, C.R)
    run = jax.jit(lambda p, l: msm.window_sums_device(p, l, c_bits))
    t0 = time.time()
    sums = run(aff, limbs)
    jax.block_until_ready(sums)
    log(f"MSM compile+first run: {time.time()-t0:.1f}s (c={c_bits})")
    t0 = time.time()
    sums = run(aff, limbs)
    jax.block_until_ready(sums)
    total = combine_window_sums(bn.g1, g1b.unpack(sums), c_bits)
    msm_s = time.time() - t0  # full end-to-end: device pipeline + combine
    expect = bn.g1.mul_scalar(bn.g1.g, sum(scalars) % C.R)
    ok = bn.g1.equal(total, expect)
    msm_pts_per_s = n_points / msm_s
    # mixed-add accounting: W passes over N points
    from go_snark_study_tpu.ops.msm import num_windows

    madds = num_windows(c_bits) * n_points
    msm_mfu = (
        madds * kernel_cost("point_add_mixed", 1)["int32_ops"] / msm_s / chip.int32_tops
    )
    plog = n_points.bit_length() - 1
    log(
        f"MSM 2^{plog} G1 end-to-end: {msm_s*1e3:.1f} ms "
        f"({msm_pts_per_s:.0f} pts/s, accumulate MFU {100*msm_mfu:.0f}%) correct={ok}"
    )

    # ---------------- end-to-end fast Groth16 ----------------
    from go_snark_study_tpu.models import groth16 as g16m
    from go_snark_study_tpu.models.groth16_fast import FastGroth16
    from go_snark_study_tpu.synthetic import mul_chain_r1cs

    n_cons = int(os.environ.get("GOSNARK_BENCH_PROVE", 1 << 16))
    clog = n_cons.bit_length() - 1
    r1cs = mul_chain_r1cs(n_cons, seed=1)
    fast = FastGroth16()
    t0 = time.time()
    fsetup = fast.setup(r1cs, rng=random.Random(1), materialize_host=False)
    jax.block_until_ready(fsetup.pk._device.at)
    t_setup = time.time() - t0
    log(f"groth16-fast 2^{clog} setup: {t_setup:.1f}s (device-resident)")
    t0 = time.time()
    fproof = fast.prove(r1cs, fsetup.pk, rng=random.Random(2))
    t_prove_cold = time.time() - t0
    t0 = time.time()
    fproof = fast.prove(r1cs, fsetup.pk, rng=random.Random(3))
    t_prove = time.time() - t0
    t0 = time.time()
    ver_ok = g16m.verify_proof(fsetup.vk, fproof, r1cs.witness[1:2])
    t_verify = time.time() - t0
    log(
        f"groth16-fast 2^{clog} constraints: prove {t_prove:.2f}s "
        f"(cold {t_prove_cold:.1f}s), verify {t_verify*1e3:.0f} ms "
        f"(4 pairings, host), verified={ver_ok}"
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
        "metric": f"msm_g1_points_per_sec_2^{plog}",
        "value": round(msm_pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_pts_per_s / serial_pts_per_s, 2),
        "sub": {
            "modmul_mps": round(modmul_per_s / 1e6, 1),
            "mfu": {
                "modmul": round(modmul_mfu, 3),
                "ntt_butterfly": round(ntt_mfu, 3),
                "msm_accumulate": round(msm_mfu, 3),
            },
            f"ntt_2^{nlog}_ms": round(ntt_ms, 1),
            f"msm_2^{plog}_ms": round(msm_s * 1e3, 1),
            f"groth16_prove_2^{clog}_s": round(t_prove, 2),
            f"groth16_setup_2^{clog}_s": round(t_setup, 1),
            "groth16_verify_ms": round(t_verify * 1e3, 1),
        },
    }
    log(f"total bench wall time: {time.time()-T0:.1f}s")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
