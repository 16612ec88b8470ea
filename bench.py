"""Benchmark driver — runs on the real TPU chip; prints ONE JSON line.

Headline metric: END-TO-END Pippenger MSM throughput over G1 (points/sec/
chip — the full ``window_sums`` device pipeline + host window combine that
the prover actually uses), the dominant cost of Groth16 proof generation and
the BASELINE.json primary metric.

Sub-metrics: modmul throughput + MFU vs the v5e speed-of-light model, NTT
wall time at the target 2^20 domain, fused prove/setup wall times, pairing
verify latency.

``vs_baseline``: the reference (arnaucube/go-snark-study) publishes no
numbers and its serial double-and-add MSM is the work we replace
(snark.go:265-286), so the baseline is a measured host-side serial MSM
(python-int Jacobian double-and-add, algorithmically identical to the
reference's math/big loop) extrapolated from a sample — reported as the
speedup multiple.

Robustness: every stage is individually fenced by a wall-clock budget
(``GOSNARK_BENCH_BUDGET``, default 600 s) and a try/except; the final JSON
line is ALWAYS printed — on normal completion, on a stage failure, and on
SIGTERM/SIGINT (e.g. an external ``timeout``).  Compiles go through the
persistent on-disk cache (:mod:`go_snark_study_tpu.compile_cache`), so a
warm repo compiles in seconds.

Env overrides: GOSNARK_BENCH_MSM (default 2^20 points),
GOSNARK_BENCH_NTT (default 2^20), GOSNARK_BENCH_PROVE (default 2^16
constraints), GOSNARK_BENCH_BUDGET (seconds).
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()
BUDGET = float(os.environ.get("GOSNARK_BENCH_BUDGET", 600))

RESULT = {"sub": {}}
_PRINTED = False


def log(*a):
    print(f"[{time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def left():
    return BUDGET - (time.time() - T0)


def finalize(note=None):
    """Print the single JSON line exactly once, from whatever completed."""
    global _PRINTED
    if _PRINTED:
        return
    _PRINTED = True
    sub = RESULT["sub"]
    ok = RESULT.get("correct", True)
    if "msm_pts_per_s" in RESULT and ok:
        plog = RESULT["msm_log2"]
        out = {
            "metric": f"msm_g1_points_per_sec_2^{plog}",
            "value": round(RESULT["msm_pts_per_s"], 1),
            "unit": "points/s",
            "vs_baseline": round(
                RESULT["msm_pts_per_s"] / RESULT.get("serial_pts_per_s", 375.6), 2
            ),
            "sub": sub,
        }
    elif "modmul_mps" in sub and ok:
        out = {
            "metric": "montgomery_mul_per_sec",
            "value": round(sub["modmul_mps"] * 1e6, 0),
            "unit": "ops/s",
            "vs_baseline": round(sub["modmul_mps"] * 1e6 / 2.2e6, 1),
            "sub": sub,
        }
    else:
        out = {
            "metric": "msm_g1_points_per_sec",
            "value": 0,
            "unit": "points/s",
            "vs_baseline": 0,
            "error": note or "no stage completed / correctness failed",
            "sub": sub,
        }
    if note:
        out["note"] = note
    log(f"total bench wall time: {time.time()-T0:.1f}s")
    print(json.dumps(out), flush=True)


def _on_signal(signum, frame):
    log(f"caught signal {signum} — emitting partial result")
    finalize(note=f"interrupted by signal {signum}")
    sys.exit(0)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)


def stage(name, est):
    """Decorator-ish runner: executes fn if the budget allows, fencing
    exceptions so later stages still run."""

    def run(fn):
        if left() < est:
            log(f"SKIP {name}: {left():.0f}s left < est {est:.0f}s")
            RESULT["sub"][f"skipped_{name}"] = True
            return None
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — bench must always finish
            log(f"STAGE {name} FAILED: {type(e).__name__}: {e}")
            RESULT["sub"][f"error_{name}"] = f"{type(e).__name__}: {e}"
            return None

    return run


def main():
    import random

    from go_snark_study_tpu.compile_cache import enable_compile_cache

    enable_compile_cache()

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
        num_windows,
        scalars_to_limbs,
    )
    from go_snark_study_tpu.ops.ntt import NTTEngine
    from go_snark_study_tpu.profiling import CHIP_MODELS, kernel_cost

    bn = default_bn128()
    Kr, Kq = fr_kernels(), fq_kernels()
    rng = random.Random(0xBEEF)
    chip = CHIP_MODELS["v5e"]
    mm_cost = kernel_cost("mont_mul", 1)

    # ---------------- modmul throughput + MFU ----------------
    @stage("modmul", est=45)
    def _modmul():
        n = 1 << 20
        a = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (32, n), dtype=np.int32)
        )

        def chain8(x):
            for _ in range(8):
                x = Kr._mul_impl(x, a)
            return x

        f = jax.jit(chain8)
        r = f(a)
        np.asarray(r[:, :1])  # force execution (axon defers until a fetch)
        t0 = time.time()
        reps = 4
        for _ in range(reps):
            r = f(r)
        np.asarray(r[:, :1])
        per_s = 8 * reps * n / (time.time() - t0)
        mfu = per_s * mm_cost["int32_ops"] / chip.int32_tops
        RESULT["sub"]["modmul_mps"] = round(per_s / 1e6, 1)
        RESULT["sub"].setdefault("mfu", {})["modmul"] = round(mfu, 3)
        log(
            f"modmul: {per_s/1e6:.1f} M/s @ batch 2^20 "
            f"(MFU {100*mfu:.0f}% of {chip.int32_tops/1e12:.1f} int32 Tops)"
        )

    # ---------------- MSM end-to-end (headline) ----------------
    g1b = G1Batch(Kq)
    msm = MSMEngine(g1b, bn.g1, C.R)

    @stage("msm", est=120)
    def _msm():
        n_points = int(os.environ.get("GOSNARK_BENCH_MSM", 1 << 20))
        plog = n_points.bit_length() - 1
        scalars = [rng.randrange(C.R) for _ in range(n_points)]
        # identical points: the correctness oracle is cheap (sum of
        # scalars), and bucket/sort behaviour depends on the scalars, not
        # the points.  Broadcast ONE packed generator to N lanes (packing
        # 2^20 host points would cost more than the MSM itself).
        one = g1b.pack([bn.g1.g])
        pts = jax.tree.map(lambda c: jnp.broadcast_to(c, c.shape[:-1] + (n_points,)), one)
        c_bits = msm.window_bits_for(n_points)
        aff = jax.jit(g1b._to_affine_impl)(pts)
        jax.block_until_ready(aff)
        limbs = scalars_to_limbs(scalars, C.R)
        run = lambda p, l: msm.window_sums_eager(p, l, c_bits)
        t0 = time.time()
        sums = run(aff, limbs)
        g1b.unpack(sums)  # force execution (axon defers until a fetch)
        t_compile = time.time() - t0
        log(f"MSM compile+first run: {t_compile:.1f}s (c={c_bits})")
        t0 = time.time()
        sums = run(aff, limbs)
        jax.block_until_ready(sums)
        total = combine_window_sums(bn.g1, g1b.unpack(sums), c_bits)
        msm_s = time.time() - t0  # full end-to-end: device pipeline + combine
        expect = bn.g1.mul_scalar(bn.g1.g, sum(scalars) % C.R)
        ok = bn.g1.equal(total, expect)
        RESULT["correct"] = RESULT.get("correct", True) and bool(ok)
        madds = num_windows(c_bits) * n_points
        mfu = (
            madds
            * kernel_cost("point_add_mixed", 1)["int32_ops"]
            / msm_s
            / chip.int32_tops
        )
        RESULT["msm_pts_per_s"] = n_points / msm_s
        RESULT["msm_log2"] = plog
        RESULT["sub"][f"msm_2^{plog}_ms"] = round(msm_s * 1e3, 1)
        RESULT["sub"]["msm_compile_s"] = round(t_compile, 1)
        RESULT["sub"].setdefault("mfu", {})["msm_accumulate"] = round(mfu, 3)
        log(
            f"MSM 2^{plog} G1 end-to-end: {msm_s*1e3:.1f} ms "
            f"({n_points/msm_s:.0f} pts/s, accumulate MFU {100*mfu:.0f}%) "
            f"correct={ok}"
        )

    # ---------------- NTT at the 2^20 target ----------------
    @stage("ntt", est=60)
    def _ntt():
        eng = NTTEngine(Kr)
        nd = int(os.environ.get("GOSNARK_BENCH_NTT", 1 << 20))
        nlog = nd.bit_length() - 1
        x = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (32, nd), dtype=np.int32)
        )
        y = eng.forward(x)
        np.asarray(y[:, :1])  # force execution (axon defers until a fetch)
        t0 = time.time()
        y = eng.forward(x)
        np.asarray(y[:, :1])
        ntt_ms = (time.time() - t0) * 1e3
        mfu = (
            (nd / 2 * nlog) * mm_cost["int32_ops"] / (ntt_ms / 1e3) / chip.int32_tops
        )
        RESULT["sub"][f"ntt_2^{nlog}_ms"] = round(ntt_ms, 1)
        RESULT["sub"].setdefault("mfu", {})["ntt_butterfly"] = round(mfu, 3)
        log(f"NTT 2^{nlog} forward: {ntt_ms:.1f} ms (butterfly-mul MFU {100*mfu:.0f}%)")

    # ---------------- end-to-end fast Groth16 ----------------
    @stage("prove", est=150)
    def _prove():
        from go_snark_study_tpu.models import groth16 as g16m
        from go_snark_study_tpu.models.groth16_fast import FastGroth16
        from go_snark_study_tpu.synthetic import mul_chain_r1cs

        n_cons = int(os.environ.get("GOSNARK_BENCH_PROVE", 1 << 16))
        if left() < 240 and n_cons > (1 << 14):
            n_cons = 1 << 14
            log(f"budget-downshift: prove at 2^14 ({left():.0f}s left)")
        clog = n_cons.bit_length() - 1
        r1cs = mul_chain_r1cs(n_cons, seed=1)
        fast = FastGroth16()
        t0 = time.time()
        fsetup = fast.setup(r1cs, rng=random.Random(1), materialize_host=False)
        for leaf in jax.tree.leaves(fsetup.pk._device.at):
            np.asarray(leaf[:, :1])  # force execution (axon defers)
        t_setup = time.time() - t0
        log(f"groth16-fast 2^{clog} setup: {t_setup:.1f}s (device-resident)")
        RESULT["sub"][f"groth16_setup_2^{clog}_s"] = round(t_setup, 1)
        t0 = time.time()
        fproof = fast.prove(r1cs, fsetup.pk, rng=random.Random(2))
        t_prove_cold = time.time() - t0
        t0 = time.time()
        fproof = fast.prove(r1cs, fsetup.pk, rng=random.Random(3))
        t_prove = time.time() - t0
        t0 = time.time()
        ver_ok = g16m.verify_proof(fsetup.vk, fproof, r1cs.witness[1:2])
        t_verify = time.time() - t0
        RESULT["correct"] = RESULT.get("correct", True) and bool(ver_ok)
        RESULT["sub"][f"groth16_prove_2^{clog}_s"] = round(t_prove, 2)
        RESULT["sub"]["groth16_prove_cold_s"] = round(t_prove_cold, 1)
        RESULT["sub"]["groth16_verify_ms"] = round(t_verify * 1e3, 1)
        log(
            f"groth16-fast 2^{clog} constraints: prove {t_prove:.2f}s "
            f"(cold {t_prove_cold:.1f}s), verify {t_verify*1e3:.0f} ms "
            f"(4 pairings, host), verified={ver_ok}"
        )

    # ---------------- serial baseline (reference-equivalent) --------------
    @stage("serial_baseline", est=10)
    def _serial():
        sample = 8
        t0 = time.time()
        accp = bn.g1.zero()
        for _ in range(sample):
            s = rng.randrange(C.R)
            accp = bn.g1.add(accp, bn.g1.mul_scalar(bn.g1.g, s))
        per_s = sample / (time.time() - t0)
        RESULT["serial_pts_per_s"] = per_s
        log(f"serial host MSM baseline: {per_s:.1f} pts/s")

    finalize()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        log(f"FATAL: {type(e).__name__}: {e}")
        finalize(note=f"fatal: {type(e).__name__}: {e}")
        sys.exit(0)
