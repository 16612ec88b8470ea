"""Benchmark driver — runs on the real TPU chip; prints ONE JSON line.

Headline metric: END-TO-END Pippenger MSM throughput over G1 (points/sec/
chip — the full ``window_sums`` device pipeline + host window combine that
the prover actually uses), the dominant cost of Groth16 proof generation and
the BASELINE.json primary metric.  The MSM uses DISTINCT random points
kᵢ·G (random kᵢ — structured small multiples collide under signed-digit
accumulation and would trip the incomplete-formula fallback, which real
keys never do), generated on device by the fixed-base engine; the
correctness oracle is (Σ sᵢ·kᵢ)·G.  Set GOSNARK_BENCH_MSM_MODE=samepoint
for the broadcast variant.

Sub-metrics: NTT wall time at the target 2^20 domain, the Groth16 tier
ladder (setup/prove/verify at 2^14 / 2^16 / 2^18 as budget allows), modmul
throughput + MFU vs the v5e speed-of-light model.

``vs_baseline``: the reference (arnaucube/go-snark-study) publishes no
numbers and its serial double-and-add MSM is the work we replace
(snark.go:265-286), so the baseline is a measured host-side serial MSM
(python-int Jacobian double-and-add, algorithmically identical to the
reference's math/big loop) extrapolated from a sample — reported as the
speedup multiple.  The serial stage is host-only and runs FIRST (no device
dependency); if it somehow fails, the r01-measured 375.6 pts/s is used and
flagged with ``baseline_assumed``.

Robustness (the axon TPU tunnel intermittently stalls the FIRST host<->
device round-trip of a process for minutes — measured 17 s .. >420 s):

  * a dedicated ``device_warmup`` stage absorbs that stall with its own
    generous cap and is logged separately; the stage budget starts AFTER
    warmup completes;
  * the headline MSM is the first device stage, so later stalls can only
    forfeit sub-metrics;
  * a watchdog thread heartbeats the active stage every 60 s and
    force-finalizes (partial JSON + exit 2) at a hard wall cap even if the
    main thread is stuck in a blocking native call;
  * SIGTERM/SIGINT print the partial JSON and exit 128+signum, so an
    external ``timeout`` kill is visible in the exit status.

Compiles go through the persistent on-disk cache
(:mod:`go_snark_study_tpu.compile_cache`); all MSM/fixed-base programs use
canonical fixed shapes (8192-lane fixed-base tiles, 2^17-lane MSM chunks),
so a warm repo compiles nothing.

Env overrides: GOSNARK_BENCH_MSM (default 2^20 points), GOSNARK_BENCH_NTT
(default 2^20), GOSNARK_BENCH_PROVE (comma list of log2 constraint tiers,
default "16,20,14,18" — priority order, run as given after the
compile-warmup stages), GOSNARK_BENCH_MSM21 ("0"
skips the 2^21 MSM probe), GOSNARK_BENCH_BUDGET (stage seconds, default
3200 — a cold process spends most of it in the two compile-warmup
stages), GOSNARK_BENCH_WARMUP_CAP (default 600).
"""

import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()
# defaults sized so a COLD process (no cross-process compile reuse on the
# axon backend) can land the headline MSM + NTT + the 2^16 prove tier and
# still finish under the driver's observed external allowance (>= ~1700 s);
# a stalled warmup forfeits depth, never the headline (MSM runs first)
BUDGET = float(os.environ.get("GOSNARK_BENCH_BUDGET", 3200))
WARMUP_CAP = float(os.environ.get("GOSNARK_BENCH_WARMUP_CAP", 600))

RESULT = {"sub": {}}
_PRINTED = False
_STATE = {"stage": "init", "stage_t0": T0, "budget_t0": T0}

# r01-measured serial host MSM rate (pts/s) — used only if the serial
# stage fails this run, and flagged via baseline_assumed
R01_SERIAL_PTS_PER_S = 375.6


def log(*a):
    print(f"[{time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def left():
    return BUDGET - (time.time() - _STATE["budget_t0"])


def finalize(note=None):
    """Print the single JSON line exactly once, from whatever completed."""
    global _PRINTED
    if _PRINTED:
        return
    _PRINTED = True
    sub = RESULT["sub"]
    ok = RESULT.get("correct", True)
    if "serial_pts_per_s" in RESULT:
        baseline = RESULT["serial_pts_per_s"]
    else:
        baseline = R01_SERIAL_PTS_PER_S
        sub["baseline_assumed"] = True
    if "msm_pts_per_s" in RESULT and ok:
        plog = RESULT["msm_log2"]
        out = {
            "metric": f"msm_g1_points_per_sec_2^{plog}",
            "value": round(RESULT["msm_pts_per_s"], 1),
            "unit": "points/s",
            "vs_baseline": round(RESULT["msm_pts_per_s"] / baseline, 2),
            "sub": sub,
        }
    elif "modmul_mps" in sub and ok:
        out = {
            "metric": "montgomery_mul_per_sec",
            "value": round(sub["modmul_mps"] * 1e6, 0),
            "unit": "ops/s",
            # vs the same serial-MSM baseline expressed in field muls:
            # one serial point costs ~254 doubles + ~127 adds ~ 4.3k muls
            "vs_baseline": round(sub["modmul_mps"] * 1e6 / (baseline * 4300), 1),
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
    log(f"caught signal {signum} in stage {_STATE['stage']} — emitting partial result")
    finalize(note=f"interrupted by signal {signum} during {_STATE['stage']}")
    sys.exit(128 + signum)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)


def _watchdog():
    """Heartbeat + hard wall caps.  Runs as a daemon thread: even if the
    main thread is stuck inside a blocking native call (tunnel stall), the
    partial JSON still lands and the process exits nonzero.  A warmup that
    outlives WARMUP_CAP aborts immediately — nothing useful can follow a
    device that never answered."""
    while True:
        time.sleep(30)
        wall = time.time() - T0
        stage_s = time.time() - _STATE["stage_t0"]
        log(f"[hb] stage={_STATE['stage']} stage_wall={stage_s:.0f}s total={wall:.0f}s")
        if _STATE["stage"] == "device_warmup" and stage_s > WARMUP_CAP:
            log("WARMUP CAP hit — device unreachable, force-finalizing")
            finalize(note="device warmup exceeded cap (tunnel stall)")
            os._exit(3)
        if wall > WARMUP_CAP + BUDGET + 60:
            log(f"HARD CAP hit in stage {_STATE['stage']} — force-finalizing")
            finalize(note=f"hard wall cap during {_STATE['stage']}")
            os._exit(2)


threading.Thread(target=_watchdog, daemon=True).start()


def stage(name, est):
    """Decorator-ish runner: executes fn if the budget allows, fencing
    exceptions so later stages still run."""

    def run(fn):
        if left() < est:
            log(f"SKIP {name}: {left():.0f}s left < est {est:.0f}s")
            RESULT["sub"][f"skipped_{name}"] = True
            return None
        _STATE["stage"] = name
        _STATE["stage_t0"] = time.time()
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — bench must always finish
            log(f"STAGE {name} FAILED: {type(e).__name__}: {e}")
            RESULT["sub"][f"error_{name}"] = f"{type(e).__name__}: {e}"
            return None
        finally:
            _STATE["stage"] = "between-stages"

    return run


def main():
    import random

    from go_snark_study_tpu.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # CPU smoke runs: the axon TPU-relay plugin is registered by this
        # image's sitecustomize in every process; with it registered, the
        # first transfer dials the (possibly wedged) tunnel EVEN FOR CPU
        # ARRAYS.  Drop it, exactly like __graft_entry__ does.
        jax.config.update("jax_platforms", "cpu")
        try:
            import jax._src.xla_bridge as _xb

            _xb._backend_factories.pop("axon", None)
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    from go_snark_study_tpu.bn128 import constants as C, default_bn128
    from go_snark_study_tpu.ops.curve_ops import G1Batch
    from go_snark_study_tpu.ops.fields import fq_kernels, fr_kernels
    from go_snark_study_tpu.ops.fixed_base import FixedBaseEngine
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

    # ---------------- serial baseline (host-only, stall-immune) ----------
    _STATE["stage"] = "serial_baseline"
    _STATE["stage_t0"] = time.time()
    try:
        sample = 8
        t0 = time.time()
        accp = bn.g1.zero()
        for _ in range(sample):
            s = rng.randrange(C.R)
            accp = bn.g1.add(accp, bn.g1.mul_scalar(bn.g1.g, s))
        per_s = sample / (time.time() - t0)
        RESULT["serial_pts_per_s"] = per_s
        log(f"serial host MSM baseline: {per_s:.1f} pts/s")
    except Exception as e:  # noqa: BLE001
        log(f"serial baseline failed: {e}")

    # ---------------- device warmup (absorbs the tunnel stall) -----------
    # The axon tunnel has good and bad periods: a process's first round-trip
    # either answers in seconds or hangs for many minutes.  A sacrificial
    # CANARY subprocess probes until the tunnel answers (each probe has its
    # own short timeout, so a wedged probe is abandoned, not waited on);
    # only then does THIS process dial the device.
    _STATE["stage"] = "device_warmup"
    _STATE["stage_t0"] = time.time()
    import subprocess

    canary_cmd = [
        sys.executable,
        "-c",
        "import os, jax\n"
        "if 'cpu' in os.environ.get('JAX_PLATFORMS', ''):\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "    import jax._src.xla_bridge as xb\n"
        "    xb._backend_factories.pop('axon', None)\n"
        "import jax.numpy as jnp, numpy as np\n"
        "np.asarray(jnp.asarray(np.arange(8, dtype=np.int32)) + 1)\n"
        "print('canary-ok')",
    ]
    n_probe = 0
    t0 = time.time()
    while time.time() - _STATE["stage_t0"] < WARMUP_CAP - 120:
        n_probe += 1
        try:
            r = subprocess.run(
                canary_cmd, capture_output=True, timeout=90, text=True
            )
            if "canary-ok" in r.stdout:
                break
        except subprocess.TimeoutExpired:
            pass
        log(f"canary probe {n_probe}: tunnel not answering, retrying")
    RESULT["sub"]["warmup_canary_probes"] = n_probe
    t_canary = time.time() - t0
    t0 = time.time()
    log("devices:", jax.devices())
    t_dev = time.time() - t0
    t0 = time.time()
    np.asarray(jnp.asarray(np.arange(32, dtype=np.int32)) + 1)
    t_first = time.time() - t0
    t0 = time.time()
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (32, 1024), np.int32))
    jax.block_until_ready(jax.jit(lambda v: Kr._mul_impl(v, v))(x))
    t_jit = time.time() - t0
    RESULT["sub"]["warmup_s"] = {
        "canary": round(t_canary, 1),
        "device_init": round(t_dev, 1),
        "first_roundtrip": round(t_first, 1),
        "first_jit": round(t_jit, 1),
    }
    log(
        f"warmup: canary {t_canary:.1f}s ({n_probe} probes), device_init "
        f"{t_dev:.1f}s, first round-trip {t_first:.1f}s, first jit {t_jit:.1f}s"
    )
    # the stage budget starts now — warmup (tunnel-dependent) is excluded
    _STATE["budget_t0"] = time.time()

    # ---------------- shared engine set ----------------
    # ONE FastGroth16 instance supplies the G1/G2 batch groups, the MSM
    # engines, the fixed-base engines and the NTT engine for every stage,
    # so jit caches are shared in-process: the headline MSM's compiled
    # programs are exactly the ones the prove tiers reuse.
    from go_snark_study_tpu.models.groth16_fast import FastGroth16

    fast = FastGroth16()
    g1b = fast.g1b
    msm = fast.msm_g1
    fb_g1 = fast.fb_g1

    # tier ORDER is priority order (run as given, not sorted): a cold
    # driver run that gets cut should lose the cheap tiers, not the
    # headline ones — 2^16 and 2^20 ride the already-warm big family,
    # while 2^14 waits on the small-chunk family compiles
    tiers = [
        int(t)
        for t in os.environ.get("GOSNARK_BENCH_PROVE", "16,20,14,18").split(",")
        if t.strip()
    ]

    # ---------------- compile warmup, stage 1: the headline family ------
    # Precompile the canonical families from threads (the remote backend
    # overlaps compiles).  Split in two stages so the MSM headline lands
    # even if the driver cuts a long cold run: first only what the 2^20
    # G1 MSM needs, then everything else (G2, small family, fixed-base,
    # per-domain H pipelines) before the tier ladder.  est=0: never
    # skipped — nothing else can run without the compiles.
    @stage("compile_warmup", est=0)
    def _warm():
        import logging

        logging.basicConfig(level=logging.INFO, stream=sys.stderr)
        t0 = time.time()
        fast.warmup(families=("big",), domains=(), g2=False, fixed_base=True)
        RESULT["sub"]["compile_warmup_s"] = round(time.time() - t0, 1)
        log(f"compile warmup (msm family): {time.time()-t0:.1f}s")

    @stage("msm", est=120)
    def _msm():
        n_points = int(os.environ.get("GOSNARK_BENCH_MSM", 1 << 20))
        plog = n_points.bit_length() - 1
        mode = os.environ.get("GOSNARK_BENCH_MSM_MODE", "distinct")
        scalars = [rng.randrange(C.R) for _ in range(n_points)]
        t0 = time.time()
        if mode == "distinct":
            # points kᵢ·G with RANDOM kᵢ, generated ON DEVICE by the
            # fixed-base engine (packing 2^20 host points would cost more
            # than the MSM).  Random multiples mirror a real proving key
            # (commitments are indistinguishable from random group
            # elements); small structured multiples like (i+1)·G make
            # signed-digit partial sums collide with incoming points and
            # permanently trip the incomplete-formula fallback — a
            # pathology real keys never exhibit.
            from go_snark_study_tpu.ops.msm import scalars_to_windows

            ks = [rng.randrange(1, C.R) for _ in range(n_points)]
            gens = scalars_to_windows(ks, C.R)
            aff = g1b.to_affine_tiled(fb_g1.batch_mul_device(gens))
            expect_s = sum(s * k for s, k in zip(scalars, ks)) % C.R
        else:
            one = g1b.pack([bn.g1.g])
            pts = jax.tree.map(
                lambda c: jnp.broadcast_to(c, c.shape[:-1] + (n_points,)), one
            )
            aff = g1b.to_affine_tiled(pts)
            expect_s = sum(scalars) % C.R
        jax.block_until_ready(aff)
        log(f"MSM points ready ({mode}): {time.time()-t0:.1f}s")
        c_bits = msm.window_bits_for(n_points)
        limbs = scalars_to_limbs(scalars, C.R)
        run = lambda p, l: msm.window_sums_checked(p, l, c_bits)
        t0 = time.time()
        sums = run(aff, limbs)
        np.asarray(jax.tree.leaves(sums)[0][:1, :1])  # force execution
        t_compile = time.time() - t0
        log(f"MSM compile+first run: {t_compile:.1f}s (c={c_bits})")
        t0 = time.time()
        sums = run(aff, limbs)
        total = combine_window_sums(bn.g1, g1b.unpack(sums), c_bits)
        msm_s = time.time() - t0  # full end-to-end: device pipeline + combine
        expect = bn.g1.mul_scalar(bn.g1.g, expect_s)
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
        RESULT["sub"]["msm_points_mode"] = mode
        RESULT["sub"]["msm_fallback_hits"] = msm.fallback_hits
        RESULT["sub"].setdefault("mfu", {})["msm_accumulate"] = round(mfu, 3)
        log(
            f"MSM 2^{plog} G1 end-to-end: {msm_s*1e3:.1f} ms "
            f"({n_points/msm_s:.0f} pts/s, accumulate MFU {100*mfu:.0f}%) "
            f"correct={ok}"
        )

    # ---------------- NTT at the 2^20 target ----------------
    @stage("ntt", est=100)
    def _ntt():
        eng = fast.ntt
        nd = int(os.environ.get("GOSNARK_BENCH_NTT", 1 << 20))
        nlog = nd.bit_length() - 1
        x = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (32, nd), dtype=np.int32)
        )
        # timed regions END WITH A SMALL FETCH: the axon backend defers
        # execution until a host fetch, so block_until_ready alone would
        # under-measure and push the work into the next stage's fetch
        t0 = time.time()
        y = eng.forward(x)
        np.asarray(y[:1, :1])
        RESULT["sub"]["ntt_compile_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        y = eng.forward(x)
        np.asarray(y[:1, :1])
        ntt_ms = (time.time() - t0) * 1e3
        mfu = (
            (nd / 2 * nlog) * mm_cost["int32_ops"] / (ntt_ms / 1e3) / chip.int32_tops
        )
        RESULT["sub"][f"ntt_2^{nlog}_ms"] = round(ntt_ms, 1)
        RESULT["sub"].setdefault("mfu", {})["ntt_butterfly"] = round(mfu, 3)
        log(f"NTT 2^{nlog} forward: {ntt_ms:.1f} ms (butterfly-mul MFU {100*mfu:.0f}%)")

    # ---------------- modmul throughput + MFU (cheap — run it early) -----
    @stage("modmul", est=45)
    def _modmul():
        n = 1 << 20
        a = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (32, n), dtype=np.int32)
        )

        def chain8(x, y):
            # y passed as an ARGUMENT: closing over it bakes the 128 MB
            # buffer into the HLO as a literal (the 160-318 MB cache
            # entries of rounds 2-3 were exactly this)
            for _ in range(8):
                x = Kr._mul_impl(x, y)
            return x

        f = jax.jit(chain8)
        r = f(a, a)
        np.asarray(r[:1, :1])  # deferred-execution fence (see NTT stage)
        t0 = time.time()
        reps = 4
        for _ in range(reps):
            r = f(r, a)
        np.asarray(r[:1, :1])
        per_s = 8 * reps * n / (time.time() - t0)
        mfu = per_s * mm_cost["int32_ops"] / chip.int32_tops
        RESULT["sub"]["modmul_mps"] = round(per_s / 1e6, 1)
        RESULT["sub"].setdefault("mfu", {})["modmul"] = round(mfu, 3)
        log(
            f"modmul: {per_s/1e6:.1f} M/s @ batch 2^20 "
            f"(MFU {100*mfu:.0f}% of {chip.int32_tops/1e12:.1f} int32 Tops)"
        )

    # ---------------- compile warmup, stage 2: everything else ----------
    # TIME-BOXED: the G2/small/H families can cost thousands of compile
    # seconds on a bad tunnel day.  The warmup runs in a thread and the
    # ladder starts once it finishes OR 55% of the remaining budget is
    # gone — tiers then block only on the specific programs they need
    # (piece jits are lock-guarded), and every completed tier still lands.
    @stage("compile_warmup_rest", est=0)
    def _warm_rest():
        t0 = time.time()
        done = threading.Event()

        def run():
            try:
                fast.warmup(
                    families=("big", "small"),
                    domains=sorted({1 << c for c in tiers}),
                    g2=True,
                    fixed_base=True,
                )
            finally:
                done.set()

        threading.Thread(target=run, daemon=True).start()
        cap = max(120.0, 0.55 * left())
        done.wait(timeout=cap)
        RESULT["sub"]["compile_warmup_rest_s"] = round(time.time() - t0, 1)
        RESULT["sub"]["compile_warmup_rest_done"] = done.is_set()
        log(
            f"compile warmup (rest): {time.time()-t0:.1f}s "
            f"(complete={done.is_set()}; ladder starts regardless)"
        )

    # ---------------- Groth16 tier ladder ----------------
    from go_snark_study_tpu.models import groth16 as g16m
    from go_snark_study_tpu.synthetic import mul_chain_r1cs

    def _tier(clog, est):
        @stage(f"prove_2^{clog}", est=est)
        def _prove():
            n_cons = 1 << clog
            r1cs = mul_chain_r1cs(n_cons, seed=1)
            t0 = time.time()
            fsetup = fast.setup(r1cs, rng=random.Random(1), materialize_host=False)
            for leaf in jax.tree.leaves(
                (
                    fsetup.pk._device.at,
                    fsetup.pk._device.b1,
                    fsetup.pk._device.b2,
                    fsetup.pk._device.cdelta,
                    fsetup.pk._device.ptau,
                )
            ):
                jax.block_until_ready(leaf)
            np.asarray(jax.tree.leaves(fsetup.pk._device.at)[0][:1, :1])
            t_setup = time.time() - t0
            log(f"groth16-fast 2^{clog} setup: {t_setup:.1f}s (device-resident)")
            RESULT["sub"][f"groth16_setup_2^{clog}_s"] = round(t_setup, 1)
            pk_bytes = sum(
                leaf.size * leaf.dtype.itemsize
                for leaf in jax.tree.leaves(
                    (
                        fsetup.pk._device.at,
                        fsetup.pk._device.b1,
                        fsetup.pk._device.b2,
                        fsetup.pk._device.cdelta,
                        fsetup.pk._device.ptau,
                    )
                )
            )
            RESULT["sub"][f"pk_hbm_2^{clog}_mb"] = round(pk_bytes / 1e6, 1)
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
            RESULT["sub"][f"groth16_prove_cold_2^{clog}_s"] = round(t_prove_cold, 1)
            RESULT["sub"]["groth16_verify_ms"] = round(t_verify * 1e3, 1)
            RESULT["sub"]["prove_fallback_hits"] = (
                fast.msm_g1.fallback_hits + fast.msm_g2.fallback_hits
            )
            log(
                f"groth16-fast 2^{clog} constraints: prove {t_prove:.2f}s "
                f"(cold {t_prove_cold:.1f}s), verify {t_verify*1e3:.0f} ms "
                f"(4 pairings, host), verified={ver_ok}"
            )

    # est reflects the WARM cost (compile_warmup precompiled every family
    # and H domain): setup fixed-base commits dominate and scale with size.
    # Ascending order: cheap tiers land first, the 2^20 headline last.
    # tiers run UNGATED (est=0): each completed tier lands in the artifact
    # immediately, and a driver cut mid-ladder still keeps everything
    # measured so far (the signal handler emits the partial JSON)
    for clog in tiers:
        _tier(clog, est=0)

    # ---------------- MSM at 2^21 (single-chip feasibility probe) --------
    # The full 2^21 prove tier needs a ~350 s setup on top; the MSM itself
    # is the scaling question (pk residency + throughput at 2x the
    # headline) — run it if budget remains or when explicitly requested.
    @stage("msm_2^21", est=240)
    def _msm21():
        if os.environ.get("GOSNARK_BENCH_MSM21", "auto") == "0":
            return
        n_points = 1 << 21
        from go_snark_study_tpu.ops.msm import scalars_to_windows

        ks = [rng.randrange(1, C.R) for _ in range(n_points)]
        gens = scalars_to_windows(ks, C.R)
        aff = g1b.to_affine_tiled(fb_g1.batch_mul_device(gens))
        scalars = [rng.randrange(C.R) for _ in range(n_points)]
        limbs = scalars_to_limbs(scalars, C.R)
        c_bits = msm.window_bits_for(n_points)
        t0 = time.time()
        sums = msm.window_sums_checked(aff, limbs, c_bits)
        total = combine_window_sums(bn.g1, g1b.unpack(sums), c_bits)
        msm_s = time.time() - t0
        expect_s = sum(s * k for s, k in zip(scalars, ks)) % C.R
        ok = bn.g1.equal(total, bn.g1.mul_scalar(bn.g1.g, expect_s))
        RESULT["correct"] = RESULT.get("correct", True) and bool(ok)
        RESULT["sub"]["msm_2^21_ms"] = round(msm_s * 1e3, 1)
        RESULT["sub"]["msm_2^21_pts_per_s"] = round(n_points / msm_s, 1)
        log(
            f"MSM 2^21 G1: {msm_s*1e3:.1f} ms ({n_points/msm_s:.0f} pts/s) "
            f"correct={ok}"
        )

    finalize()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        log(f"FATAL: {type(e).__name__}: {e} (stage {_STATE['stage']})")
        finalize(note=f"fatal in {_STATE['stage']}: {type(e).__name__}: {e}")
        sys.exit(1)
