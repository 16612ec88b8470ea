"""go_snark_study_tpu — a TPU-native zkSNARK proving stack.

A from-scratch re-design of the capabilities of arnaucube/go-snark-study
(flat-code circuit DSL -> R1CS -> QAP -> Pinocchio/Groth16 setup/prove/verify
over BN128) built TPU-first:

  * hot compute (field vectors, NTT, MSM, batched curve ops) runs on TPU via
    JAX/XLA/Pallas with 8-bit-limb Montgomery arithmetic in int32 lanes;
  * multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
    collectives (psum/all_gather/all_to_all) — see ``parallel/``;
  * exact host layers (Python ints) provide the latency path (pairing,
    verifier, tiny circuits) and the bit-exact parity oracle vs the Go
    reference.

Package map (SURVEY.md §7):
  fields/           host field tower Fq, Fq2, Fq6, Fq12
  bn128/            curve groups + optimal-ate pairing (host)
  ops/              TPU kernels: limb arithmetic, NTT, curve ops, MSM
  parallel/         mesh/sharding: multi-chip MSM + four-step NTT
  circuitcompiler/  flat-code DSL lexer/parser, R1CS, witness
  r1csqap/          polynomial field + QAP (parity path and NTT fast path)
  models/           proof systems: Pinocchio (PGHR13) and Groth16
  utils/            decimal/hex JSON codecs (reference wire format)
  externalverif/    circom/snarkjs proof verification
  cli/              the go-snark-cli-compatible command line
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the kernel graphs (MSM, NTT, point ops)
# are compiled per (shape, backend) and dominate cold-start latency; caching
# them on disk makes repeat processes start in seconds.
def _enable_compile_cache() -> None:
    import os

    path = os.environ.get(
        "GOSNARK_JAX_CACHE", os.path.expanduser("~/.cache/gosnark_jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()
