"""External-toolchain interop: verify circom/snarkjs Groth16 proofs."""

from .circom import CircomProof, CircomVk, verify_from_circom

__all__ = ["CircomProof", "CircomVk", "verify_from_circom"]
