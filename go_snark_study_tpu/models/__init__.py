"""Proof systems ("model families"): Pinocchio/PGHR13 and Groth16.

Reference: snark.go (Pinocchio) and groth16/groth16.go.  Both protocols share
the :class:`~go_snark_study_tpu.models.context.ProtocolContext`, whose MSM
hooks route the prover's hot multi-scalar multiplications to the TPU
Pippenger engine when installed.
"""

from . import groth16, pinocchio
from .context import ProtocolContext, default_context, set_msm_backend

__all__ = ["groth16", "pinocchio", "ProtocolContext", "default_context", "set_msm_backend"]
