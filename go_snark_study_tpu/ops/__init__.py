"""TPU compute kernels (JAX/XLA/Pallas).

The compute core the reference runs serially on ``math/big``
(SURVEY §2.9 mapping table), rebuilt TPU-first:

  limbs.py         batched 254-bit Montgomery arithmetic, 8-bit limbs/int32
  fields.py        shared Fq/Fr kernel instances for BN128
  curve_ops.py     branchless batched Jacobian G1/G2 point add/double
  msm.py           Pippenger bucket MSM (sort + segmented scan)
  ntt.py           radix-2 NTT over Fr (2-adicity 28)
  pallas_field.py  fused Pallas kernels for the hot limb ops
"""

from .limbs import LIMBS, LIMB_BITS, FieldKernels

__all__ = ["LIMBS", "LIMB_BITS", "FieldKernels"]
