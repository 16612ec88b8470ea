"""The sharded "training step" of the prover: one fused, jitted program that
runs the two hot phases of Groth16 proof generation over a device mesh:

  * the witness MSM (data-parallel Pippenger window sums, points sharded,
    combined with all_gather + tree adds), and
  * the H(x) pipeline (four-step NTTs with all_to_all transposes: forward
    transforms of a/b/c evaluations, pointwise p = a*b - c on the coset,
    inverse transform).

This is what ``__graft_entry__.dryrun_multichip`` compiles and runs on an
N-virtual-device mesh, and what the large-circuit prover invokes per proof.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..bn128 import constants as C, default_bn128
from ..ops.curve_ops import G1Batch
from ..ops.fields import fq_kernels, fr_kernels
from ..ops.ntt import NTTEngine
from .sharded_msm import ShardedMSMEngine
from .sharded_ntt import FourStepNTT

__all__ = ["make_sharded_prove_step"]


def make_sharded_prove_step(mesh: Mesh, n_points: int, n_domain: int):
    """Returns (step_fn, example_args).

    step_fn(points, windows, a_coeffs, b_coeffs, c_coeffs) ->
        (msm_window_sums, h_coeffs)

    where points is a batched G1 pytree with n_points lanes, windows is
    (32, n_points) scalar digits, and the coefficient vectors are
    (32, n_domain) Fr Montgomery limbs.
    """
    bn = default_bn128()
    Kq, Kr = fq_kernels(), fr_kernels()
    g1b = G1Batch(Kq)
    msm = ShardedMSMEngine(g1b, bn.g1, C.R, mesh)
    fs = FourStepNTT(mesh, NTTEngine(Kr))

    ndev = mesh.devices.size
    msm_fn = msm._build(msm.window_bits_for(max(1, n_points // ndev)))
    ntt_fwd = fs._build(n_domain, False)
    ntt_inv = fs._build(n_domain, True)
    n1, n2 = fs.split(n_domain)
    tw_f = jnp.asarray(fs._twiddle_table(n_domain, False))
    tw_i = jnp.asarray(fs._twiddle_table(n_domain, True))
    L = 32

    def step(points, windows, a_c, b_c, c_c):
        sums, _bad = msm_fn(points, windows)
        shape3 = (L, n1, n2)
        ae = ntt_fwd(a_c.reshape(shape3), tw_f)
        be = ntt_fwd(b_c.reshape(shape3), tw_f)
        ce = ntt_fwd(c_c.reshape(shape3), tw_f)
        flat = lambda x: x.reshape(L, n_domain)
        p = Kr._sub_impl(Kr._mul_impl(flat(ae), flat(be)), flat(ce))
        h = ntt_inv(p.reshape(shape3), tw_i).reshape(L, n_domain)
        return sums, h

    # tiny example args
    import numpy as np

    pts = g1b.pack([bn.g1.g] * n_points)
    windows = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (32, n_points), dtype=np.int32)
    )
    coeff = lambda seed: jnp.asarray(
        np.random.RandomState(seed).randint(0, 256, (L, n_domain), dtype=np.int32)
    )
    example = (pts, windows, coeff(1), coeff(2), coeff(3))
    return jax.jit(step), example
