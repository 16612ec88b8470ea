"""NTT tests vs direct-evaluation oracle over Fr."""

import random

import pytest

from go_snark_study_tpu.bn128 import constants as C
from go_snark_study_tpu.ops.ntt import NTTEngine

R = C.R


@pytest.fixture(scope="module")
def eng():
    return NTTEngine()


def _direct_dft(coeffs, w, r):
    n = len(coeffs)
    return [
        sum(c * pow(w, i * j, r) for j, c in enumerate(coeffs)) % r for i in range(n)
    ]


@pytest.mark.parametrize("n", [8, 64, 256])
def test_forward_matches_direct_dft(eng, n):
    rng = random.Random(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    w = eng.root_of_unity(n)
    assert pow(w, n, R) == 1 and pow(w, n // 2, R) != 1
    got = eng.ntt_ints(coeffs)
    assert got == _direct_dft(coeffs, w, R)


@pytest.mark.parametrize("n", [8, 128])
def test_roundtrip(eng, n):
    rng = random.Random(7 * n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    assert eng.intt_ints(eng.ntt_ints(coeffs)) == coeffs


def test_poly_mul_via_ntt_matches_host(eng):
    from go_snark_study_tpu.fields import Fq
    from go_snark_study_tpu.r1csqap import PolynomialField

    rng = random.Random(99)
    pf = PolynomialField(Fq(R))
    a = [rng.randrange(R) for _ in range(60)]
    b = [rng.randrange(R) for _ in range(50)]
    want = pf.mul(a, b)

    n = 128  # >= len(a)+len(b)-1
    fa = eng.ntt_ints(a + [0] * (n - len(a)))
    fb = eng.ntt_ints(b + [0] * (n - len(b)))
    prod_evals = [x * y % R for x, y in zip(fa, fb)]
    got = eng.intt_ints(prod_evals)[: len(want)]
    assert got == want


def test_coset_vanishing_is_constant(eng):
    # Z(x) = x^n - 1 evaluated on the coset gH is the constant g^n - 1
    n = 16
    g = 5
    w = eng.root_of_unity(n)
    vals = {(pow(g * pow(w, i, R), n, R) - 1) % R for i in range(n)}
    assert vals == {(pow(g, n, R) - 1) % R}


def test_coset_shift_roundtrip(eng):
    rng = random.Random(3)
    n = 64
    coeffs = [rng.randrange(R) for _ in range(n)]
    x = eng.K.pack(coeffs)
    y = eng.coset_shift(eng.coset_shift(x, g=5), g=5, inverse=True)
    assert eng.K.unpack(y) == coeffs


def test_pallas_butterfly_matches_xla_on_tpu():
    """Bit-identity of the fused Pallas butterfly vs the XLA limb kernels on
    a tiled shape.  Runs only on a TPU backend (the conftest forces CPU, so
    this is exercised in on-chip sessions / bench environments)."""
    import jax
    import pytest as _pytest

    if jax.default_backend() not in ("tpu", "axon"):
        _pytest.skip("Pallas butterfly kernel is TPU-only")
    import random

    import numpy as np

    from go_snark_study_tpu.ops.ntt import NTTEngine, PALLAS_BF_TILE

    eng = NTTEngine()
    K = eng.K
    rng = random.Random(21)
    n = PALLAS_BF_TILE
    vals = lambda: K.pack([rng.randrange(K.p) for _ in range(n)])
    even, odd, tw = vals(), vals(), vals()
    lo_p, hi_p = eng._butterfly(even, odd, tw)  # lanes % TILE == 0 -> Pallas
    t = K._mul_impl(odd, tw)
    lo_x, hi_x = K._add_impl(even, t), K._sub_impl(even, t)
    assert np.array_equal(np.asarray(lo_p), np.asarray(lo_x))
    assert np.array_equal(np.asarray(hi_p), np.asarray(hi_x))


def test_col_fused_recursion_matches_stage_loop():
    """The fused multi-stage column transform (_col_fused: recursive
    four-step with radix-16 kernels) must equal the XLA stage loop.  On the
    CPU backend the pallas kernels are off, so the radix kernels are stood
    in by the stage-loop itself — this pins the recursion structure and the
    w^{k1*i2} twiddle tables; the TPU run compares the real fused kernels
    against GOSNARK_NTT_FUSED=0 bit-for-bit (bench/manual session)."""
    import numpy as np
    import jax.numpy as jnp

    from go_snark_study_tpu.ops.limbs import LIMBS
    from go_snark_study_tpu.ops.ntt import NTTEngine

    import random

    eng = NTTEngine()
    eng._small_ntt = lambda g, inv, interpret=False: (
        lambda x3: eng._col_transform(x3, g, inv)
    )
    rng = random.Random(9)
    for n_len, b in ((64, 256), (256, 8), (32, 16)):
        # canonical field elements (raw random limbs would be >= p, where
        # the two implementations may legitimately differ)
        vals = [rng.randrange(eng.r) for _ in range(n_len * b)]
        x3 = eng.K.pack(vals).reshape(LIMBS, n_len, b)
        for inverse in (False, True):
            got = eng._col_fused(x3, n_len, inverse)
            ref = eng._col_transform(x3, n_len, inverse)
            assert np.array_equal(np.asarray(got), np.asarray(ref)), (
                n_len,
                b,
                inverse,
            )
