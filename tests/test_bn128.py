"""BN128 group + pairing tests, pinned to the reference's golden values
(bn128/g1_test.go, g2_test.go, bn128_test.go)."""

import pytest

from go_snark_study_tpu.bn128 import Bn128, constants as C, default_bn128


@pytest.fixture(scope="module")
def bn() -> Bn128:
    return default_bn128()


def test_reference_constants(bn):
    # derived constants must equal the reference's hard-coded ones
    # (bn128/bn128.go:40-169); the 2790-bit final-exp integer is read straight
    # out of the reference source rather than transcribed.
    import os, re

    ref_src = "/root/reference/bn128/bn128.go"
    if os.path.exists(ref_src):
        m = re.search(r'SetString\("(5524842\d+)", 10\)', open(ref_src).read())
        assert m and int(m.group(1)) == C.FINAL_EXP
    assert C.FINAL_EXP == (C.Q**12 - 1) // C.R
    assert bn.twist_mul_by_qx == (
        21575463638280843010398324269430826099269044274347216827212613867836435027261,
        10307601595873709700152284273816112264069230130616436755625194854815875713954,
    )
    assert bn.twist_mul_by_qy == (
        2821565182194536844548159561693502659359617185244120367078079554186484126554,
        3505843767911556378687030309984248845540243509899259641013678093033130930403,
    )
    assert bn.frobenius_coeffs_c11 == C.Q - 1
    # Fr 2-adicity / NTT root
    assert pow(C.ROOT_OF_UNITY, 1 << C.TWO_ADICITY, C.R) == 1
    assert pow(C.ROOT_OF_UNITY, 1 << (C.TWO_ADICITY - 1), C.R) != 1


def test_g1_homomorphism_and_golden_coords(bn):
    # bn128/g1_test.go:13-31
    g1 = bn.g1
    gr1 = g1.mul_scalar(g1.g, 33)
    gr2 = g1.mul_scalar(g1.g, 44)
    grsum1 = g1.add(gr1, gr2)
    grsum2 = g1.mul_scalar(g1.g, 77)
    assert g1.equal(grsum1, grsum2)
    a = g1.affine(grsum1)
    assert a == g1.affine(grsum2)
    assert format(a[0], "x") == "2f978c0ab89ebaa576866706b14787f360c4d6c3869efe5a72f7c3651a72ff00"
    assert format(a[1], "x") == "12e4ba7f0edca8b4fa668fe153aebd908d322dc26ad964d4cd314795844b62b2"


def test_g1_on_curve_and_order(bn):
    g1 = bn.g1
    x, y = g1.affine(g1.mul_scalar(g1.g, 123456789))
    assert (y * y - (x * x * x + 3)) % C.Q == 0
    assert g1.is_zero(g1.mul_scalar(g1.g, C.R))


def test_g2_homomorphism(bn):
    # bn128/g2_test.go:10-24
    g2 = bn.g2
    gr1 = g2.affine(g2.mul_scalar(g2.g, 33))
    gr2 = g2.affine(g2.mul_scalar(g2.g, 44))
    grsum1 = g2.affine(g2.add(gr1, gr2))
    grsum2 = g2.affine(g2.mul_scalar(g2.g, 77))
    assert g2.equal(grsum1, grsum2)
    assert g2.is_zero(g2.mul_scalar(g2.g, C.R))


def test_miller_bilinearity_ratio(bn):
    # bn128/bn128_test.go:11-43: e(40G1,75G2) / e(75G1,40G2) == 1
    g1a = bn.g1.mul_scalar(bn.g1.g, 40)
    g2a = bn.g2.mul_scalar(bn.g2.g, 75)
    g1b = bn.g1.mul_scalar(bn.g1.g, 75)
    g2b = bn.g2.mul_scalar(bn.g2.g, 40)
    r1 = bn.miller_loop(bn.precompute_g1(g1a), bn.precompute_g2(g2a))
    r2 = bn.miller_loop(bn.precompute_g1(g1b), bn.precompute_g2(g2b))
    rbe = bn.fq12.mul(r1, bn.fq12.inverse(r2))
    res = bn.final_exponentiation(rbe)
    assert bn.fq12.equal(res, bn.fq12.one())


def test_pairing_symmetry_nonzero(bn):
    # bn128/bn128_test.go:45-67
    pa = bn.pairing(bn.g1.mul_scalar(bn.g1.g, 25), bn.g2.mul_scalar(bn.g2.g, 30))
    pb = bn.pairing(bn.g1.mul_scalar(bn.g1.g, 30), bn.g2.mul_scalar(bn.g2.g, 25))
    assert bn.fq12.equal(pa, pb)
    assert bn.fq12.affine(pa)[0][0][0] != 0


def test_pairing_exponent_bilinearity(bn):
    # bn128/bn128_test.go:69-88
    gt = bn.pairing(bn.g1.g, bn.g2.g)
    gt6 = bn.fq12.exp(gt, 6)
    assert bn.fq12.equal(gt6, bn.pairing(bn.g1.g, bn.g2.mul_scalar(bn.g2.g, 6)))
    assert bn.fq12.equal(gt6, bn.pairing(bn.g1.mul_scalar(bn.g1.g, 6), bn.g2.g))
    assert bn.fq12.equal(
        gt6, bn.pairing(bn.g1.mul_scalar(bn.g1.g, 3), bn.g2.mul_scalar(bn.g2.g, 2))
    )
    assert bn.fq12.equal(
        gt6, bn.pairing(bn.g1.mul_scalar(bn.g1.g, 2), bn.g2.mul_scalar(bn.g2.g, 3))
    )


def test_fast_final_exp_matches_naive(bn):
    # the fast easy/hard decomposition must agree with the reference's naive
    # Fq12.Exp by (q^12-1)/r (bn128/bn128.go:418-421) — checked on a Miller
    # loop output (an element of the right subgroup's coset).
    f = bn.miller_loop(
        bn.precompute_g1(bn.g1.mul_scalar(bn.g1.g, 7)),
        bn.precompute_g2(bn.g2.mul_scalar(bn.g2.g, 11)),
    )
    fast = bn.final_exponentiation(f)
    naive = bn.final_exponentiation_naive(f)
    assert bn.fq12.equal(fast, naive)
