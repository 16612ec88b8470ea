"""Polynomial field + QAP tests, pinned to the reference
(r1csqap/r1csqap_test.go, r1csqapFloat/r1csqapFloat_test.go)."""

from go_snark_study_tpu.bn128 import constants as C
from go_snark_study_tpu.fields import Fq
from go_snark_study_tpu.r1csqap import PolynomialField, transpose
from go_snark_study_tpu.r1csqap import float_qap as fq


def _pf() -> PolynomialField:
    return PolynomialField(Fq(C.R))


def test_transpose():
    # r1csqap_test.go:12-31
    b0, b1 = 0, 1
    a = [
        [b0, b1, b0, b0, b0, b0],
        [b0, b0, b0, b1, b0, b0],
        [b0, b1, b0, b0, b1, b0],
        [b1 * 5, b0, b0, b0, b0, b1],
    ]
    at = transpose(a)
    assert at == [
        [0, 0, 0, 5],
        [1, 0, 1, 0],
        [0, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ]


def test_pol_ops_golden():
    # r1csqap_test.go:37-95 with exact small-coefficient checks
    pf = _pf()
    b0, b1, b2, b3, b4, b5, b6 = range(7)
    a = [b1, b0, b5]  # 1 + 5x^2
    b = [b3, b0, b1]  # 3 + x^2
    # mul: (1+5x^2)(3+x^2) = 3 + 16x^2 + 5x^4
    assert pf.mul(a, b) == [3, 0, 16, 0, 5]
    # div: a / b = 5 rem (1 - 15) = -14
    quo, rem = pf.div(a, b)
    assert quo == [5]
    # the reference's Div drops exactly one coefficient per step, so the
    # remainder keeps a trailing zero (r1csqap.go:70-84)
    assert rem == [C.R - 14, 0]
    # add
    assert pf.add(a, b) == [4, 0, 6]
    # sub
    assert pf.sub(a, b) == [C.R - 2, 0, 4]
    # eval: 1+5x^2 at x=3 -> 46
    assert pf.eval(a, 3) == 46


def test_pol_div_random_roundtrip():
    import random

    pf = _pf()
    rng = random.Random(7)
    for _ in range(5):
        a = [rng.randrange(C.R) for _ in range(9)]
        b = [rng.randrange(C.R) for _ in range(4)]
        if b[-1] == 0:
            b[-1] = 1
        quo, rem = pf.div(a, b)
        recon = pf.add(pf.mul(quo, b), rem)
        assert recon[: len(a)] == [x % C.R for x in a]


def test_lagrange_interpolation():
    # r1csqap_test.go:97-114: interpolated poly evaluates to inputs at 1..n
    pf = _pf()
    values = [0, 1, 3, 4]
    alpha = pf.lagrange_interpolation(values)
    for i, v in enumerate(values):
        assert pf.eval(alpha, i + 1) == v % C.R


def test_r1cs_to_qap_vitalik_cubic():
    # r1csqap_test.go:116-176: the hand-written cubic R1CS; check the QAP
    # identities px == hx*zx (+rem 0) and ax*bx - cx == px.
    pf = _pf()
    b0, b1, b5 = 0, 1, 5
    neg = lambda x: C.R - x
    a = [
        [b0, b1, b0, b0, b0, b0],
        [b0, b0, b0, b1, b0, b0],
        [b0, b1, b0, b0, b1, b0],
        [b5, b0, b0, b0, b0, b1],
    ]
    b = [
        [b0, b1, b0, b0, b0, b0],
        [b0, b1, b0, b0, b0, b0],
        [b1, b0, b0, b0, b0, b0],
        [b1, b0, b0, b0, b0, b0],
    ]
    c = [
        [b0, b0, b0, b1, b0, b0],
        [b0, b0, b0, b0, b1, b0],
        [b0, b0, b0, b0, b0, b1],
        [b0, b0, b1, b0, b0, b0],
    ]
    alphas, betas, gammas, zx = pf.r1cs_to_qap(a, b, c)
    # the reference's quirk: z roots at 1..len(alphas)-2 = 1..4 here,
    # so z has degree 4 (length 5)
    assert len(zx) == 5
    w = [1, 3, 35, 9, 27, 30]
    ax, bx, cx, px = pf.combine_polynomials(w, alphas, betas, gammas)
    hx = pf.divisor_polynomial(px, zx)
    # px == hx * zx exactly
    assert pf.sub(pf.mul(hx, zx), px) == [0] * max(len(px), len(hx) + len(zx) - 1)
    _, rem = pf.div(px, zx)
    assert all(x == 0 for x in rem)


def test_lagrange_no_overflow_beyond_20_points():
    # the reference's int64-factorial overflows at ~21 points
    # (r1csqap.go:129-147); our field-arithmetic denominator must not.
    pf = _pf()
    values = list(range(40))
    alpha = pf.lagrange_interpolation(values)
    for i, v in enumerate(values):
        assert pf.eval(alpha, i + 1) == v


def test_float_qap_golden_z():
    # r1csqapFloat_test.go:118-119: Z(x) = [24, -50, 35, -10, 1] for n=4
    a = [[0.0, 1.0], [0.0, 1.0], [0.0, 1.0], [5.0, 0.0]]
    b = [[0.0, 1.0]] * 4
    c = [[0.0, 1.0]] * 4
    _, _, _, z = fq.r1cs_to_qap(a, b, c)
    assert z == [24.0, -50.0, 35.0, -10.0, 1.0]


def test_float_lagrange_roundtrip():
    vals = [3.0, 7.0, 1.0, 9.0]
    pol = fq.lagrange_interpolation(vals)
    for i, v in enumerate(vals):
        assert abs(fq.pol_eval(pol, float(i + 1)) - v) < 1e-6
