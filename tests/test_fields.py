"""Field-tower tests, pinned to the reference's golden values
(fields/fqn_test.go:22-169)."""

from go_snark_study_tpu.bn128 import constants as C
from go_snark_study_tpu.fields import Fq, Fq2, Fq6, Fq12


def test_fq_toy_modulus():
    # fields/fqn_test.go:22-45 over Z/7
    f = Fq(7)
    assert f.affine(f.add(4, 4)) == 1
    assert f.affine(f.double(5)) == 3
    assert f.affine(f.sub(5, 7)) == 5
    assert f.affine(f.neg(5)) == 2
    assert f.affine(f.mul(5, 11)) == 6
    assert f.inverse(4) == 2
    assert f.square(5) == 4
    assert f.exp(3, 4) == 81 % 7
    assert f.div(6, 2) == 3
    assert f.is_zero(0) and f.is_zero(7) and not f.is_zero(3)
    assert f.equal(8, 1)


def test_fq2_toy_modulus():
    # fields/fqn_test.go:47-84 over Z/7 with beta = -1
    f = Fq2(Fq(7), -1)
    assert f.affine(f.add((4, 4), (3, 4))) == (0, 1)
    assert f.affine(f.double((5, 3))) == (3, 6)
    assert f.affine(f.sub((5, 3), (7, 2))) == (5, 1)
    assert f.affine(f.neg((4, 4))) == (3, 3)
    assert f.affine(f.mul((4, 4), (3, 4))) == (3, 0)
    assert f.affine(f.inverse((4, 4))) == (1, 6)
    assert f.affine(f.square((4, 4))) == (0, 4)
    assert f.affine(f.square((4, 4))) == f.affine(f.mul((4, 4), (4, 4)))
    assert f.affine(f.square((3, 5))) == (5, 2)
    assert f.affine(f.square((3, 5))) == f.affine(f.mul((3, 5), (3, 5)))
    assert f.equal(f.square((4, 4)), f.mul((4, 4), (4, 4)))


def _tower():
    fq1 = Fq(C.Q)
    fq2 = Fq2(fq1, C.NON_RESIDUE_FQ2)
    fq6 = Fq6(fq2, C.NON_RESIDUE_FQ6)
    fq12 = Fq12(fq6, fq2, C.NON_RESIDUE_FQ6)
    return fq1, fq2, fq6, fq12


def test_fq6_mul_div_roundtrip():
    # fields/fqn_test.go:86-119
    _, _, fq6, _ = _tower()
    a = ((1, 2), (3, 4), (5, 6))
    b = ((12, 11), (10, 9), (8, 7))
    assert fq6.affine(fq6.div(fq6.mul(a, b), b)) == fq6.affine(a)


def test_fq12_add_mul_div():
    # fields/fqn_test.go:121-169
    _, _, _, fq12 = _tower()
    a = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
    b = (((12, 11), (10, 9), (8, 7)), ((6, 5), (4, 3), (2, 1)))
    thirteens = (((13, 13),) * 3, ((13, 13),) * 3)
    assert fq12.add(a, b) == thirteens
    assert fq12.affine(fq12.div(fq12.mul(a, b), b)) == fq12.affine(a)


def test_fq12_exp_matches_repeated_mul():
    _, _, _, fq12 = _tower()
    a = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
    acc = fq12.one()
    for _ in range(13):
        acc = fq12.mul(acc, a)
    assert fq12.affine(fq12.exp(a, 13)) == fq12.affine(acc)


def test_fq_rand_in_range_and_inverse_roundtrip():
    f = Fq(C.R)
    for _ in range(10):
        x = f.rand()
        assert 0 <= x < C.R
        if x:
            assert f.mul(x, f.inverse(x)) == 1
