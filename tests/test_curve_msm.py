"""Batched curve kernels + Pippenger MSM vs the host oracle."""

import random

import pytest

from go_snark_study_tpu.bn128 import constants as C, default_bn128
from go_snark_study_tpu.ops.curve_ops import G1Batch, G2Batch
from go_snark_study_tpu.ops.fields import fq_kernels
from go_snark_study_tpu.ops.msm import MSMEngine


@pytest.fixture(scope="module")
def bn():
    return default_bn128()


@pytest.fixture(scope="module")
def g1b():
    return G1Batch(fq_kernels())


@pytest.fixture(scope="module")
def g2b():
    return G2Batch(fq_kernels())


def _rand_g1(bn, rng, n):
    return [bn.g1.mul_scalar(bn.g1.g, rng.randrange(1, C.R)) for _ in range(n)]


def _rand_g2(bn, rng, n):
    return [bn.g2.mul_scalar(bn.g2.g, rng.randrange(1, C.R)) for _ in range(n)]


def test_g1_batch_add_matches_host(bn, g1b):
    rng = random.Random(11)
    pa = _rand_g1(bn, rng, 8)
    pb = _rand_g1(bn, rng, 8)
    out = g1b.unpack(g1b.add(g1b.pack(pa), g1b.pack(pb)))
    for p, q, r in zip(pa, pb, out):
        assert bn.g1.equal(bn.g1.add(p, q), r)


def test_g1_batch_add_special_cases(bn, g1b):
    rng = random.Random(12)
    p = bn.g1.mul_scalar(bn.g1.g, 77)
    q = bn.g1.mul_scalar(bn.g1.g, 99)
    zero = bn.g1.zero()
    neg_p = bn.g1.neg(p)
    # same point with different Z (non-affine equal representation)
    p_scaled = bn.g1.mul_scalar(bn.g1.g, 77)
    p_jac = (p[0] * 4 % C.Q, p[1] * 8 % C.Q, p[2] * 2 % C.Q)
    assert bn.g1.equal(p_jac, p)
    pa = [p, zero, p, p, p_jac]
    pb = [zero, q, p, neg_p, p]
    out = g1b.unpack(g1b.add(g1b.pack(pa), g1b.pack(pb)))
    assert bn.g1.equal(out[0], p)
    assert bn.g1.equal(out[1], q)
    assert bn.g1.equal(out[2], bn.g1.double(p))  # equal-points -> double
    assert bn.g1.is_zero(out[3])  # p + (-p) -> identity
    assert bn.g1.equal(out[4], bn.g1.double(p))  # projectively equal points


def test_g1_batch_double_matches_host(bn, g1b):
    rng = random.Random(13)
    pts = _rand_g1(bn, rng, 8) + [bn.g1.zero()]
    out = g1b.unpack(g1b.double(g1b.pack(pts)))
    for p, r in zip(pts, out):
        assert bn.g1.equal(bn.g1.double(p), r)


def test_g2_batch_add_double(bn, g2b):
    rng = random.Random(14)
    pa = _rand_g2(bn, rng, 4)
    pb = _rand_g2(bn, rng, 4)
    out = g2b.unpack(g2b.add(g2b.pack(pa), g2b.pack(pb)))
    for p, q, r in zip(pa, pb, out):
        assert bn.g2.equal(bn.g2.add(p, q), r)
    out2 = g2b.unpack(g2b.double(g2b.pack(pa)))
    for p, r in zip(pa, out2):
        assert bn.g2.equal(bn.g2.double(p), r)


def test_msm_g1_matches_serial(bn, g1b):
    rng = random.Random(21)
    n = 50
    pts = _rand_g1(bn, rng, n)
    scalars = [rng.randrange(C.R) for _ in range(n)]
    engine = MSMEngine(g1b, bn.g1, C.R)
    got = engine.msm(pts, scalars)
    want = bn.g1.zero()
    for p, s in zip(pts, scalars):
        want = bn.g1.add(want, bn.g1.mul_scalar(p, s))
    assert bn.g1.equal(got, want)


def test_msm_g1_edge_scalars(bn, g1b):
    rng = random.Random(22)
    pts = _rand_g1(bn, rng, 6) + [bn.g1.zero(), bn.g1.g]
    scalars = [0, 1, C.R - 1, 2, 255, 256, 12345, 0]
    engine = MSMEngine(g1b, bn.g1, C.R)
    got = engine.msm(pts, scalars)
    want = bn.g1.zero()
    for p, s in zip(pts, scalars):
        want = bn.g1.add(want, bn.g1.mul_scalar(p, s))
    assert bn.g1.equal(got, want)


def test_msm_g1_repeated_points_same_bucket(bn, g1b):
    # many copies of the same point with the same digit exercises the
    # equal-points path inside bucket accumulation
    pts = [bn.g1.g] * 16
    scalars = [7] * 16
    engine = MSMEngine(g1b, bn.g1, C.R)
    got = engine.msm(pts, scalars)
    assert bn.g1.equal(got, bn.g1.mul_scalar(bn.g1.g, 7 * 16))


@pytest.mark.slow
def test_msm_g2_matches_serial(bn, g2b):
    rng = random.Random(23)
    n = 20
    pts = _rand_g2(bn, rng, n)
    scalars = [rng.randrange(C.R) for _ in range(n)]
    engine = MSMEngine(g2b, bn.g2, C.R)
    got = engine.msm(pts, scalars)
    want = bn.g2.zero()
    for p, s in zip(pts, scalars):
        want = bn.g2.add(want, bn.g2.mul_scalar(p, s))
    assert bn.g2.equal(got, want)


def test_msm_empty_and_single(bn, g1b):
    engine = MSMEngine(g1b, bn.g1, C.R)
    assert bn.g1.is_zero(engine.msm([], []))
    got = engine.msm([bn.g1.g], [42])
    assert bn.g1.equal(got, bn.g1.mul_scalar(bn.g1.g, 42))
