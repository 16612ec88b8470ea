"""Limb-kernel tests: bit-exact vs the host python-int oracle
(the acceptance criterion from SURVEY §7.2 layer 1)."""

import random

import numpy as np
import pytest

from go_snark_study_tpu.bn128 import constants as C
from go_snark_study_tpu.ops.fields import fq_kernels, fr_kernels

N = 256  # batch size for tests


@pytest.fixture(scope="module")
def rng():
    return random.Random(1234)


@pytest.fixture(scope="module", params=["fq", "fr"])
def K(request):
    return fq_kernels() if request.param == "fq" else fr_kernels()


def _rand_elems(K, rng, n=N):
    return [rng.randrange(K.p) for _ in range(n)]


def test_pack_unpack_roundtrip(K, rng):
    xs = _rand_elems(K, rng)
    assert K.unpack(K.pack(xs)) == xs
    assert K.unpack(K.pack(xs, mont=False), mont=False) == xs


def test_add_sub_neg(K, rng):
    xs, ys = _rand_elems(K, rng), _rand_elems(K, rng)
    a, b = K.pack(xs), K.pack(ys)
    assert K.unpack(K.add(a, b)) == [(x + y) % K.p for x, y in zip(xs, ys)]
    assert K.unpack(K.sub(a, b)) == [(x - y) % K.p for x, y in zip(xs, ys)]
    assert K.unpack(K.neg(a)) == [(-x) % K.p for x in xs]
    assert K.unpack(K.double(a)) == [2 * x % K.p for x in xs]


def test_mont_mul_exact(K, rng):
    xs, ys = _rand_elems(K, rng), _rand_elems(K, rng)
    a, b = K.pack(xs), K.pack(ys)
    assert K.unpack(K.mul(a, b)) == [x * y % K.p for x, y in zip(xs, ys)]
    assert K.unpack(K.square(a)) == [x * x % K.p for x in xs]


def test_mont_mul_edge_values(K):
    edge = [0, 1, 2, K.p - 1, K.p - 2, (K.p - 1) // 2, 1 << 253, K.p >> 1]
    xs = edge + edge[::-1]
    ys = edge[::-1] + edge
    a, b = K.pack(xs), K.pack(ys)
    assert K.unpack(K.mul(a, b)) == [x % K.p * (y % K.p) % K.p for x, y in zip(xs, ys)]


def test_mul_chain_stays_canonical(K, rng):
    # repeated ops must preserve the canonical-limb invariant
    xs = _rand_elems(K, rng, 64)
    a = K.pack(xs)
    acc = a
    expect = list(xs)
    for _ in range(5):
        acc = K.mul(K.add(acc, a), K.sub(acc, a))
        expect = [((e + x) * (e - x)) % K.p for e, x in zip(expect, xs)]
    got = K.unpack(acc)
    assert got == expect
    arr = np.asarray(acc)
    assert arr.min() >= 0 and arr.max() <= 255


def test_domain_conversion(K, rng):
    xs = _rand_elems(K, rng, 64)
    raw = K.pack(xs, mont=False)
    m = K.to_mont(raw)
    assert K.unpack(m) == xs
    back = K.from_mont(m)
    assert K.unpack(back, mont=False) == xs


def test_is_zero_equal(K):
    xs = [0, 1, 0, K.p - 1]
    a = K.pack(xs)
    assert list(np.asarray(K.is_zero(a))) == [True, False, True, False]
    assert list(np.asarray(K.equal(a, a))) == [True] * 4


def test_inverse_fermat():
    K = fr_kernels()
    rng = random.Random(5)
    xs = [rng.randrange(1, K.p) for _ in range(32)]
    inv = K.inverse(K.pack(xs))
    assert K.unpack(inv) == [pow(x, -1, K.p) for x in xs]


def test_mul_const():
    K = fr_kernels()
    rng = random.Random(6)
    xs = [rng.randrange(K.p) for _ in range(64)]
    k = rng.randrange(K.p)
    a = K.pack(xs)
    kk = K.pack([k])
    assert K.unpack(K.mul_const(a, kk)) == [x * k % K.p for x in xs]


def test_jit_matches_eager():
    import jax

    K = fr_kernels()
    rng = random.Random(9)
    xs, ys = [rng.randrange(K.p) for _ in range(N)], [rng.randrange(K.p) for _ in range(N)]
    a, b = K.pack(xs), K.pack(ys)
    jm = jax.jit(K.mul)
    assert K.unpack(jm(a, b)) == [x * y % K.p for x, y in zip(xs, ys)]
