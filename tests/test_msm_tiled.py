"""Tiled (large-N) bucket accumulation path, exercised at small scale via the
configurable tile parameters, including adversarial same-bucket runs that
span tile boundaries."""

import random

import pytest

from go_snark_study_tpu.bn128 import constants as C, default_bn128
from go_snark_study_tpu.ops.curve_ops import G1Batch
from go_snark_study_tpu.ops.fields import fq_kernels
from go_snark_study_tpu.ops.msm import MSMEngine


@pytest.fixture(scope="module")
def tiled_engine():
    bn = default_bn128()
    return (
        MSMEngine(
            G1Batch(fq_kernels()), bn.g1, C.R, tile_threshold=128, tile_steps=16
        ),
        bn,
    )


def _oracle(bn, pts, scalars):
    acc = bn.g1.zero()
    for p, s in zip(pts, scalars):
        acc = bn.g1.add(acc, bn.g1.mul_scalar(p, s))
    return acc


def test_tiled_random(tiled_engine):
    eng, bn = tiled_engine
    rng = random.Random(5)
    n = 200  # pads to 256 = 16 tiles of 16
    pts = [bn.g1.mul_scalar(bn.g1.g, rng.randrange(1, C.R)) for _ in range(8)] * 25
    scalars = [rng.randrange(C.R) for _ in range(n)]
    assert bn.g1.equal(eng.msm(pts, scalars), _oracle(bn, pts, scalars))


def test_tiled_runs_span_tiles(tiled_engine):
    # many equal digits -> single runs far longer than one tile
    eng, bn = tiled_engine
    rng = random.Random(6)
    n = 256
    pts = [bn.g1.mul_scalar(bn.g1.g, k + 1) for k in range(4)] * (n // 4)
    digit_heavy = 0x55  # same byte in every window -> maximal runs
    s_heavy = int.from_bytes(bytes([digit_heavy] * 32), "little") % C.R
    scalars = [s_heavy] * 200 + [rng.randrange(C.R) for _ in range(n - 200)]
    assert bn.g1.equal(eng.msm(pts, scalars), _oracle(bn, pts, scalars))


def test_tiled_zero_scalars_and_identities(tiled_engine):
    eng, bn = tiled_engine
    rng = random.Random(7)
    n = 192
    pts = [bn.g1.zero() if i % 7 == 0 else bn.g1.mul_scalar(bn.g1.g, i + 1) for i in range(n)]
    scalars = [0 if i % 5 == 0 else rng.randrange(C.R) for i in range(n)]
    assert bn.g1.equal(eng.msm(pts, scalars), _oracle(bn, pts, scalars))
