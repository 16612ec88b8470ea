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


@pytest.fixture(scope="module")
def chunked_engine():
    """Canonical chunked pipeline (fixed-shape chunks + cross-chunk bucket
    accumulation), exercised at small scale: chunk_lanes=512 with window
    overrides so the CPU backend runs the exact code path the TPU uses at
    2^17-lane chunks."""
    bn = default_bn128()
    return (
        MSMEngine(
            G1Batch(fq_kernels()),
            bn.g1,
            C.R,
            window_bits=6,
            tile_threshold=128,
            tile_lanes=128,
            chunk_lanes=512,
        ),
        bn,
    )


@pytest.mark.slow
def test_chunked_multi_chunk_with_padding(chunked_engine):
    # 1200 points -> pads to 1536 = 3 chunks of 512; identity pad lanes
    eng, bn = chunked_engine
    rng = random.Random(8)
    n = 1200
    pts = [bn.g1.mul_scalar(bn.g1.g, rng.randrange(1, 1 << 20)) for _ in range(16)] * 75
    scalars = [rng.randrange(C.R) for _ in range(n)]
    assert eng._canonical(n)
    assert bn.g1.equal(eng.msm(pts, scalars), _oracle(bn, pts, scalars))


def test_chunked_heavy_runs_and_padding(chunked_engine):
    # 900 points -> pads to 1024 = 2 chunks (identity pad lanes exercised);
    # equal-digit runs crossing the chunk boundary must merge through the
    # cross-chunk bucket ADD (buckets are additive)
    eng, bn = chunked_engine
    rng = random.Random(9)
    n = 900
    pts = [bn.g1.mul_scalar(bn.g1.g, (i % 8) + 1) for i in range(n)]
    s_heavy = int.from_bytes(bytes([0x2A] * 32), "little") % C.R
    scalars = [s_heavy] * 600 + [rng.randrange(C.R) for _ in range(n - 600)]
    assert eng._canonical(n)
    assert bn.g1.equal(eng.msm(pts, scalars), _oracle(bn, pts, scalars))
