"""Oracle BPC gates: encoder and decoder are exact inverses per codeblock."""

import numpy as np
import pytest

from picsong_tpu.core import spec
from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.reference.bpc import (consecutive_bitplanes, decode_codeblock,
                                       encode_codeblock, find_subband)

PARAMS = LUTParams()
WL = 2
LUT = neutral_lut(PARAMS, WL, 2)
LUT3 = neutral_lut(PARAMS, WL, 3)


def random_lut(seed, coding_passes=2, n_groups=1):
    rng = np.random.default_rng(seed)
    size = PARAMS.size_per_group(WL, coding_passes) * n_groups
    return rng.integers(1, 127, size=size).astype(np.int32)


def roundtrip(block, lut=LUT, cp=2, k=0.0, level=0, subband=0):
    stream, size = encode_codeblock(block, level, subband, lut, PARAMS, WL,
                                    coding_passes=cp, k_factor=k)
    out = decode_codeblock(stream, size, level, subband, lut, PARAMS, WL,
                           coding_passes=cp, k_factor=k)
    return stream, size, out


def test_zero_block():
    block = np.zeros((64, 64), dtype=np.int32)
    stream, size, out = roundtrip(block)
    assert size == 1 and stream[0] == 32
    assert np.array_equal(out, block)


def test_single_coefficient():
    block = np.zeros((64, 64), dtype=np.int32)
    block[5, 7] = -13
    _, _, out = roundtrip(block)
    assert out[5, 7] == -13
    assert np.count_nonzero(out) == 1


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("amplitude", [3, 100, 2000])
def test_random_blocks_lossless(seed, amplitude):
    rng = np.random.default_rng(seed)
    block = rng.integers(-amplitude, amplitude + 1, size=(64, 64), dtype=np.int32)
    _, _, out = roundtrip(block)
    assert np.array_equal(out, block)


@pytest.mark.parametrize("seed", [3, 4])
def test_random_blocks_trained_lut(seed):
    lut = random_lut(seed)
    rng = np.random.default_rng(seed + 100)
    block = rng.integers(-50, 51, size=(64, 64), dtype=np.int32)
    # sparse wavelet-like content
    mask = rng.random((64, 64)) < 0.15
    block = np.where(mask, block, 0).astype(np.int32)
    _, _, out = roundtrip(block, lut=lut, level=1, subband=2)
    assert np.array_equal(out, block)


def test_sparse_block_compresses():
    rng = np.random.default_rng(9)
    block = np.zeros((64, 64), dtype=np.int32)
    idx = rng.integers(0, 64, size=(40, 2))
    block[idx[:, 0], idx[:, 1]] = rng.integers(-7, 8, size=40)
    _, size, out = roundtrip(block)
    assert np.array_equal(out, block)
    assert size < 1200, f"sparse block used {size} slots"


@pytest.mark.parametrize("seed", [5, 6])
def test_three_coding_passes_roundtrip(seed):
    rng = np.random.default_rng(seed)
    block = rng.integers(-40, 41, size=(64, 64), dtype=np.int32)
    mask = rng.random((64, 64)) < 0.2
    block = np.where(mask, block, 0).astype(np.int32)
    _, _, out = roundtrip(block, lut=LUT3, cp=3)
    assert np.array_equal(out, block)


@pytest.mark.parametrize("k", [0.5, 2.0, 10.0])
def test_bulk_mode_roundtrip(k):
    """With k > 0, low planes go through the fused bulk pass; the round
    trip must still be bit-exact (bulk is a coding-order change, not a
    quality change)."""
    rng = np.random.default_rng(int(k * 10))
    block = rng.integers(-500, 501, size=(64, 64), dtype=np.int32)
    n_groups = PARAMS.n_bitplane_files
    lut = random_lut(int(k), n_groups=n_groups)
    _, _, out = roundtrip(block, lut=lut, k=k, level=0, subband=1)
    assert np.array_equal(out, block)


def test_bulk_covers_all_planes():
    # huge k: every plane below the MSB is bulk-coded
    rng = np.random.default_rng(42)
    block = rng.integers(-1000, 1001, size=(64, 64), dtype=np.int32)
    lut = random_lut(7, n_groups=PARAMS.n_bitplane_files)
    _, _, out = roundtrip(block, lut=lut, k=60.0)
    assert np.array_equal(out, block)


def test_incompressible_block_falls_back_to_raw():
    """Adversarial LUT probabilities blow up the stream; the encoder must
    fall back to the raw 16-bit copy and the decoder must honor it."""
    rng = np.random.default_rng(11)
    block = rng.integers(-(1 << 14), 1 << 14, size=(64, 64), dtype=np.int32)
    # probability 1 for everything: every symbol=0 exhausts in ~3 steps
    lut = np.full(PARAMS.size_per_group(WL, 2), 1, dtype=np.int32)
    stream, size = encode_codeblock(block, 0, 0, lut, PARAMS, WL)
    assert size == spec.CBLOCK_SIZE
    out = decode_codeblock(stream, size, 0, 0, lut, PARAMS, WL)
    # raw copy keeps the low 15 magnitude bits + sign
    expect_mag = np.abs(block) & 0x7FFF
    expect = np.where(block < 0, -expect_mag, expect_mag)
    assert np.array_equal(out, expect)


def test_find_subband():
    # 256x256, 2 levels: blocks are 64x64 -> 4x4 grid
    W = H = 256
    assert find_subband(0, 0, W, H, 2) == (2, 0)        # residual LL region
    assert find_subband(192, 0, W, H, 2) == (0, spec.SUBBAND_HL)
    assert find_subband(0, 192, W, H, 2) == (0, spec.SUBBAND_LH)
    assert find_subband(192, 192, W, H, 2) == (0, spec.SUBBAND_HH)
    assert find_subband(64, 0, W, H, 2) == (1, spec.SUBBAND_HL)
    assert find_subband(64, 64, W, H, 2) == (1, spec.SUBBAND_HH)


def test_consecutive_bitplanes_rule():
    assert consecutive_bitplanes(10, 0.0, 0, 0, 2) == 0
    # LL band: uses row max(L-1,0), col 0
    v = consecutive_bitplanes(10, 2.0, 2, 0, 2)
    assert v == int(np.floor(10 * (2.0 / spec.WAVELET_QSTEPS[1][0])))
    # HL at level 0: col 3 - 0 = 3
    v = consecutive_bitplanes(8, 1.0, 0, 0, 2)
    assert v == int(np.floor(8 * (1.0 / spec.WAVELET_QSTEPS[0][3])))
