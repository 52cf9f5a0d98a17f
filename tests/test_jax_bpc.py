"""JAX BPC gates: streams bit-identical to the NumPy oracle; exact inverse."""

import numpy as np
import pytest

from picsong_tpu.core import spec
from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.entropy import bpc_jax
from picsong_tpu.reference import bpc as obpc

PARAMS = LUTParams()
WL = 2


def random_lut(seed, coding_passes=2, n_groups=1):
    rng = np.random.default_rng(seed)
    size = PARAMS.size_per_group(WL, coding_passes) * n_groups
    return rng.integers(1, 127, size=size).astype(np.int32)


def oracle_encode(blocks, levels, subbands, lut, cp=2, k=0.0):
    streams = np.empty((len(blocks), spec.CBLOCK_SIZE), dtype=np.int32)
    sizes = np.empty(len(blocks), dtype=np.int64)
    for i, b in enumerate(blocks):
        streams[i], sizes[i] = obpc.encode_codeblock(
            b, int(levels[i]), int(subbands[i]), lut, PARAMS, WL,
            coding_passes=cp, k_factor=k)
    return streams, sizes


def make_blocks(seed, n, amplitude=60, sparsity=0.2):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(-amplitude, amplitude + 1, size=(n, 64, 64),
                          dtype=np.int32)
    mask = rng.random((n, 64, 64)) < sparsity
    blocks = np.where(mask, blocks, 0).astype(np.int32)
    blocks[0] = 0                          # an all-zero block in the batch
    levels = rng.integers(0, WL + 1, size=n).astype(np.int32)
    subbands = np.where(levels == WL, 0, rng.integers(0, 3, size=n)).astype(np.int32)
    return blocks, levels, subbands


@pytest.mark.parametrize("seed", [0, 1])
def test_encode_matches_oracle_bitexact(seed):
    blocks, levels, subbands = make_blocks(seed, 6)
    lut = random_lut(seed)
    want_s, want_n = oracle_encode(blocks, levels, subbands, lut)
    got_s, got_n = bpc_jax.encode(blocks, levels, subbands, lut, PARAMS, WL)
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_s, want_s)


def test_decode_matches_oracle_and_inverts():
    blocks, levels, subbands = make_blocks(7, 5, amplitude=300, sparsity=0.5)
    lut = random_lut(7)
    streams, sizes = bpc_jax.encode(blocks, levels, subbands, lut, PARAMS, WL)
    out = bpc_jax.decode(streams, sizes, levels, subbands, lut, PARAMS, WL)
    assert np.array_equal(out, blocks)


@pytest.mark.parametrize("k,fused", [(1.0, "0"), (8.0, "0"),
                                     (1.0, "1"), (8.0, "1")])
def test_bulk_mode_matches_oracle(k, fused, monkeypatch):
    """Gates the STAGED bulk pass (the production k > 0 path) and, with
    PICSONG_FUSED_K=1, the whole-direction fused variant whose bulk pass
    is a second top-level loop inside the fused program."""
    monkeypatch.setenv("PICSONG_FUSED_K", fused)
    bpc_jax._staged_cache.clear()
    blocks, levels, subbands = make_blocks(11, 4, amplitude=900, sparsity=0.6)
    lut = random_lut(3, n_groups=PARAMS.n_bitplane_files)
    want_s, want_n = oracle_encode(blocks, levels, subbands, lut, k=k)
    got_s, got_n = bpc_jax.encode(blocks, levels, subbands, lut, PARAMS, WL,
                                  k_factor=k)
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_s, want_s)
    out = bpc_jax.decode(got_s, got_n, levels, subbands, lut, PARAMS, WL,
                         k_factor=k)
    assert np.array_equal(out, blocks)


def test_bulk_mode_mono_matches_oracle():
    """Keeps the monolithic k > 0 formulation gated now that the NumPy
    entry points route through the staged bulk program."""
    import jax.numpy as jnp
    k = 4.0
    blocks, levels, subbands = make_blocks(19, 3, amplitude=700, sparsity=0.5)
    lut = random_lut(9, n_groups=PARAMS.n_bitplane_files)
    want_s, want_n = oracle_encode(blocks, levels, subbands, lut, k=k)
    args = bpc_jax._meta_args(levels, subbands, PARAMS, WL, 2, k)
    n_planes = bpc_jax.planes_for_magnitude(int(np.max(np.abs(blocks))))
    got_s, got_n = bpc_jax.encode_blocks(
        jnp.asarray(blocks, jnp.int32), jnp.asarray(lut, jnp.int32), *args,
        params=PARAMS, wavelet_levels=WL, coding_passes=2, has_k=True,
        n_planes=n_planes)
    assert np.array_equal(np.asarray(got_n), want_n)
    assert np.array_equal(np.asarray(got_s), want_s)
    out = bpc_jax.decode_blocks(
        jnp.asarray(got_s), jnp.asarray(got_n, jnp.int32),
        jnp.asarray(lut, jnp.int32), *args, params=PARAMS, wavelet_levels=WL,
        coding_passes=2, has_k=True, n_planes=n_planes)
    assert np.array_equal(np.asarray(out), blocks)


def test_three_coding_passes_matches_oracle():
    blocks, levels, subbands = make_blocks(13, 4, amplitude=40, sparsity=0.25)
    lut = random_lut(5, coding_passes=3)
    want_s, want_n = oracle_encode(blocks, levels, subbands, lut, cp=3)
    got_s, got_n = bpc_jax.encode(blocks, levels, subbands, lut, PARAMS, WL,
                                  coding_passes=3)
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_s, want_s)
    out = bpc_jax.decode(got_s, got_n, levels, subbands, lut, PARAMS, WL,
                         coding_passes=3)
    assert np.array_equal(out, blocks)


def test_incompressible_fallback_roundtrip():
    rng = np.random.default_rng(17)
    blocks = rng.integers(-(1 << 14), 1 << 14, size=(2, 64, 64), dtype=np.int32)
    levels = np.zeros(2, np.int32)
    subbands = np.zeros(2, np.int32)
    lut = np.full(PARAMS.size_per_group(WL, 2), 1, dtype=np.int32)
    streams, sizes = bpc_jax.encode(blocks, levels, subbands, lut, PARAMS, WL)
    assert np.all(sizes == spec.CBLOCK_SIZE)
    out = bpc_jax.decode(streams, sizes, levels, subbands, lut, PARAMS, WL)
    expect_mag = np.abs(blocks) & 0x7FFF
    expect = np.where(blocks < 0, -expect_mag, expect_mag)
    assert np.array_equal(out, expect)


def test_neutral_lut_roundtrip_large_batch():
    rng = np.random.default_rng(23)
    blocks = rng.integers(-2000, 2001, size=(16, 64, 64), dtype=np.int32)
    levels = np.zeros(16, np.int32)
    subbands = np.ones(16, np.int32)
    lut = neutral_lut(PARAMS, WL, 2)
    streams, sizes = bpc_jax.encode(blocks, levels, subbands, lut, PARAMS, WL)
    out = bpc_jax.decode(streams, sizes, levels, subbands, lut, PARAMS, WL)
    assert np.array_equal(out, blocks)
