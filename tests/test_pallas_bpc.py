"""Pallas decoder vs the (oracle-gated) XLA coder, in interpret mode."""

import numpy as np
import pytest

from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.entropy import bpc_jax, bpc_pallas


@pytest.mark.parametrize("seed,maxmag", [(0, 200), (1, 7)])
def test_pallas_decode_matches_xla(seed, maxmag):
    params = LUTParams()
    wl = 2
    rng = np.random.default_rng(seed)
    n = 24  # padded to one 128-block chunk inside the kernel
    blocks = rng.integers(-maxmag, maxmag + 1, size=(n, 64, 64),
                          dtype=np.int32)
    # sparsify: realistic subband data is mostly near zero
    blocks[rng.random(blocks.shape) < 0.7] = 0
    blocks[3] = 0  # an empty codeblock
    levels = (np.arange(n) % wl).astype(np.int32)
    subbands = (np.arange(n) % 3).astype(np.int32)
    lut = neutral_lut(params, wl, 2)
    # non-neutral probabilities exercise the interval math
    lut = lut + (np.arange(lut.size, dtype=np.int32) % 41)

    streams, sizes = bpc_jax.encode(blocks, levels, subbands, lut, params, wl)
    ref = bpc_jax.decode(streams, sizes, levels, subbands, lut, params, wl)
    assert np.array_equal(ref, blocks)

    meta = bpc_jax.block_metadata(levels, subbands, params, wl, 2, 0.0)
    n_planes = bpc_jax.planes_for_streams(streams[:, 0], sizes)
    out = bpc_pallas.decode_blocks(
        streams, sizes, lut, meta["ref"], meta["sig"], meta["sign"],
        params=params, n_planes=n_planes, interpret=True)
    assert np.array_equal(np.asarray(out), blocks)


@pytest.mark.parametrize("seed,maxmag", [(0, 200), (1, 7), (2, 30000)])
def test_pallas_encode_matches_xla(seed, maxmag):
    """The event-tape encoder emits bit-identical streams to the XLA coder
    (which is itself gated bit-identical against the NumPy oracle)."""
    params = LUTParams()
    wl = 2
    rng = np.random.default_rng(seed)
    n = 24
    blocks = rng.integers(-maxmag, maxmag + 1, size=(n, 64, 64),
                          dtype=np.int32)
    blocks[rng.random(blocks.shape) < 0.7] = 0
    blocks[3] = 0   # an empty codeblock
    if maxmag >= 30000:
        blocks[5] = rng.integers(-maxmag, maxmag + 1, size=(64, 64),
                                 dtype=np.int32)  # dense: near/at raw fallback
    levels = (np.arange(n) % wl).astype(np.int32)
    subbands = (np.arange(n) % 3).astype(np.int32)
    lut = neutral_lut(params, wl, 2)
    lut = lut + (np.arange(lut.size, dtype=np.int32) % 41)

    ref_streams, ref_sizes = bpc_jax.encode(blocks, levels, subbands, lut,
                                            params, wl)
    meta = bpc_jax.block_metadata(levels, subbands, params, wl, 2, 0.0)
    n_planes = bpc_jax.planes_for_magnitude(int(np.max(np.abs(blocks))))
    streams, sizes = bpc_pallas.encode_blocks(
        blocks, lut, meta["ref"], meta["sig"], meta["sign"],
        params=params, n_planes=n_planes, interpret=True)
    assert np.array_equal(np.asarray(sizes), ref_sizes)
    assert np.array_equal(np.asarray(streams), ref_streams)
