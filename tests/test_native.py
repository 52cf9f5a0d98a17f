"""Native C++ runtime: bit-identical to the NumPy reference implementations."""

import numpy as np
import pytest

from picsong_tpu import native
from picsong_tpu.assembly.pack import pack_streams as py_pack
from picsong_tpu.assembly.pack import unpack_streams as py_unpack
from picsong_tpu.core.header import CodecConfig, pack_header
from picsong_tpu.core.image_io import mirror_pad

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _random_streams(rng, ncb):
    streams = np.full((ncb, 4096), -1, dtype=np.int32)
    sizes = np.zeros(ncb, dtype=np.int64)
    for i in range(ncb):
        n = int(rng.integers(1, 700))
        streams[i, 0] = int(rng.integers(0, 15))
        streams[i, 1:n] = rng.integers(0, 65536, size=n - 1)
        sizes[i] = n
    return streams, sizes


def test_native_pack_matches_numpy():
    rng = np.random.default_rng(0)
    streams, sizes = _random_streams(rng, 11)
    header = pack_header(CodecConfig(width=704, height=64))
    want = py_pack(streams, sizes, header)
    got = native.pack_streams(streams, sizes, header)
    assert np.array_equal(got, want)
    got2 = native.pack_streams(streams, sizes, None)
    want2 = py_pack(streams, sizes, None)
    assert np.array_equal(got2, want2)


def test_native_unpack_matches_numpy():
    rng = np.random.default_rng(1)
    streams, sizes = _random_streams(rng, 7)
    packed = py_pack(streams, sizes, None)
    ns, nn = native.unpack_streams(packed, 7)
    ps, pn = py_unpack(packed, 7)
    assert np.array_equal(ns, ps)
    assert np.array_equal(nn, pn)


def test_native_frame_load_with_padding(tmp_path):
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, size=(50, 70), dtype=np.uint8)
              for _ in range(3)]
    path = str(tmp_path / "v.raw")
    with open(path, "wb") as f:
        for fr in frames:
            f.write(fr.tobytes())
    for i, fr in enumerate(frames):
        got = native.load_frame_padded(path, 70, 50, i, 128, 64)
        want = mirror_pad(fr, 128, 64)
        assert np.array_equal(got, want)
