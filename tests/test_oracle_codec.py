"""Oracle end-to-end: image encode -> decode round trips (BASELINE config 1
semantics at reduced size for test speed), pack/unpack, color transforms."""

import numpy as np
import pytest

from picsong_tpu.core.header import CodecConfig, pack_header, unpack_header
from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.reference.codec import (decode_image, encode_image,
                                         ict_forward, ict_inverse,
                                         pack_streams, rct_forward,
                                         rct_inverse, unpack_streams)

PARAMS = LUTParams()


def make_image(rng, h, w):
    """Smooth-ish uint8 test image (wavelet-friendly)."""
    y, x = np.mgrid[0:h, 0:w]
    base = (96 + 64 * np.sin(x / 9.0) * np.cos(y / 13.0)
            + rng.normal(0, 8, size=(h, w)))
    return np.clip(base, 0, 255).astype(np.uint8)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    ncb = 5
    streams = np.full((ncb, 4096), -1, dtype=np.int32)
    sizes = np.zeros(ncb, dtype=np.int64)
    for i in range(ncb):
        n = int(rng.integers(1, 300))
        streams[i, 0] = int(rng.integers(0, 15))
        streams[i, 1:n] = rng.integers(0, 65536, size=n - 1)
        sizes[i] = n
    header = pack_header(CodecConfig(width=320, height=64))
    packed = pack_streams(streams, sizes, header)
    assert packed[:9].tolist() == header.tolist()
    streams2, sizes2 = unpack_streams(packed, ncb)
    assert np.array_equal(sizes2, sizes)
    for i in range(ncb):
        assert np.array_equal(streams2[i, :sizes[i]], streams[i, :sizes[i]])


def test_rct_exact_inverse():
    rng = np.random.default_rng(1)
    r, g, b = (rng.integers(-128, 128, size=(32, 32), dtype=np.int32)
               for _ in range(3))
    y, u, v = rct_forward(r, g, b)
    r2, g2, b2 = rct_inverse(y, u, v)
    assert np.array_equal(r2, r) and np.array_equal(g2, g) and np.array_equal(b2, b)


def test_ict_near_inverse():
    rng = np.random.default_rng(2)
    r, g, b = (rng.integers(-128, 128, size=(16, 16)).astype(np.float32)
               for _ in range(3))
    y, cb, cr = ict_forward(r, g, b)
    r2, g2, b2 = ict_inverse(y, cb, cr)
    assert np.max(np.abs(r2 - r)) <= 1
    assert np.max(np.abs(g2 - g)) <= 1
    assert np.max(np.abs(b2 - b)) <= 1


@pytest.mark.parametrize("wl", [1, 2])
def test_lossless_image_bitexact_roundtrip(wl):
    """BASELINE config 1: greyscale PGM, 5/3, cp=2 — bit-exact round trip."""
    rng = np.random.default_rng(3 + wl)
    img = make_image(rng, 128, 128)
    cfg = CodecConfig(width=128, height=128, wavelet_levels=wl)
    lut = neutral_lut(PARAMS, wl, 2)
    streams = encode_image(img, cfg, [lut], PARAMS)
    # header round-trips through the wire
    cfg2 = unpack_header(streams[0][:9])
    assert (cfg2.width, cfg2.height, cfg2.wavelet_levels) == (128, 128, wl)
    out = decode_image(streams, cfg2, [lut], PARAMS)
    assert np.array_equal(out, img)


def test_lossless_nonmultiple_size_roundtrip():
    """Mirror padding path: 100x70 image padded to 128x128."""
    rng = np.random.default_rng(8)
    img = make_image(rng, 70, 100)
    cfg = CodecConfig(width=100, height=70, wavelet_levels=1)
    lut = neutral_lut(PARAMS, 1, 2)
    streams = encode_image(img, cfg, [lut], PARAMS)
    out = decode_image(streams, unpack_header(streams[0][:9]), [lut], PARAMS)
    assert np.array_equal(out, img)


def test_lossy_image_psnr():
    """BASELINE config 2 semantics: 9/7 + quantization, PSNR gate."""
    rng = np.random.default_rng(5)
    img = make_image(rng, 128, 128)
    cfg = CodecConfig(width=128, height=128, wavelet_levels=3, is_lossy=True,
                      qs=1.0)
    lut = neutral_lut(PARAMS, 3, 2)
    streams = encode_image(img, cfg, [lut], PARAMS)
    out = decode_image(streams, unpack_header(streams[0][:9]), [lut], PARAMS)
    err = out.astype(np.float64) - img.astype(np.float64)
    psnr = 10 * np.log10(255.0 ** 2 / max(float(np.mean(err * err)), 1e-12))
    assert psnr > 40.0, f"PSNR {psnr:.2f}"


def test_rgb_lossless_roundtrip():
    rng = np.random.default_rng(6)
    planes = [make_image(rng, 64, 64) for _ in range(3)]
    cfg = CodecConfig(width=64, height=64, wavelet_levels=1, is_rgb=True,
                      components=3)
    lut = neutral_lut(PARAMS, 1, 2)
    streams = encode_image(planes, cfg, [lut, lut, lut], PARAMS)
    assert len(streams) == 3
    out = decode_image(streams, unpack_header(streams[0][:9]), [lut] * 3, PARAMS)
    for got, want in zip(out, planes):
        assert np.array_equal(got, want)
