"""Property tests: header pack <-> unpack round-trips.

The reference hand-mirrors setExtraInformation (BitStreamBuilder.cpp:35-94)
and getExtraInformation (DecodingEngine.cu:567-585); SURVEY.md section 4
flags this pair as a must-property-test.
"""

import numpy as np
import pytest

from picsong_tpu.core.header import CodecConfig, pack_header, unpack_header


def roundtrip(cfg: CodecConfig) -> CodecConfig:
    return unpack_header(pack_header(cfg))


def test_basic_roundtrip():
    cfg = CodecConfig(width=512, height=512)
    out = roundtrip(cfg)
    assert out == cfg


@pytest.mark.parametrize("width,height", [(64, 64), (2048, 2048), (2560, 2048),
                                          (4096, 2048), (8192, 8192)])
def test_geometry_roundtrip(width, height):
    cfg = CodecConfig(width=width, height=height)
    out = roundtrip(cfg)
    assert (out.width, out.height) == (width, height)


def test_full_field_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(300):
        cfg = CodecConfig(
            width=int(rng.integers(1, 1 << 12)) * 2,
            height=int(rng.integers(1, 1 << 12)),
            components=1,
            coding_passes=int(rng.choice([2, 3])),
            cb_height=int(rng.integers(18, 21)),
            cb_width=64,
            # Header carries only 3 bits of wavelet_levels (reference wire
            # format limit; validation allows 1..10 but 8..10 are unpackable)
            wavelet_levels=int(rng.integers(1, 8)),
            bit_depth=8,
            is_lossy=bool(rng.integers(0, 2)),
            qs=float(rng.integers(0, 10001)) / 10000.0,
            is_rgb=bool(rng.integers(0, 2)),
            endianess=int(rng.integers(0, 2)),
            bps=int(rng.integers(1, 17)),
            is_signed=bool(rng.integers(0, 2)),
            frames=int(rng.integers(0, 1 << 16)),
            k_factor=float(rng.integers(0, 65536)) / 1000.0,
        )
        out = roundtrip(cfg)
        assert out == cfg, f"mismatch for {cfg}"


def test_rgb_three_component_geometry():
    cfg = CodecConfig(width=2048, height=2560, components=3, is_rgb=True)
    out = roundtrip(cfg)
    assert out.width == 2048 and out.height == 2560 and out.components == 3


def test_header_is_nine_shorts():
    assert pack_header(CodecConfig(width=64, height=64)).shape == (9,)
    assert pack_header(CodecConfig(width=64, height=64)).dtype == np.uint16
