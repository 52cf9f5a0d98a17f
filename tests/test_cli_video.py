"""CLI and video engine round trips (image + frame-sequence paths)."""

import numpy as np

from picsong_tpu.core.header import CodecConfig
from picsong_tpu.core.image_io import read_pgm, read_raw_frame, write_pgm
from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.engine.cli import main
from picsong_tpu.engine.video import decode_video, encode_video

PARAMS = LUTParams()


def make_image(rng, h, w):
    y, x = np.mgrid[0:h, 0:w]
    base = (96 + 64 * np.sin(x / 9.0) * np.cos(y / 13.0)
            + rng.normal(0, 8, size=(h, w)))
    return np.clip(base, 0, 255).astype(np.uint8)


def test_cli_image_roundtrip_pgm(tmp_path):
    rng = np.random.default_rng(0)
    img = make_image(rng, 64, 64)
    src = str(tmp_path / "in.pgm")
    enc = str(tmp_path / "out.enc")
    dec = str(tmp_path / "out.pgm")
    write_pgm(src, img)
    assert main(["-cd", "0", "-i", src, "-o", enc, "-wl", "1", "-cp", "2",
                 "-type", "0", "-video", "0", "-LUTFolder", "neutral"]) == 0
    assert main(["-cd", "1", "-i", enc, "-o", dec, "-video", "0",
                 "-LUTFolder", "neutral"]) == 0
    assert np.array_equal(read_pgm(dec), img)


def test_cli_validation_rejects_bad_params(tmp_path):
    assert main(["-cd", "0", "-i", "x.raw", "-o", "y.enc", "-wl", "0",
                 "-xSize", "64", "-ySize", "64"]) == 1
    assert main(["-cd", "0", "-i", "x.raw", "-o", "y.enc", "-cbWidth", "63",
                 "-xSize", "64", "-ySize", "64"]) == 1
    assert main(["-cd", "5"]) == 1


def test_video_roundtrip_gray(tmp_path):
    rng = np.random.default_rng(1)
    frames = [make_image(rng, 64, 128) for _ in range(4)]
    raw = str(tmp_path / "v.raw")
    with open(raw, "wb") as f:
        for fr in frames:
            f.write(fr.tobytes())
    enc = str(tmp_path / "v.enc")
    dec = str(tmp_path / "v_dec.raw")
    cfg = CodecConfig(width=128, height=64, wavelet_levels=1, frames=4)
    lut = neutral_lut(PARAMS, 1, 2)
    st = encode_video(raw, enc, cfg, [lut], PARAMS, frames=4)
    assert st.frames == 4
    st = decode_video(enc, dec, cfg, [lut], PARAMS)
    assert st.frames == 4
    for i, fr in enumerate(frames):
        assert np.array_equal(read_raw_frame(dec, 128, 64, i), fr)


def test_video_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(2)
    n_frames = 2
    planes = [[make_image(rng, 64, 64) for _ in range(3)]
              for _ in range(n_frames)]
    raw = str(tmp_path / "v.raw")
    with open(raw, "wb") as f:
        for frame in planes:
            for p in frame:
                f.write(p.tobytes())
    enc = str(tmp_path / "v.enc")
    dec = str(tmp_path / "v_dec.raw")
    cfg = CodecConfig(width=64, height=64, wavelet_levels=1, frames=n_frames,
                      is_rgb=True, components=3)
    lut = neutral_lut(PARAMS, 1, 2)
    encode_video(raw, enc, cfg, [lut] * 3, PARAMS, frames=n_frames)
    decode_video(enc, dec, cfg, [lut] * 3, PARAMS)
    for i, frame in enumerate(planes):
        for c, p in enumerate(frame):
            assert np.array_equal(read_raw_frame(dec, 64, 64, i * 3 + c), p)
