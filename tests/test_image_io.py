"""PGM / RAW IO and mirror padding."""

import numpy as np

from picsong_tpu.core.image_io import (append_raw_frame, mirror_pad, read_pgm,
                                       read_codestream, read_raw_frame,
                                       read_sizes, write_codestream, write_pgm)
from picsong_tpu.core.spec import adapted_size


def test_pgm_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    path = str(tmp_path / "x.pgm")
    write_pgm(path, img)
    out = read_pgm(path)
    assert np.array_equal(out, img)


def test_mirror_pad_semantics():
    # Edge-repeating reflection: x[W+j] = x[W-1-j] (IOManager.ipp:95-110)
    plane = np.array([[1, 2, 3, 4]], dtype=np.uint8)
    out = mirror_pad(plane, 6, 1)
    assert list(out[0]) == [1, 2, 3, 4, 4, 3]
    plane = np.array([[1], [2], [3]], dtype=np.uint8)
    out = mirror_pad(plane, 1, 5)
    assert list(out[:, 0]) == [1, 2, 3, 3, 2]


def test_adapted_size():
    assert adapted_size(512, 512) == (512, 512)
    assert adapted_size(100, 65) == (128, 128)
    assert adapted_size(2560, 2048) == (2560, 2048)


def test_raw_frames_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "video.raw")
    frames = [rng.integers(0, 256, size=(16, 8), dtype=np.uint8) for _ in range(3)]
    for fr in frames:
        append_raw_frame(path, fr)
    for i, fr in enumerate(frames):
        assert np.array_equal(read_raw_frame(path, 8, 16, i), fr)


def test_codestream_and_size_sidecar(tmp_path):
    path = str(tmp_path / "out.enc")
    s1 = np.arange(10, dtype=np.uint16)
    s2 = np.arange(7, dtype=np.uint16) + 100
    write_codestream(path, s1, first=True)
    write_codestream(path, s2, first=False)
    assert read_sizes(path) == [10, 7]
    assert np.array_equal(read_codestream(path, 0, 10), s1)
    assert np.array_equal(read_codestream(path, 10, 7), s2)
    # overwrite semantics on first=True
    write_codestream(path, s2, first=True)
    assert read_sizes(path) == [7]
