"""Compression-quality gates: LUT-driven context modeling must actually
compress (VERDICT r1 missing #3 — previously no test measured stream size,
so a codec emitting near-raw streams would have passed the suite).

The reference's whole point is stationary context-probability tables
(Engines/Engine.cu:8-185; LUT/n1_lossless). Gates here:
  1. a natural image at wl=5 lossless compresses >= 2x vs raw with the
     upstream reference tables,
  2. the repo's shipped trained tables (tools/lut_train.py) beat neutral
     and are within a few percent of the reference tables,
  3. streams stay bit-exact round-trippable with real (non-neutral) LUTs.
"""

import os

import numpy as np

from picsong_tpu.core.header import CodecConfig
from picsong_tpu.core.lut import LUTParams, load_luts, neutral_lut
from picsong_tpu.engine.pipeline import TPUCodec

REFERENCE_LUTS = "/root/reference/CUDA_ImCod/LUT/n1_lossless"
TRAINED_LUTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "luts", "trained_lossless")


def natural_image(size=256, seed=42, sigma=24, noise=2.0):
    """Filtered-noise stand-in for a natural photo: strong spatial
    correlation with mild sensor noise."""
    rng = np.random.default_rng(seed)
    n = rng.normal(0, 1, size=(size, size))
    f = np.fft.fft2(n)
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    filt = np.exp(-(fx ** 2 + fy ** 2) * (sigma * size / 8) ** 2)
    img = np.real(np.fft.ifft2(f * filt))
    img = (img - img.min()) / max(np.ptp(img), 1e-9) * 255
    img = img + rng.normal(0, noise, size=(size, size))
    return np.clip(img, 0, 255).astype(np.uint8)


def encode_bytes(img, folder):
    cfg = CodecConfig(width=img.shape[1], height=img.shape[0],
                      wavelet_levels=5)
    if folder is None:
        lut, params = neutral_lut(LUTParams(), 5, 2), LUTParams()
    else:
        luts, params = load_luts(folder, 5, 2, 0.0)
        lut = luts[0]
    codec = TPUCodec(cfg, [lut], params)
    stream = codec.encode(img)[0]
    out = codec.decode([stream])
    assert np.array_equal(out, img), f"round trip broke with {folder}"
    return stream.size * 2


def test_reference_lut_compresses_2x():
    img = natural_image()
    nbytes = encode_bytes(img, REFERENCE_LUTS)
    ratio = img.size / nbytes
    assert ratio >= 2.0, f"reference-LUT ratio {ratio:.3f} < 2.0"


def test_trained_lut_beats_neutral():
    img = natural_image(seed=43)
    neutral_bytes = encode_bytes(img, None)
    trained_bytes = encode_bytes(img, TRAINED_LUTS)
    assert trained_bytes < 0.85 * neutral_bytes, (
        f"trained {trained_bytes} not clearly below neutral {neutral_bytes}")


def test_trained_lut_close_to_reference():
    img = natural_image(seed=44)
    ref_bytes = encode_bytes(img, REFERENCE_LUTS)
    trained_bytes = encode_bytes(img, TRAINED_LUTS)
    assert trained_bytes <= 1.10 * ref_bytes, (
        f"trained {trained_bytes} > 110% of reference {ref_bytes}")
