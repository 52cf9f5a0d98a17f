"""Oracle DWT gates: 5/3 integer perfect reconstruction, 9/7 quality."""

import numpy as np
import pytest

from picsong_tpu.reference.dwt import dwt_forward, dwt_reverse


@pytest.mark.parametrize("levels", [1, 2, 3, 5])
@pytest.mark.parametrize("shape", [(64, 64), (128, 64), (128, 192)])
def test_53_perfect_reconstruction(levels, shape):
    rng = np.random.default_rng(levels)
    plane = rng.integers(-128, 128, size=shape, dtype=np.int32)
    mallat = dwt_forward(plane, levels, lossy=False, qs=1.0)
    back = dwt_reverse(mallat, levels, lossy=False, qs=1.0)
    assert np.array_equal(back, plane)


def test_53_energy_compaction():
    # A smooth ramp concentrates energy in LL
    y, x = np.mgrid[0:64, 0:64]
    plane = ((x + y) // 2 - 32).astype(np.int32)
    mallat = dwt_forward(plane, 1, lossy=False, qs=1.0)
    ll = mallat[:32, :32]
    hh = mallat[32:, 32:]
    assert np.abs(ll).sum() > 10 * np.abs(hh).sum()


@pytest.mark.parametrize("qs", [1.0, 0.5])
def test_97_roundtrip_psnr(qs):
    rng = np.random.default_rng(7)
    base = rng.integers(-96, 96, size=(128, 128)).astype(np.float32)
    # smooth the noise so it behaves like imagery
    k = np.ones((4, 4)) / 16.0
    smooth = np.real(np.fft.ifft2(np.fft.fft2(base) * np.fft.fft2(k, base.shape)))
    plane = smooth.astype(np.float32)
    mallat = dwt_forward(plane, 3, lossy=True, qs=qs)
    quantized = mallat.astype(np.int32)   # entropy stage truncation
    back = dwt_reverse(quantized, 3, lossy=True, qs=qs)
    err = back - plane
    mse = float(np.mean(err * err))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 40.0, f"PSNR {psnr:.2f} dB too low at qs={qs}"


def test_97_zero_plane():
    plane = np.zeros((64, 64), dtype=np.float32)
    mallat = dwt_forward(plane, 2, lossy=True, qs=1.0)
    assert np.allclose(mallat, 0)
    back = dwt_reverse(mallat.astype(np.int32), 2, lossy=True, qs=1.0)
    assert np.allclose(back, 0)
