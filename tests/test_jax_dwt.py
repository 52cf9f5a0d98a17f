"""JAX DWT gates: bit-exact vs the NumPy oracle (lossless), PSNR (lossy)."""

import numpy as np
import pytest

from picsong_tpu.reference import dwt as odwt
from picsong_tpu.transform import dwt as jdwt


@pytest.mark.parametrize("levels", [1, 3, 5])
@pytest.mark.parametrize("shape", [(64, 64), (256, 128)])
def test_53_matches_oracle_bitexact(levels, shape):
    rng = np.random.default_rng(levels)
    plane = rng.integers(-128, 128, size=shape, dtype=np.int32)
    want = odwt.dwt_forward(plane, levels, lossy=False, qs=1.0)
    got = np.asarray(jdwt.dwt_forward(plane, levels, lossy=False))
    assert np.array_equal(got, want)
    back = np.asarray(jdwt.dwt_reverse(got, levels, lossy=False))
    assert np.array_equal(back, plane)


def test_53_reverse_matches_oracle():
    rng = np.random.default_rng(9)
    mallat = rng.integers(-300, 300, size=(128, 128), dtype=np.int32)
    want = odwt.dwt_reverse(mallat, 2, lossy=False, qs=1.0)
    got = np.asarray(jdwt.dwt_reverse(mallat, 2, lossy=False))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("qs", [1.0, 0.5])
def test_97_close_to_oracle_and_reconstructs(qs):
    rng = np.random.default_rng(3)
    plane = rng.normal(0, 30, size=(128, 128)).astype(np.float32)
    want = odwt.dwt_forward(plane, 3, lossy=True, qs=qs)
    got = np.asarray(jdwt.dwt_forward(plane, 3, lossy=True, qs=qs))
    # float op-order differences across backends allow tiny drift
    assert np.allclose(got, want, rtol=1e-4, atol=1e-2)
    q = got.astype(np.int32)
    back = np.asarray(jdwt.dwt_reverse(q, 3, lossy=True, qs=qs))
    err = back - plane
    psnr = 10 * np.log10(255.0 ** 2 / max(float(np.mean(err * err)), 1e-12))
    assert psnr > 40.0
