"""Per-stage timing of the round trip on the real chip.

Times dwt+tile / staged encode / pallas decode / untile+idwt separately
(block_until_ready between phases — a wait, not a data read, so it does
not trigger the tunnel's D2H poisoning; see PERF_NOTES.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=2048)
ap.add_argument("--levels", type=int, default=5)
ap.add_argument("--iters", type=int, default=5)
ap.add_argument("--lossy", action="store_true")
args = ap.parse_args()

import jax
import jax.numpy as jnp

from picsong_tpu.core.header import CodecConfig
from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.engine.pipeline import TPUCodec
from bench import make_image

cfg = CodecConfig(width=args.size, height=args.size,
                  wavelet_levels=args.levels, is_lossy=args.lossy, qs=1.0)
params = LUTParams()
lut = neutral_lut(params, cfg.wavelet_levels, cfg.coding_passes)
codec = TPUCodec(cfg, [lut], params)
img = make_image(args.size)
n_planes = codec.planes_host(img)
print("n_planes", n_planes)
plane = jnp.asarray(codec._prep_gray(jnp.asarray(img)))


def timed(name, fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{name:28s} {dt*1e3:9.3f} ms")
    return out


blocks, _ = timed("dwt+tile", codec._dwt_tile, plane)
streams, sizes = timed("encode (staged bpc)",
                       lambda b: codec._staged.encode(b, codec.luts[0],
                                                      codec._meta, n_planes),
                       blocks)
dec = timed("decode (pallas bpc)",
            lambda s, z: codec._decode_plane(s, z, codec.luts[0], n_planes)
            , streams, sizes)
out = timed("full roundtrip",
            lambda p: codec._decode_plane(
                *codec._encode_plane(p, codec.luts[0], n_planes),
                codec.luts[0], n_planes), plane)
assert np.array_equal(np.asarray(out), np.asarray(plane)) or args.lossy
print("OK")
