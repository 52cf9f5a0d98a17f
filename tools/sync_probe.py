"""Hard-sync differential timing: chain K round trips, then force real
completion with a tiny D2H read; print the wall from chain start to read
completion.

Run this in TWO fresh processes with different K; the flat first-read
transition (~size-independent) appears in both walls, so
(T_K2 - T_K1) / (K2 - K1) is the true per-iteration time even where
block_until_ready lies (tools/kscale_probe.py showed 8192^2 chained walls
~8x BELOW the HBM-bandwidth lower bound — readiness there is fiction).

Run: python tools/sync_probe.py --size 8192 --k 8
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=8192)
ap.add_argument("--levels", type=int, default=5)
ap.add_argument("--lossy", action="store_true")
ap.add_argument("--k", type=int, default=8)
args = ap.parse_args()

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
plane = jnp.asarray(codec._prep_gray(jnp.asarray(img)))
print(f"n_planes {n_planes}", flush=True)


def rt(x):
    streams, sizes = codec._encode_plane(x, codec.luts[0], n_planes)
    return codec._decode_plane(streams, sizes, codec.luts[0], n_planes)


out = rt(plane)
out.block_until_ready()
print("warm done", flush=True)

x = plane
t0 = time.perf_counter()
for _ in range(args.k):
    x = rt(x)
# tiny dependent value; np.asarray is the only trustworthy sync
tail = jnp.sum(x[:1, :256])
val = int(np.asarray(tail))
wall = time.perf_counter() - t0
print(f"K={args.k} synced wall {wall:9.3f} s  checksum {val}", flush=True)
