"""Timing-honesty probe: per-iteration block vs chained-dependency walls.

Under the axon tunnel, block_until_ready intermittently reports large
outputs ready while server execution is still queued (bench.py
warm_and_time). This probe quantifies it: for a given config it times
  a) K independent round trips, blocking each (the old protocol),
  b) a K-link data-dependent chain, one block at the end,
for K in {2, 6}, printing every wall. If (a) and (b) disagree, (b) is the
truth (data dependence forces sequential server execution).

Run: python tools/chain_probe.py --size 2048 [--lossy] [--levels 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=2048)
ap.add_argument("--levels", type=int, default=5)
ap.add_argument("--lossy", action="store_true")
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

for K in (2, 6):
    t0 = time.perf_counter()
    for _ in range(K):
        o = rt(plane)
        o.block_until_ready()
    wa = time.perf_counter() - t0
    print(f"K={K} independent+block-each: {wa*1e3:9.2f} ms total "
          f"({wa*1e3/K:8.2f} ms/iter)", flush=True)

    x = plane
    t0 = time.perf_counter()
    for _ in range(K):
        x = rt(x)
    x.block_until_ready()
    wb = time.perf_counter() - t0
    print(f"K={K} chained, block once:  {wb*1e3:9.2f} ms total "
          f"({wb*1e3/K:8.2f} ms/iter)", flush=True)
