"""K-scaling probe: chained walls for growing K, then a real D2H sync.

If block_until_ready lies, small-K chained walls underestimate; as K
grows past the client's queue depth, enqueue backpressure couples the
wall to true execution throughput. The final np.asarray read is a hard
sync: the time from chain start to read completion is an upper bound on
K * per-iter (plus the one-off flat transition), printed for
cross-checking.

Run: python tools/kscale_probe.py --size 8192 [--lossy]
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
ap.add_argument("--ks", type=int, nargs="*", default=[8, 32, 64])
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

t_all0 = time.perf_counter()
last = None
for K in args.ks:
    x = plane
    t0 = time.perf_counter()
    for _ in range(K):
        x = rt(x)
    x.block_until_ready()
    w = time.perf_counter() - t0
    print(f"K={K:3d} chained wall {w*1e3:10.2f} ms ({w*1e3/K:9.2f} ms/iter)",
          flush=True)
    last = x

# hard sync: real D2H of one row of the final output (first read of the
# process -> includes the flat transition, printed separately)
t0 = time.perf_counter()
row = np.asarray(last[:1])
t_read = time.perf_counter() - t0
t_total = time.perf_counter() - t_all0
print(f"final D2H read (flat transition + residual exec): {t_read:8.2f} s",
      flush=True)
print(f"total enqueue->synced: {t_total:8.2f} s for {sum(args.ks)} iters "
      f"=> upper bound {t_total/sum(args.ks)*1e3:9.2f} ms/iter incl. "
      f"transition", flush=True)
print("row checksum", int(row.astype(np.int64).sum()) & 0xFFFFFFFF,
      flush=True)
