"""Ground-truth timing: pay the flat transition once, then time every
config with a REAL D2H sync per iteration.

2026-08-20 finding: the axon tunnel's first D2H in a process costs
minutes (measured 541 s for 8 bytes today) but — unlike round 2 —
subsequent dispatch+read pairs cost ~0.03 s. So the honest protocol is:
warm everything, read one tiny value (pay the transition), then time
round trips each synced by a tiny dependent read. block_until_ready never
enters the picture (its readiness reporting is fictional at large
program/buffer sizes).

Run: python tools/truth_probe.py  (takes ~10-15 min, transition-dominated)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from picsong_tpu.core.header import CodecConfig
from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.engine.pipeline import TPUCodec
from bench import make_image

CONFIGS = [
    ("512_wl1_lossless", 512, 1, False, None, 12),
    ("2048_wl5_lossless", 2048, 5, False, None, 10),
    ("2048_wl5_lossy", 2048, 5, True, None, 6),
    ("8192_wl5_lossless_chunked", 8192, 5, False, None, 4),   # auto-chunk
    ("8192_wl5_lossless_unchunked", 8192, 5, False, 0, 2),
]


def build(size, levels, lossy, chunk):
    cfg = CodecConfig(width=size, height=size, wavelet_levels=levels,
                      is_lossy=lossy, qs=1.0)
    params = LUTParams()
    lut = neutral_lut(params, levels, cfg.coding_passes)
    codec = TPUCodec(cfg, [lut], params, chunk_blocks=chunk)
    img = make_image(size)
    n_planes = codec.planes_host(img)
    plane = jnp.asarray(codec._prep_gray(jnp.asarray(img)))
    def rt(x):
        s, z = codec._encode_plane(x, codec.luts[0], n_planes)
        return codec._decode_plane(s, z, codec.luts[0], n_planes)
    return rt, plane


def tiny(x):
    return jnp.sum(x[:1, :64])


runs = []
for name, size, levels, lossy, chunk, iters in CONFIGS:
    rt, plane = build(size, levels, lossy, chunk)
    out = rt(plane)          # compile + warm (no read yet)
    out.block_until_ready()
    runs.append((name, rt, plane, iters))
    print(f"warmed {name}", flush=True)

t0 = time.perf_counter()
_ = int(np.asarray(tiny(runs[0][2])))
print(f"flat transition paid: {time.perf_counter()-t0:.1f} s", flush=True)

for name, rt, plane, iters in runs:
    # settle: one synced round trip (drains any leftover)
    _ = float(np.asarray(tiny(rt(plane))))
    samples = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = float(np.asarray(tiny(rt(plane))))
        samples.append((time.perf_counter() - t0) * 1e3)
    med = sorted(samples)[len(samples) // 2]
    npx = plane.shape[0] * plane.shape[1]
    print(f"{name:30s} median {med:10.2f} ms  ({npx/med/1e3:10.1f} MPix/s) "
          f" samples {['%.1f' % s for s in samples]}", flush=True)
