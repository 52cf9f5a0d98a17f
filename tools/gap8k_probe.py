"""Round-5 probe: full-plane 8K encode vs decode walls, same session.

The per-program probe (dec_gap_probe.py) measured encode/decode grouped
programs AT PARITY per 1024-block chunk (0.172 vs 0.170 ms), so the
round-4 8K gap (24.9 vs 35.1 ms) must live between programs: per-chunk
host slicing, output concatenation, or scheduling. This times the
engine's actual _encode_plane/_decode_plane at 8192^2, blocked, medians.

Usage: timeout 1200 python tools/gap8k_probe.py [--size 8192] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--sync", action="store_true",
                    help="hard-sync protocol (tools/truth_probe.py): a "
                         "tiny dependent D2H read per iteration instead "
                         "of block_until_ready, whose readiness is "
                         "fiction at 8K buffer sizes (PERF_NOTES r3). "
                         "Pays the flat tunnel transition once up front; "
                         "each read then costs ~0.03 s, reported "
                         "separately as the read floor.")
    args = ap.parse_args()

    import jax.numpy as jnp

    from picsong_tpu.core.header import CodecConfig
    from picsong_tpu.core.lut import LUTParams, neutral_lut
    from picsong_tpu.engine.pipeline import TPUCodec

    size = args.size
    cfg = CodecConfig(width=size, height=size, wavelet_levels=5)
    params = LUTParams()
    lut = neutral_lut(params, cfg.wavelet_levels, cfg.coding_passes)
    codec = TPUCodec(cfg, [lut], params)
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:size, 0:size]
    img = np.clip(96 + 64 * np.sin(x / 9.0) * np.cos(y / 13.0)
                  + rng.normal(0, 8, size=(size, size)), 0,
                  255).astype(np.uint8)
    n_planes = codec.planes_host(img)
    plane = jnp.asarray(codec._prep_gray(jnp.asarray(img)))
    lutd = codec.luts[0]

    def med(samples):
        return sorted(samples)[len(samples) // 2]

    # warm both directions first (compile), then interleave timed samples
    streams, sizes = codec._encode_plane(plane, lutd, n_planes)
    streams.block_until_ready()
    out = codec._decode_plane(streams, sizes, lutd, n_planes)
    out.block_until_ready()

    read_floor = 0.0
    if args.sync:
        t0 = time.perf_counter()
        np.asarray(out[0, 0])           # flat transition paid here
        trans_s = time.perf_counter() - t0
        floors = []
        for _ in range(5):
            o2 = codec._decode_plane(streams, sizes, lutd, n_planes)
            t0 = time.perf_counter()
            np.asarray(o2[0, 0])
            floors.append(time.perf_counter() - t0)
        read_floor = med(floors)
        print(f"transition {trans_s:.1f} s, read floor "
              f"{read_floor * 1e3:.1f} ms")

    def ready_enc(s):
        if args.sync:
            np.asarray(s[0, 0])
        else:
            s.block_until_ready()

    def ready_dec(o):
        if args.sync:
            np.asarray(o[0, 0])
        else:
            o.block_until_ready()

    enc_ms, dec_ms = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        streams, sizes = codec._encode_plane(plane, lutd, n_planes)
        ready_enc(streams)
        enc_ms.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        out = codec._decode_plane(streams, sizes, lutd, n_planes)
        ready_dec(out)
        dec_ms.append((time.perf_counter() - t0) * 1e3)

    tag = (f" (hard-sync; subtract ~{read_floor * 1e3:.1f} ms read floor)"
           if args.sync else " (block_until_ready)")
    print(f"size={size} n_planes={n_planes} iters={args.iters}{tag}")
    print(f"encode median {med(enc_ms):.2f} ms  samples "
          f"{[round(s, 2) for s in enc_ms]}")
    print(f"decode median {med(dec_ms):.2f} ms  samples "
          f"{[round(s, 2) for s in dec_ms]}")


if __name__ == "__main__":
    main()
