"""Measure one BPC path (mono/staged/pallas) on the real chip, properly.

Protocol (VERDICT round-1 item 1):
  - run in a FRESH process per mode (no cross-contamination of the axon
    dispatch state or compile cache rolls)
  - block_until_ready() on EVERY timed sample
  - >= 10 timed iterations, report per-iter times + median

Usage: python tools/mode_bench.py <mode> [--size 2048] [--levels 5]
       [--iters 10] [--lossy]
Prints one JSON line with per-iteration milliseconds.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["mono", "staged", "pallas"])
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--lossy", action="store_true")
    args = ap.parse_args()

    os.environ["PICSONG_ENCODER"] = args.mode
    os.environ["PICSONG_DECODER"] = args.mode

    import jax.numpy as jnp
    import numpy as np

    from picsong_tpu.core.header import CodecConfig
    from picsong_tpu.core.lut import LUTParams, neutral_lut
    from picsong_tpu.engine.pipeline import TPUCodec

    cfg = CodecConfig(width=args.size, height=args.size,
                      wavelet_levels=args.levels, is_lossy=args.lossy, qs=1.0)
    params = LUTParams()
    lut = neutral_lut(params, cfg.wavelet_levels, cfg.coding_passes)
    codec = TPUCodec(cfg, [lut], params)

    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:args.size, 0:args.size]
    img = np.clip(96 + 64 * np.sin(x / 9.0) * np.cos(y / 13.0)
                  + rng.normal(0, 8, size=(args.size, args.size)),
                  0, 255).astype(np.uint8)

    n_planes = codec.planes_host(img)
    plane = jnp.asarray(codec._prep_gray(jnp.asarray(img)))

    def roundtrip():
        streams, sizes = codec._encode_plane(plane, codec.luts[0], n_planes)
        return codec._decode_plane(streams, sizes, codec.luts[0], n_planes)

    t0 = time.perf_counter()
    out = roundtrip()
    out.block_until_ready()
    compile_s = time.perf_counter() - t0

    samples_ms = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = roundtrip()
        out.block_until_ready()
        samples_ms.append((time.perf_counter() - t0) * 1e3)

    med = sorted(samples_ms)[len(samples_ms) // 2]
    mpix = args.size * args.size / (med / 1e3) / 1e6
    ok = None
    if not args.lossy:
        ok = bool(np.array_equal(np.asarray(out), np.asarray(plane)))
    print(json.dumps({
        "mode": args.mode, "size": args.size, "levels": args.levels,
        "lossy": args.lossy, "compile_s": round(compile_s, 2),
        "samples_ms": [round(s, 3) for s in samples_ms],
        "median_ms": round(med, 3), "mpix_s": round(mpix, 1),
        "bitexact": ok,
    }))


if __name__ == "__main__":
    main()
