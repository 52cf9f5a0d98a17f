"""Quick LUT-table evaluation: lossless bpp on the held-out images.

Compares candidate LUT folders against the upstream reference tables and
the neutral baseline on the exact held-out set QUALITY.md reports
(tools/quality_report.py), so trainer experiments get a pass/fail signal
in minutes without regenerating the full report.

Usage: python tools/lut_eval.py FOLDER [FOLDER...] [--size 512]
"""
from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from picsong_tpu.core.header import CodecConfig  # noqa: E402
from picsong_tpu.core.lut import LUTParams, load_luts, neutral_lut  # noqa: E402
from picsong_tpu.engine.pipeline import TPUCodec  # noqa: E402
from tools.quality_report import REF, edges, natural, noisy  # noqa: E402


def bpp(img: np.ndarray, lut, params) -> float:
    cfg = CodecConfig(width=img.shape[1], height=img.shape[0],
                      wavelet_levels=5)
    codec = TPUCodec(cfg, [lut], params)
    s = codec.encode(img)[0]
    assert np.array_equal(codec.decode([s]), img)
    return s.size * 2 * 8 / img.size


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("folders", nargs="+")
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    imgs = [("natural", natural(args.size)), ("noisy", noisy(args.size)),
            ("edges", edges(args.size))]
    cands = {"neutral": (neutral_lut(LUTParams(), 5, 2), LUTParams())}
    ref_luts, ref_p = load_luts(f"{REF}/n1_lossless", 5, 2, 0.0)
    cands["reference"] = (ref_luts[0], ref_p)
    for folder in args.folders:
        luts, p = load_luts(folder, 5, 2, 0.0)
        cands[os.path.basename(folder.rstrip("/"))] = (luts[0], p)

    header = ["image"] + list(cands)
    print("\t".join(header))
    for iname, img in imgs:
        row = [iname]
        for lut, p in cands.values():
            row.append(f"{bpp(img, lut, p):.4f}")
        print("\t".join(row))


if __name__ == "__main__":
    main()
