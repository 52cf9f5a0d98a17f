"""LUT trainer: generate stationary context-probability tables from images.

The reference ships trained LUT folders (LUT/{n1,video}_{lossless,lossy})
but not the trainer that produced them (it belongs to the BPC-PaCo paper's
offline pipeline). This tool regenerates equivalent side information from
any set of training images: it runs the DWT, then simulates the exact
SPP/MRP scan (same context formation as the coder) while counting
(context, bit) occurrences per (wavelet level, subband, bitplane), and
writes a LUT folder in the reference's text format
(IO/IOManager.ipp:404-612) that both this codec and the reference parser
understand.

Probabilities are P(bit == 0) at 7-bit precision, clamped to [1, 127]
(the arithmetic coder needs both symbols representable).

Usage:
  python tools/lut_train.py --out LUT/trained_lossless --levels 5 \
      [--lossy] [--qs 1.0] [--images a.pgm b.pgm ...]

Without --images, a synthetic natural-image ensemble (filtered noise at
several correlation lengths) is used.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picsong_tpu.core import spec                       # noqa: E402
from picsong_tpu.core.geometry import (codeblock_bands,  # noqa: E402
                                       plane_to_codeblocks)
from picsong_tpu.core.image_io import read_pgm           # noqa: E402
from picsong_tpu.reference.dwt import dwt_forward        # noqa: E402

N_SIG_CTX, N_SIGN_CTX, N_REF_CTX = 9, 4, 1


class _Stats:
    """(level|LL, subband, bitplane, ctx) -> [count0, count1] accumulators."""

    def __init__(self, levels: int, n_bitplanes: int):
        g = levels * 3 + 1
        self.sig = np.zeros((g, n_bitplanes, N_SIG_CTX, 2), dtype=np.int64)
        self.sign = np.zeros((g, n_bitplanes, N_SIGN_CTX, 2), dtype=np.int64)
        self.ref = np.zeros((g, n_bitplanes, N_REF_CTX, 2), dtype=np.int64)
        self.levels = levels
        self.nbp = n_bitplanes

    def group(self, level: int, subband: int) -> int:
        if level == self.levels:
            return self.levels * 3
        return level * 3 + subband


def collect_block(stats: _Stats, block: np.ndarray, level: int, subband: int):
    """Count SPP/MRP events for one codeblock with the EXACT coder scan.

    Runs the same 64-row x 2-phase significance-propagation and refinement
    scan as the coder (reference/bpc.py _spp_pass/_mrp_pass, mirroring
    BPCEngine.cu:799-1022), including in-scan state updates — so the
    (context, bit) statistics are drawn from exactly the distribution the
    coder will index at code time. (A previous plane-synchronous
    approximation produced tables *worse* than neutral: it systematically
    undercounted contexts, because the coder's up/left neighbors already
    reflect the current plane's significance.)
    """
    from picsong_tpu.reference import bpc

    g = stats.group(level, subband)
    mag = np.abs(block.astype(np.int64))
    signbit = (block < 0).astype(np.int64)
    T = (mag << 1) | signbit
    msb_or = int(np.bitwise_or.reduce((T >> 1).reshape(-1)))
    if not msb_or:
        return
    msb = msb_or.bit_length() - 1

    from picsong_tpu.core.lut import LUTParams
    coder = bpc._CodeblockCoder(np.full(8, 64, np.int64), LUTParams(),
                                bpc._LutPtrs(0, 0, 0))
    coder.T[1:-1, 1:-1] = T

    for plane in range(min(msb, stats.nbp - 1), -1, -1):
        # SPP: significance + sign (BPCEngine.cu:799-843)
        for row in range(64):
            for phase in range(2):
                cur, cols = coder.cells(row, phase)
                nb = coder.neighbors(row, phase)
                active = (cur >> 31) == 0
                ctx = coder._sig_context(nb)
                bits = (cur >> (plane + 1)) & 1
                np.add.at(stats.sig[g, plane], (ctx[active], bits[active]), 1)
                newly = active & (bits == 1)
                upd = cur
                if newly.any():
                    sctx = coder._sign_context(nb["up"], nb["lf"], nb["rt"],
                                               nb["bt"])
                    ssym = np.where((cur & 1) == (sctx & 1), 0, 1)
                    np.add.at(stats.sign[g, plane],
                              ((sctx[newly] >> 1), ssym[newly]), 1)
                    upd = np.where(newly, cur | (1 << 31) | (plane << 24), cur)
                coder.T[row + 1, cols] = upd
        # MRP: refinement (BPCEngine.cu:986-1022)
        for row in range(64):
            for phase in range(2):
                cur, cols = coder.cells(row, phase)
                refine = ((cur >> 29) & 1) == 1
                eligible_next = ~refine & (((cur >> 31) & 1) == 1)
                bits = (cur >> (plane + 1)) & 1
                stats.ref[g, plane, 0, 0] += int((refine & (bits == 0)).sum())
                stats.ref[g, plane, 0, 1] += int((refine & (bits == 1)).sum())
                coder.T[row + 1, cols] = np.where(eligible_next,
                                                  cur | (1 << 29), cur)


def collect_image(stats: _Stats, plane: np.ndarray, levels: int,
                  lossy: bool, qs: float):
    h, w = plane.shape
    aw, ah = spec.adapted_size(w, h)
    if (aw, ah) != (w, h):
        from picsong_tpu.core.image_io import mirror_pad
        plane = mirror_pad(plane.astype(np.uint8), aw, ah)
    shifted = plane.astype(np.int32) - 128
    coeffs = dwt_forward(shifted.astype(np.float32) if lossy else shifted,
                         levels, lossy, qs).astype(np.int32)
    lv, sb = codeblock_bands(aw, ah, levels)
    blocks = plane_to_codeblocks(coeffs)
    for i in range(blocks.shape[0]):
        collect_block(stats, blocks[i], int(lv[i]), int(sb[i]))


def probabilities(counts: np.ndarray) -> np.ndarray:
    """counts (..., 2) -> 7-bit P(bit == 0), neutral 64 where unseen."""
    total = counts.sum(axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        p0 = counts[..., 0] / np.maximum(total, 1)
    prob = np.rint(p0 * 128).astype(np.int64)
    prob = np.clip(prob, 1, 127)
    return np.where(total < 16, 64, prob).astype(np.int32)


def write_lut_folder(stats: _Stats, out_dir: str, n_bitplane_files: int = 15):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "header.txt"), "w") as f:
        f.write(f"LUT_N_BITPLANES;{stats.nbp}\nLUT_N_SUBBANDS;3\n"
                "N_CONTEXT_REFINEMENT;1\nN_CONTEXT_SIGN;4\n"
                "N_CONTEXT_SIGNIFICANCE;9\nMULT_PRECISION;7\nLUT_N_FILES;3\n"
                f"AMOUNT_OF_BITPLANE_FILES;{n_bitplane_files}")

    def records(table, n_ctx):
        lines = []
        for g in range(table.shape[0]):
            level, subband = divmod(g, 3) if g < stats.levels * 3 else (stats.levels, 0)
            for bp in range(stats.nbp):
                vals = probabilities(table[g, bp])
                lines.append(f"{level} {subband} {bp} : "
                             + " ".join(str(int(v)) for v in vals))
        return "\n".join(lines) + "\n"

    for stem, table, n_ctx in (("ref", stats.ref, 1), ("sig", stats.sig, 9),
                               ("sign", stats.sign, 4)):
        text = records(table, n_ctx)
        # identical statistics for every channel and bitplane group — the
        # trainer currently pools channels; per-channel refinement is a
        # straightforward extension
        for ch in ("R", "G", "B"):
            for s in range(n_bitplane_files + 1):
                with open(os.path.join(out_dir, f"{stem}{ch}.txt_{s}"), "w") as f:
                    f.write(text)


def synthetic_ensemble(rng, count=9, size=512):
    """Natural-image stand-ins: correlated base + sensor-like noise.

    Diversity matters more than realism here: tables trained on only
    ultra-smooth images predict P(bit=0) ~ 127/128 at the low bitplanes
    and EXPAND noisy images (a 1 under p=127 costs ~7 bits), ending up
    worse than neutral. Mixing correlation lengths, noise amplitudes and
    edge content keeps every (plane, context) cell honestly populated.
    """
    out = []
    specs = [(2, 0.0), (4, 2.0), (8, 4.0), (16, 8.0), (32, 1.0),
             (2, 8.0), (8, 16.0), (4, 0.5), (16, 2.0)]
    for i in range(count):
        sigma, namp = specs[i % len(specs)]
        noise = rng.normal(0, 1, size=(size, size))
        f = np.fft.fft2(noise)
        fy = np.fft.fftfreq(size)[:, None]
        fx = np.fft.fftfreq(size)[None, :]
        filt = np.exp(-(fx ** 2 + fy ** 2) * (sigma * size / 8) ** 2)
        img = np.real(np.fft.ifft2(f * filt))
        img = (img - img.min()) / max(np.ptp(img), 1e-9) * 255
        if i % 3 == 2:   # piecewise content: hard edges every ~96 px
            yy, xx = np.mgrid[0:size, 0:size]
            img = np.where(((yy // 96) + (xx // 96)) % 2 == 0, img,
                           255.0 - img)
        img = img + rng.normal(0, namp, size=(size, size))
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--lossy", action="store_true")
    ap.add_argument("--qs", type=float, default=1.0)
    ap.add_argument("--bitplanes", type=int, default=15)
    ap.add_argument("--images", nargs="*", default=[])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    stats = _Stats(args.levels, args.bitplanes)
    if args.images:
        planes = [read_pgm(p) for p in args.images]
    else:
        planes = synthetic_ensemble(np.random.default_rng(args.seed))
    for img in planes:
        collect_image(stats, img, args.levels, args.lossy, args.qs)
    write_lut_folder(stats, args.out)
    print(f"wrote LUT folder {args.out} "
          f"({stats.sig.sum():.0f} significance events)")


if __name__ == "__main__":
    main()
