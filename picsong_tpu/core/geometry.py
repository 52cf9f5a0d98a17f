"""Codeblock tiling geometry shared by oracle, JAX engine, and dist layers.

Codeblock iteration order is row-major over the adapted plane
(warpID = y_block * nWarpsX + x_block, BPC/BPCEngine.cu:1974-1979); each
codeblock's decomposition level and subband follow findSubband
(BPCEngine.cu:143-170).
"""

from __future__ import annotations

import numpy as np

from . import spec


def find_subband(cb_x: int, cb_y: int, width: int, height: int,
                 wavelet_levels: int) -> tuple[int, int]:
    """Decomposition level and subband of the codeblock at pixel (cb_x, cb_y).

    Subband codes HL=0, LH=1, HH=2; the residual LL reports
    (wavelet_levels, 0)."""
    for aux in range(1, wavelet_levels + 1):
        in_right = cb_x >= (width >> aux)
        in_bottom = cb_y >= (height >> aux)
        if in_right or in_bottom:
            if in_right:
                return aux - 1, spec.SUBBAND_HH if in_bottom else spec.SUBBAND_HL
            return aux - 1, spec.SUBBAND_LH
    return wavelet_levels, 0


def codeblock_bands(adapted_w: int, adapted_h: int,
                    wavelet_levels: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-codeblock (level, subband) vectors in warpID order."""
    by, bx = adapted_h // spec.CBLOCK_LENGTH, adapted_w // spec.CBLOCK_WIDTH
    levels = np.empty(by * bx, dtype=np.int32)
    subbands = np.empty(by * bx, dtype=np.int32)
    for yb in range(by):
        for xb in range(bx):
            lvl, sb = find_subband(xb * spec.CBLOCK_WIDTH,
                                   yb * spec.CBLOCK_LENGTH,
                                   adapted_w, adapted_h, wavelet_levels)
            levels[yb * bx + xb] = lvl
            subbands[yb * bx + xb] = sb
    return levels, subbands


def plane_to_codeblocks(plane):
    """(H, W) -> (ncb, 64, 64) in warpID order (works on numpy or jnp)."""
    h, w = plane.shape
    by, bx = h // spec.CBLOCK_LENGTH, w // spec.CBLOCK_WIDTH
    return (plane.reshape(by, spec.CBLOCK_LENGTH, bx, spec.CBLOCK_WIDTH)
            .transpose(0, 2, 1, 3).reshape(by * bx, spec.CBLOCK_LENGTH,
                                           spec.CBLOCK_WIDTH))


def codeblocks_to_plane(blocks, h: int, w: int):
    by, bx = h // spec.CBLOCK_LENGTH, w // spec.CBLOCK_WIDTH
    return (blocks.reshape(by, bx, spec.CBLOCK_LENGTH, spec.CBLOCK_WIDTH)
            .transpose(0, 2, 1, 3).reshape(h, w))
