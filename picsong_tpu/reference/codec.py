"""NumPy oracle: full image encode/decode pipelines and codestream packing.

Ties together the oracle DWT (reference/dwt.py) and BPC (reference/bpc.py)
with the wire format:

- Codeblock iteration order is row-major over the adapted plane
  (warpID = y_block * nWarpsX + x_block, BPCEngine.cu:1974-1979).
- Codestream relocation: 9-short header slot + per-codeblock (MSB, size)
  short pairs + concatenated payloads; total length
  sum(sizes) + 9 + 2*nCB - nCB + 1 with a trailing filler short
  (BitStreamBuilder.cu:106-171,290-323). Only the first frame/component
  carries real header values; later ones keep 0xFFFF filler
  (BitStreamBuilder.cpp:100-114, BSEngine::deviceMemoryAllocator).
- Color transforms and DC level shift (CodingEngine.cu:357-449,581-588;
  DecodingEngine.cu:599-729).
"""

from __future__ import annotations

import numpy as np

from ..core import spec
from ..core.header import CodecConfig, pack_header
from ..core.lut import LUTParams
from . import bpc, dwt


# --------------------------------------------------------------------------
# Codestream relocation (pack/unpack)
# --------------------------------------------------------------------------

def pack_streams(streams: np.ndarray, sizes: np.ndarray,
                 header: np.ndarray | None) -> np.ndarray:
    """Pack per-codeblock sparse streams into the dense short codestream.

    streams: int32 (ncb, 4096), word 0 = MSB; sizes: used words per block.
    header: 9 uint16 values for the first frame, or None for 0xFFFF filler.
    """
    ncb = streams.shape[0]
    sizes = np.asarray(sizes, dtype=np.int64)
    prefix = np.cumsum(sizes)
    total = int(prefix[-1])
    length = total + 9 + 2 * ncb - ncb + 1
    out = np.full(length, 0xFFFF, dtype=np.uint16)
    if header is not None:
        out[:9] = header
    out[9:9 + 2 * ncb:2] = (streams[:, 0] & 0xFFFF).astype(np.uint16)
    out[10:10 + 2 * ncb:2] = (sizes & 0xFFFF).astype(np.uint16)
    payload_base = 8 + 2 * ncb
    pexc = prefix - sizes
    for i in range(ncb):
        n = int(sizes[i])
        if n <= 1:
            continue
        start = payload_base + int(pexc[i]) + 1 - i
        out[start:start + n - 1] = (streams[i, 1:n] & 0xFFFF).astype(np.uint16)
    return out


def unpack_streams(stream: np.ndarray, ncb: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of pack_streams: rebuild (ncb, 4096) int32 streams + sizes.

    Unused slots are -1 (the decoder memsets its codestream buffer to -1,
    BitStreamBuilder.cu:282); payload shorts are zero-extended to int32.
    """
    stream = np.asarray(stream, dtype=np.uint16)
    sizes = stream[10:10 + 2 * ncb:2].astype(np.int64)
    msbs = stream[9:9 + 2 * ncb:2].astype(np.int64)
    out = np.full((ncb, spec.CBLOCK_SIZE), -1, dtype=np.int32)
    out[:, 0] = msbs
    payload_base = 8 + 2 * ncb
    prefix = np.cumsum(sizes)
    pexc = prefix - sizes
    for i in range(ncb):
        n = int(sizes[i])
        if n <= 1:
            continue
        start = payload_base + int(pexc[i]) + 1 - i
        out[i, 1:n] = stream[start:start + n - 1].astype(np.int32)
    return out, sizes


def stream_length(sizes: np.ndarray) -> int:
    ncb = len(sizes)
    return int(np.sum(sizes)) + 9 + 2 * ncb - ncb + 1


# --------------------------------------------------------------------------
# Codeblock tiling
# --------------------------------------------------------------------------

def plane_to_codeblocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (ncb, 64, 64) in warpID (row-major block) order."""
    h, w = plane.shape
    by, bx = h // spec.CBLOCK_LENGTH, w // spec.CBLOCK_WIDTH
    return (plane.reshape(by, spec.CBLOCK_LENGTH, bx, spec.CBLOCK_WIDTH)
            .transpose(0, 2, 1, 3).reshape(by * bx, spec.CBLOCK_LENGTH,
                                           spec.CBLOCK_WIDTH))


def codeblocks_to_plane(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    by, bx = h // spec.CBLOCK_LENGTH, w // spec.CBLOCK_WIDTH
    return (blocks.reshape(by, bx, spec.CBLOCK_LENGTH, spec.CBLOCK_WIDTH)
            .transpose(0, 2, 1, 3).reshape(h, w))


def codeblock_bands(adapted_w: int, adapted_h: int,
                    wavelet_levels: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-codeblock (level, subband) in warpID order (findSubband)."""
    by, bx = adapted_h // spec.CBLOCK_LENGTH, adapted_w // spec.CBLOCK_WIDTH
    levels = np.empty(by * bx, dtype=np.int32)
    subbands = np.empty(by * bx, dtype=np.int32)
    for yb in range(by):
        for xb in range(bx):
            lvl, sb = bpc.find_subband(xb * spec.CBLOCK_WIDTH,
                                       yb * spec.CBLOCK_LENGTH,
                                       adapted_w, adapted_h, wavelet_levels)
            levels[yb * bx + xb] = lvl
            subbands[yb * bx + xb] = sb
    return levels, subbands


# --------------------------------------------------------------------------
# Component-plane encode/decode
# --------------------------------------------------------------------------

def encode_plane(plane: np.ndarray, cfg: CodecConfig, lut: np.ndarray,
                 params: LUTParams) -> tuple[np.ndarray, np.ndarray]:
    """DC-shifted component plane -> (per-cb streams, sizes)."""
    coeffs = dwt.dwt_forward(plane, cfg.wavelet_levels, cfg.is_lossy, cfg.qs)
    coeffs = coeffs.astype(np.int32)  # lossy: trunc toward zero, (int) cast
    aw, ah = coeffs.shape[1], coeffs.shape[0]
    levels, subbands = codeblock_bands(aw, ah, cfg.wavelet_levels)
    blocks = plane_to_codeblocks(coeffs)
    ncb = blocks.shape[0]
    streams = np.empty((ncb, spec.CBLOCK_SIZE), dtype=np.int32)
    sizes = np.empty(ncb, dtype=np.int64)
    for i in range(ncb):
        streams[i], sizes[i] = bpc.encode_codeblock(
            blocks[i], int(levels[i]), int(subbands[i]), lut, params,
            cfg.wavelet_levels, cfg.coding_passes, cfg.k_factor)
    return streams, sizes


def decode_plane(streams: np.ndarray, sizes: np.ndarray, cfg: CodecConfig,
                 lut: np.ndarray, params: LUTParams,
                 adapted_w: int, adapted_h: int) -> np.ndarray:
    """(per-cb streams, sizes) -> reconstructed DC-shifted plane."""
    levels, subbands = codeblock_bands(adapted_w, adapted_h, cfg.wavelet_levels)
    ncb = streams.shape[0]
    blocks = np.empty((ncb, spec.CBLOCK_LENGTH, spec.CBLOCK_WIDTH), dtype=np.int32)
    for i in range(ncb):
        blocks[i] = bpc.decode_codeblock(
            streams[i], int(sizes[i]), int(levels[i]), int(subbands[i]), lut,
            params, cfg.wavelet_levels, cfg.coding_passes, cfg.k_factor)
    mallat = codeblocks_to_plane(blocks, adapted_h, adapted_w)
    return dwt.dwt_reverse(mallat, cfg.wavelet_levels, cfg.is_lossy, cfg.qs)


# --------------------------------------------------------------------------
# Color transforms (exact reference math)
# --------------------------------------------------------------------------

def rct_forward(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    """Reversible transform on DC-shifted ints (CodingEngine.cu:372-374)."""
    r = r.astype(np.int32)
    g = g.astype(np.int32)
    b = b.astype(np.int32)
    y = (r + 2 * g + b) >> 2        # floor division
    return y, b - g, r - g


def rct_inverse(y: np.ndarray, u: np.ndarray, v: np.ndarray):
    """DecodingEngine.cu:613-615 (its floor() on ints is plain floor-div)."""
    g = y - ((u + v) >> 2)
    return v + g, g, u + g


def ict_forward(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    m = spec.ICT_FORWARD
    stack = np.stack([r, g, b]).astype(np.float32)
    out = np.tensordot(m, stack, axes=1)
    return out[0], out[1], out[2]


def ict_inverse(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    m = spec.ICT_BACKWARD
    stack = np.stack([y, cb, cr]).astype(np.float32)
    out = np.tensordot(m, stack, axes=1)
    # __float2int_rn(x + 0.01f) per component (DecodingEngine.cu:640-642)
    return tuple(np.rint(out[i] + np.float32(0.01)).astype(np.int32)
                 for i in range(3))


# --------------------------------------------------------------------------
# Whole-image encode/decode (grayscale and RGB)
# --------------------------------------------------------------------------

def encode_image(pixels: np.ndarray | list[np.ndarray], cfg: CodecConfig,
                 luts: list[np.ndarray], params: LUTParams) -> list[np.ndarray]:
    """uint8 plane (grayscale) or [R, G, B] planes -> list of codestreams.

    Returns one short-stream per component; the first carries the header
    (RGB images are stored as three appended component streams,
    CodingEngine::runImage, CodingEngine.cu:606-628).
    """
    header = pack_header(cfg)
    offset = 0 if cfg.is_signed else (1 << (cfg.bit_depth - 1))
    aw, ah = spec.adapted_size(cfg.width, cfg.height)

    from ..core.image_io import mirror_pad, sample_dtype

    dtype = sample_dtype(cfg.bps, cfg.endianess, cfg.is_signed).newbyteorder("=")
    if cfg.is_rgb:
        planes = [mirror_pad(np.asarray(p).astype(dtype), aw, ah)
                  for p in pixels]
        r, g, b = (p.astype(np.int32) - offset for p in planes)
        if cfg.is_lossy:
            comps = list(ict_forward(r.astype(np.float32), g.astype(np.float32),
                                     b.astype(np.float32)))
        else:
            comps = list(rct_forward(r, g, b))
    else:
        plane = mirror_pad(np.asarray(pixels).astype(dtype), aw, ah)
        shifted = plane.astype(np.int32) - offset
        comps = [shifted.astype(np.float32) if cfg.is_lossy else shifted]

    out = []
    for i, comp in enumerate(comps):
        lut = luts[min(i, len(luts) - 1)]
        streams, sizes = encode_plane(comp, cfg, lut, params)
        out.append(pack_streams(streams, sizes, header if i == 0 else None))
    return out


def decode_image(component_streams: list[np.ndarray], cfg: CodecConfig,
                 luts: list[np.ndarray], params: LUTParams) -> np.ndarray | list[np.ndarray]:
    """Codestreams -> uint8 plane(s), cropped to (height, width)."""
    aw, ah = spec.adapted_size(cfg.width, cfg.height)
    ncb = spec.num_codeblocks(aw, ah)
    offset = 0 if cfg.is_signed else (1 << (cfg.bit_depth - 1))
    from ..core.image_io import sample_dtype
    dtype = sample_dtype(cfg.bps, cfg.endianess, cfg.is_signed).newbyteorder("=")
    if cfg.is_signed:
        mn, mx = -(1 << (cfg.bit_depth - 1)), (1 << (cfg.bit_depth - 1)) - 1
    else:
        mn, mx = 0, (1 << cfg.bit_depth) - 1

    planes = []
    for cs_shorts in component_streams:
        streams, sizes = unpack_streams(cs_shorts, ncb)
        lut = luts[min(len(planes), len(luts) - 1)]
        planes.append(decode_plane(streams, sizes, cfg, lut, params, aw, ah))

    if cfg.is_rgb:
        if cfg.is_lossy:
            r, g, b = ict_inverse(planes[0], planes[1], planes[2])
        else:
            r, g, b = rct_inverse(*[p.astype(np.int32) for p in planes])
        out = []
        for p in (r, g, b):
            p = np.clip(p.astype(np.int32) + offset, mn, mx).astype(dtype)
            out.append(p[:cfg.height, :cfg.width])
        return out

    plane = planes[0]
    if cfg.is_lossy:
        # removeOffsetAndApplyMaxMinLossy (DecodingEngine.cu:706-715)
        vals = np.rint(plane.astype(np.float32) + np.float32(offset)
                       + np.float32(0.01))
        plane = np.clip(vals, mn, mx).astype(dtype)
    else:
        plane = np.clip(plane.astype(np.int32) + offset, mn, mx).astype(dtype)
    return plane[:cfg.height, :cfg.width]
