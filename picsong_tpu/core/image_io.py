"""File formats: PGM P5, planar RAW frames, codestreams and _SIZE sidecars.

Mirrors the reference IOManager (IO/IOManager.ipp):
- PGM P5 images (loadImageChar :36-65, writeImage :267-344),
- planar RAW frame reads with symmetric mirror padding up to the adapted
  (codeblock-multiple) size (loadFrameCAdaptedSizes :72-112),
- coded-stream append plus an ASCII comma-separated "<out>_SIZE" sidecar
  holding per-frame short counts, enabling random access to any frame
  (writeCodedFrame :176-190, readBulkSizes :196-208).

All functions are pure host-side NumPy; device code never touches files.
"""

from __future__ import annotations

import os

import numpy as np


# --------------------------------------------------------------------------
# PGM P5
# --------------------------------------------------------------------------

def sample_dtype(bps: int = 8, endianess: int = 0,
                 is_signed: bool = False) -> np.dtype:
    """Sample dtype from the header's bps/endianess/signed fields.

    The reference reads any sample type through the templated
    IOManager<T, Y> (IO/IOManager.ipp:72-138) with the type picked from
    the same three header fields (BitStreamBuilder.cpp:70-84). Here:
    bps <= 8 -> (u)int8; bps 9..16 -> (u)int16 with endianess 0 = little,
    1 = big."""
    if bps <= 8:
        return np.dtype(np.int8 if is_signed else np.uint8)
    if bps <= 16:
        return np.dtype(("<" if endianess == 0 else ">")
                        + ("i2" if is_signed else "u2"))
    raise ValueError(f"unsupported bits per sample: {bps}")


def read_pgm(path: str) -> np.ndarray:
    """Read a binary PGM (P5).

    Returns uint8 (maxval <= 255) or uint16 (16-bit PGM; samples are
    big-endian per the Netpbm spec)."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise ValueError(f"{path}: not a P5 PGM")
    # Tokenize header: magic, width, height, maxval; '#' starts a comment.
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    pixels = np.frombuffer(data, dtype=dtype, count=width * height, offset=pos)
    out = pixels.reshape(height, width)
    return out.astype(np.uint16) if maxval > 255 else out.copy()


def write_pgm(path: str, image: np.ndarray, bit_depth: int = 8) -> None:
    """Write a binary PGM (P5) with maxval 2**bit_depth - 1.

    16-bit images are written big-endian per the Netpbm spec."""
    image = np.asarray(image)
    if bit_depth > 8:
        image = image.astype(">u2")
    else:
        image = image.astype(np.uint8)
    height, width = image.shape
    header = f"P5\n{width} {height}\n{(1 << bit_depth) - 1}\n".encode()
    with open(path, "wb") as f:
        f.write(header)
        f.write(image.tobytes())


# --------------------------------------------------------------------------
# RAW planar frames
# --------------------------------------------------------------------------

def mirror_pad(plane: np.ndarray, adapted_width: int, adapted_height: int) -> np.ndarray:
    """Pad right/bottom by symmetric reflection with the edge repeated.

    x[W + j] = x[W - 1 - j] per row, then row[H + r] = row[H - 1 - r]
    (loadFrameCAdaptedSizes, IOManager.ipp:95-110). Equivalent to
    numpy's 'symmetric' pad mode.
    """
    height, width = plane.shape
    return np.pad(
        plane,
        ((0, adapted_height - height), (0, adapted_width - width)),
        mode="symmetric",
    )


def read_raw_frame(path: str, width: int, height: int, frame_index: int,
                   dtype=np.uint8) -> np.ndarray:
    """Read one grayscale frame / one component plane from a planar RAW file.

    Plane `frame_index` is at byte offset frame_index * width * height *
    itemsize (loadFrameC, IOManager.ipp:118-138). For an RGB image the
    three components are planes 0, 1, 2 of the same file. `dtype` comes
    from sample_dtype(bps, endianess, is_signed); samples are returned in
    native byte order."""
    dtype = np.dtype(dtype)
    size = width * height * dtype.itemsize
    with open(path, "rb") as f:
        f.seek(size * frame_index)
        data = f.read(size)
    if len(data) != size:
        raise ValueError(f"{path}: frame {frame_index} truncated")
    out = np.frombuffer(data, dtype=dtype).reshape(height, width)
    return out.astype(dtype.newbyteorder("="), copy=True)


def append_raw_frame(path: str, plane: np.ndarray, dtype=np.uint8) -> None:
    """Append one plane to a planar RAW file in the sample dtype.

    Note astype(copy=False) treats byte-order-only changes as equivalent
    and would skip the swap, so the conversion always copies."""
    with open(path, "ab") as f:
        f.write(np.asarray(plane).astype(np.dtype(dtype)).tobytes())


# --------------------------------------------------------------------------
# Codestream files and the _SIZE sidecar
# --------------------------------------------------------------------------

def write_codestream(path: str, stream: np.ndarray, first: bool) -> None:
    """Append one frame's codestream (uint16 shorts) and record its size.

    The sidecar "<path>_SIZE" accumulates comma-separated short counts
    (writeCodedFrame, IOManager.ipp:176-190); it is what gives video decode
    random access to frame i via prefix sums.
    """
    stream = np.asarray(stream, dtype=np.uint16)
    if first:
        for p in (path, path + "_SIZE"):
            if os.path.exists(p):
                os.remove(p)
    with open(path, "ab") as f:
        f.write(stream.tobytes())
    with open(path + "_SIZE", "a") as f:
        f.write(("%d" if first else ",%d") % stream.size)


def read_sizes(path: str) -> list[int]:
    """Read the _SIZE sidecar (readBulkSizes, IOManager.ipp:196-208)."""
    with open(path + "_SIZE", "r") as f:
        return [int(tok) for tok in f.read().split(",") if tok.strip()]


def read_codestream(path: str, offset_shorts: int, n_shorts: int) -> np.ndarray:
    """Read one frame's codestream as uint16 shorts at a short offset."""
    with open(path, "rb") as f:
        f.seek(offset_shorts * 2)
        data = f.read(n_shorts * 2)
    return np.frombuffer(data, dtype=np.uint16).copy()


def read_header_shorts(path: str, count: int = 9) -> np.ndarray:
    """Read the leading header shorts (loadBasicInfo, IOManager.ipp:21-32)."""
    with open(path, "rb") as f:
        data = f.read(count * 2)
    return np.frombuffer(data, dtype=np.uint16).copy()
