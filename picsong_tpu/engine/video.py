"""Pipelined video engine: the TPU equivalent of runVideo.

The reference overlaps disk reads, H2D copies, kernels, D2H copies and
disk writes with N CUDA streams fed by reader/writer CPU threads that
handshake through polled flag arrays (Engines/CodingEngine.cu:758-983,
203-262; DecodingEngine.cu:866-1043). On TPU the same overlap falls out of
XLA's async dispatch: device programs are enqueued without blocking, so a
reader thread keeping a small prefetch queue full plus non-blocking
`device_put` gives reader / compute / writer overlap without any polling
protocol. Frames share one compiled executable (one geometry).

Stage timers mirror the reference's printed metrics (reader stall, writer
stall, device time; CodingEngine.cu:258,495,1049).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

from ..core.header import CodecConfig
from ..core.image_io import (read_codestream, read_raw_frame, read_sizes,
                             write_codestream)
from .pipeline import TPUCodec


@dataclass
class VideoStats:
    frames: int = 0
    reader_stall_s: float = 0.0
    writer_stall_s: float = 0.0
    compute_s: float = 0.0
    wall_s: float = 0.0

    def as_dict(self) -> dict:
        return dict(frames=self.frames, reader_stall_s=self.reader_stall_s,
                    writer_stall_s=self.writer_stall_s,
                    compute_s=self.compute_s, wall_s=self.wall_s)


@dataclass
class _Prefetcher:
    """Reader thread with a bounded queue (the double-buffer input lane)."""

    fetch: callable
    count: int
    depth: int
    q: queue.Queue = field(init=False)

    def __post_init__(self):
        self.q = queue.Queue(maxsize=self.depth)
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def _run(self):
        for i in range(self.count):
            self.q.put((i, self.fetch(i)))

    def get(self):
        return self.q.get()


def encode_video(input_path: str, output_path: str, cfg: CodecConfig,
                 luts, params, frames: int, prefetch_depth: int = 4,
                 progress: bool = False) -> VideoStats:
    """Encode a planar RAW video (grayscale or RGB) frame sequence."""
    codec = TPUCodec(cfg, luts, params)
    stats = VideoStats()
    t0 = time.perf_counter()
    n_planes = 3 if cfg.is_rgb else 1

    def fetch(i):
        if cfg.is_rgb:
            return [read_raw_frame(input_path, cfg.width, cfg.height,
                                   i * n_planes + c) for c in range(3)]
        return read_raw_frame(input_path, cfg.width, cfg.height, i)

    reader = _Prefetcher(fetch, frames, prefetch_depth)
    for i in range(frames):
        tr = time.perf_counter()
        _, frame = reader.get()
        stats.reader_stall_s += time.perf_counter() - tr
        tc = time.perf_counter()
        streams = codec.encode(frame)
        stats.compute_s += time.perf_counter() - tc
        tw = time.perf_counter()
        for j, s in enumerate(streams):
            write_codestream(output_path, s, first=(i == 0 and j == 0))
        stats.writer_stall_s += time.perf_counter() - tw
        stats.frames += 1
        if progress:
            print(f"\rframe {i + 1}/{frames}", end="", flush=True)
    if progress:
        print()
    stats.wall_s = time.perf_counter() - t0
    return stats


def decode_video(input_path: str, output_path: str, cfg: CodecConfig,
                 luts, params, prefetch_depth: int = 4,
                 progress: bool = False) -> VideoStats:
    """Decode an appended-codestream video file back to planar RAW."""
    codec = TPUCodec(cfg, luts, params)
    stats = VideoStats()
    t0 = time.perf_counter()
    sizes = read_sizes(input_path)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    n_planes = 3 if cfg.is_rgb else 1
    n_frames = len(sizes) // n_planes

    def fetch(i):
        return [read_codestream(input_path,
                                int(offsets[i * n_planes + c]),
                                int(sizes[i * n_planes + c]))
                for c in range(n_planes)]

    reader = _Prefetcher(fetch, n_frames, prefetch_depth)
    import os
    if os.path.exists(output_path):
        os.remove(output_path)
    from ..core.image_io import append_raw_frame
    for i in range(n_frames):
        tr = time.perf_counter()
        _, comp_streams = reader.get()
        stats.reader_stall_s += time.perf_counter() - tr
        tc = time.perf_counter()
        out = codec.decode(comp_streams)
        stats.compute_s += time.perf_counter() - tc
        tw = time.perf_counter()
        if cfg.is_rgb:
            for p in out:
                append_raw_frame(output_path, p)
        else:
            append_raw_frame(output_path, out)
        stats.writer_stall_s += time.perf_counter() - tw
        stats.frames += 1
        if progress:
            print(f"\rframe {i + 1}/{n_frames}", end="", flush=True)
    if progress:
        print()
    stats.wall_s = time.perf_counter() - t0
    return stats
