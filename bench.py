"""Benchmark harness: MPixels/s/chip for encode+decode round trips.

Runs the jitted single-device pipeline on the default accelerator (the
real TPU chip under the driver) over the BASELINE workload family and
prints one JSON line:

  {"metric": ..., "value": N, "unit": "MPixels/s", "vs_baseline": N,
   "extra": {...}}

The reference publishes no numbers (BASELINE.md), so vs_baseline is
reported against the BASELINE.json north-star acceptance value of
100 MPixels/s/chip for a lossless 5/3 + BPC round trip.

`value` is the headline config (lossless 5/3, 2048x2048, wl=5 — BASELINE
config 1). A default run additionally times the whole recorded surface
(VERDICT r2 next #6) and reports it under "extra":

  lossy97_2048      BASELINE config 2 (9/7 + quantization)
  lossless53_8192   BASELINE config 3 (8K single image)
  lossy97_8192      BASELINE config 3, lossy path
  quick_512         the dispatch-overhead regime (512^2, wl=1)
  packed_2048       round trip THROUGH the device-side BitStreamBuilder
                    (encode_packed -> dense payload -> unpack_dense ->
                    decode): codestream relocation included

Flags:
  --size N       image edge (default 2048)
  --levels N     wavelet levels (default 5)
  --lossy        benchmark the 9/7 + quantization path
  --iters N      timed iterations (default 10)
  --quick        512x512, 1 level, 2 iters (smoke test)
  --packed       round trip through encode_packed/unpack_dense
  --no-extras    headline config only (single-config runs imply this)

Timing discipline (PERF_NOTES.md round 3): per-iteration blocked timing
with ONE round trip in flight, medians reported; large geometries run
through the engine's chunked codeblock batches, which keeps every program
in the regime where readiness reporting is trustworthy (see
Config.warm_and_time and tools/sync_probe.py for the investigation). NO
device->host read happens before the LAST timed loop finishes — the first
D2H permanently degrades dispatch ~1000x, so all configs compile + warm +
time first and every correctness assert runs after. The JSON line reports
which encoder/decoder path ran, per-sample times and the mean, so a
silent path flip, an async leak or a bad compile roll is visible from the
recorded line alone (VERDICT r1 weak #8).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

BASELINE_MPS = 100.0  # acceptance floor, MPixels/s/chip round trip


def make_image(size: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:size, 0:size]
    base = (96 + 64 * np.sin(x / 9.0) * np.cos(y / 13.0)
            + rng.normal(0, 8, size=(size, size)))
    return np.clip(base, 0, 255).astype(np.uint8)


class Config:
    """One benchmark configuration: build/warm/time now, verify later."""

    def __init__(self, name: str, size: int, levels: int, lossy: bool,
                 iters: int, packed: bool = False, k: float = 0.0):
        self.name, self.size, self.levels = name, size, levels
        self.lossy, self.iters, self.packed = lossy, iters, packed
        self.k = k
        self.samples_ms: list[float] = []
        self.error: str | None = None

    def build(self):
        import jax.numpy as jnp

        from picsong_tpu.core.header import CodecConfig
        from picsong_tpu.core.lut import LUTParams, neutral_lut
        from picsong_tpu.engine.pipeline import TPUCodec

        cfg = CodecConfig(width=self.size, height=self.size,
                          wavelet_levels=self.levels, is_lossy=self.lossy,
                          qs=1.0, k_factor=self.k)
        params = LUTParams()
        lut = neutral_lut(params, cfg.wavelet_levels, cfg.coding_passes,
                          n_groups=params.n_bitplane_files if self.k else 1)
        # PICSONG_LUT_PAD: cache-busting knob — padding the (index-clipped)
        # LUT changes the HLO hash without changing semantics, forcing a
        # fresh compile (the remote TPU compiler is observably
        # nondeterministic; a re-roll can replace a bad cached binary)
        pad = int(os.environ.get("PICSONG_LUT_PAD", "0"))
        if pad:
            lut = np.concatenate([lut, np.full(pad, 64, dtype=np.int32)])
        self.codec = TPUCodec(cfg, [lut], params)
        img = make_image(self.size)
        self.n_planes = self.codec.planes_host(img)
        self.plane = jnp.asarray(self.codec._prep_gray(jnp.asarray(img)))
        if self.packed:
            # bucket: static dense-payload capacity in uint16 words. The
            # synthetic image compresses ~2x, so half the raw size plus
            # slack; overflow is checked post-timing and reported.
            self.bucket = self.size * self.size // 2 + (1 << 16)

    def roundtrip(self, plane):
        codec, lut = self.codec, self.codec.luts[0]
        if self.packed:
            import jax.numpy as jnp
            st = codec._staged
            blocks, _ = codec._dwt_tile(plane)
            sizes, msb, dense = st.encode_packed(
                blocks, lut, codec._meta, self.n_planes, self.bucket)
            streams = st.unpack_dense(dense, sizes,
                                      msb.astype(jnp.int32))
            blocks = st.decode(streams, sizes.astype(jnp.int32), lut,
                               codec._meta, self.n_planes)
            self._sizes = sizes
            return codec._untile_idwt(blocks)
        streams, sizes = codec._encode_plane(plane, lut, self.n_planes)
        return codec._decode_plane(streams, sizes, lut, self.n_planes)

    def warm_and_time(self):
        """Per-iteration blocked timing, one round trip in flight.

        Protocol notes (tools/sync_probe.py, PERF_NOTES.md round 3):
        `block_until_ready` readiness is only trustworthy in the
        VMEM-resident regime (codeblock batches ~<= 2048 blocks); larger
        unchunked programs both run pathologically slowly under the axon
        tunnel AND report fictional readiness, so big-geometry configs
        run CHUNKED (the engine splits the codeblock batch; see build()).
        Chained-dependency timing is NOT used: with lying readiness the
        client enqueues the whole chain ahead, overcommitting HBM
        (measured: a 104-link 8192^2 chain wedged the device for >30
        minutes). Medians over samples_ms are robust to the occasional
        early-return sample."""
        out = self.roundtrip(self.plane)
        out.block_until_ready()           # compile + warm up
        self.out = out                    # single-pass result for verify()
        t0 = time.perf_counter()
        for _ in range(self.iters):
            ts = time.perf_counter()
            out = self.roundtrip(self.plane)
            out.block_until_ready()
            self.samples_ms.append((time.perf_counter() - ts) * 1e3)
        self.chained_ms = (time.perf_counter() - t0) * 1e3 / self.iters

    def verify(self):
        """Runs AFTER every config's timed loop (first D2H of the run).

        Comparisons happen ON DEVICE and download one scalar each — a
        full-plane download of the 8192^2 config would cost ~30 s at the
        tunnel's D2H bandwidth for no extra signal."""
        import jax.numpy as jnp
        if self.packed:
            used = int(jnp.sum(self._sizes.astype(jnp.int64))
                       - self._sizes.shape[0])
            if used > self.bucket:
                raise AssertionError(
                    f"dense bucket overflow: {used} > {self.bucket}")
        if not self.lossy:
            if not bool(jnp.array_equal(self.out, self.plane)):
                raise AssertionError("lossless round trip not bit-exact")
        else:
            err = self.out.astype(jnp.float64) - self.plane
            rms = float(jnp.sqrt(jnp.mean(err * err)))
            if rms > 4.0:
                raise AssertionError(f"lossy reconstruction RMS {rms:.2f}")

    @property
    def median_ms(self) -> float:
        return sorted(self.samples_ms)[len(self.samples_ms) // 2]

    @property
    def mpix(self) -> float:
        return self.size * self.size / (self.median_ms / 1e3) / 1e6

    def report(self) -> dict:
        if self.error:
            return {"error": self.error}
        return {"mpix_s": round(self.mpix, 3),
                "median_ms": round(self.median_ms, 3),
                "mean_ms": round(self.chained_ms, 3),
                "samples_ms": [round(s, 3) for s in self.samples_ms]}


class VideoBench:
    """BASELINE config 4 evidence: video frames/s through the batched
    pipelined engine (engine/video.py).

    Runs LAST — the video drain downloads streams mid-run (first D2H of
    the process is the flat tunnel transition, PERF_NOTES.md), so it must
    never precede the image configs' timed loops. Protocol: one cold run
    pays compile + the flat transition, a second warm run measures the
    steady state the reference's runVideo pipeline corresponds to
    (CodingEngine.cu:758-983); both are reported."""

    name = "video_1080p"

    def __init__(self, frames: int = 32, width: int = 1920,
                 height: int = 1080, batch: int = 8):
        self.frames, self.width, self.height = frames, width, height
        self.batch = batch

    def run(self) -> dict:
        import tempfile

        import numpy as np

        from picsong_tpu.core.header import CodecConfig
        from picsong_tpu.core.lut import LUTParams, neutral_lut
        from picsong_tpu.engine.video import decode_video, encode_video

        params = LUTParams()
        cfg = CodecConfig(width=self.width, height=self.height,
                          wavelet_levels=3, frames=self.frames)
        lut = neutral_lut(params, cfg.wavelet_levels, cfg.coding_passes)
        tmp = tempfile.mkdtemp(prefix="picsong_vbench_")
        raw = f"{tmp}/v.raw"
        base = make_image(2048)[:self.height, :self.width]
        rng = np.random.default_rng(1)
        with open(raw, "wb") as f:
            for i in range(self.frames):
                frame = np.roll(base, 7 * i, axis=1)
                frame = np.clip(frame.astype(np.int16)
                                + rng.integers(-4, 5, frame.shape), 0,
                                255).astype(np.uint8)
                f.write(frame.tobytes())
        enc = f"{tmp}/v.enc"
        dec = f"{tmp}/v_dec.raw"
        kw = dict(frames=self.frames, batch=self.batch)
        e_cold = encode_video(raw, enc, cfg, [lut], params, **kw)
        e_warm = encode_video(raw, enc, cfg, [lut], params, **kw)
        d_cold = decode_video(enc, dec, cfg, [lut], params, batch=self.batch)
        d_warm = decode_video(enc, dec, cfg, [lut], params, batch=self.batch)
        with open(raw, "rb") as f, open(dec, "rb") as g:
            exact = f.read() == g.read()

        def detail(st):
            return {k: round(getattr(st, k, 0.0), 3)
                    for k in ("wall_s", "compute_s", "download_s",
                              "reader_stall_s", "writer_stall_s")}

        # Caveats encoded in the record: the cold run pays compile + the
        # axon tunnel's flat first-download transition; the warm run pays
        # the tunnel's post-download degraded dispatch (PERF_NOTES.md) —
        # a long-video fresh process (the defer schedule's design point)
        # sits between them, so both bounds are reported.
        rec = {
            "frames": self.frames, "batch": self.batch,
            "geometry": f"{self.width}x{self.height} gray wl=3 lossless",
            "encode_fps": round(self.frames / e_warm.wall_s, 3),
            "decode_fps": round(self.frames / d_warm.wall_s, 3),
            "encode_fps_cold": round(self.frames / e_cold.wall_s, 3),
            "decode_fps_cold": round(self.frames / d_cold.wall_s, 3),
            "encode_stats": detail(e_warm), "decode_stats": detail(d_warm),
            "encode_stats_cold": detail(e_cold),
            "lossless_bitexact": exact,
        }
        if not exact:
            rec["error"] = "video round trip not bit-exact"
        return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--lossy", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--k", type=float, default=0.0,
                    help="complexity-scalability factor (bulk bitplanes)")
    ap.add_argument("--video", action="store_true",
                    help="run ONLY the video frames/s config")
    ap.add_argument("--video-frames", type=int, default=32)
    ap.add_argument("--no-extras", action="store_true")
    args = ap.parse_args()

    if args.video:
        vb = VideoBench(frames=args.video_frames)
        rec = vb.run()
        print(json.dumps({
            "metric": "video frames/s 1080p gray encode+decode",
            "value": rec["encode_fps"], "unit": "frames/s",
            "vs_baseline": rec["encode_fps"] / 24.0,   # realtime-24fps floor
            "extra": {vb.name: rec}}))
        return

    single = (args.size is not None or args.quick or args.lossy
              or args.packed or args.no_extras or args.k > 0)
    if args.quick:
        size, levels = 512, 1
        iters = 2 if args.iters == 10 else args.iters
    else:
        size, levels, iters = args.size or 2048, args.levels, args.iters

    mode = "lossy97" if args.lossy else "lossless53"
    if args.k > 0:
        mode = f"cs_k{args.k:g}_{mode}"
    head = Config(f"{mode}_{size}", size, levels, args.lossy, iters,
                  packed=args.packed, k=args.k)
    configs = [head]
    if not single:
        configs += [
            Config("lossy97_2048", 2048, 5, True, iters),
            Config("quick_512", 512, 1, False, max(iters, 10)),
            Config("packed_2048", 2048, 5, False, iters, packed=True),
            Config("cs_k5_2048", 2048, 5, False, iters, k=5.0),
            Config("lossless53_8192", 8192, 5, False, max(iters // 2, 3)),
            Config("lossy97_8192", 8192, 5, True, max(iters // 2, 3)),
        ]

    # Phase 1: build + warm + time everything. No D2H before this loop
    # completes (planes_host is a CPU-backend replica, not a device read).
    for c in configs:
        try:
            c.build()
            c.warm_and_time()
        except Exception as e:                      # noqa: BLE001
            c.error = f"{type(e).__name__}: {e}"
            if c is head:
                raise
    # Phase 2: correctness (first device reads of the process).
    for c in configs:
        if c.error:
            continue
        try:
            c.verify()
        except Exception as e:                      # noqa: BLE001
            c.error = f"{type(e).__name__}: {e}"
            if c is head:
                raise

    from picsong_tpu.engine.pipeline import _decoder_mode, _encoder_mode
    from picsong_tpu.entropy.bpc_jax import _pair_enabled

    def _group_size():
        """Recorded plane-group policy: env override or 'adaptive'."""
        return os.environ.get("PICSONG_STAGED_GROUP", "adaptive")
    rec = {
        "metric": (f"MPixels/s/chip encode+decode {mode} {size}x{size}"
                   + (" packed" if args.packed else "")),
        "value": round(head.mpix, 3),
        "unit": "MPixels/s",
        "vs_baseline": round(head.mpix / BASELINE_MPS, 4),
        "encoder": _encoder_mode(), "decoder": _decoder_mode(),
        "paired": _pair_enabled(), "plane_group": _group_size(),
        "median_ms": round(head.median_ms, 3),
        "mean_ms": round(head.chained_ms, 3),
        "samples_ms": [round(s, 3) for s in head.samples_ms],
    }
    if not single:
        rec["extra"] = {c.name: c.report() for c in configs[1:]}
        # Phase 3: video frames/s (BASELINE config 4). Runs dead last —
        # its drain downloads mid-run, which is only safe after every
        # image config's timed loop is done.
        try:
            rec["extra"]["video_1080p"] = VideoBench().run()
        except Exception as e:                       # noqa: BLE001
            rec["extra"]["video_1080p"] = {
                "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
