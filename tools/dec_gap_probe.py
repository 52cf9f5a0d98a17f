"""Round-5 probe: where does the 8K decode/encode gap live?

Round 4 measured (PERF_NOTES 8K phase breakdown): encode 24.9 ms vs
decode 35.1 ms for the 16-chunk 8K entropy chains, and blamed either the
te/to donation warnings (disproved round 5 — those came from the FINISH
programs donating args with no aliasable output; no copy ever happened)
or a per-chunk re-materialization of the decoder's read-only streams
buffer.

This probe times each staged program CLASS individually at the 8K chunk
shape (1024 codeblocks, 16 planes, G=8), one call in flight, blocked
samples, encode vs decode side by side:

  init     _init_enc vs _init_dec
  group    grouped pair program per call (x2 calls per chunk at G=8)
  finish   _finish_enc vs _finish_dec

Usage: timeout 900 python tools/dec_gap_probe.py [--blocks 1024] [--iters 8]
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
    ap.add_argument("--blocks", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--planes", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp

    from picsong_tpu.core.lut import LUTParams, neutral_lut
    from picsong_tpu.entropy import bpc_jax

    params = LUTParams()
    wl = 5
    N, P = args.blocks, args.planes
    lut = jnp.asarray(neutral_lut(params, wl, 2), jnp.int32)
    levels = np.zeros(N, np.int32)
    subbands = np.zeros(N, np.int32)
    meta = tuple(jnp.asarray(m) for m in bpc_jax._meta_args(
        levels, subbands, params, wl, 2, 0.0))
    st = bpc_jax.get_staged(params, wl, 2, False)
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.integers(-30000, 30000, size=(N, 64, 64)),
                         jnp.int32)

    G = bpc_jax._group_size(N, P)
    enc_prog = st._grouped_prog(True, G)
    dec_prog = st._grouped_prog(False, G)

    def timed(fn, ready, iters=args.iters):
        samples = []
        out = fn()
        ready(out)                       # compile + warm
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            ready(out)
            samples.append((time.perf_counter() - t0) * 1e3)
        return sorted(samples)[len(samples) // 2], out

    def ready_state(state):
        state[0].block_until_ready()

    # ---- encode side ----
    ms_init_e, (state0, msb, consec, empty, g) = timed(
        lambda: st._init_enc(blocks, *meta), lambda s: s[1].block_until_ready())

    def run_enc_group(state):
        for p0 in range(P - 1, -1, -G):
            state = enc_prog(*state, msb, consec, g["sig_grid0"],
                             g["sign_grid0"], g["ref_b"], lut, p0)
        return state

    # fresh state per iteration (donated buffers are consumed); rebuild
    # outside the timed region
    enc_groups = []
    state = state0
    for _ in range(args.iters + 1):
        state0_i = st._init_enc(blocks, *meta)[0]
        t0 = time.perf_counter()
        state = run_enc_group(state0_i)
        ready_state(state)
        enc_groups.append((time.perf_counter() - t0) * 1e3)
    ms_group_e = sorted(enc_groups[1:])[len(enc_groups[1:]) // 2]

    ms_fin_e, (streams, sizes) = timed(
        lambda: st._finish_enc(*st._init_enc(blocks, *meta)[0], msb, empty),
        lambda o: o[0].block_until_ready())
    # real streams for the decode side
    full_state = run_enc_group(st._init_enc(blocks, *meta)[0])
    streams, sizes = st._finish_enc(*full_state, msb, empty)
    streams = jnp.asarray(streams)
    sizes_i = jnp.asarray(sizes, jnp.int32)

    # ---- decode side ----
    ms_init_d, (dstate0, dmsb, dconsec, is_raw, dg) = timed(
        lambda: st._init_dec(streams, sizes_i, *meta),
        lambda s: s[1].block_until_ready())

    def run_dec_group(state):
        for p0 in range(P - 1, -1, -G):
            state = dec_prog(*state, dmsb, dconsec, dg["sig_grid0"],
                             dg["sign_grid0"], dg["ref_b"], lut, p0)
        return state

    dec_groups = []
    for _ in range(args.iters + 1):
        dstate_i = st._init_dec(streams, sizes_i, *meta)[0]
        t0 = time.perf_counter()
        dstate = run_dec_group(dstate_i)
        ready_state(dstate)
        dec_groups.append((time.perf_counter() - t0) * 1e3)
    ms_group_d = sorted(dec_groups[1:])[len(dec_groups[1:]) // 2]

    dstate = run_dec_group(st._init_dec(streams, sizes_i, *meta)[0])
    ms_fin_d, _ = timed(
        lambda: st._finish_dec(dstate[0], dstate[1], streams, is_raw),
        lambda o: o.block_until_ready())

    print(f"blocks={N} planes={P} G={G} iters={args.iters}")
    print(f"{'phase':8} {'encode ms':>10} {'decode ms':>10}")
    print(f"{'init':8} {ms_init_e:10.3f} {ms_init_d:10.3f}")
    print(f"{'groups':8} {ms_group_e:10.3f} {ms_group_d:10.3f}")
    print(f"{'finish':8} {ms_fin_e:10.3f} {ms_fin_d:10.3f}")


if __name__ == "__main__":
    main()
