"""Compile + time ONE staged BPC program at one LUT pad. Exit code encodes
the verdict so a farming loop can sweep pads cheaply.

Usage: python tools/roll_one.py {spp_enc|mrp_enc|spp_dec|mrp_dec} PAD [N]

Exit 0 = good roll (< 5 ms/call), 1 = bad roll. The farming driver runs
this under `timeout`: bad compiles take 10x longer than good ones
(PERF_NOTES.md), so a timeout kill is also a skip signal.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

prog = sys.argv[1]
pad = int(sys.argv[2])
n = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

import jax
import jax.numpy as jnp

from picsong_tpu.core.lut import LUTParams, neutral_lut, pad_lut
from picsong_tpu.entropy import bpc_jax

params = LUTParams()
wl = 5
lut = pad_lut(neutral_lut(params, wl, 2), pad)

rng = np.random.default_rng(0)
blocks = rng.integers(-512, 512, size=(n, 64, 64), dtype=np.int32)
levels = np.zeros(n, dtype=np.int32)
subbands = np.zeros(n, dtype=np.int32)
meta = tuple(jnp.asarray(a) for a in bpc_jax._meta_args(
    levels, subbands, params, wl, 2, 0.0))

staged = bpc_jax.StagedBPC(params, wl, 2, False)
lut_j = jnp.asarray(lut, jnp.int32)

if prog.endswith("_enc"):
    state, msb, consec, _, g = staged._init_enc(
        jnp.asarray(blocks, jnp.int32), *meta)
else:
    streams, sizes = bpc_jax.encode(blocks, levels, subbands,
                                    neutral_lut(params, wl, 2), params, wl)
    state, msb, consec, _, g = staged._init_dec(
        jnp.asarray(streams, jnp.int32), jnp.asarray(sizes, jnp.int32), *meta)

fns = {
    "spp_enc": lambda st: staged._spp_enc(
        *st, msb, consec, g["sig_grid0"], g["sign_grid0"], lut_j, 8),
    "mrp_enc": lambda st: staged._mrp_enc(*st, msb, consec, g["ref_b"],
                                          lut_j, 8),
    "spp_dec": lambda st: staged._spp_dec(
        *st, msb, consec, g["sig_grid0"], g["sign_grid0"], lut_j, 8),
    "mrp_dec": lambda st: staged._mrp_dec(*st, msb, consec, g["ref_b"],
                                          lut_j, 8),
}
fn = fns[prog]

t0 = time.perf_counter()
state = fn(state)
jax.block_until_ready(state)
compile_s = time.perf_counter() - t0

iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    state = fn(state)
jax.block_until_ready(state)
ms = (time.perf_counter() - t0) / iters * 1e3
good = ms < 5
print(f"ROLL {prog} pad={pad} n={n} compile={compile_s:.1f}s "
      f"per_call={ms:.3f}ms {'GOOD' if good else 'BAD'}", flush=True)
sys.exit(0 if good else 1)
