"""Probe the TPU compile lottery: time every staged BPC program + DWT.

Usage: python tools/roll_probe.py [pad] [n_blocks]

Prints compile seconds and steady-state per-pass milliseconds for each
jitted program in the hot path. A good roll is < 1 ms/pass at N=1024; a
bad roll is > 100 ms/pass (PERF_NOTES.md). The pad pads the LUT table,
changing the HLO hash without changing semantics -- each pad value is an
independent lottery ticket.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pad = int(sys.argv[1]) if len(sys.argv) > 1 else 0
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

import jax
import jax.numpy as jnp

from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.entropy import bpc_jax

params = LUTParams()
wl = 5
lut = neutral_lut(params, wl, 2)
if pad:
    lut = np.concatenate([lut, np.full(pad, 64, dtype=np.int32)])

rng = np.random.default_rng(0)
blocks = rng.integers(-512, 512, size=(n, 64, 64), dtype=np.int32)
levels = np.zeros(n, dtype=np.int32)
subbands = np.zeros(n, dtype=np.int32)
meta = tuple(jnp.asarray(a) for a in bpc_jax._meta_args(
    levels, subbands, params, wl, 2, 0.0))

staged = bpc_jax.StagedBPC(params, wl, 2, False)
lut_j = jnp.asarray(lut, jnp.int32)
results = {}


def probe(name, fn, state_maker, iters=20):
    st = state_maker()
    t0 = time.perf_counter()
    st = fn(st)
    jax.block_until_ready(st)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        st = fn(st)
    jax.block_until_ready(st)
    ms = (time.perf_counter() - t0) / iters * 1e3
    verdict = "GOOD" if ms < 5 else "BAD"
    results[name] = (compile_s, ms, verdict)
    print(f"pad={pad} n={n} {name:10s} compile={compile_s:7.1f}s "
          f"per_call={ms:8.3f}ms {verdict}", flush=True)


# encoder state
state0, msb, consec, empty, g = staged._init_enc(
    jnp.asarray(blocks, jnp.int32), *meta)

probe("spp_enc", lambda st: staged._spp_enc(
    *st, msb, consec, g["sig_grid0"], g["sign_grid0"], lut_j, 8),
    lambda: state0)

state0, msb, consec, empty, g = staged._init_enc(
    jnp.asarray(blocks, jnp.int32), *meta)
probe("mrp_enc", lambda st: staged._mrp_enc(
    *st, msb, consec, g["ref_b"], lut_j, 8),
    lambda: state0)

# run a real encode to get decodable streams
streams, sizes = bpc_jax.encode(blocks, levels, subbands, lut, params, wl)

dstate0, dmsb, dconsec, is_raw, dg = staged._init_dec(
    jnp.asarray(streams, jnp.int32), jnp.asarray(sizes, jnp.int32), *meta)
probe("spp_dec", lambda st: staged._spp_dec(
    *st, dmsb, dconsec, dg["sig_grid0"], dg["sign_grid0"], lut_j, 8),
    lambda: dstate0)

dstate0, dmsb, dconsec, is_raw, dg = staged._init_dec(
    jnp.asarray(streams, jnp.int32), jnp.asarray(sizes, jnp.int32), *meta)
probe("mrp_dec", lambda st: staged._mrp_dec(
    *st, dmsb, dconsec, dg["ref_b"], lut_j, 8),
    lambda: dstate0)

# init/finish endpoints
t0 = time.perf_counter()
for _ in range(5):
    st, *_ = staged._init_enc(jnp.asarray(blocks, jnp.int32), *meta)
    jax.block_until_ready(st)
print(f"pad={pad} init_enc   per_call={(time.perf_counter()-t0)/5*1e3:8.3f}ms",
      flush=True)

# DWT at 2048 (the bench geometry)
from picsong_tpu.transform.dwt import dwt_forward, dwt_reverse

plane = jnp.asarray(rng.integers(-128, 128, size=(2048, 2048)), jnp.int32)
fwd = jax.jit(lambda p: dwt_forward(p, wl, False, 1.0))
rev = jax.jit(lambda c: dwt_reverse(c, wl, False, 1.0))
t0 = time.perf_counter(); c = fwd(plane); jax.block_until_ready(c)
comp = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(10):
    c = fwd(plane)
jax.block_until_ready(c)
print(f"pad={pad} dwt_fwd    compile={comp:7.1f}s "
      f"per_call={(time.perf_counter()-t0)/10*1e3:8.3f}ms", flush=True)
t0 = time.perf_counter(); p2 = rev(c); jax.block_until_ready(p2)
comp = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(10):
    p2 = rev(c)
jax.block_until_ready(p2)
print(f"pad={pad} dwt_rev    compile={comp:7.1f}s "
      f"per_call={(time.perf_counter()-t0)/10*1e3:8.3f}ms", flush=True)
