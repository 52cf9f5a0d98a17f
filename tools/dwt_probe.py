"""DWT formulation shootout on the real chip (VERDICT r2 missing #4).

Times three one-plane multi-level 5/3 formulations, forward + reverse,
blocked, fresh per-variant executables:

  xla-T      current production path (vertical lifting + transposes for
             the horizontal pass, transform/dwt.py)
  xla-lane   transpose-free: horizontal lifting via lane-axis
             deinterleave (reshape (H, W/2, 2)) — no transposes at all
  roundtrip  whole encode+decode for scale (DWT share)

Run: python tools/dwt_probe.py --size 2048 --levels 5 --iters 10
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=2048)
ap.add_argument("--levels", type=int, default=5)
ap.add_argument("--iters", type=int, default=10)
args = ap.parse_args()

import jax
import jax.numpy as jnp

from picsong_tpu.transform import dwt as dwt_mod
from picsong_tpu.transform.dwt import dwt_forward, dwt_reverse


# ---- transpose-free variant ------------------------------------------------

def _nxt_l(a):
    return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)


def _prv_l(a):
    return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)


def _fwd53_h(x):
    h, w = x.shape
    pairs = x.reshape(h, w // 2, 2)
    even, odd = pairs[..., 0], pairs[..., 1]
    d = odd - ((even + _nxt_l(even)) >> 1)
    s = even + ((_prv_l(d) + d + 2) >> 2)
    return s, d


def _fwd_level_lane(plane):
    lo_v, hi_v = dwt_mod._fwd53(plane)
    ll, hl = _fwd53_h(lo_v)
    lh, hh = _fwd53_h(hi_v)
    return ll, hl, lh, hh


@partial(jax.jit, static_argnames=("levels",))
def dwt_forward_lane(plane, levels: int):
    cur = plane
    quads = []
    for _ in range(levels):
        ll, hl, lh, hh = _fwd_level_lane(cur)
        quads.append((hl, lh, hh))
        cur = ll
    out = cur
    for level in range(levels - 1, -1, -1):
        hl, lh, hh = quads[level]
        out = jnp.block([[out, hl], [lh, hh]])
    return out


def _inv53_h(s, d):
    even = s - ((_prv_l(d) + d + 2) >> 2)
    odd = d + ((even + _nxt_l(even)) >> 1)
    out = jnp.stack([even, odd], axis=2)
    return out.reshape(s.shape[0], s.shape[1] * 2)


def _inv_level_lane(ll, hl, lh, hh):
    lo_v = _inv53_h(ll, hl)
    hi_v = _inv53_h(lh, hh)
    return dwt_mod._inv53(lo_v, hi_v)


@partial(jax.jit, static_argnames=("levels",))
def dwt_reverse_lane(mallat, levels: int):
    h, w = mallat.shape
    ll = None
    for level in range(levels - 1, -1, -1):
        hh_, wh_ = h >> (level + 1), w >> (level + 1)
        hl = mallat[:hh_, wh_:2 * wh_]
        lh = mallat[hh_:2 * hh_, :wh_]
        hh = mallat[hh_:2 * hh_, wh_:2 * wh_]
        if ll is None:
            ll = mallat[:hh_, :wh_]
        ll = _inv_level_lane(ll, hl, lh, hh)
    return ll


# ---- harness ----------------------------------------------------------------

def bench(tag, fn, x):
    out = fn(x)
    out.block_until_ready()
    samples = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = fn(x)
        out.block_until_ready()
        samples.append((time.perf_counter() - t0) * 1e3)
    med = sorted(samples)[len(samples) // 2]
    print(f"{tag:18s} median {med:8.3f} ms  "
          f"({args.size * args.size / med / 1e3:8.1f} MPix/s)  "
          f"samples {['%.3f' % s for s in samples]}", flush=True)
    return out


rng = np.random.default_rng(0)
plane = jnp.asarray(rng.integers(-128, 128, (args.size, args.size),
                                 dtype=np.int64).astype(np.int32))

L = args.levels
fT = jax.jit(lambda p: dwt_forward(p, L, False))
rT = jax.jit(lambda m: dwt_reverse(m, L, False))
fL = jax.jit(lambda p: dwt_forward_lane(p, L))
rL = jax.jit(lambda m: dwt_reverse_lane(m, L))

m1 = bench("fwd xla-T", fT, plane)
m2 = bench("fwd xla-lane", fL, plane)
bench("rev xla-T", rT, m1)
bench("rev xla-lane", rL, m2)

# correctness cross-checks (AFTER all timing: first D2H of the process)
a, b = np.asarray(m1), np.asarray(m2)
print("fwd equal:", np.array_equal(a, b))
print("rev T ok:", np.array_equal(np.asarray(rT(m1)), np.asarray(plane)))
print("rev lane ok:", np.array_equal(np.asarray(rL(m2)), np.asarray(plane)))
