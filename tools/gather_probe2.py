"""Measure window-refill (contiguous slice gather) and one-hot distribution
as replacements for the decoder's per-element codeword gather."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 1024
CAP = 4096
W = 160
rng = np.random.default_rng(0)
streams = jnp.asarray(rng.integers(0, 1 << 30, size=(N, CAP)), jnp.int32)
base0 = jnp.asarray(rng.integers(0, CAP - W, size=(N,)), jnp.int32)
rank0 = jnp.asarray(rng.integers(0, W, size=(32, N)), jnp.int32)
kidx = jnp.arange(W, dtype=jnp.int32)  # module-ish constant, passed as arg


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    o = fn(*args)
    jax.block_until_ready(o)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        o = fn(*args)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:34s} compile={comp:6.1f}s loop(64 iters)={ms:9.3f}ms "
          f"per_iter={ms/64*1e3:8.1f}us", flush=True)


# A: window refill via vmapped dynamic_slice, once per iteration
@jax.jit
def refill_loop(streams, base):
    def it(i, carry):
        acc, base = carry
        win = jax.vmap(lambda row, c: jax.lax.dynamic_slice(row, (c,), (W,)),
                       in_axes=(0, 0), out_axes=1)(streams, base)  # (W, N)
        return acc + win[0], (base + 1) % (CAP - W)
    acc = jnp.zeros((N,), jnp.int32)
    acc, _ = jax.lax.fori_loop(0, 64, it, (acc, base0))
    return acc


timeit(f"refill_dynslice(W={W})", refill_loop, streams, base0)


# B: one-hot distribution from a carried (W, N) window, 4x per iteration
@jax.jit
def onehot_loop(win, rank, kidx):
    kcol = kidx[:, None]  # (W, 1)

    def it(i, carry):
        acc, rank = carry
        for _ in range(4):
            sel = (kcol[:, None, :] == rank[None, :, :])  # (W, 32, N)
            v = jnp.sum(jnp.where(sel, win[:, None, :], 0), axis=0)
            acc = acc + v
            rank = (rank + 1) % W
        return acc, rank
    acc = jnp.zeros((32, N), jnp.int32)
    acc, _ = jax.lax.fori_loop(0, 64, it, (acc, rank0))
    return acc


win0 = jnp.asarray(rng.integers(0, 1 << 30, size=(W, N)), jnp.int32)
timeit(f"onehot_distribute(W={W})x4", onehot_loop, win0, rank0, kidx)


# C: combined per-iteration: refill once + 4 distributions
@jax.jit
def combined_loop(streams, base, rank, kidx):
    kcol = kidx[:, None]

    def it(i, carry):
        acc, base, rank = carry
        win = jax.vmap(lambda row, c: jax.lax.dynamic_slice(row, (c,), (W,)),
                       in_axes=(0, 0), out_axes=1)(streams, base)
        for _ in range(4):
            sel = (kcol[:, None, :] == rank[None, :, :])
            v = jnp.sum(jnp.where(sel, win[:, None, :], 0), axis=0)
            acc = acc + v
            rank = (rank + 1) % W
        return acc, (base + 1) % (CAP - W), rank
    acc = jnp.zeros((32, N), jnp.int32)
    acc, _, _ = jax.lax.fori_loop(0, 64, it, (acc, base0, rank0))
    return acc


timeit(f"combined refill+4xdist(W={W})", combined_loop, streams, base0, rank0,
       kidx)
