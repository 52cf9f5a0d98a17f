"""Isolate the cost of the decoder's per-iteration codeword gather."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 1024
CAP = 4096
rng = np.random.default_rng(0)
streams = jnp.asarray(rng.integers(0, 1 << 30, size=(N, CAP)), jnp.int32)
streams_t = jnp.asarray(np.asarray(streams).T.copy())
slot0 = jnp.asarray(rng.integers(0, CAP, size=(32, N)), jnp.int32)


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
    print(f"{name:28s} compile={comp:6.1f}s loop(64 iters)={ms:9.3f}ms "
          f"per_iter={ms/64*1e3:8.1f}us", flush=True)


def make_loop(body):
    @jax.jit
    def run(streams, slot):
        def it(i, carry):
            acc, slot = carry
            acc, slot = body(streams, acc, slot, i)
            return acc, slot
        acc = jnp.zeros((32, N), jnp.int32)
        acc, _ = jax.lax.fori_loop(0, 64, it, (acc, slot))
        return acc
    return run


def gather_vmap(streams, acc, slot, i):
    v = jax.vmap(lambda row, s: row[s], in_axes=(0, 1), out_axes=1)(streams,
                                                                    slot)
    return acc + v, (slot + 1) % CAP


def gather_tal_t(streams_t, acc, slot, i):
    v = jnp.take_along_axis(streams_t, slot, axis=0)
    return acc + v, (slot + 1) % CAP


def control(streams, acc, slot, i):
    return acc + slot * 3 + 1, (slot + 1) % CAP


timeit("control_no_gather", make_loop(control), streams, slot0)
timeit("gather_vmap_rows(N,4096)", make_loop(gather_vmap), streams, slot0)
timeit("gather_take_along_T(4096,N)", make_loop(gather_tal_t), streams_t,
       slot0)

# smaller operand
streams_small = streams[:, :512]
slot_small = slot0 % 512


def gather_vmap_small(s, acc, slot, i):
    v = jax.vmap(lambda row, sl: row[sl], in_axes=(0, 1), out_axes=1)(s, slot)
    return acc + v, (slot + 1) % 512


timeit("gather_vmap_rows(N,512)", make_loop(gather_vmap_small), streams_small,
       slot_small)

# scatter control (the encoder's op, known good)
def scatter_vmap(streams, acc, slot, i):
    out = jax.vmap(lambda row, s, v: row.at[s].set(v, mode="drop"),
                   in_axes=(0, 1, 1))(streams, slot, acc)
    return acc + out[:, :32].T[:, :N] * 0 + 1, (slot + 1) % CAP


@jax.jit
def scatter_loop(streams, slot):
    def it(i, carry):
        out, slot = carry
        out = jax.vmap(lambda row, s, v: row.at[s].set(v, mode="drop"),
                       in_axes=(0, 1, 1))(out, slot, slot)
        return out, (slot + 1) % CAP
    out, _ = jax.lax.fori_loop(0, 64, it, (streams, slot))
    return out


timeit("scatter_vmap_rows(N,4096)", scatter_loop, streams, slot0)
