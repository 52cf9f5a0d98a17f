"""Sanity-check Pallas/Mosaic on the axon backend with the primitives the
BPC kernel needs: fori_loop over VMEM state, one-hot vector updates,
scalar-addressed dynamic slices (the per-block window refill), @pl.when.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128     # codeblock chunk
CAP = 512


def kernel(tape_ref, base_ref, out_ref, win_ref):
    # 1. vector math on (32, C) tiles inside a fori_loop
    def body(r, acc):
        cur = tape_ref[0:32, 0:C]
        acc = acc + (cur >> 1) + jnp.where(cur > 100, 1, 0)
        return acc

    acc = jax.lax.fori_loop(0, 64, body, jnp.zeros((32, C), jnp.int32))

    # 2. scalar loop over blocks: per-block dynamic-slice copy (refill).
    # Mosaic requires dynamic lane-axis starts to be provably 128-aligned,
    # so window bases advance in 128-word units.
    def refill(n, _):
        b = pl.multiple_of((base_ref[n] // 128) * 128, 128)
        win_ref[n, :] = tape_ref[n, pl.ds(b, 128)]
        return 0

    jax.lax.fori_loop(0, C, refill, 0)

    # 3. one-hot distribution from the window
    widx = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
    rank = acc[0:1, :].reshape(C, 1) % 128
    sel = widx == rank
    fetched = jnp.sum(jnp.where(sel, win_ref[:, :], 0), axis=1)  # (C,)

    out_ref[0:32, :] = acc + fetched[None, :]

    # 4. @pl.when conditional
    @pl.when(base_ref[0] > 0)
    def _():
        out_ref[0, :] = out_ref[0, :] * 2


@jax.jit
def run(tape, base):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, 128), jnp.int32)],
    )(tape, base)


rng = np.random.default_rng(0)
tape = jnp.asarray(rng.integers(0, 200, size=(C, CAP)), jnp.int32)
base = jnp.asarray(rng.integers(0, CAP - 64, size=(C,)), jnp.int32)

t0 = time.perf_counter()
out = run(tape, base)
jax.block_until_ready(out)
print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
for _ in range(50):
    out = run(tape, base)
jax.block_until_ready(out)
print(f"pallas steady: {(time.perf_counter()-t0)/50*1e3:.3f} ms/call",
      flush=True)
print("out[0,:4] =", np.asarray(out)[0, :4])
