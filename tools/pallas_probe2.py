"""Probe the Mosaic primitives the Pallas BPC decoder needs:
1. dynamic-amount rotate (pltpu.roll with traced scalar shift)
2. in-kernel transpose (C, 128) -> (128, C)
3. major-axis dynamic slab load from a (X, 8, 128) VMEM ref
4. @pl.when nested inside a scalar fori_loop
5. one-hot fetch contraction (K, 32, C)
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

C = 128


def kernel(tape_ref, amt_ref, out_ref, stage_ref):
    # 3. major-axis dynamic slab load, inside a scalar loop with @pl.when
    def body(n, _):
        @pl.when(amt_ref[n] >= 0)
        def _():
            q = amt_ref[n] // 1024          # which (8,128) slab
            slab = tape_ref[n * 4 + q, :, :]            # (8, 128)
            # 1. dynamic sublane rotate then dynamic lane rotate
            srot = pltpu.roll(slab, (amt_ref[n] % 1024) // 128, 0)
            lrot = pltpu.roll(srot, amt_ref[n] % 128, 1)
            stage_ref[n, :] = lrot[0, :]
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    # 2. transpose (C, 128) -> (128, C)
    t = jnp.transpose(stage_ref[:, :], (1, 0))

    # 5. one-hot contraction: fetched[l, n] = t[rank[l, n], n], K = 8
    rank = jnp.abs(t[0:32, :]) % 8
    kio = jax.lax.broadcasted_iota(jnp.int32, (8, 32, C), 0)
    sel = kio == rank[None, :, :]
    fetched = jnp.sum(jnp.where(sel, t[0:8, None, :], 0), axis=0)

    out_ref[:, :] = fetched + t[0:32, :]


@jax.jit
def run(tape, amt):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, 128), jnp.int32)],
    )(tape, amt)


rng = np.random.default_rng(0)
tape_flat = rng.integers(0, 1 << 20, size=(C, 4096)).astype(np.int32)
tape = jnp.asarray(tape_flat.reshape(C * 4, 8, 128))
amt = jnp.asarray(rng.integers(0, 4096 - 128, size=(C,)), jnp.int32)

t0 = time.perf_counter()
out = run(tape, amt)
jax.block_until_ready(out)
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
for _ in range(100):
    out = run(tape, amt)
jax.block_until_ready(out)
print(f"steady: {(time.perf_counter()-t0)/100*1e3:.3f} ms/call", flush=True)

# correctness of the slab+rotate extraction: stage[n, 0] should be
# tape_flat[n, (amt//1024)*1024 + ((amt%1024)//128)*128 + amt%128] = tape_flat[n, amt]
a = np.asarray(amt)
expect_stage0 = tape_flat[np.arange(C), a]
rankv = np.abs(expect_stage0.astype(np.int64)) % 8  # t[0:32,:] rows are stage cols
# verify via out: out[l,n] = fetched[l,n] + t[l,n]; t[l,n] = stage[n,l]
# full check on host:
stage = np.empty((C, 128), np.int32)
for n in range(C):
    q = a[n] // 1024
    flat = tape_flat[n, q * 1024:(q + 1) * 1024]
    s = (a[n] % 1024) // 128
    l0 = a[n] % 128
    rot = np.roll(flat.reshape(8, 128), -s, axis=0)
    rot = np.roll(rot, -l0, axis=1)
    stage[n] = rot[0]
t = stage.T
rank = np.abs(t[0:32, :]) % 8
fetched = t[0:8, :][rank, np.arange(C)[None, :].repeat(32, 0) * 0
                    + np.arange(C)[None, :]]
expect = fetched + t[0:32, :]
ok = np.array_equal(np.asarray(out), expect)
print("extraction+rotate+transpose+onehot correct:", ok)
