"""Device probe: Pallas encoder vs staged XLA encoder — parity + timing."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from picsong_tpu.core.header import CodecConfig
from picsong_tpu.core.lut import LUTParams, neutral_lut
from picsong_tpu.engine.pipeline import TPUCodec
from picsong_tpu.entropy import bpc_pallas
from bench import make_image

size, levels, iters = 2048, 5, 10
cfg = CodecConfig(width=size, height=size, wavelet_levels=levels)
params = LUTParams()
lut = neutral_lut(params, levels, 2)
codec = TPUCodec(cfg, [lut], params)
img = make_image(size)
n_planes = codec.planes_host(img)
plane = jnp.asarray(codec._prep_gray(jnp.asarray(img)))
blocks, _ = codec._dwt_tile(plane)
jax.block_until_ready(blocks)


def pallas_enc(b):
    return bpc_pallas.encode_blocks(
        b, codec.luts[0], codec._meta[0], codec._meta[1], codec._meta[2],
        params=params, n_planes=n_planes)


def staged_enc(b):
    return codec._staged.encode(b, codec.luts[0], codec._meta, n_planes)


def timed(name, fn):
    out = fn(blocks)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(blocks)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:9.3f} ms")
    return out

s_p, z_p = timed("pallas encode", pallas_enc)
s_x, z_x = timed("staged encode", staged_enc)
# correctness AFTER timing (D2H poisons dispatch)
ok_sizes = np.array_equal(np.asarray(z_p), np.asarray(z_x))
ok_streams = np.array_equal(np.asarray(s_p), np.asarray(s_x))
print("sizes match:", ok_sizes, " streams match:", ok_streams)
