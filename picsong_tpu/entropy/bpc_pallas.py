"""Pallas/Mosaic BPC-PaCo decoder: the whole bitplane decode in one kernel.

Why this exists: the XLA formulation of the decoder (entropy/bpc_jax.py)
needs a per-AC-call random-access gather of codewords from the (N, 4096)
codestream buffer, and XLA:TPU lowers that gather at ~460 us per loop
iteration regardless of operand size (measured; the encoder's scatter
compiles fine, the decode gather does not). Mosaic has no vector gather
either -- but the BPC-PaCo stream gives us something better: **codeword
slots are consumed strictly sequentially per codeblock** (slot = running
counter + lane rank, BPC/BPCEngine.cu:404-442), so decoding is tape
reading, not random access. This kernel exploits that:

- The padded codestream tape sits in VMEM as (C*5, 8, 128) slabs. Refills
  load one aligned 128-word row per codeblock with a scalar-loop slab load
  + dynamic sublane rotate (Mosaic allows arbitrary *major*-axis dynamic
  indexing; unaligned sublane/lane indexing is what it forbids).
- A per-chunk fetch window H (FW, C) holds the next >=16 upcoming words of
  every codeblock. Per AC call, needing lanes receive consecutive words
  via a 16-wide one-hot contraction (pure VPU) -- no gather.
- When a call would read past the 16-word budget, a slow path rotates H
  by the per-block consumed offset (log-step rolls + selects) and refills
  low blocks; all data-dependent movement is bounded-depth vector algebra.

One kernel invocation decodes *all* bitplanes x (SPP, MRP) passes of a
chunk of C codeblocks: state (grids, AC lanes, window) never leaves VMEM,
and there is no per-pass dispatch. cp=2, k=0 (the default hot path); cp=3
and the CS bulk path stay on the XLA implementation.

Bit-exactness: mirrors entropy/bpc_jax.py construct-for-construct (which
is gated bit-identical against the NumPy oracle of the reference coder);
tests/test_pallas_bpc.py cross-checks decoded coefficients on random
codeblock batches in interpret mode (CPU) and on device.

MEASURED CONCLUSION (round 2-3, tools/mode_bench.py; PERF_NOTES.md): on
the real v5e chip the XLA staged path round-trips 2048^2 at ~1-6 GPix/s
while this kernel pair measures ~42 MPix/s — the per-block scalar-loop
tape refills serialize on the scalar core and swamp the dispatch savings.
The staged (32, N) XLA formulation is the production path; this module is
kept as the CI-gated alternative formulation (PICSONG_ENCODER/DECODER=
pallas) because it is the only implementation that exploits the stream's
sequential-consumption property directly, but further optimization here
was retired in favor of the paired-pass staged schedule (bpc_jax.py
_spp_mrp_pass) after measurement. Do not extend it without re-measuring.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import spec
from ..core.lut import LUTParams

C = 128            # codeblocks per kernel chunk (fills the 128-lane axis)
FW = 160           # fetch-window depth: 32 reserve + 128 refill granularity
TAPE_WORDS = 5120  # 4096 slots padded to 5 (8, 128) slabs per block
_LANES = spec.LANES
_ROWS = spec.CBLOCK_LENGTH
_U = jnp.uint32
_INIT = spec.AC_INTERVAL_INIT


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _roll_up(x, amt, nbits):
    """x (S, C) -> out[k, n] = x[(k + amt[0, n]) % S, n]; amt < 2**nbits."""
    s = x.shape[0]
    for i in range(nbits):
        b = 1 << i
        sel = (amt & b) != 0          # (1, C) -> broadcasts over rows
        x = jnp.where(sel, pltpu.roll(x, (s - b) % s, 0), x)
    return x


def _roll_down(x, amt, nbits):
    """x (S, C) -> out[k, n] = x[(k - amt[0, n]) % S, n]."""
    s = x.shape[0]
    for i in range(nbits):
        b = 1 << i
        sel = (amt & b) != 0
        x = jnp.where(sel, pltpu.roll(x, b % s, 0), x)
    return x


def _lane_scan(need):
    """Inclusive prefix sum of an int32 (32, C) mask along the lane axis."""
    s = need
    kio = _iota((_LANES, C), 0)
    for d in (1, 2, 4, 8, 16):
        s = s + jnp.where(kio >= d, pltpu.roll(s, d, 0), 0)
    return s


def _onehot_rows(rows, idx):
    """fetched[l, n] = rows[idx[l, n], n] for idx in [0, K); K = rows rows."""
    k = rows.shape[0]
    kio = _iota((k, _LANES, C), 0)
    vals = jnp.broadcast_to(rows.reshape(k, 1, C), (k, _LANES, C))
    return jnp.sum(jnp.where(kio == idx[None, :, :], vals, 0), axis=0)


def _sign_ctx_table(h, v):
    out = jnp.zeros_like(h)
    out = jnp.where((h == 0) & (v > 0), 2, out)
    out = jnp.where((h == 0) & (v < 0), 3, out)
    out = jnp.where((h > 0) & (v == 0), 4, out)
    out = jnp.where((h > 0) & (v > 0), 6, out)
    out = jnp.where((h < 0) & (v == 0), 5, out)
    out = jnp.where((h < 0) & (v > 0), 1, out)
    out = jnp.where((h < 0) & (v < 0), 7, out)
    return out


def _sign_ctx(up, lf, rt, bt):
    def c(v):
        sig = (v >> 31) != 0
        return jnp.where(sig, jnp.where((v & 1) == 1, -1, 1), 0).astype(
            jnp.int32)

    return _sign_ctx_table(c(lf) + c(rt), c(up) + c(bt))


def _scatter_rows(k: int, idx, vals, mask):
    """out (k, C): out[j, n] = sum_l [idx[l, n] == j and mask] * vals[l, n].

    The emission mirror of _onehot_rows: distinct idx per (l, n) by
    construction (slot ranks are a prefix scan), so the sum is a select."""
    kio = _iota((k, _LANES, C), 0)
    sel = (kio == idx[None, :, :]) & (mask[None, :, :] != 0)
    vb = jnp.broadcast_to(vals[None, :, :], (k, _LANES, C))
    return jnp.sum(jnp.where(sel, vb, 0), axis=1)


# Encoder emission geometry: appends go to a 48-row staging window S
# (per-call flush count <= 32, staged offset kept < 48), S spills into a
# 192-row pending window H with one per-block roll, and full 128-word rows
# DMA straight to the HBM event tape. 40 rows of 128 = 5120 events per
# block; appends stop at row 37 so the <=2 final partial-row drains fit
# (only counter-saturated blocks ever hit the cap, and those are replaced
# by the raw-copy fallback anyway).
EW = 192           # pending-window depth (must hold 127 + 48 + 17 slack)
SW = 48            # staging-window depth
TAPE_ROWS = TAPE_WORDS // 128   # 40
_FULL_ROW_CAP = TAPE_ROWS - 3   # 37


def _make_encode_kernel(n_planes: int, prec: int):
    """Encode kernel body: grids -> sequential (slot<<16 | codeword) tape.

    The XLA encoder's per-flush scatter (bpc_jax._ac_encode) becomes a
    time-ordered event log: slots are reserved rank+counter so every
    non-saturated block's events are unique, and one XLA scatter after the
    kernel rebuilds the (N, 4096) stream bit-exactly."""

    def kernel(te_in, to_in, msb_ref, probs_ref, tape_ref, meta_ref,
               te_ref, to_ref, low_ref, size_ref, resv_ref, win_ref,
               stage_s_ref, stage_ref, wo_ref, addrv_ref, addr_smem,
               sem, dsem):
        blk = pl.program_id(0)
        te_ref[...] = te_in[...]
        to_ref[...] = to_in[...]
        z32 = jnp.zeros((_LANES, C), jnp.int32)
        low_ref[...] = z32
        size_ref[...] = z32
        resv_ref[...] = z32
        win_ref[...] = jnp.zeros((EW, C), jnp.int32)
        stage_s_ref[...] = jnp.zeros((SW, C), jnp.int32)
        wo_ref[...] = jnp.zeros((8, C), jnp.int32)  # rows: 0=off_s 1=off_h
        #                                             2=wpos 3=counter

        kio_ew = _iota((EW, C), 0)

        def drain_rows(threshold: int):
            """Write full (or, at threshold=1, partial zero-padded) 128-word
            rows of the pending window to the block's HBM tape rows."""
            offh = wo_ref[1:2, :]
            wpos = wo_ref[2:3, :]
            do = offh >= threshold
            addrv_ref[...] = jnp.where(do, wpos, -1)
            dma = pltpu.make_async_copy(addrv_ref, addr_smem, sem)
            dma.start()
            dma.wait()
            stage_ref[...] = jnp.transpose(win_ref[0:128, :], (1, 0))

            def body(n, _):
                r = addr_smem[0, n]

                @pl.when(r >= 0)
                def _():
                    row = blk * C * TAPE_ROWS + n * TAPE_ROWS + r
                    d = pltpu.make_async_copy(
                        stage_ref.at[pl.ds(n, 1), :],
                        tape_ref.at[pl.ds(row, 1), :], dsem)
                    d.start()
                    d.wait()
                return 0

            jax.lax.fori_loop(0, C, body, 0, unroll=False)
            rolled = pltpu.roll(win_ref[...], EW - 128, 0)  # row k <- k+128
            newoff = jnp.maximum(offh - 128, 0)
            win_ref[...] = jnp.where(do, jnp.where(kio_ew < newoff, rolled, 0),
                                     win_ref[...])
            wo_ref[1:2, :] = jnp.where(do, newoff, offh)
            wo_ref[2:3, :] = jnp.where(do,
                                       jnp.minimum(wpos + 1, TAPE_ROWS - 1),
                                       wpos)

        def spill():
            """Staging window -> pending window (one per-block roll)."""
            offh = wo_ref[1:2, :]
            pad = jnp.concatenate(
                [stage_s_ref[...], jnp.zeros((EW - SW, C), jnp.int32)], axis=0)
            win_ref[...] = win_ref[...] | _roll_down(pad, offh, 8)
            wo_ref[1:2, :] = offh + wo_ref[0:1, :]
            stage_s_ref[...] = jnp.zeros((SW, C), jnp.int32)
            wo_ref[0:1, :] = jnp.zeros((1, C), jnp.int32)

            @pl.when(jnp.max(wo_ref[1:2, :]) >= 128)
            def _():
                drain_rows(128)

        def emit(flush, vals):
            """Append (slot<<16 | low) events for flushing lanes."""
            s = _lane_scan(flush)
            rank = s - flush
            m = s[_LANES - 1:_LANES, :]

            @pl.when(jnp.max(m) > 0)
            def _():
                @pl.when(jnp.max(wo_ref[0:1, :] + m) > SW)
                def _():
                    spill()

                offs = wo_ref[0:1, :]
                full = wo_ref[2:3, :] >= _FULL_ROW_CAP
                mask = (flush != 0) & ~full
                idx = jnp.where(mask, offs + rank, SW)

                @pl.when(jnp.max(jnp.where(mask, idx, 0)) < 16)
                def _():
                    stage_s_ref[0:16, :] = (stage_s_ref[0:16, :]
                                            | _scatter_rows(16, idx, vals,
                                                            mask))

                @pl.when(jnp.max(jnp.where(mask, idx, 0)) >= 16)
                def _():
                    stage_s_ref[...] = (stage_s_ref[...]
                                        | _scatter_rows(SW, idx, vals, mask))

                wo_ref[0:1, :] = offs + jnp.where(full, 0, m)

        def ac_encode(active, bits, probs):
            """One arithmetic-encoder step for all lanes (bpc_jax._ac_encode
            with the slot scatter replaced by sequential event emission)."""
            size = size_ref[...]
            need = (active & (size == 0)).astype(jnp.int32)
            s = _lane_scan(need)
            rank = s - need
            m = s[_LANES - 1:_LANES, :]
            cnt = wo_ref[3:4, :]
            nslot = jnp.minimum(rank + cnt, spec.MAX_RESERVED_SLOT) + 1
            needb = need != 0
            resv = jnp.where(needb, nslot, resv_ref[...])
            resv_ref[...] = resv
            wo_ref[3:4, :] = jnp.minimum(cnt + m, spec.MAX_SLOT_COUNT)
            low = jnp.where(needb, 0, low_ref[...])
            size = jnp.where(needb, _INIT, size)

            aux = ((size * probs) >> prec) + bits
            one = active & (bits == 1)
            zero = active & (bits == 0)
            size = jnp.where(zero, aux, jnp.where(one, size - aux, size))
            low = jnp.where(one, low + aux, low)
            low_ref[...] = low
            size_ref[...] = size
            flush = (active & (size == 0)).astype(jnp.int32)
            emit(flush, (resv << 16) | low)

        def plane_body(p_idx, _):
            plane = (n_planes - 1) - p_idx
            ptab = probs_ref[plane]                       # (16, C)
            act_blk = (plane <= msb_ref[0:1, :])          # (1, C)
            plane_u = plane.astype(_U)
            shift = plane_u + 1
            flag = _U(1 << 31) | (plane_u << 24)

            # ---- SPP: significance propagation ---------------------------
            def spp_row(r, _):
                te3 = te_ref[pl.ds(r, 3)]                 # (3, 40, C)
                to3 = to_ref[pl.ds(r, 3)]
                for phase in (0, 1):
                    if phase == 0:
                        cur = te3[1, 0:_LANES, :]
                        nb = dict(ul=to3[0, 0:_LANES, :],
                                  up=te3[0, 0:_LANES, :],
                                  ur=to3[0, 1:_LANES + 1, :],
                                  lf=to3[1, 0:_LANES, :],
                                  rt=to3[1, 1:_LANES + 1, :],
                                  bl=to3[2, 0:_LANES, :],
                                  bt=te3[2, 0:_LANES, :],
                                  br=to3[2, 1:_LANES + 1, :])
                    else:
                        cur = to3[1, 1:_LANES + 1, :]
                        nb = dict(ul=te3[0, 0:_LANES, :],
                                  up=to3[0, 1:_LANES + 1, :],
                                  ur=te3[0, 1:_LANES + 1, :],
                                  lf=te3[1, 0:_LANES, :],
                                  rt=te3[1, 1:_LANES + 1, :],
                                  bl=te3[2, 0:_LANES, :],
                                  bt=to3[2, 1:_LANES + 1, :],
                                  br=te3[2, 1:_LANES + 1, :])
                    insig = (cur >> 31) == 0
                    active = insig & act_blk
                    ctx = sum((v >> 31).astype(jnp.int32) for v in nb.values())
                    probs = _onehot_rows(ptab[0:9, :], ctx)
                    bits = ((cur >> shift) & _U(1)).astype(jnp.int32)
                    ac_encode(active, bits, probs)
                    newly = active & (bits == 1)
                    sctx = _sign_ctx(nb["up"], nb["lf"], nb["rt"], nb["bt"])
                    sprobs = _onehot_rows(ptab[9:13, :], sctx >> 1)
                    ssym = jnp.where(
                        (cur & _U(1)).astype(jnp.int32) == (sctx & 1), 0, 1)
                    ac_encode(newly, ssym, sprobs)
                    upd = jnp.where(newly, cur | flag, cur)
                    if phase == 0:
                        te_ref[pl.ds(r + 1, 1), 0:_LANES, :] = (
                            upd.reshape(1, _LANES, C))
                        row1 = jnp.concatenate(
                            [upd, te3[1, _LANES:, :]], axis=0)
                        te3 = jnp.concatenate(
                            [te3[0:1], row1.reshape(1, 40, C), te3[2:3]],
                            axis=0)
                    else:
                        to_ref[pl.ds(r + 1, 1), 1:_LANES + 1, :] = (
                            upd.reshape(1, _LANES, C))
                return 0

            jax.lax.fori_loop(0, _ROWS, spp_row, 0, unroll=False)

            # ---- MRP: magnitude refinement -------------------------------
            ref_prob = jnp.broadcast_to(ptab[13:14, :], (_LANES, C))

            def mrp_row(r, _):
                for phase in (0, 1):
                    g3 = te_ref[pl.ds(r, 3)] if phase == 0 else \
                        to_ref[pl.ds(r, 3)]
                    cur = (g3[1, 0:_LANES, :] if phase == 0
                           else g3[1, 1:_LANES + 1, :])
                    refine = ((cur >> 29) & 1) == 1
                    active = refine & act_blk
                    eligible = (~refine & ((cur >> 31) == 1)) & act_blk
                    bits = ((cur >> shift) & _U(1)).astype(jnp.int32)
                    ac_encode(active, bits, ref_prob)
                    upd = jnp.where(eligible, cur | _U(1 << 29), cur)
                    if phase == 0:
                        te_ref[pl.ds(r + 1, 1), 0:_LANES, :] = (
                            upd.reshape(1, _LANES, C))
                    else:
                        to_ref[pl.ds(r + 1, 1), 1:_LANES + 1, :] = (
                            upd.reshape(1, _LANES, C))
                return 0

            jax.lax.fori_loop(0, _ROWS, mrp_row, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, n_planes, plane_body, 0, unroll=False)

        # final flush: every lane emits its reserved slot (BPCEngine.cu:1719)
        emit(jnp.ones((_LANES, C), jnp.int32),
             (resv_ref[...] << 16) | low_ref[...])
        spill()
        drain_rows(1)
        drain_rows(1)
        meta_ref[0:1, :] = wo_ref[3:4, :]        # counter
        meta_ref[1:2, :] = wo_ref[2:3, :]        # rows written

    return kernel


@partial(jax.jit, static_argnames=("n_planes", "prec", "interpret"))
def _encode_chunks(te, to, msb, probs, *, n_planes: int, prec: int,
                   interpret: bool = False):
    """te/to (66, 40, nc*C) uint32, msb (1, nc*C), probs (P, 16, nc*C)."""
    n = msb.shape[1]
    nc = n // C
    kernel = _make_encode_kernel(n_planes, prec)
    tape, meta = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((_ROWS + 2, 40, C), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS + 2, 40, C), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_planes, 16, C), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * TAPE_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, n), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_ROWS + 2, 40, C), _U),   # te (mutable copy)
            pltpu.VMEM((_ROWS + 2, 40, C), _U),   # to
            pltpu.VMEM((_LANES, C), jnp.int32),   # low
            pltpu.VMEM((_LANES, C), jnp.int32),   # size
            pltpu.VMEM((_LANES, C), jnp.int32),   # resv
            pltpu.VMEM((EW, C), jnp.int32),       # pending window H
            pltpu.VMEM((SW, C), jnp.int32),       # staging window S
            pltpu.VMEM((C, 128), jnp.int32),      # drain staging (transposed)
            pltpu.VMEM((8, C), jnp.int32),        # off_s/off_h/wpos/counter
            pltpu.VMEM((1, C), jnp.int32),        # drain addresses
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(te, to, msb, probs)
    return tape, meta


@partial(jax.jit, static_argnames=("n_planes", "prec", "interpret"))
def _prepare_and_encode(blocks, lut, ref_b, sig_b, sign_b,
                        *, n_planes: int, prec: int, interpret: bool):
    from .bpc_jax import _or_reduce_rows, _raw_layout, _to_grids

    n = blocks.shape[0]
    npad = -(-n // C) * C
    mag = jnp.abs(blocks).astype(_U)
    sign = (blocks < 0).astype(_U)
    words = (mag << 1) | sign
    msb_or = _or_reduce_rows((words >> 1).reshape(n, -1))
    msb = 31 - jax.lax.clz(msb_or).astype(jnp.int32)   # -1 for empty blocks
    empty = msb_or == 0
    msb_p = jnp.pad(msb, (0, npad - n), constant_values=-1).reshape(1, npad)

    probs = _prob_tables(lut, ref_b, sig_b, sign_b, n_planes)
    probs = jnp.pad(probs, ((0, 0), (0, 0), (0, npad - n)),
                    constant_values=64)

    te33, to33 = _to_grids(words)                       # (66, 33, n)
    te = jnp.pad(te33, ((0, 0), (0, 40 - _LANES - 1), (0, npad - n)))
    to = jnp.pad(to33, ((0, 0), (0, 40 - _LANES - 1), (0, npad - n)))

    tape, meta = _encode_chunks(te, to, msb_p, probs, n_planes=n_planes,
                                prec=prec, interpret=interpret)
    events = tape.reshape(npad, TAPE_WORDS)[:n]
    counter = meta[0, :n]
    rows_written = meta[1, :n]

    # scatter events into the stream; rows past the drained region are
    # HBM garbage, so mask them to slot 0 (overwritten by the MSB word)
    eidx = jnp.arange(TAPE_WORDS, dtype=jnp.int32)[None, :]
    valid = eidx < (rows_written[:, None] * 128)
    slots = jnp.where(valid, events >> 16, 0)
    vals = jnp.where(valid, events & 0xFFFF, 0)
    out = jnp.full((n, spec.CBLOCK_SIZE), -1, jnp.int32)
    out = jax.vmap(lambda row, s, v: row.at[s].set(v, mode="drop"))(
        out, slots, vals)

    out = out.at[:, 0].set(jnp.where(empty, 32, msb))
    sizes = jnp.where(empty, 1, counter + 1)
    raw = _raw_layout(words)
    expand = (sizes == spec.CBLOCK_SIZE)[:, None]
    out = jnp.where(expand, raw, out)
    return out, sizes


def encode_blocks(blocks, lut, ref_base, sig_base, sign_base,
                  *, params: LUTParams, n_planes: int,
                  interpret: bool = False):
    """Encode (N, 64, 64) int32 codeblocks -> (streams (N, 4096), sizes).

    cp=2, k=0 only (the default path); callers route cp=3 / k>0 to the XLA
    implementation. Streams are bit-identical to bpc_jax.encode_blocks."""
    return _prepare_and_encode(
        jnp.asarray(blocks, jnp.int32), jnp.asarray(lut, jnp.int32),
        jnp.asarray(ref_base, jnp.int32), jnp.asarray(sig_base, jnp.int32),
        jnp.asarray(sign_base, jnp.int32),
        n_planes=n_planes, prec=params.mult_precision, interpret=interpret)


def _make_kernel(n_planes: int, prec: int):
    """Build the decode kernel body for a static bitplane count."""

    def kernel(tape_ref, msb_ref, probs_ref, te_ref, to_ref,
               low_ref, size_ref, cw_ref, h_ref, vvo_ref, fetch_ref,
               stage_ref, addrv_ref, addr_smem, sem):
        # ---- state init (scratch persists across grid steps) -------------
        te_ref[...] = jnp.zeros((_ROWS + 2, 40, C), _U)
        to_ref[...] = jnp.zeros((_ROWS + 2, 40, C), _U)
        z32 = jnp.zeros((_LANES, C), jnp.int32)
        low_ref[...] = z32
        size_ref[...] = z32
        cw_ref[...] = z32
        h_ref[...] = jnp.zeros((FW, C), jnp.int32)
        vvo_ref[...] = jnp.zeros((8, C), jnp.int32)  # rows: 0=v 1=valid 2=off

        kio_fw = _iota((FW, C), 0)
        kio_128 = _iota((128, C), 0)

        def refill_round():
            """Top up every block with < 32 available words (off == 0)."""
            v = vvo_ref[0:1, :]
            valid = vvo_ref[1:2, :]
            addr = v + 1 + valid                      # next tape index
            needr = valid < 32
            addrv_ref[...] = jnp.where(needr, addr, -1)
            dma = pltpu.make_async_copy(addrv_ref, addr_smem, sem)
            dma.start()
            dma.wait()

            def body(n, _):
                a = addr_smem[0, n]

                @pl.when(a >= 0)
                def _():
                    r = a >> 7                         # aligned tape row
                    slab = tape_ref[n * 5 + (r >> 3)]  # (8, 128)
                    srot = pltpu.roll(slab, (8 - (r & 7)) % 8, 0)
                    stage_ref[n, :] = srot[0, :]
                return 0

            jax.lax.fori_loop(0, C, body, 0, unroll=False)

            st = jnp.transpose(stage_ref[...], (1, 0))   # (128, C)
            shift = addr & 127                            # prefix to drop
            seg = _roll_up(st, shift, 7)
            gain = jnp.where(needr, 128 - shift, 0)
            seg = jnp.where(kio_128 < gain, seg, 0)
            placed = jnp.concatenate(
                [seg, jnp.zeros((FW - 128, C), jnp.int32)], axis=0)
            placed = _roll_down(placed, valid, 6)         # valid <= 32 here
            h_ref[...] = h_ref[...] | placed
            vvo_ref[1:2, :] = valid + gain

        def ac_fetch(need, rank, m):
            """Deliver the next codewords to needing lanes -> fetch_ref.

            Skipped wholesale when no lane anywhere needs a word (common on
            sign calls): state is invariant under m == 0."""
            off = vvo_ref[2:3, :]
            valid = vvo_ref[1:2, :]
            t = off + m
            slow = jnp.max(jnp.maximum(t - 16, (off + m) - valid)) > 0

            @pl.when(slow)
            def _():
                off2 = vvo_ref[2:3, :]
                valid2 = vvo_ref[1:2, :]
                h = _roll_up(h_ref[...], off2, 6)          # off <= 32
                nv = valid2 - off2
                h_ref[...] = jnp.where(kio_fw < nv, h, 0)
                vvo_ref[1:2, :] = nv
                vvo_ref[2:3, :] = jnp.zeros((1, C), jnp.int32)
                refill_round()

                @pl.when(jnp.min(vvo_ref[1:2, :]) < 32)
                def _():
                    refill_round()

            off3 = vvo_ref[2:3, :]
            idx = off3 + rank
            fetch_ref[...] = _onehot_rows(h_ref[0:16, :], idx)

            @pl.when(jnp.max(jnp.where(need != 0, idx, 0)) >= 16)
            def _():
                fetch_ref[...] = _onehot_rows(h_ref[0:32, :], idx)

            vvo_ref[2:3, :] = off3 + m
            vvo_ref[0:1, :] = jnp.minimum(vvo_ref[0:1, :] + m, 4200)

        def ac_decode(active, probs):
            """One arithmetic-decoder step for all lanes (bpc_jax._ac_decode
            with the gather replaced by the sequential fetch window)."""
            size = size_ref[...]
            need = (active & (size == 0)).astype(jnp.int32)
            s = _lane_scan(need)
            rank = s - need
            m = s[_LANES - 1:_LANES, :]

            @pl.when(jnp.max(m) > 0)
            def _():
                ac_fetch(need, rank, m)

            needb = need != 0
            cw = jnp.where(needb, fetch_ref[...], cw_ref[...])
            low = jnp.where(needb, 0, low_ref[...])
            size = jnp.where(needb, _INIT, size)

            aux = ((size * probs) >> prec) + 1
            aux2 = low + aux
            one = active & (cw.astype(_U) >= aux2.astype(_U))
            size_ref[...] = jnp.where(one, size - aux,
                                      jnp.where(active & ~one, aux - 1, size))
            low_ref[...] = jnp.where(one, aux2, low)
            cw_ref[...] = cw
            return jnp.where(one, 1, 0)

        def plane_body(p_idx, _):
            plane = (n_planes - 1) - p_idx
            ptab = probs_ref[plane]                       # (16, C)
            act_blk = (plane <= msb_ref[0:1, :])          # (1, C)
            plane_u = plane.astype(_U)
            shift = plane_u + 1
            pmask = jnp.where(plane >= 1, _U(3) << plane_u, _U(2))
            flag = _U(1 << 31) | (plane_u << 24)

            # ---- SPP: significance propagation ---------------------------
            def spp_row(r, _):
                te3 = te_ref[pl.ds(r, 3)]                 # (3, 40, C)
                to3 = to_ref[pl.ds(r, 3)]
                for phase in (0, 1):
                    if phase == 0:
                        cur = te3[1, 0:_LANES, :]
                        nb = dict(ul=to3[0, 0:_LANES, :], up=te3[0, 0:_LANES, :],
                                  ur=to3[0, 1:_LANES + 1, :],
                                  lf=to3[1, 0:_LANES, :], rt=to3[1, 1:_LANES + 1, :],
                                  bl=to3[2, 0:_LANES, :], bt=te3[2, 0:_LANES, :],
                                  br=to3[2, 1:_LANES + 1, :])
                    else:
                        cur = to3[1, 1:_LANES + 1, :]
                        nb = dict(ul=te3[0, 0:_LANES, :], up=to3[0, 1:_LANES + 1, :],
                                  ur=te3[0, 1:_LANES + 1, :],
                                  lf=te3[1, 0:_LANES, :], rt=te3[1, 1:_LANES + 1, :],
                                  bl=te3[2, 0:_LANES, :], bt=to3[2, 1:_LANES + 1, :],
                                  br=te3[2, 1:_LANES + 1, :])
                    insig = (cur >> 31) == 0
                    active = insig & act_blk
                    ctx = sum((v >> 31).astype(jnp.int32) for v in nb.values())
                    probs = _onehot_rows(ptab[0:9, :], ctx)
                    bits = ac_decode(active, probs)
                    newly = active & (bits == 1)
                    sctx = _sign_ctx(nb["up"], nb["lf"], nb["rt"], nb["bt"])
                    sprobs = _onehot_rows(ptab[9:13, :], sctx >> 1)
                    ssym = ac_decode(newly, sprobs)
                    sbit = jnp.where((ssym & 1) == (sctx & 1), _U(0), _U(1))
                    upd = jnp.where(newly, cur | pmask | flag | sbit, cur)
                    if phase == 0:
                        te_ref[pl.ds(r + 1, 1), 0:_LANES, :] = (
                            upd.reshape(1, _LANES, C))
                        row1 = jnp.concatenate(
                            [upd, te3[1, _LANES:, :]], axis=0)
                        te3 = jnp.concatenate(
                            [te3[0:1], row1.reshape(1, 40, C), te3[2:3]],
                            axis=0)
                    else:
                        to_ref[pl.ds(r + 1, 1), 1:_LANES + 1, :] = (
                            upd.reshape(1, _LANES, C))
                return 0

            jax.lax.fori_loop(0, _ROWS, spp_row, 0, unroll=False)

            # ---- MRP: magnitude refinement -------------------------------
            ref_prob = jnp.broadcast_to(ptab[13:14, :], (_LANES, C))

            def mrp_row(r, _):
                for phase in (0, 1):
                    g3 = te_ref[pl.ds(r, 3)] if phase == 0 else \
                        to_ref[pl.ds(r, 3)]
                    cur = (g3[1, 0:_LANES, :] if phase == 0
                           else g3[1, 1:_LANES + 1, :])
                    refine = ((cur >> 29) & 1) == 1
                    active = refine & act_blk
                    eligible = (~refine & ((cur >> 31) == 1)) & act_blk
                    sym = ac_decode(active, ref_prob)
                    patt = ((sym.astype(_U) << 1) + 1) << plane_u
                    upd = jnp.where(active, (cur & ~pmask) | (pmask & patt),
                                    cur)
                    upd = jnp.where(eligible, upd | _U(1 << 29), upd)
                    if phase == 0:
                        te_ref[pl.ds(r + 1, 1), 0:_LANES, :] = (
                            upd.reshape(1, _LANES, C))
                    else:
                        to_ref[pl.ds(r + 1, 1), 1:_LANES + 1, :] = (
                            upd.reshape(1, _LANES, C))
                return 0

            jax.lax.fori_loop(0, _ROWS, mrp_row, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, n_planes, plane_body, 0, unroll=False)

    return kernel


@partial(jax.jit, static_argnames=("n_planes", "prec", "interpret"))
def _decode_chunks(tape5, msb, probs, *, n_planes: int, prec: int,
                   interpret: bool = False):
    """tape5 (nc*C*5, 8, 128), msb (1, nc*C), probs (P, 16, nc*C)."""
    n = msb.shape[1]
    nc = n // C
    grid = (nc,)
    kernel = _make_kernel(n_planes, prec)
    te, to = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((C * 5, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_planes, 16, C), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS + 2, 40, C), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS + 2, 40, C), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_ROWS + 2, 40, n), _U),
            jax.ShapeDtypeStruct((_ROWS + 2, 40, n), _U),
        ),
        scratch_shapes=[
            pltpu.VMEM((_LANES, C), jnp.int32),   # low
            pltpu.VMEM((_LANES, C), jnp.int32),   # size
            pltpu.VMEM((_LANES, C), jnp.int32),   # cw
            pltpu.VMEM((FW, C), jnp.int32),       # fetch window H
            pltpu.VMEM((8, C), jnp.int32),        # v / valid / off
            pltpu.VMEM((_LANES, C), jnp.int32),   # fetched
            pltpu.VMEM((C, 128), jnp.int32),      # refill staging
            pltpu.VMEM((1, C), jnp.int32),        # refill addresses
            pltpu.SMEM((1, C), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tape5, msb, probs)
    return te, to


def _prob_tables(lut, ref_b, sig_b, sign_b, n_planes):
    """(P, 16, N) int32: rows 0-8 sig ctx, 9-12 sign ctx, 13 refinement."""
    n = ref_b.shape[0]
    p = jnp.arange(n_planes, dtype=jnp.int32)
    i9 = jnp.arange(9, dtype=jnp.int32)
    i4 = jnp.arange(4, dtype=jnp.int32)
    top = lut.shape[0] - 1
    sig = lut[jnp.clip(sig_b[None, None, :] + (p[:, None, None] * 9)
                       + i9[None, :, None], 0, top)]
    sign = lut[jnp.clip(sign_b[None, None, :] + (p[:, None, None] * 4)
                        + i4[None, :, None], 0, top)]
    ref = lut[jnp.clip(ref_b[None, None, :] + p[:, None, None], 0, top)]
    pad = jnp.full((n_planes, 2, n), 64, jnp.int32)
    return jnp.concatenate([sig, sign, ref, pad], axis=1)


@partial(jax.jit, static_argnames=("n_planes", "prec", "interpret"))
def _prepare_and_decode(streams, sizes, lut, ref_b, sig_b, sign_b,
                        *, n_planes: int, prec: int, interpret: bool):
    from .bpc_jax import _from_grids, _raw_unlayout

    n = streams.shape[0]
    npad = -(-n // C) * C
    msb_word = streams[:, 0]
    is_raw = sizes == spec.CBLOCK_SIZE
    skip = (msb_word == 32) | is_raw
    msb = jnp.where(skip, -1, msb_word)
    msb = jnp.pad(msb, (0, npad - n), constant_values=-1).reshape(1, npad)

    probs = _prob_tables(lut, ref_b, sig_b, sign_b, n_planes)
    probs = jnp.pad(probs, ((0, 0), (0, 0), (0, npad - n)),
                    constant_values=64)

    # pad the tape to 5120 words/block; words past slot 4095 replicate the
    # last slot so the fetch window's address clamp is pure padding
    tail = jnp.broadcast_to(streams[:, spec.CBLOCK_SIZE - 1:],
                            (n, TAPE_WORDS - spec.CBLOCK_SIZE))
    tape = jnp.concatenate([streams, tail], axis=1)
    tape = jnp.pad(tape, ((0, npad - n), (0, 0)))
    tape5 = tape.reshape(npad * 5, 8, 128)

    te, to = _decode_chunks(tape5, msb, probs, n_planes=n_planes, prec=prec,
                            interpret=interpret)
    # convert the kernel's (66, 40, N) padded grids to the (66, 33, N)
    # layout _from_grids expects
    te = te[:, 0:_LANES + 1, 0:n]
    to = to[:, 0:_LANES + 1, 0:n]
    words = _from_grids(te, to)
    words = jnp.where(is_raw[:, None, None], _raw_unlayout(streams), words)
    out = ((words & spec.MAGNITUDE_MASK) >> 1).astype(jnp.int32)
    return jnp.where((words & 1) == 1, -out, out)


def decode_blocks(streams, sizes, lut, ref_base, sig_base, sign_base,
                  *, params: LUTParams, n_planes: int,
                  interpret: bool = False):
    """Decode (N, 4096) int32 streams -> (N, 64, 64) coefficients.

    cp=2, k=0 only (the default path); callers route cp=3 / k>0 to the XLA
    implementation. Bases are the per-codeblock LUT section offsets from
    bpc_jax.block_metadata.
    """
    return _prepare_and_decode(
        jnp.asarray(streams, jnp.int32), jnp.asarray(sizes, jnp.int32),
        jnp.asarray(lut, jnp.int32), jnp.asarray(ref_base, jnp.int32),
        jnp.asarray(sig_base, jnp.int32), jnp.asarray(sign_base, jnp.int32),
        n_planes=n_planes, prec=params.mult_precision, interpret=interpret)
