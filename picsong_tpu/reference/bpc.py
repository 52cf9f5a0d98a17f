"""NumPy oracle of the BPC-PaCo bitplane coder with exact reference semantics.

The reference codes each 64x64 codeblock with one warp: 32 lanes, each
owning two columns of 64 rows, scanning row 0..63 with a left-column phase
then a right-column phase per row (BPC/BPCEngine.cu:770-1003). Each lane is
an independent 16-bit stationary-probability arithmetic coder; lanes share
only the per-codeblock codeword-slot counter, reserved by warp ballot in
lane-ascending order (arithmeticEncoder, BPCEngine.cu:371-399).

This oracle models the warp as a 32-vector state machine: every divergent
CUDA branch becomes a lane mask, every __activemask/__popc ballot becomes a
masked cumulative sum, preserving the exact slot-reservation order and so
the exact codestream. It exists to (a) define our codestream bit-for-bit
and (b) gate the vectorized JAX/Pallas implementations in tests.

Coefficient word layout (readCoefficients/writeCoefficients,
BPCEngine.cu:41-137): bits 0..23 = (|v| << 1) | sign, bit 29 =
refinement-eligible, bit 30 = cleanup candidate (3 coding passes), bit 31 =
significant, bits 24..28 = bitplane where the coefficient became
significant.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import spec
from ..core.lut import LUTParams, group_base

_LANES = spec.LANES
_ROWS = spec.CBLOCK_LENGTH
_LANE_IDX = np.arange(_LANES)


@dataclass
class _LutPtrs:
    """Flat-LUT section pointers for one codeblock (BPCEngine.cu:329-358)."""

    ref: int
    sig: int
    sign: int
    cp_sig: int = 0
    cp_sign: int = 0


def make_lut_pointers(params: LUTParams, wavelet_levels: int, coding_passes: int,
                      level: int, subband: int, s_group: int) -> _LutPtrs:
    """Base pointers for a codeblock's (level, subband) at bitplane-group s.

    The returned pointers address bitplane 0 of the group; pass code adds
    `plane * n_ctx` (the reference walks a pointer down from MSB — the
    net index is always `current plane * n_ctx`, BPCEngine.cu:353-358).
    """
    off = params.section_offsets(wavelet_levels, coding_passes)
    s_off = s_group * params.stride_per_group(wavelet_levels)
    ref = s_off + off["ref"] + group_base(params, wavelet_levels, level, subband,
                                          params.ctx_refinement)
    sig = s_off + off["sig"] + group_base(params, wavelet_levels, level, subband,
                                          params.ctx_significance)
    sgn = s_off + off["sign"] + group_base(params, wavelet_levels, level, subband,
                                           params.ctx_sign)
    ptrs = _LutPtrs(ref=ref, sig=sig, sign=sgn)
    if coding_passes == 3:
        # Cleanup pass reuses sig/sign pointers shifted by the distance from
        # the sig/sign sections to the cp_sig/cp_sign sections
        # (LUTPointerAux, BPCEngine.cu:1744-1748).
        aux = (params.section_size(params.ctx_significance, wavelet_levels)
               + params.section_size(params.ctx_sign, wavelet_levels))
        ptrs.cp_sig = sig + aux
        ptrs.cp_sign = sgn + aux
    return ptrs


def find_subband(cb_x: int, cb_y: int, width: int, height: int,
                 wavelet_levels: int) -> tuple[int, int]:
    """Decomposition level and subband of the codeblock at (cb_x, cb_y).

    Mirrors findSubband (BPCEngine.cu:143-170): walks the dyadic pyramid;
    subband codes HL=0, LH=1, HH=2; the residual LL reports
    (wavelet_levels, 0).
    """
    for aux in range(1, wavelet_levels + 1):
        in_right = cb_x >= (width >> aux)
        in_bottom = cb_y >= (height >> aux)
        if in_right or in_bottom:
            if in_right:
                return aux - 1, spec.SUBBAND_HH if in_bottom else spec.SUBBAND_HL
            return aux - 1, spec.SUBBAND_LH
    return wavelet_levels, 0


def consecutive_bitplanes(msb: int, k_factor: float, level: int, subband: int,
                          wavelet_levels: int) -> int:
    """Complexity-scalability split plane (BPCEngine.cu:1684-1692)."""
    if k_factor <= 0:
        return 0
    row, col = spec.l2norm_column(level, subband, wavelet_levels)
    return max(int(np.floor(msb * (k_factor / spec.WAVELET_QSTEPS[row][col]))), 0)


class _WarpAC:
    """The 32-lane arithmetic coder with shared slot reservation."""

    def __init__(self, codestream: np.ndarray, mult_precision: int):
        self.cs = codestream                 # int32 (4096,), slot 0 = MSB word
        self.prec = mult_precision
        self.low = np.zeros(_LANES, dtype=np.int64)
        self.size = np.zeros(_LANES, dtype=np.int64)
        self.resv = np.zeros(_LANES, dtype=np.int64)   # absolute slot index
        self.counter = 0

    def _reserve(self, need: np.ndarray) -> None:
        # __activemask + __popc ballot in lane-ascending order
        # (BPCEngine.cu:378-383): rank = active lanes below me.
        rank = np.cumsum(need) - need
        slot = np.minimum(rank + self.counter, spec.MAX_RESERVED_SLOT) + 1
        self.resv = np.where(need, slot, self.resv)
        self.counter = min(self.counter + int(need.sum()), spec.MAX_SLOT_COUNT)
        self.low = np.where(need, 0, self.low)
        self.size = np.where(need, spec.AC_INTERVAL_INIT, self.size)

    def encode(self, active: np.ndarray, symbols: np.ndarray,
               probs: np.ndarray) -> None:
        if not active.any():
            return
        self._reserve(active & (self.size == 0))
        aux = ((self.size * probs) >> self.prec) + symbols
        take1 = active & (symbols == 1)
        take0 = active & (symbols == 0)
        self.size = np.where(take0, aux, np.where(take1, self.size - aux, self.size))
        self.low = np.where(take1, self.low + aux, self.low)
        flush = active & (self.size == 0)
        if flush.any():
            self.cs[self.resv[flush]] = self.low[flush]

    def decode(self, active: np.ndarray, probs: np.ndarray) -> np.ndarray:
        symbols = np.zeros(_LANES, dtype=np.int64)
        if not active.any():
            return symbols
        need = active & (self.size == 0)
        if need.any():
            rank = np.cumsum(need) - need
            slot = np.minimum(rank + self.counter, spec.MAX_RESERVED_SLOT) + 1
            # resv doubles as the current-codeword register on decode
            cw = self.cs[slot].astype(np.int64) & 0xFFFFFFFF
            self.resv = np.where(need, cw, self.resv)
            self.counter = min(self.counter + int(need.sum()), spec.MAX_SLOT_COUNT)
            self.low = np.where(need, 0, self.low)
            self.size = np.where(need, spec.AC_INTERVAL_INIT, self.size)
        aux = ((self.size * probs) >> self.prec) + 1
        aux2 = self.low + aux
        one = active & (self.resv >= aux2)
        zero = active & ~one
        self.size = np.where(one, self.size - aux,
                             np.where(zero, aux - 1, self.size))
        self.low = np.where(one, aux2, self.low)
        symbols[one] = 1
        return symbols

    def flush_final(self) -> None:
        # Encode(): codeStream[reservedCodeword] = ACIntervalLower for every
        # lane at the end (BPCEngine.cu:1719). Lane order is the CUDA
        # warp-store order; identical values make order irrelevant except
        # for capped slots, where higher lanes win — replicate by storing
        # in ascending lane order.
        self.cs[self.resv] = self.low


class _CodeblockCoder:
    """Scan-order state shared by encode and decode for one codeblock."""

    def __init__(self, lut: np.ndarray, params: LUTParams, ptrs: _LutPtrs):
        self.lut = lut.astype(np.int64)
        self.params = params
        self.ptrs = ptrs
        # Padded 66x66 grid: outside-block neighbors read as 0, which
        # reproduces correctCBBorders and the first/last-row zeroing
        # (BPCEngine.cu:446-484,770-843).
        self.T = np.zeros((_ROWS + 2, _ROWS + 2), dtype=np.int64)

    # -- grid helpers ------------------------------------------------------

    def cells(self, row: int, phase: int):
        """Current 32-lane cell values at (row, phase): cols 2L+phase."""
        cols = _LANE_IDX * 2 + phase + 1
        return self.T[row + 1, cols], cols

    def neighbors(self, row: int, phase: int):
        """Pre-step captures of the 8 neighbors for all 32 lanes."""
        cols = _LANE_IDX * 2 + phase + 1
        r = row + 1
        T = self.T
        return {
            "ul": T[r - 1, cols - 1], "up": T[r - 1, cols], "ur": T[r - 1, cols + 1],
            "lf": T[r, cols - 1], "rt": T[r, cols + 1],
            "bl": T[r + 1, cols - 1], "bt": T[r + 1, cols], "br": T[r + 1, cols + 1],
        }

    # -- context formation -------------------------------------------------

    @staticmethod
    def _sig_context(nb) -> np.ndarray:
        """8-neighbor significance count (computeContext, BPCEngine.cu:222)."""
        return sum((nb[k] >> 31) & 1 for k in ("ul", "up", "ur", "lf", "rt",
                                               "bl", "bt", "br"))

    @staticmethod
    def _sig_context_bulk(nb, plane: int) -> np.ndarray:
        """computeContextBulk (BPCEngine.cu:236-243)."""
        return sum((((nb[k] >> 24) & 31) >= plane).astype(np.int64)
                   for k in ("ul", "up", "ur", "lf", "rt", "bl", "bt", "br"))

    @staticmethod
    def _sign_context(up, lf, rt, bt) -> np.ndarray:
        """computeSignContext (BPCEngine.cu:252-308): ctx code with the
        expected sign in bit 0."""

        def contrib(v):
            sig = ((v >> 31) & 1) != 0
            return np.where(sig, np.where((v & 1) == 1, -1, 1), 0)

        h = contrib(lf) + contrib(rt)
        v = contrib(up) + contrib(bt)
        return _sign_ctx_table(h, v)

    @staticmethod
    def _sign_context_bulk(up, lf, rt, bt, plane: int) -> np.ndarray:
        """computeSignContextBulk (BPCEngine.cu:311-323)."""

        def contrib(v):
            sig = (((v >> 31) & 1) != 0) & (((v >> 24) & 31) >= plane)
            return np.where(sig, np.where((v & 1) == 1, -1, 1), 0)

        h = contrib(lf) + contrib(rt)
        v = contrib(up) + contrib(bt)
        return _sign_ctx_table(h, v)


def _sign_ctx_table(h: np.ndarray, v: np.ndarray) -> np.ndarray:
    """The 3x3 (sign(h), sign(v)) -> context code map (BPCEngine.cu:252-293)."""
    out = np.zeros_like(h)
    out = np.where((h == 0) & (v > 0), 2, out)
    out = np.where((h == 0) & (v < 0), 3, out)
    out = np.where((h > 0) & (v == 0), 4, out)
    out = np.where((h > 0) & (v > 0), 6, out)
    out = np.where((h > 0) & (v < 0), 0, out)
    out = np.where((h < 0) & (v == 0), 5, out)
    out = np.where((h < 0) & (v > 0), 1, out)
    out = np.where((h < 0) & (v < 0), 7, out)
    return out


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def encode_codeblock(coeffs: np.ndarray, level: int, subband: int,
                     lut: np.ndarray, params: LUTParams, wavelet_levels: int,
                     coding_passes: int = 2, k_factor: float = 0.0) -> tuple[np.ndarray, int]:
    """Encode one 64x64 int32 codeblock.

    Returns (codestream int32[4096] with word 0 = MSB and unused slots -1,
    size = used slots including the MSB word). A size of 4096 marks the
    incompressible raw-copy fallback (expansionFix, BPCEngine.cu:1905-1924).
    """
    cs = np.full(spec.CBLOCK_SIZE, -1, dtype=np.int32)

    mag = np.abs(coeffs.astype(np.int64))
    signbit = (coeffs < 0).astype(np.int64)
    T = (mag << 1) | signbit
    if coding_passes == 3:
        T |= 1 << 30

    # findMSB (BPCEngine.cu:176-216): position of the highest magnitude bit
    msb_or = int(np.bitwise_or.reduce((T >> 1).reshape(-1)))
    if coding_passes == 3:
        msb_or &= ~(1 << 29)   # drop the shifted CP flag (findMSB3CP)
    msb = msb_or.bit_length() - 1 if msb_or else 32

    cs[0] = msb
    if msb == 32:
        return cs, 1

    coder = _CodeblockCoder(lut, params, _LutPtrs(0, 0, 0))
    coder.T[1:-1, 1:-1] = T
    ac = _WarpAC(cs, params.mult_precision)

    if coding_passes == 2:
        consec = consecutive_bitplanes(msb, k_factor, level, subband, wavelet_levels)
        s_group = min(consec, msb) if k_factor > 0 else 0
        ptrs = make_lut_pointers(params, wavelet_levels, 2, level, subband, s_group)
        coder.ptrs = ptrs
        plane = msb
        while plane >= consec:
            _spp_pass(coder, ac, plane, encode=True)
            _mrp_pass(coder, ac, plane, encode=True)
            plane -= 1
        if plane >= 0:
            _bulk_pass(coder, ac, plane, encode=True)
    else:
        ptrs = make_lut_pointers(params, wavelet_levels, 3, level, subband, 0)
        coder.ptrs = ptrs
        _cp_pass(coder, ac, msb, encode=True)
        for plane in range(msb - 1, -1, -1):
            _spp_pass(coder, ac, plane, encode=True, three_cp=True)
            _mrp_pass(coder, ac, plane, encode=True)
            _cp_pass(coder, ac, plane, encode=True)

    ac.flush_final()
    size = ac.counter + 1
    if size == spec.CBLOCK_SIZE:
        # Incompressible fallback: raw low-16-bit copy in lane-major order
        # (expansionFix, BPCEngine.cu:1905-1912).
        _expansion_fix(coder.T[1:-1, 1:-1], cs)
    return cs, size


def _expansion_fix(T: np.ndarray, cs: np.ndarray) -> None:
    for lane in range(_LANES):
        for parity in range(2):
            col = lane * 2 + parity
            cs[lane * 128 + np.arange(_ROWS) * 2 + parity] = T[:, col] & 0xFFFF


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_codeblock(cs: np.ndarray, size: int, level: int, subband: int,
                     lut: np.ndarray, params: LUTParams, wavelet_levels: int,
                     coding_passes: int = 2, k_factor: float = 0.0) -> np.ndarray:
    """Decode one codeblock codestream back to int32 coefficients.

    Mirror of kernelBPCDecoder (BPCEngine.cu:2126-2215): midpoint
    approximation bits are inserted for every decoded magnitude bit.
    """
    msb = int(cs[0])
    coder = _CodeblockCoder(lut, params, _LutPtrs(0, 0, 0))
    if coding_passes == 3:
        coder.T[1:-1, 1:-1] |= 1 << 30

    if size == spec.CBLOCK_SIZE:
        T = coder.T[1:-1, 1:-1]
        for lane in range(_LANES):
            for parity in range(2):
                col = lane * 2 + parity
                T[:, col] = cs[lane * 128 + np.arange(_ROWS) * 2 + parity].astype(np.int64) & 0xFFFF
    elif msb != 32:
        ac = _WarpAC(cs, params.mult_precision)
        if coding_passes == 2:
            consec = consecutive_bitplanes(msb, k_factor, level, subband,
                                           wavelet_levels)
            s_group = min(consec, msb) if k_factor > 0 else 0
            coder.ptrs = make_lut_pointers(params, wavelet_levels, 2, level,
                                           subband, s_group)
            mask = 0x3 << msb
            if msb == 0:
                mask &= 0x2
            plane = msb
            while plane >= consec:
                _spp_pass(coder, ac, plane, encode=False, mask=mask)
                _mrp_pass(coder, ac, plane, encode=False, mask=mask)
                mask >>= 1
                if plane == 1:
                    mask = 0x2
                plane -= 1
            if plane >= 0:
                _bulk_pass(coder, ac, plane, encode=False, mask=mask)
        else:
            coder.ptrs = make_lut_pointers(params, wavelet_levels, 3, level,
                                           subband, 0)
            mask = 0x3 << msb
            if msb == 0:
                mask &= 0x2
            _cp_pass(coder, ac, msb, encode=False, mask=mask)
            mask >>= 1
            if msb - 1 == 0:
                mask = 0x2
            for plane in range(msb - 1, -1, -1):
                _spp_pass(coder, ac, plane, encode=False, mask=mask, three_cp=True)
                _mrp_pass(coder, ac, plane, encode=False, mask=mask)
                _cp_pass(coder, ac, plane, encode=False, mask=mask)
                mask >>= 1
                if plane == 1:
                    mask = 0x2

    # writeCoefficients (BPCEngine.cu:93-111)
    T = coder.T[1:-1, 1:-1]
    out = ((T & spec.MAGNITUDE_MASK) >> 1).astype(np.int32)
    return np.where((T & 1) == 1, -out, out).astype(np.int32)


# --------------------------------------------------------------------------
# Coding passes. Each runs the 64-row x 2-phase scan; all per-step reads
# capture pre-step state (warp shuffles happen before encoding in the
# reference), and each step only writes its own 32 cells.
# --------------------------------------------------------------------------

def _spp_pass(coder: _CodeblockCoder, ac: _WarpAC, plane: int, encode: bool,
              mask: int = 0, three_cp: bool = False) -> None:
    lut, ptrs, params = coder.lut, coder.ptrs, coder.params
    sig_base = ptrs.sig + plane * params.ctx_significance
    sign_base = ptrs.sign + plane * params.ctx_sign
    for row in range(_ROWS):
        for phase in range(2):
            cur, cols = coder.cells(row, phase)
            nb = coder.neighbors(row, phase)
            insig = (cur >> 31) == 0
            if three_cp:
                has_sig_nb = sum(((nb[k] >> 31) & 1) for k in nb) > 0
                active = insig & has_sig_nb
                becomes_candidate = insig & ~has_sig_nb
            else:
                active = insig
                becomes_candidate = np.zeros(_LANES, dtype=bool)
            ctx = coder._sig_context(nb)
            probs = lut[np.minimum(sig_base + ctx, lut.size - 1)]
            if encode:
                bits = (cur >> (plane + 1)) & 1
                ac.encode(active, bits, probs)
                newly = active & (bits == 1)
            else:
                bits = ac.decode(active, probs)
                newly = active & (bits == 1)
            if newly.any():
                sctx = coder._sign_context(nb["up"], nb["lf"], nb["rt"], nb["bt"])
                sprobs = lut[np.minimum(sign_base + (sctx >> 1), lut.size - 1)]
                if encode:
                    ssym = np.where((cur & 1) == (sctx & 1), 0, 1)
                    ac.encode(newly, ssym, sprobs)
                    upd = np.where(newly, cur | (1 << 31) | (plane << 24), cur)
                else:
                    ssym = ac.decode(newly, sprobs)
                    sbit = np.where((ssym & 1) == (sctx & 1), 0, 1)
                    upd = np.where(newly,
                                   cur | mask | (1 << 31) | (plane << 24) | sbit,
                                   cur)
            else:
                upd = cur
            if becomes_candidate.any():
                upd = np.where(becomes_candidate, upd | (1 << 30), upd)
            coder.T[row + 1, cols] = upd


def _mrp_pass(coder: _CodeblockCoder, ac: _WarpAC, plane: int, encode: bool,
              mask: int = 0) -> None:
    prob = coder.lut[min(coder.ptrs.ref + plane * coder.params.ctx_refinement,
                         coder.lut.size - 1)]
    probs = np.full(_LANES, prob, dtype=np.int64)
    for row in range(_ROWS):
        for phase in range(2):
            cur, cols = coder.cells(row, phase)
            refine = ((cur >> 29) & 1) == 1
            eligible_next = ~refine & (((cur >> 31) & 1) == 1)
            if encode:
                ac.encode(refine, (cur >> (plane + 1)) & 1, probs)
                upd = cur
            else:
                sym = ac.decode(refine, probs)
                upd = np.where(refine,
                               (cur & ~mask) | (mask & (((sym << 1) + 1) << plane)),
                               cur)
            upd = np.where(eligible_next, upd | (1 << 29), upd)
            coder.T[row + 1, cols] = upd


def _cp_pass(coder: _CodeblockCoder, ac: _WarpAC, plane: int, encode: bool,
             mask: int = 0) -> None:
    """Cleanup pass (3 coding passes mode, CPEncoder/CPDecoder,
    BPCEngine.cu:644-719)."""
    lut, ptrs, params = coder.lut, coder.ptrs, coder.params
    sig_base = ptrs.cp_sig + plane * params.ctx_significance
    sign_base = ptrs.cp_sign + plane * params.ctx_sign
    for row in range(_ROWS):
        for phase in range(2):
            cur, cols = coder.cells(row, phase)
            nb = coder.neighbors(row, phase)
            active = ((cur >> 30) & 1) == 1
            ctx = coder._sig_context(nb)
            probs = lut[np.minimum(sig_base + ctx, lut.size - 1)]
            if encode:
                bits = (cur >> (plane + 1)) & 1
                ac.encode(active, bits, probs)
            else:
                bits = ac.decode(active, probs)
            upd = np.where(active, cur & ~(1 << 30), cur)
            newly = active & (bits == 1)
            if newly.any():
                sctx = coder._sign_context(nb["up"], nb["lf"], nb["rt"], nb["bt"])
                sprobs = lut[np.minimum(sign_base + (sctx >> 1), lut.size - 1)]
                if encode:
                    ssym = np.where((cur & 1) == (sctx & 1), 0, 1)
                    ac.encode(newly, ssym, sprobs)
                    upd = np.where(newly,
                                   upd | (1 << 31) | (1 << 29) | (plane << 24), upd)
                else:
                    ssym = ac.decode(newly, sprobs)
                    sbit = np.where((ssym & 1) == (sctx & 1), 0, 1)
                    upd = np.where(
                        newly,
                        upd | mask | (1 << 31) | (1 << 29) | (plane << 24) | sbit,
                        upd)
            coder.T[row + 1, cols] = upd


def _bulk_pass(coder: _CodeblockCoder, ac: _WarpAC, entry_plane: int,
               encode: bool, mask: int = 0) -> None:
    """Fused multi-bitplane pass for complexity scalability
    (encodeBulkMode/decodeBulkMode, BPCEngine.cu:1285-1662).

    The significance context is captured once per cell at the entry plane;
    the inner loop then codes every remaining plane for that cell before
    moving on.
    """
    lut, ptrs, params = coder.lut, coder.ptrs, coder.params
    for row in range(_ROWS):
        for phase in range(2):
            cur, cols = coder.cells(row, phase)
            nb = coder.neighbors(row, phase)
            # __any_sync(!significant): with every lane significant the
            # reference skips context formation (context stays 0) — the
            # value is never used on that path, so computing it is harmless.
            if entry_plane != 0:
                ctx = coder._sig_context_bulk(nb, entry_plane)
            else:
                ctx = coder._sig_context(nb)
            work = cur.copy()
            lmask = mask
            for plane in range(entry_plane, -1, -1):
                back = entry_plane - plane
                ref_p = lut[min(ptrs.ref + entry_plane * params.ctx_refinement
                                - params.ctx_refinement * back, lut.size - 1)]
                sig_p = lut[np.minimum(
                    ptrs.sig + entry_plane * params.ctx_significance + ctx
                    - params.ctx_significance * back, lut.size - 1)]
                sign_base = (ptrs.sign + entry_plane * params.ctx_sign
                             - params.ctx_sign * back)
                sig_lanes = ((work >> 31) & 1) == 1
                probs = np.full(_LANES, ref_p, dtype=np.int64)
                if encode:
                    ac.encode(sig_lanes, (work >> (plane + 1)) & 1, probs)
                else:
                    sym = ac.decode(sig_lanes, probs)
                    work = np.where(sig_lanes,
                                    (work & ~lmask)
                                    | (lmask & (((sym << 1) + 1) << plane)),
                                    work)
                insig = ~sig_lanes
                if encode:
                    bits = (work >> (plane + 1)) & 1
                    ac.encode(insig, bits, sig_p)
                    newly = insig & (bits == 1)
                else:
                    bits = ac.decode(insig, sig_p)
                    newly = insig & (bits == 1)
                if newly.any():
                    sctx = coder._sign_context_bulk(nb["up"], nb["lf"],
                                                    nb["rt"], nb["bt"], plane)
                    sprobs = lut[np.minimum(sign_base + (sctx >> 1),
                                            lut.size - 1)]
                    if encode:
                        ssym = np.where((work & 1) == (sctx & 1), 0, 1)
                        ac.encode(newly, ssym, sprobs)
                        work = np.where(newly,
                                        work | (1 << 31) | (plane << 24), work)
                    else:
                        ssym = ac.decode(newly, sprobs)
                        sbit = np.where((ssym & 1) == (sctx & 1), 0, 1)
                        work = np.where(
                            newly,
                            work | lmask | (1 << 31) | (plane << 24) | sbit,
                            work)
                lmask >>= 1
                if plane == 1:
                    lmask = 0x2
            coder.T[row + 1, cols] = work
