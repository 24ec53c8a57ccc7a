"""Device-resident Huffman entropy stage (encode side).

Turns the padded stream-order bins (ops/stream_layout.py) into the exact
reference Huffman bitstream (HuffmanEncoder.hpp:135-218: MSB-first
concatenation of per-symbol codes) without the bins ever leaving the device:

  jit A: windowed exact histogram (one-hot MXU matmul, two-level radix-128)
         + extraction of the STREAM SLOT INDICES of unpredictable points
         (values gather outside through a static slot->source map — the
         originals stream never needs laying out)
  host:  Huffman tree build (native engine, reference tie-breaking) -> code
         tables; total bit count derived exactly from hist x lens
  jit B: fused code lookup (vreg lane-gather chains; XLA gather is ~120ms/16M
         on TPU, this is ~2ms) + bit packing:
         kernel 1: per 8192-element chunk, pack 128 rows of 64 codes by a
                   size-classed vectorized scan (16-row buffers for typical
                   ~5-6 bits/symbol chunks, 72-row worst case), then
                   concatenate the rows with a 4-level binary merge tree,
                   emitting 8 splice segments per chunk (rows pre-shuffled
                   to bit-reversed lanes so half-pairing yields natural
                   order; variable shifts decompose into static rolls +
                   selects — no gathers, no scatters, no lane-dynamic
                   addressing). Segments store in the splice's natural
                   (row, lane) word layout via one in-kernel transpose +
                   content-proportional static row writes.
         kernel 2: batched splice: 128 segments per grid step are bit-shifted,
                   lane-rotated and OR-placed into a VMEM accumulator at
                   their exclusive prefix bit offsets (pure vector ops), then
                   the batch span DMAs out in 128-row granules — OR-RMW only
                   for the granule overlapping the previous batch's tail
                   (Mosaic only allows dynamic offsets on the sublane dim;
                   the lane part rides a traced roll)

Constraints (host falls back to the scalar engine when violated):
  * anchor grid present, f32 data, max code length <= 32 bits,
  * all nonzero symbols inside the static window [radius-4096, radius+4096),
  * literal count within the static capacity.

Wire-format reference: encoder/HuffmanEncoder.hpp (tree+stream),
SZGenericCompressor.hpp:38-63 (payload framing; assembled by
szt_interp_seal_packed on the host).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

# ---- static geometry ----------------------------------------------------------

LANES = 128
ROW_ELEMS = 64                      # elements packed per row by the scan
CHUNK = LANES * ROW_ELEMS           # 8192 elements per grid step
ROWBUF_W = 72                       # words per row buffer (<=32 bits/code ->
                                    # 64 full + 1 partial; padded to a size
                                    # whose SEG_W divides 128 at MERGE_LEVELS)
FRAME_W = ROWBUF_W * LANES          # words per chunk frame (9216)
FRAME_SUB = FRAME_W // LANES        # frame rows when viewed (72, 128)
MERGE_LEVELS = 4                    # in-kernel merge depth; remaining splits
                                    # become separate splice segments (the
                                    # splice is ~0.9 ms for 4k segments —
                                    # round-5 trace — so trading the two
                                    # largest merge levels for 4x segments
                                    # removes ~75% of the merge-tree work)
SEGS_PER_CHUNK = 128 >> MERGE_LEVELS   # 8
SEG_W = ROWBUF_W * (1 << MERGE_LEVELS)  # words per emitted segment (1152)
SMALL_W = 16                        # small merge class: every lane's packed
                                    # row fits 16 words (<= 8 bits/symbol avg)
SEG_SUB = SEG_W // LANES            # segment rows viewed (9, 128)
# after L merge levels the surviving segment lanes are l < SEGS_PER_CHUNK and
# lane l holds rows bitrev(l)*2^L..: emit must map stream-order segment k to
# lane bitrev(k) (for MERGE_LEVELS=6 the 1-bit reversal was the identity)
_SEG_LANE = [int(f"{i:0{7 - MERGE_LEVELS}b}"[::-1], 2)
             for i in range(SEGS_PER_CHUNK)]
# (DMA sublane region sizes must be multiples of 8 — the TPU faults on
# non-multiple-of-8 dynamic DMA regions; the splice uses 128-row granules)

W_HALF = 8190                       # symbol window half-width around radius:
                                    # the largest that fits the 128x128 radix
                                    # histogram (N_IDX + trash <= 16384). For
                                    # quantbinCnt <= 16380 (radius <= 8190,
                                    # incl. the tuner's 16384 retune) EVERY
                                    # legal bin is in-window; only the default
                                    # 65536-bin config can overflow to TRASH
N_IDX = 2 + 2 * W_HALF              # 0 -> symbol 0, 1 -> sentinel, 2.. window
IDX_SPACE = 128 * 128               # two-level radix-128 histogram space
TRASH = N_IDX                       # out-of-window bucket (host gate)
TBL_ROWS = (N_IDX + 1 + 127) // 128  # 129 vreg rows of lookup table

SENTINEL = -1

_BITREV7 = np.array([int(f"{i:07b}"[::-1], 2) for i in range(128)], np.int32)


def _interpret() -> bool:
    import os
    if os.environ.get("SZT_JAX_DEVICE", "") == "cpu":
        return True     # parity tests pin execution to the host backend
    return jax.default_backend() != "tpu"


def _sym_index(bins, wlo):
    """bins -> table index (see module docstring). wlo = radius - W_HALF.
    All constants are explicit int32: a weak Python-int inside a kernel
    becomes an int64 convert under x64, which Mosaic cannot lower."""
    i32 = jnp.int32
    r = bins - wlo
    idx = jnp.where((r >= i32(0)) & (r < i32(2 * W_HALF)), r + i32(2), i32(TRASH))
    idx = jnp.where(bins == i32(0), i32(0), idx)
    idx = jnp.where(bins == i32(SENTINEL), i32(1), idx)
    return idx


# ---- jit A: histogram + literal extraction --------------------------------------


def _hist_kernel(wlo_ref, bins_tile_ref,
                 hist_ref, lits_ref, nlit_ref, acc_ref, ptr_ref):
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ptr_ref[0] = 0

    # exact two-level histogram on the MXU: build the one-hots with the
    # BUCKET on the sublane axis and the element on the lane axis (so the
    # (64,128) tile layout is consumed directly — no transposes), in int8
    # end-to-end (packed compares run 4x the int32 rate), and fire ONE
    # 8192-contraction s8 dot per chunk: m[h,l] = sum_e hiOH[h,e]*loOH[l,e].
    idx_t = _sym_index(bins_tile_ref[:], wlo_ref[0])     # (64, 128)
    hi_t = idx_t >> jnp.int32(7)
    lo_t = idx_t & jnp.int32(127)
    # (the VPU has no sub-32-bit compares; compare in int32, store int8)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ohh_cols = []
    ohl_cols = []
    for r in range(ROW_ELEMS):
        ohh_cols.append((sub128 == hi_t[r:r + 1, :]).astype(jnp.int8))
        ohl_cols.append((sub128 == lo_t[r:r + 1, :]).astype(jnp.int8))
    ohhT = jnp.concatenate(ohh_cols, axis=1)             # (128, CHUNK)
    ohlT = jnp.concatenate(ohl_cols, axis=1)
    m = jax.lax.dot_general(ohhT, ohlT, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    acc_ref[:] = acc_ref[:] + m

    # literal extraction: STREAM SLOT INDICES of bin==0 slots, in stream
    # order (values gather through a static slot->source map outside the
    # kernel — the source stream never needs laying out, which removed a
    # full 67 MB relayout at 256^3). Per row: compact the (rare) zero-slots
    # to the front, then place the compacted run at the running literal
    # offset (lane-rotate + two masked sublane RMWs).
    cap_rows = lits_ref.shape[0]
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    chunk_zeros = jnp.sum((bins_tile_ref[:] == jnp.int32(0)).astype(jnp.int32),
                          axis=1, keepdims=True, dtype=jnp.int32)
    any_zero = jnp.sum(chunk_zeros, axis=0, keepdims=True,
                       dtype=jnp.int32)[0, 0]

    # NOTE: python-unrolled row loop: inside a gridded kernel, fori_loop with
    # array bounds lowers to a while-op Mosaic cannot legalize, and python
    # bounds make an int64 index under x64. Unrolling also gives static
    # sublane addressing for the tile reads.
    @pl.when(any_zero > 0)
    def _():
      for r in range(ROW_ELEMS):
        rb = bins_tile_ref[r:r + 1, :]                    # (1,128)
        mask = rb == jnp.int32(0)
        z = jnp.sum(mask.astype(jnp.int32), axis=1, dtype=jnp.int32)[0]

        @pl.when(z > 0)
        def _():
            ov = ci * jnp.int32(CHUNK) + jnp.int32(r * LANES) + lane_v
            # inclusive lane prefix-sum (Mosaic has no cumsum): log-shift adds
            t = mask.astype(jnp.int32)
            for sh in (1, 2, 4, 8, 16, 32, 64):
                t = t + jnp.where(lane_v >= jnp.int32(sh), pltpu.roll(t, jnp.int32(sh), 1), jnp.int32(0))
            # butterfly compaction to the front: element at lane l moves left
            # by l - (t[l]-1); monotone routing is collision-free when the
            # shift is applied one binary digit at a time. Bit-exact (pure
            # selects/rolls; an MXU one-hot matmul would round f32 to bf16).
            shamt = jnp.where(mask, lane_v - (t - jnp.int32(1)), jnp.int32(0))
            vals = ov
            alive = mask.astype(jnp.int32)  # rolls need 32-bit data
            for j in (1, 2, 4, 8, 16, 32, 64):
                rl = jnp.int32(LANES - j)
                cand_v = pltpu.roll(vals, rl, 1)
                cand_s = pltpu.roll(shamt, rl, 1)
                cand_a = pltpu.roll(alive, rl, 1)
                take = (cand_a != 0) & ((cand_s & jnp.int32(j)) != jnp.int32(0))
                moved = (alive != 0) & ((shamt & jnp.int32(j)) != jnp.int32(0))
                vals = jnp.where(take, cand_v, vals)
                shamt = jnp.where(take, cand_s - jnp.int32(j), shamt)
                # vacated lanes lose their element (else stale duplicates
                # keep marching and can crush real slots)
                alive = jnp.where(take, jnp.int32(1),
                                  jnp.where(moved, jnp.int32(0), alive))
            comp = vals                                   # (1,128) compacted
            p = ptr_ref[0]
            pr = jnp.minimum(p >> jnp.int32(7), jnp.int32(cap_rows - 2))
            pl_ = p & jnp.int32(127)
            rot = pltpu.roll(comp, pl_, 1)
            keep_mask = (lane_v >= pl_) & (lane_v < pl_ + z)
            wrap_mask = lane_v < pl_ + z - jnp.int32(128)
            cur0 = lits_ref[pl.ds(pr, 1), :]
            lits_ref[pl.ds(pr, 1), :] = jnp.where(keep_mask, rot, cur0)
            cur1 = lits_ref[pl.ds(pr + jnp.int32(1), 1), :]
            lits_ref[pl.ds(pr + 1, 1), :] = jnp.where(wrap_mask, rot, cur1)
            ptr_ref[0] = p + z

    @pl.when(ci == pl.num_programs(0) - 1)
    def _():
        hist_ref[:] = acc_ref[:]
        nlit_ref[0] = ptr_ref[0]


@functools.partial(jax.jit, static_argnames=("cap_rows",))
def hist_and_literals(bins_padded, wlo, cap_rows: int):
    """bins_padded: (Mp,) stream order (Mp % CHUNK == 0).
    Returns (hist (128,128) i32 indexed [hi, lo], literal slot indices
    (cap_rows,128) i32 — the stream positions of the bin==0 slots, in
    stream order — and the literal count). Values resolve outside via a
    static slot->source gather."""
    mp = bins_padded.shape[0]
    nc = mp // CHUNK
    bins_tile = bins_padded.reshape(nc * ROW_ELEMS, LANES)
    # x64 must be off while tracing pallas calls: under x64 the grid machinery
    # emits int64 ops that Mosaic cannot legalize ('func.return')
    with jax.enable_x64(False):
        hist, lits, nlit = _hist_call(bins_tile, wlo, cap_rows, nc)
    return hist, lits, nlit


def _hist_call(bins_tile, wlo, cap_rows, nc):
    hist, lits, nlit = pl.pallas_call(
        _hist_kernel,
        out_shape=(jax.ShapeDtypeStruct((128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((cap_rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_ELEMS, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((128, 128), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap_rows, LANES), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(jnp.asarray(wlo, jnp.int32).reshape(1), bins_tile)
    return hist, lits, nlit


# ---- jit B kernel 1: per-chunk pack ---------------------------------------------


def _chain8(idx_tile, t8, base):
    """where-chain lane-gather over an 8-row table slice (rows base..base+7)."""
    lane = idx_tile & jnp.int32(127)
    row = idx_tile >> jnp.int32(7)
    acc = jnp.zeros_like(idx_tile)
    for s in range(8):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(t8[s:s + 1, :], idx_tile.shape), lane, axis=1)
        acc = jnp.where(row == base + jnp.int32(s), cand, acc)
    return acc


def _chain_full(idx_tile, tref):
    lane = idx_tile & jnp.int32(127)
    row = idx_tile >> jnp.int32(7)
    acc = jnp.zeros_like(idx_tile)
    for s in range(TBL_ROWS):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(tref[s, :][None, :], idx_tile.shape), lane,
            axis=1)
        acc = jnp.where(row == jnp.int32(s), cand, acc)
    return acc


def _shr32(x, n):
    """Logical right shift with shift amounts outside [0,31] -> 0."""
    xu = x.astype(jnp.uint32)
    nc = jnp.clip(n, jnp.int32(0), jnp.int32(31)).astype(jnp.uint32)
    ok = (n >= jnp.int32(0)) & (n < jnp.int32(32))
    return jnp.where(ok, (xu >> nc).astype(jnp.int32), jnp.int32(0))


def _shl32(x, n):
    xu = x.astype(jnp.uint32)
    nc = jnp.clip(n, jnp.int32(0), jnp.int32(31)).astype(jnp.uint32)
    ok = (n >= jnp.int32(0)) & (n < jnp.int32(32))
    return jnp.where(ok, (xu << nc).astype(jnp.int32), jnp.int32(0))


def _pack_kernel(wlo_ref, c0_ref, bins_ref, tc_ref, tl_ref,
                 frames_ref, cbits_ref, codes_ref, lens_ref):
    i32 = jnp.int32
    ci = pl.program_id(0)
    idx = _sym_index(bins_ref[:], wlo_ref[0])            # (64, 128)
    # adaptive lookup: symbols cluster tightly, so the common case reads an
    # 8-row (1024-entry) window of each table at a dynamic sublane offset;
    # chunks spanning a wider range take the full-table chain. Special
    # indices (0: symbol zero, 1: sentinel) resolve from SMEM scalars so
    # anchors/unpredictables never widen the window.
    special = idx < i32(2)
    idxw = jnp.where(special, i32(TBL_ROWS * 128 - 1), idx)
    rmin = jnp.min(jnp.min(idxw, axis=1, keepdims=True), axis=0,
                   keepdims=True)[0, 0]
    idxm = jnp.where(special, i32(0), idx)
    rmax = jnp.max(jnp.max(idxm, axis=1, keepdims=True), axis=0,
                   keepdims=True)[0, 0]
    base = jnp.clip(rmin >> i32(7), i32(0), i32(TBL_ROWS - 8))
    narrow = (rmax >> i32(7)) - base < i32(8)

    @pl.when(narrow)
    def _():
        codes_ref[:] = _chain8(idx, tc_ref[pl.ds(base, 8), :], base)
        lens_ref[:] = _chain8(idx, tl_ref[pl.ds(base, 8), :], base)

    @pl.when(jnp.logical_not(narrow))
    def _():
        codes_ref[:] = _chain_full(idx, tc_ref)
        lens_ref[:] = _chain_full(idx, tl_ref)

    codes = jnp.where(idx == i32(0), c0_ref[0], codes_ref[:])
    lens = jnp.where(idx == i32(0), c0_ref[1], lens_ref[:])
    codes = jnp.where(idx == i32(1), i32(0), codes)
    lens = jnp.where(idx == i32(1), i32(0), lens)

    # exact per-lane bit totals BEFORE the scan: picks the size class so the
    # scan's rowbuf-update traffic (a (rows,128) where per step) runs at
    # SMALL_W rows for typical chunks instead of the 72-row worst case
    bits = jnp.sum(lens, axis=0, keepdims=True, dtype=jnp.int32)  # (1,128)

    def scan_rows(rows: int):
        """64-step scan: pack each lane's codes MSB-first into `rows` words."""
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        z = jnp.zeros((1, LANES), jnp.int32)
        buf, cnt, ptr = z, z, z
        rowbuf = jnp.zeros((rows, LANES), jnp.int32)
        for t in range(ROW_ELEMS):                        # python-unrolled
            c = codes[t:t + 1, :]                         # (1,128) right-aligned
            l = lens[t:t + 1, :]
            total = cnt + l
            emit_w = total >= i32(32)
            w = buf | _shr32(c, total - i32(32))          # valid when emit
            rowbuf = jnp.where((iota_w == ptr) & emit_w, w, rowbuf)
            buf = jnp.where(emit_w, _shl32(c, i32(64) - total),
                            buf | _shl32(c, i32(32) - total))
            cnt = jnp.where(emit_w, total - i32(32), total)
            ptr = ptr + emit_w.astype(jnp.int32)
        # park the partial word (upper cnt bits) at ptr
        return jnp.where(iota_w == ptr, buf, rowbuf)

    # MERGE_LEVELS(=6)-level binary merge leaving SEGS_PER_CHUNK(=2) splice
    # segments; lanes are bit-reversed rows so half-pairing concatenates in
    # natural order. The lane dim stays 128 wide throughout (Mosaic chokes on
    # sub-128 lane pads/concats): the merge partner is fetched by a lane
    # roll, results are valid in lanes [0, 128 >> (lev+1)) and garbage
    # elsewhere; only the segment lanes of the final frame are read.
    #
    # The merge is SIZE-CLASSED: capacity doubles per level, but typical
    # chunks carry ~5-6 bits/symbol (~12 words/lane vs the 66-word worst
    # case), so running the tree at full capacity processes ~5x zero padding.
    # When every lane fits SMALL_W words the tree runs on a SMALL_W-row
    # frame; the final frame then covers only the content rows of each
    # segment, and the splice reads content-proportional granules (it knows
    # cbits), so garbage beyond is never observed.
    def merge(frame, blen):
        for lev in range(MERGE_LEVELS):
            half = 128 >> (lev + 1)
            cap = frame.shape[0]
            right = pltpu.roll(frame, jnp.int32(128 - half), 1)
            rlen = pltpu.roll(blen, jnp.int32(128 - half), 1)
            b = blen & jnp.int32(31)
            wo = blen >> jnp.int32(5)
            rp = jnp.pad(right, ((0, cap), (0, 0)))
            # bit shift right by b with word carry (word w-1 one sublane up)
            prev = pltpu.roll(rp, jnp.int32(1), 0)
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, rp.shape, 0)
            prev = jnp.where(sub_iota == 0, 0, prev)
            rs = _shr32(rp, b) | _shl32(prev, jnp.int32(32) - b)
            # word offset by wo: binary-decomposed sublane rolls (zero-padded
            # frame -> wrapped words are zeros)
            for j in range(int(np.log2(2 * cap)) + 1):
                sh = 1 << j
                if sh >= 2 * cap:
                    break
                rolled = pltpu.roll(rs, jnp.int32(sh), 0)
                rolled = jnp.where(sub_iota < sh, 0, rolled)
                rs = jnp.where((wo & jnp.int32(sh)) != jnp.int32(0), rolled, rs)
            frame = jnp.pad(frame, ((0, cap), (0, 0))) | rs
            blen = blen + rlen
        return frame, blen

    def emit(frame, blen):
        # content-proportional segment write in the splice's NATURAL (row,
        # lane) word layout: stream-order segment k's word w lands at
        # frames row k*SEG_SUB + (w>>7), lane w&127. One in-kernel transpose
        # turns the merge's per-lane word columns into lane-major rows;
        # 128-aligned static lane slices then store row granules. (The
        # previous (FRAME_W, 1) column output forced XLA to relayout 80 MB
        # through a degenerate-dim reduce — 13.8 ms at 256^3, round-5 trace.)
        frameT = jnp.transpose(frame, (1, 0))            # (128, cap)
        crows_cap = frame.shape[0] // 128
        for k in range(SEGS_PER_CHUNK):
            lane = _SEG_LANE[k]
            cw = (blen[0, lane] + jnp.int32(31)) >> jnp.int32(5)
            crows = (cw + jnp.int32(127)) >> jnp.int32(7)
            for r in range(min(SEG_SUB, crows_cap)):
                @pl.when(jnp.int32(r) < crows)
                def _():
                    frames_ref[k * SEG_SUB + r:k * SEG_SUB + r + 1, :] = \
                        frameT[lane:lane + 1, r * 128:(r + 1) * 128]
            cbits_ref[ci * SEGS_PER_CHUNK + k] = blen[0, lane]

    maxbits = jnp.max(bits, axis=1, keepdims=True)[0, 0]
    small = maxbits < jnp.int32(SMALL_W * 32)

    @pl.when(small)
    def _():
        frame, blen = merge(scan_rows(SMALL_W), bits)
        emit(frame, blen)

    @pl.when(jnp.logical_not(small))
    def _():
        frame, blen = merge(scan_rows(ROWBUF_W), bits)
        emit(frame, blen)             # rare worst-case class


def _pack_chunks(bins_bitrev, table_codes, table_lens, wlo, c0, nc):
    with jax.enable_x64(False):
        return pl.pallas_call(
            _pack_kernel,
            out_shape=(jax.ShapeDtypeStruct((nc * SEGS_PER_CHUNK * SEG_SUB,
                                             128), jnp.int32),
                       jax.ShapeDtypeStruct((nc * SEGS_PER_CHUNK,), jnp.int32)),
            grid=(nc,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ROW_ELEMS, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TBL_ROWS, 128), lambda c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TBL_ROWS, 128), lambda c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SEGS_PER_CHUNK * SEG_SUB, 128),
                             lambda c: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.VMEM((ROW_ELEMS, LANES), jnp.int32),
                            pltpu.VMEM((ROW_ELEMS, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret(),
        )(jnp.asarray(wlo, jnp.int32).reshape(1),
          jnp.asarray(c0, jnp.int32).reshape(2), bins_bitrev,
          table_codes, table_lens)


# ---- jit B kernel 2: global splice ----------------------------------------------


SPLICE_BATCH = 128                  # segments assembled in VMEM per grid step
ACC_ROWS = SPLICE_BATCH * SEG_SUB + 128   # batch accumulator (worst span +
                                          # start offset + rotation spill)
ACC_G = -(-ACC_ROWS // 128)         # 128-row output granules per batch
_RMW = (SEG_SUB + 1 + 7) // 8 * 8   # 8-aligned rows per segment RMW placement


def _splice_kernel(gw_ref, gbit_ref, cb_ref, frames_ref, _aliased_in,
                   out_hbm, acc_ref, vin, vout, sem_in, sem_out):
    """Batched splice: assemble SPLICE_BATCH segments at their bit offsets
    into a VMEM accumulator (pure vector ops, no per-segment DMA), then DMA
    the span out in 128-row granules — OR-RMW only for granule 0 (overlap
    with the previous batch's tail), pure writes beyond. Content-proportional:
    segment masking and the granule count derive from cbits, so the
    size-classed pack frames' garbage rows are never observed."""
    i32 = jnp.int32
    ci = pl.program_id(0)
    base = ci * jnp.int32(SPLICE_BATCH)
    abase = gw_ref[base] >> i32(7)  # out row of acc row 0 for this batch
    acc_ref[:] = jnp.zeros_like(acc_ref)
    lane_i = jax.lax.broadcasted_iota(i32, (SEG_SUB, 128), 1)
    sub_i = jax.lax.broadcasted_iota(i32, (SEG_SUB, 128), 0)
    widx = sub_i * i32(128) + lane_i
    lane_r = jax.lax.broadcasted_iota(i32, (SEG_SUB + 1, 128), 1)

    for s in range(SPLICE_BATCH):
        gws = gw_ref[base + jnp.int32(s)]
        gb = gbit_ref[base + jnp.int32(s)]
        cbs = cb_ref[base + jnp.int32(s)]

        @pl.when(cbs > 0)
        def _():
            f = frames_ref[s]                             # (SEG_SUB, 128)
            # mask garbage beyond content (size-classed frames)
            cw0 = (cbs + i32(31)) >> i32(5)
            f = jnp.where(widx < cw0, f, i32(0))
            # bit shift right by gb; previous word = lane-1 (wrapping to the
            # previous sublane's lane 127)
            a = pltpu.roll(f, i32(1), 1)
            b2 = pltpu.roll(a, i32(1), 0)
            prev = jnp.where(lane_i == 0, b2, a)
            prev = jnp.where((lane_i == 0) & (sub_i == 0), 0, prev)
            fs = _shr32(f, gb) | _shl32(prev, i32(32) - gb)
            # place at word offset rel within the accumulator: rotate by
            # rel&127 lanes (wrapped lanes land one sublane down), rows at
            # rel>>7
            rel = gws - (abase << i32(7))
            gl = rel & i32(127)
            rot = pltpu.roll(fs, gl, 1)
            down = jnp.pad(rot, ((1, 0), (0, 0)))[:-1, :]
            keep = jnp.pad(rot, ((0, 1), (0, 0)))
            down = jnp.pad(down, ((0, 1), (0, 0)))
            region = jnp.where(lane_r < gl, down, keep)
            region = jnp.pad(region, ((0, _RMW - (SEG_SUB + 1)), (0, 0)))
            rr = rel >> i32(7)
            cur = acc_ref[pl.ds(rr, _RMW), :]
            acc_ref[pl.ds(rr, _RMW), :] = cur | region

    # span of this batch in 128-row granules (last segment's end)
    last = base + jnp.int32(SPLICE_BATCH - 1)
    end_w = gw_ref[last] + ((gbit_ref[last] + cb_ref[last] + i32(31)) >> i32(5))
    span_g = (end_w - (abase << i32(7)) + i32(128 * 128 - 1)) >> i32(14)

    for g in range(ACC_G):
        @pl.when(i32(g) < span_g)
        def _():
            if g == 0:
                # overlaps the previous batch's tail: OR-RMW
                cp_in = pltpu.make_async_copy(
                    out_hbm.at[pl.ds(abase, 128), :], vin, sem_in)
                cp_in.start()
                cp_in.wait()
                vout[:] = vin[:] | acc_ref[0:128, :]
                cp_out = pltpu.make_async_copy(
                    vout, out_hbm.at[pl.ds(abase, 128), :], sem_out)
                cp_out.start()
                cp_out.wait()
            else:
                cp_out = pltpu.make_async_copy(
                    acc_ref.at[pl.ds(g * 128, 128), :],
                    out_hbm.at[pl.ds(abase + i32(g * 128), 128), :], sem_out)
                cp_out.start()
                cp_out.wait()


def _splice(frames, gw, gbit, cb, out_zeros, nbatches):
    with jax.enable_x64(False):
        return pl.pallas_call(
            _splice_kernel,
            out_shape=jax.ShapeDtypeStruct(out_zeros.shape, jnp.int32),
            grid=(nbatches,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((SPLICE_BATCH, SEG_SUB, 128),
                             lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # aliased output buffer
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((ACC_ROWS, 128), jnp.int32),
                            pltpu.VMEM((128, 128), jnp.int32),
                            pltpu.VMEM((128, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=_interpret(),
        )(gw, gbit, cb, frames, out_zeros)


def _exclusive_prefix_bits(cbits):
    """Exclusive prefix sum of the per-segment bit counts, in int64.

    jnp.cumsum(int64) lowers to an emulated-int64 reduce that measured
    ~13 ms at 256^3 on real hardware (round-5 xplane trace) — for a
    4k-element scan. Two-level instead: an int32 log-shift scan within
    128-lane rows (per-row totals <= 128 segs * 2*SEG_W*32 bits < 2^31),
    then a row-offset cumsum on the (tiny) row-total vector in int64."""
    n = cbits.shape[0]
    rows = -(-n // 128)
    c2 = jnp.pad(cbits, (0, rows * 128 - n)).reshape(rows, 128)
    s = c2
    for sh in (1, 2, 4, 8, 16, 32, 64):
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        s = s + jnp.where(lane >= sh, jnp.roll(s, sh, axis=1), 0)
    row_tot = s[:, -1].astype(jnp.int64)                 # (rows,) inclusive
    row_off = jnp.cumsum(row_tot) - row_tot              # tiny int64 scan
    incl = s.astype(jnp.int64) + row_off[:, None]
    excl = incl - c2.astype(jnp.int64)
    return excl.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("nc", "out_sub"))
def pack_bits(bins_padded, table_codes, table_lens, wlo, c0, nc: int,
              out_sub: int):
    """bins_padded (Mp,) stream order -> (packed words (out_sub,128) i32 with
    stream bit 0 at the MSB of word 0, per-chunk bit counts (nc,))."""
    # bit-reversed lane arrangement: element c*CHUNK + bitrev7(l)*64 + t
    # lands at [c, t, l] (pure transpose: split the row index into 7 bit axes
    # and reverse them)
    x = bins_padded.reshape((nc,) + (2,) * 7 + (ROW_ELEMS,))
    x = jnp.transpose(x, (0, 8, 7, 6, 5, 4, 3, 2, 1))
    bins_bitrev = x.reshape(nc * ROW_ELEMS, LANES)

    frames, cbits = _pack_chunks(bins_bitrev, table_codes, table_lens, wlo,
                                 c0, nc)
    goff = _exclusive_prefix_bits(cbits)
    gw = (goff >> 5).astype(jnp.int32)
    gbit = (goff & 31).astype(jnp.int32)
    nseg = nc * SEGS_PER_CHUNK
    npad = (-nseg) % SPLICE_BATCH
    frames3 = frames.reshape(nseg, SEG_SUB, 128)
    if npad:
        frames3 = jnp.pad(frames3, ((0, npad), (0, 0), (0, 0)))
        end_w = ((goff[-1] + cbits[-1].astype(jnp.int64) + 31) >> 5
                 ).astype(jnp.int32)
        gw = jnp.concatenate([gw, jnp.full((npad,), 1, jnp.int32) * end_w])
        gbit = jnp.pad(gbit, (0, npad))
        cb = jnp.pad(cbits, (0, npad))
    else:
        cb = cbits
    out = jnp.zeros((out_sub, 128), jnp.int32)
    out = _splice(frames3, gw, gbit, cb, out,
                  (nseg + npad) // SPLICE_BATCH)
    return out, cbits
