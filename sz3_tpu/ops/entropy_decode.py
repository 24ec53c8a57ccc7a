"""Device-resident Huffman entropy DECODE (speculative parallel bit-walk).

The reference decodes its MSB-first Huffman stream with a sequential
table/tree walk (HuffmanEncoder.hpp:225-279). A TPU needs data parallelism,
and the stream has no chunk markers, so this module uses speculative
self-synchronizing windows (the GPU "gap array" family of algorithms,
adapted to the VPU's no-gather constraint):

  * the stream is split into fixed 1024-bit WINDOWS; each window starts
    decoding 64 bits EARLY (the runway, inside the previous window) from
    bit-phase zero. Huffman codes self-synchronize: within a few symbols the
    speculative walk lands on the true symbol lattice, so by the time it
    crosses into its own range it (almost surely) observes the true
    boundaries. Each window records its first boundary >= its start (its
    ENTRY), its first boundary >= its end (its EXIT), its decoded symbols,
    and how many of them precede the entry (the skip count).
  * host validation: exit[i] == entry[i+1] for every i proves, by induction
    from window 0 (whose entry is pinned to the true stream start), that
    every window decoded the true symbol sequence — no sync assumption is
    part of the CORRECTNESS argument, only of the fast path. Mismatched
    windows are re-decoded from their true entry (same kernel; their rows
    are merged back with a device-side select — the padded symbol arrays
    never cross the PCIe/tunnel link) until the chain is stable.
  * a second kernel compacts the per-window symbol runs (skip..skip+n) into
    the dense archive-order bin stream at their exclusive prefix offsets —
    the same VMEM-accumulator + granule-DMA scheme as the encode splice,
    on int32 symbols instead of bits.

Symbol resolution: a direct 11-bit table resolves short codes (the vast
majority of stream symbols); longer codes resolve by a 13-step Eytzinger
binary search over the sorted left-aligned deep codewords (a prefix-free
code's left-aligned codewords partition the 32-bit window space, so the
predecessor rank IS the symbol) — universal for any tree with <= 8191 deep
codes and codes <= 32 bits (the encoder's own format gate), no
escape-capacity cliffs. Per-level pivot fetches are take_along_axis
lane-gathers within one vreg; only levels 8-11 need short where-chains.

The per-window word FETCH cannot gather (per-lane dynamic row reads don't
vectorize on the VPU); instead each window's words sit in a per-lane column
of a shift-REGISTER tile that rolls up one row when that lane consumes a
word — a conditional roll+select, the kernel's main data movement.

Wire format: encoder/HuffmanEncoder.hpp:135-218 (MSB-first, big-endian
words); payload framing SZGenericCompressor.hpp:65-84 (opened by
szt_open_packed without the host bit-walk).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

import time as _time

# Diagnostics from the most recent decode_stream call (pass count, per-pass
# walls, redo-window counts) — read by bench.py to attribute decode time.
last_stats: dict = {}

# ---- geometry -----------------------------------------------------------------

W_BITS = 1024                       # window payload bits
W_WORDS = W_BITS // 32              # 32
RUN_BITS = 64                       # runway: early start for self-sync
RUN_WORDS = RUN_BITS // 32          # 2
SPILL_WORDS = 2                     # max code (24b) spill past the end + slack
TILE_W = RUN_WORDS + W_WORDS + SPILL_WORDS   # 36 words per window column
GROUPS = 8
BWIN = GROUPS * 128                 # windows per batch (1024)

L1_BITS = 11
L1_ROWS = (1 << L1_BITS) // 128        # 16
ESC = 63                            # len-field marker for escape entries
MAX_EYT_LEVELS = 13                 # binary-search depth cap: <= 8191 deep
                                    # codes (actual depth adapts to the
                                    # stream's deep-code count — the pivot +
                                    # symbol chains are the kernel's dominant
                                    # per-step cost, round-5 profile)
MAXLEN = 32                         # encoder format gate; full coverage

CAP_CLASSES = (384, 512, 640, 1152)  # scan steps (multiples of 128)


def _interpret() -> bool:
    import os
    if os.environ.get("SZT_JAX_DEVICE", "") == "cpu":
        return True
    return jax.default_backend() != "tpu"


class DecodeFallback(Exception):
    """Tree outside the device decode profile; use the host bit-walk."""


# ---- host: decode tables -------------------------------------------------------

def build_decode_tables(codes: np.ndarray, lens: np.ndarray, offset: int):
    """Exported (code,len) table -> device lookup structures.

    Returns (l1, eyt, deep, cap, eyt_levels):
      l1   (16,128) i32: 11-bit direct table; resolved = (sym<<6)|len,
           escape = ESC in the len field
      eyt  i32: Eytzinger pivot tree over the sorted LEFT-ALIGNED deep
           (len>11) codewords, in the signed-compare domain
           (x ^ 0x80000000); slot t of the 1-indexed heap at [t>>7, t&127]
      deep i32: (sym<<6)|len by sorted-codeword rank
      cap: scan step class from the shortest code length
      eyt_levels: search depth (adaptive: ceil(log2(ndeep+1)))
    """
    present = np.nonzero(lens > 0)[0]
    L = lens[present].astype(np.int64)
    C = codes[present].astype(np.int64)
    syms = present + offset
    if L.max() > MAXLEN:
        raise DecodeFallback(f"huffman code length {int(L.max())} > {MAXLEN}")
    lmin = int(L.min())
    need = (RUN_BITS + W_BITS) // max(lmin, 1) + 2
    cap = next((c for c in CAP_CLASSES if c >= need), None)
    if cap is None:
        raise DecodeFallback("scan cap exceeded")

    l1 = np.zeros(1 << L1_BITS, np.int32)
    short = L <= L1_BITS
    for c, ln, sy in zip(C[short], L[short], syms[short]):
        c, ln, sy = int(c), int(ln), int(sy)
        lo = c << (L1_BITS - ln)
        l1[lo:lo + (1 << (L1_BITS - ln))] = (sy << 6) | ln
    deepm = ~short
    ndeep = int(deepm.sum())
    if ndeep >= (1 << MAX_EYT_LEVELS):
        raise DecodeFallback(
            f"{ndeep} deep codes exceed {(1 << MAX_EYT_LEVELS) - 1}")
    # adaptive search depth: the pivot chain above level 7 and the rank ->
    # symbol chain both scale with 2^levels — size them to the real tree
    eyt_levels = max(1, int(np.ceil(np.log2(ndeep + 2))))
    DEEP_CAP = 1 << eyt_levels
    DEEP_ROWS = max(1, DEEP_CAP // 128)
    # escape markers for every deep 12-bit prefix
    for p in np.unique(C[deepm] >> (L[deepm] - L1_BITS)):
        l1[int(p)] = ESC
    # sorted left-aligned deep codewords, signed-compare domain
    cl = ((C[deepm].astype(np.uint64) << (32 - L[deepm]).astype(np.uint64))
          & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    order = np.argsort(cl, kind="stable")
    cl = cl[order]
    dsym = syms[deepm][order]
    dlen = L[deepm][order]
    deep = np.zeros(DEEP_CAP, np.int32)
    deep[:ndeep] = (dsym.astype(np.int64) << 6) | dlen
    if ndeep:
        # Rank overshoot guard: the pad pivots are INT32_MAX in the signed
        # domain and the search routes RIGHT on equality (wu >= piv), so an
        # all-ones window under a deep escape prefix ranks past the real
        # codes. Pad the entry table with the LAST real code instead of
        # len-0 zeros: the lane keeps consuming bits and the speculative
        # window validation rejects any wrong decode — instead of stalling
        # through all passes into DecodeFallback (pathological latency).
        deep[ndeep:] = deep[ndeep - 1]
    # pivots padded with +inf so the search routes left past the real codes
    piv = np.full(DEEP_CAP, 0xFFFFFFFF, np.uint64)
    piv[:ndeep] = cl
    piv_signed = (piv.astype(np.int64) - 0x80000000).astype(np.int32)
    eyt = np.zeros(DEEP_CAP, np.int32)

    def build(t, lo, hi):  # Eytzinger layout of piv_signed[lo:hi)
        if t >= DEEP_CAP or lo >= hi:
            return
        mid = (lo + hi) // 2
        eyt[t] = piv_signed[mid]
        build(2 * t, lo, mid)
        build(2 * t + 1, mid + 1, hi)

    import sys
    rec = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    build(1, 0, DEEP_CAP - 1)
    sys.setrecursionlimit(rec)
    # tables under one vreg row still ship as (1,128)
    pad128 = max(0, 128 - DEEP_CAP)
    return (jnp.asarray(l1.reshape(L1_ROWS, 128)),
            jnp.asarray(np.pad(eyt, (0, pad128)).reshape(DEEP_ROWS, 128)),
            jnp.asarray(np.pad(deep, (0, pad128)).reshape(DEEP_ROWS, 128)),
            cap, eyt_levels)


def _eyt_rank_np(eyt_flat: np.ndarray, w_signed: int, eyt_levels: int) -> int:
    """Numpy reference of the kernel's search: predecessor count of w among
    the pivots (exclusive upper rank)."""
    t = 1
    for _ in range(eyt_levels):
        ge = 1 if w_signed >= eyt_flat[t] else 0
        t = 2 * t + ge
    # standard Eytzinger: subtracting the leaf base after recording the path
    # of >= decisions yields the insertion point
    return t - (1 << eyt_levels)


# ---- kernel helpers ------------------------------------------------------------

def _shr32(x, n):
    xu = x.astype(jnp.uint32)
    nc = jnp.clip(n, jnp.int32(0), jnp.int32(31)).astype(jnp.uint32)
    ok = (n >= jnp.int32(0)) & (n < jnp.int32(32))
    return jnp.where(ok, (xu >> nc).astype(jnp.int32), jnp.int32(0))


def _shl32(x, n):
    xu = x.astype(jnp.uint32)
    nc = jnp.clip(n, jnp.int32(0), jnp.int32(31)).astype(jnp.uint32)
    ok = (n >= jnp.int32(0)) & (n < jnp.int32(32))
    return jnp.where(ok, (xu << nc).astype(jnp.int32), jnp.int32(0))


def _chain(idx, tref):
    """Table lookup over (rows,128) via per-row lane-gathers (no real
    gathers on TPU; take_along_axis is legal within one vreg's lanes)."""
    i32 = jnp.int32
    lane = idx & i32(127)
    row = idx >> i32(7)
    acc = jnp.zeros_like(idx)
    for s in range(tref.shape[0]):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(tref[s, :][None, :], idx.shape), lane, axis=1)
        acc = jnp.where(row == i32(s), cand, acc)
    return acc


def _next_words(reg):
    """(GROUPS,128) row 0 of every group band."""
    return jnp.concatenate(
        [reg[g * TILE_W:g * TILE_W + 1, :] for g in range(GROUPS)], axis=0)


def _pop_bands(reg_ref, need):
    """Conditionally roll each group band up one row (lanes in `need`)."""
    i32 = jnp.int32
    for g in range(GROUPS):
        band = reg_ref[g * TILE_W:(g + 1) * TILE_W, :]
        rolled = pltpu.roll(band, i32(TILE_W - 1), 0)
        reg_ref[g * TILE_W:(g + 1) * TILE_W, :] = jnp.where(
            need[g:g + 1, :], rolled, band)


# ---- speculative scan kernel ---------------------------------------------------
#
# grid = (nbatches, CAP): minor axis = symbol step; per-window state lives in
# VMEM scratch that persists across the CAP steps of one batch (initialized
# at t == 0). Mosaic runs grid steps sequentially on the core.

def _eyt_lookup(t, eyt_ref, k):
    """Pivot fetch E[t] for search level k (t in [2^k, 2^(k+1)))."""
    i32 = jnp.int32
    lane = t & i32(127)
    if (1 << (k + 1)) <= 128:
        return jnp.take_along_axis(
            jnp.broadcast_to(eyt_ref[0, :][None, :], t.shape), lane, axis=1)
    r0 = (1 << k) >> 7
    r1 = (1 << (k + 1)) >> 7
    if r1 - r0 == 1:
        return jnp.take_along_axis(
            jnp.broadcast_to(eyt_ref[r0, :][None, :], t.shape), lane, axis=1)
    row = t >> i32(7)
    acc = jnp.zeros_like(t)
    for r in range(r0, r1):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(eyt_ref[r, :][None, :], t.shape), lane, axis=1)
        acc = jnp.where(row == i32(r), cand, acc)
    return acc


SCAN_UNROLL = 8   # symbol steps folded into one grid step: grid-step
                  # dispatch and the state-ref round-trips amortize 8x
                  # (34.5k steps at ~11 us/step dominated pass 1, round 5)


def _scan_kernel(entries_ref, ends_ref, words_ref, l1_ref, eyt_ref, deep_ref,
                 syms_ref, entry_out_ref, exit_ref, nskip_ref, nout_ref,
                 reg, hi_s, lo_s, nbits_s, pos_s, done_s, entry_s, exit_s,
                 skip_s, nout_s, *, eyt_levels: int):
    i32 = jnp.int32
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        reg[:] = words_ref[:]                     # (GROUPS*TILE_W, 128)
        e = entries_ref[:]                        # runway-relative start bit
        # skip e>>5 whole words (0..3: straggler entries reach RUN+32+32)
        k = e >> i32(5)
        for j in (1, 2):
            for g in range(GROUPS):
                band = reg[g * TILE_W:(g + 1) * TILE_W, :]
                rolled = pltpu.roll(band, i32(TILE_W - j), 0)
                reg[g * TILE_W:(g + 1) * TILE_W, :] = jnp.where(
                    (k[g:g + 1, :] & i32(j)) != 0, rolled, band)
        w0 = _next_words(reg)
        eb = e & i32(31)
        # assemble the 64-bit buffer pre-shifted so the next symbol starts
        # at the MSB of hi
        w1 = jnp.concatenate(
            [reg[g * TILE_W + 1:g * TILE_W + 2, :] for g in range(GROUPS)],
            axis=0)
        hi = jnp.where(eb == 0, w0, _shl32(w0, eb) | _shr32(w1, i32(32) - eb))
        lo = _shl32(w1, eb)
        hi_s[:] = hi
        lo_s[:] = lo
        nbits_s[:] = i32(64) - eb
        pos_s[:] = e
        ends = ends_ref[:]
        done0 = e >= ends
        done_s[:] = done0.astype(i32)
        entry_s[:] = jnp.where(done0, e, i32(-1))
        exit_s[:] = jnp.where(done0, e, i32(-1))
        z = jnp.zeros((GROUPS, 128), jnp.int32)
        skip_s[:] = z
        nout_s[:] = z
        # pop the two consumed rows of every band
        ones = jnp.ones((GROUPS, 128), jnp.bool_)
        _pop_bands(reg, ones)
        _pop_bands(reg, ones)

    # load the per-window state ONCE per grid step; SCAN_UNROLL symbol steps
    # run on values; state stores once at the end
    hi = hi_s[:]
    lo = lo_s[:]
    nbits = nbits_s[:]
    pos = pos_s[:]
    done = done_s[:]
    entry = entry_s[:]
    exit_v = exit_s[:]
    skip = skip_s[:]
    nout = nout_s[:]
    ends = ends_ref[:]

    for u in range(SCAN_UNROLL):
        active = done == 0
        w32 = hi
        # short codes: direct 11-bit table
        idx1 = _shr32(w32, i32(32 - L1_BITS))
        e1 = _chain(idx1, l1_ref)
        ln = e1 & i32(63)
        sym = e1 >> i32(6)
        esc = ln == i32(ESC)
        # deep codes: predecessor rank of the 32-bit window among the sorted
        # left-aligned deep codewords (signed-compare domain)
        wu = w32 ^ i32(-0x80000000)
        tt = jnp.ones_like(w32)
        for k in range(eyt_levels):
            piv = _eyt_lookup(tt, eyt_ref, k)
            tt = tt * i32(2) + (wu >= piv).astype(i32)
        rank = tt - i32(1 << eyt_levels)      # insertion point among pivots
        de = _chain(jnp.maximum(rank - i32(1), i32(0)), deep_ref)
        sym = jnp.where(esc, de >> i32(6), sym)
        ln = jnp.where(esc, de & i32(63), ln)

        # emit (garbage rows for inactive lanes; skip/nout delimit validity)
        syms_ref[u * GROUPS:(u + 1) * GROUPS, :] = sym

        newpos = pos + ln
        # runway symbols: start before RUN_BITS
        pre = active & (pos < i32(RUN_BITS))
        skip = skip + pre.astype(i32)
        # entry = first boundary >= RUN_BITS: either the end of the symbol
        # that crosses it, or the start of a symbol sitting exactly on/after
        first_in = active & pre & (newpos >= i32(RUN_BITS)) & (entry < 0)
        start_on = active & jnp.logical_not(pre) & (entry < 0)
        entry = jnp.where(first_in, newpos,
                          jnp.where(start_on, pos, entry))
        crossed = active & (newpos >= ends)
        exit_v = jnp.where(crossed, newpos, exit_v)
        done = jnp.where(crossed, i32(1), done)
        nout = nout + (active & jnp.logical_not(pre)).astype(i32)
        pos = jnp.where(active, newpos, pos)

        # consume ln bits, refill one word when below 33 valid bits
        lne = jnp.where(active, ln, i32(0))
        hi = jnp.where(lne == 0, hi,
                       _shl32(hi, lne) | _shr32(lo, i32(32) - lne))
        lo = _shl32(lo, lne)
        nbits = nbits - lne
        need = active & (nbits <= i32(32))
        w = _next_words(reg)
        hi = jnp.where(need & (nbits < i32(32)), hi | _shr32(w, nbits), hi)
        lo = jnp.where(need,
                       jnp.where(nbits == i32(32), lo | w,
                                 lo | _shl32(w, i32(32) - nbits)), lo)
        _pop_bands(reg, need)
        nbits = nbits + jnp.where(need, i32(32), i32(0))

    hi_s[:] = hi
    lo_s[:] = lo
    nbits_s[:] = nbits
    pos_s[:] = pos
    done_s[:] = done
    entry_s[:] = entry
    exit_s[:] = exit_v
    skip_s[:] = skip
    nout_s[:] = nout

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        entry_out_ref[:] = entry
        exit_ref[:] = exit_v
        nskip_ref[:] = skip
        nout_ref[:] = nout


@functools.partial(jax.jit, static_argnames=("nb", "cap", "eyt_levels"))
def _scan(words, entries, ends, l1, eyt, deep, nb: int, cap: int,
          eyt_levels: int):
    deep_rows = deep.shape[0]
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_scan_kernel, eyt_levels=eyt_levels),
            out_shape=(
                jax.ShapeDtypeStruct((nb * cap * GROUPS, 128), jnp.int32),
                jax.ShapeDtypeStruct((nb * GROUPS, 128), jnp.int32),
                jax.ShapeDtypeStruct((nb * GROUPS, 128), jnp.int32),
                jax.ShapeDtypeStruct((nb * GROUPS, 128), jnp.int32),
                jax.ShapeDtypeStruct((nb * GROUPS, 128), jnp.int32),
            ),
            grid=(nb, cap // SCAN_UNROLL),
            in_specs=[
                pl.BlockSpec((GROUPS, 128), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUPS, 128), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUPS * TILE_W, 128), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L1_ROWS, 128), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((deep_rows, 128), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((deep_rows, 128), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((SCAN_UNROLL * GROUPS, 128),
                             lambda b, t, capu=cap // SCAN_UNROLL:
                             (b * capu + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUPS, 128), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUPS, 128), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUPS, 128), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUPS, 128), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((GROUPS * TILE_W, 128), jnp.int32)] +
                           [pltpu.VMEM((GROUPS, 128), jnp.int32)] * 9,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret(),
        )(entries, ends, words, l1, eyt, deep)


# ---- symbol compaction ---------------------------------------------------------

COMPACT_BATCH = 128


def _compact_kernel(off_ref, skip_ref, n_ref, syms_ref, _aliased,
                    out_hbm, acc, vin, vout, sem_in, sem_out, *, capr: int):
    """Place each window's owned symbols (elements skip..skip+n of its
    row-major tile) at its exclusive prefix offset. Same accumulator +
    granule scheme as the encode splice, on int32 elements."""
    i32 = jnp.int32
    abase = off_ref[0, 0, 0] >> i32(7)
    acc[:] = jnp.zeros_like(acc)
    # Mosaic's dynamic sublane rotate requires an 8-aligned sublane count
    # (vector<3x128> fails "unsupported unaligned shape" on real hardware):
    # work on a zero-padded (padr,128) tile. Wrapped rows are never consumed:
    # every valid element has source index eidx+sk < cap, i.e. source row
    # <= capr-1 < padr (and capr <= padr-1 for the +1 carry row, since
    # CAP_CLASSES give capr in {3,4,5,9} -> padr in {8,8,8,16}).
    padr = (capr + 7) // 8 * 8
    lane_i = jax.lax.broadcasted_iota(i32, (padr, 128), 1)
    sub_i = jax.lax.broadcasted_iota(i32, (padr, 128), 0)
    eidx = sub_i * i32(128) + lane_i
    lane_r = jax.lax.broadcasted_iota(i32, (padr + 1, 128), 1)
    pad_to = (padr + 1 + 7) // 8 * 8

    for s in range(COMPACT_BATCH):
        o = off_ref[0, 0, s]
        sk = skip_ref[0, 0, s]
        n = n_ref[0, 0, s]

        @pl.when(n > 0)
        def _():
            tile = syms_ref[s * capr:(s + 1) * capr, :]
            tile = jnp.pad(tile, ((0, padr - capr), (0, 0)))
            # drop the first `sk` elements: element e <- tile[e + sk]
            skl = sk & i32(127)
            skr = sk >> i32(7)
            rot = pltpu.roll(tile, i32(128) - skl, 1)   # lane l <- (l+skl)%128
            a = pltpu.roll(rot, i32(padr) - skr, 0)     # row r <- r+skr
            b = pltpu.roll(rot, i32(padr) - skr - i32(1), 0)
            comp = jnp.where(lane_i < i32(128) - skl, a, b)
            comp = jnp.where(skl == 0, a, comp)
            comp = jnp.where(eidx < n, comp, i32(0))
            # place at offset o: rotate right by o&127, rows down by o>>7
            rel = o - (abase << i32(7))
            gl = rel & i32(127)
            rr = rel >> i32(7)
            rot2 = pltpu.roll(comp, gl, 1)
            down = jnp.pad(rot2, ((1, 0), (0, 0)))[:-1, :]
            keep = jnp.pad(rot2, ((0, 1), (0, 0)))
            down = jnp.pad(down, ((0, 1), (0, 0)))
            region = jnp.where(lane_r < gl, down, keep)
            region = jnp.pad(region, ((0, pad_to - (padr + 1)), (0, 0)))
            cur = acc[pl.ds(rr, pad_to), :]
            acc[pl.ds(rr, pad_to), :] = cur | region

    end_e = off_ref[0, 0, COMPACT_BATCH - 1] + n_ref[0, 0, COMPACT_BATCH - 1]
    span_g = (end_e - (abase << i32(7)) + i32(128 * 128 - 1)) >> i32(14)
    for g in range(acc.shape[0] // 128):
        @pl.when(i32(g) < span_g)
        def _():
            if g == 0:
                cp_in = pltpu.make_async_copy(
                    out_hbm.at[pl.ds(abase, 128), :], vin, sem_in)
                cp_in.start()
                cp_in.wait()
                vout[:] = vin[:] | acc[0:128, :]
                cp_out = pltpu.make_async_copy(
                    vout, out_hbm.at[pl.ds(abase, 128), :], sem_out)
                cp_out.start()
                cp_out.wait()
            else:
                cp = pltpu.make_async_copy(
                    acc.at[pl.ds(g * 128, 128), :],
                    out_hbm.at[pl.ds(abase + i32(g * 128), 128), :], sem_out)
                cp.start()
                cp.wait()


@functools.partial(jax.jit, static_argnames=("nbatches", "capr"))
def _compact(symsT, off, skip, n, out_zeros, nbatches: int, capr: int):
    acc_rows = (COMPACT_BATCH * capr + 256 + 127) // 128 * 128
    kern = functools.partial(_compact_kernel, capr=capr)
    # Block the scalar streams per grid step: whole-array SMEM residency is
    # 3 x nwinp x 4 B and blows the 1 MB SMEM budget at 256^3 (~74k windows;
    # real-hardware OOM, round 4). 1D SMEM operands carry an XLA T(1024)
    # tiling that rejects 128-wide blocks, so they ride as (nbatches, 128)
    # rows with one row per step.
    off = off.reshape(nbatches, 1, COMPACT_BATCH)
    skip = skip.reshape(nbatches, 1, COMPACT_BATCH)
    n = n.reshape(nbatches, 1, COMPACT_BATCH)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_zeros.shape, jnp.int32),
            grid=(nbatches,),
            in_specs=[
                pl.BlockSpec((1, 1, COMPACT_BATCH), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, COMPACT_BATCH), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, COMPACT_BATCH), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((COMPACT_BATCH * capr, 128), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((acc_rows, 128), jnp.int32),
                            pltpu.VMEM((128, 128), jnp.int32),
                            pltpu.VMEM((128, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret(),
        )(off, skip, n, symsT, out_zeros)


# ---- orchestration -------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nwin", "nb"))
def _window_tiles(words, nwin: int, nb: int):
    """Stream words (W,) -> per-window TILE_W-word columns, grouped
    (nb * GROUPS * TILE_W, 128): window w = b*1024 + g*128 + l has its words
    at rows [(b*GROUPS + g) * TILE_W + j], lane l, covering stream words
    [w*W_WORDS - RUN_WORDS, w*W_WORDS + W_WORDS + SPILL_WORDS)."""
    nwinp = nb * BWIN
    w = jnp.pad(words[:nwin * W_WORDS].reshape(nwin, W_WORDS),
                ((0, nwinp - nwin), (0, 0)))
    run = jnp.pad(w[:-1, -RUN_WORDS:], ((1, 0), (0, 0)))   # prev window tail
    nxt = jnp.pad(w[1:, :SPILL_WORDS], ((0, 1), (0, 0)))   # next window head
    t = jnp.concatenate([run, w, nxt], axis=1)             # (nwinp, TILE_W)
    t = t.reshape(nb, GROUPS, 128, TILE_W)
    t = jnp.transpose(t, (0, 1, 3, 2))                     # (nb, G, TILE_W, 128)
    return t.reshape(nb * GROUPS * TILE_W, 128)


@functools.partial(jax.jit, static_argnames=("nb", "cap", "capr"))
def _to_window_major(syms, nb: int, cap: int, capr: int):
    s = syms.reshape(nb, cap, GROUPS, 128)
    s = jnp.transpose(s, (0, 2, 3, 1))                  # (nb, G, 128, cap)
    return s.reshape(nb * BWIN * capr, 128)


HOST_REDO_MAX = 256       # redo sets at/below this size repair on the host
HOST_REDO_BUDGET = 4096   # total host window decodes before falling back


def _host_repair(bits: bytes, total_bits: int, codes, lens, offset: int,
                 final: dict, wstarts, nwin: int) -> dict:
    """Decode the mis-speculated windows on the host, with the device scan's
    exact chain semantics, until the entry/exit chain closes. Mutates
    `final` (runway-relative entry/exit, nskip, nout) and returns
    {window_index: np.ndarray of symbols} for the dense-output patch.

    A window decoded from its TRUE entry bit has entry == want by
    construction and nskip == 0 (the true entry is never inside the runway:
    the previous window's exit is >= this window's start). Corrections
    propagate at most one window per round — the loop re-validates after
    each batch and is budget-bounded."""
    lens_np = np.asarray(lens)
    codes_np = np.asarray(codes)
    present = np.nonzero(lens_np > 0)[0]
    table = {(int(lens_np[i]), int(codes_np[i])): int(i + offset)
             for i in present}
    maxlen = int(lens_np[present].max())
    nbytes = len(bits)
    patches: dict = {}
    decoded = 0
    for _round in range(HOST_REDO_BUDGET):
        exit_abs = wstarts + final["exit"] - RUN_BITS
        entry_abs = wstarts + final["entry"] - RUN_BITS
        want = np.empty(nwin, np.int64)
        want[0] = 0
        want[1:] = exit_abs[:-1]
        bad = np.nonzero(want != entry_abs)[0]
        if bad.size == 0:
            return patches
        for w in bad:
            decoded += 1
            if decoded > HOST_REDO_BUDGET:
                raise DecodeFallback("host straggler repair budget exceeded")
            ws = int(wstarts[w])
            end_abs = min(ws + W_BITS, total_bits)
            pos = int(want[w])
            if pos < ws or pos >= end_abs + 33:
                raise DecodeFallback("host repair entry out of range")
            syms_w = []
            if pos < end_abs:
                # one big-int view of the window span (+spill for the
                # crossing code); reads past the stream see zero padding
                b0 = pos // 8
                b1 = min(nbytes, (end_abs + maxlen) // 8 + 1)
                chunk = bits[b0:b1] + b"\x00" * 8
                big = int.from_bytes(chunk, "big")
                bigbits = len(chunk) * 8
                base = b0 * 8
                while pos < end_abs:
                    cur = 0
                    ln = 0
                    while True:
                        bit = (big >> (bigbits - 1 - (pos + ln - base))) & 1
                        cur = (cur << 1) | bit
                        ln += 1
                        sym = table.get((ln, cur))
                        if sym is not None:
                            break
                        if ln > maxlen:
                            raise DecodeFallback("host repair: bad code")
                    syms_w.append(sym)
                    pos += ln
            final["entry"][w] = int(want[w]) - ws + RUN_BITS
            final["exit"][w] = pos - ws + RUN_BITS
            final["nskip"][w] = 0
            final["nout"][w] = len(syms_w)
            patches[w] = np.asarray(syms_w, np.int64)
    raise DecodeFallback("host straggler repair failed to converge")


@functools.partial(jax.jit, static_argnames=("capr1", "caprF"))
def _pad_capr(symsT, capr1: int, caprF: int):
    """Window-major symbol rows (nwinp*capr1,128) -> (nwinp*caprF,128)."""
    n = symsT.shape[0] // capr1
    s = symsT.reshape(n, capr1, 128)
    return jnp.pad(s, ((0, 0), (0, caprF - capr1), (0, 0))).reshape(-1, 128)


@functools.partial(jax.jit, static_argnames=("nb2",))
def _gather_tiles(words, im, nb2: int):
    """Compact window tiles for a rescan set: im (nbad_p, TILE_W) word
    indices (negative = before stream start -> zero)."""
    nw = words.shape[0]
    wd = jnp.where(im >= 0, words[jnp.clip(im, 0, nw - 1)], jnp.int32(0))
    t = wd.reshape(nb2, GROUPS, 128, TILE_W)
    t = jnp.transpose(t, (0, 1, 3, 2))
    return t.reshape(nb2 * GROUPS * TILE_W, 128)


@functools.partial(jax.jit, static_argnames=("caprF",))
def _scatter_rows(symsT, src, rows, caprF: int):
    return symsT.at[rows].set(src)


def decode_stream(bits: bytes, count: int, codes, lens, offset: int,
                  max_passes: int = 12):
    """Huffman stream bytes -> dense archive-order bins: a device array
    (rows,128) i32 whose first `count` row-major elements are the decoded
    symbols. Raises DecodeFallback outside the device profile or when the
    speculative chain cannot stabilize.

    Pass structure (round 5): pass 1 scans ALL windows at a cap sized to the
    stream's AVERAGE code length (x1.3 headroom); windows that mis-speculate
    OR overflow that cap (exit still -1) join the redo set. Later passes
    rescan ONLY the redo set — their tiles gather into a compact batch — at
    the worst-case cap, so a 17% pass-1 failure rate costs 17% of a pass,
    not another full pass. Tiny residues repair on the host."""
    l1, eyt, deep, cap_full, eyt_levels = build_decode_tables(
        codes, lens, offset)
    caprF = cap_full // 128
    nbytes = len(bits)
    total_bits = nbytes * 8
    nwin = max(1, -(-total_bits // W_BITS))
    if nwin < 64:
        raise DecodeFallback("stream too small for the window kernel")
    nb = -(-nwin // BWIN)
    nwinp = nb * BWIN

    avg = max(1.0, total_bits / max(count, 1))
    need1 = int((RUN_BITS + W_BITS) / avg * 1.3) + 16
    cap1 = next((c for c in CAP_CLASSES if c >= need1), cap_full)
    cap1 = min(cap1, cap_full)
    capr1 = cap1 // 128

    pad = (-nbytes) % 4
    words_np = np.frombuffer(bits + b"\x00" * pad, dtype=">u4").astype(np.uint32)
    words_np = np.pad(words_np, (0, nwinp * W_WORDS - words_np.size))
    words = jnp.asarray(words_np.view(np.int32))
    tiles = _window_tiles(words, nwin, nb)

    # runway-relative decode starts: window 0 is pinned to the true stream
    # start; all others speculate from the runway start
    entries = np.zeros(nwinp, np.int32)
    entries[0] = RUN_BITS
    wstarts = np.arange(nwin, dtype=np.int64) * W_BITS
    ends = np.zeros(nwinp, np.int64)
    ends[:nwin] = np.minimum(RUN_BITS + W_BITS,
                             RUN_BITS + total_bits - wstarts)
    ends = ends.astype(np.int32)
    ends_dev = jnp.asarray(ends.reshape(nb * GROUPS, 128))

    final = {}
    patches: dict = {}
    last_stats.clear()
    last_stats.update(nwin=nwin, passes=0, pass_walls=[], redo_counts=[],
                      cap1=cap1, cap_full=cap_full, eyt_levels=eyt_levels)

    # ---- pass 1: all windows, average-sized cap
    _t0 = _time.perf_counter()
    e_dev = jnp.asarray(entries.reshape(nb * GROUPS, 128))
    s, entry, exit_, nskip, nout = _scan(tiles, e_dev, ends_dev,
                                         l1, eyt, deep, nb, cap1, eyt_levels)
    symsT = _to_window_major(s, nb, cap1, capr1)
    if capr1 != caprF:
        symsT = _pad_capr(symsT, capr1, caprF)
    final["entry"] = np.asarray(entry).ravel()[:nwin].astype(np.int64)
    final["exit"] = np.asarray(exit_).ravel()[:nwin].astype(np.int64)
    final["nskip"] = np.asarray(nskip).ravel()[:nwin].copy()
    final["nout"] = np.asarray(nout).ravel()[:nwin].copy()
    last_stats["pass_walls"].append(round(_time.perf_counter() - _t0, 4))
    last_stats["passes"] = 1

    for pass_i in range(1, max_passes):
        # chain validation: window i+1's entry must equal window i's exit;
        # exit == -1 marks a cap-1 overflow (never crossed its end)
        exit_abs = wstarts + final["exit"] - RUN_BITS
        entry_abs = wstarts + final["entry"] - RUN_BITS
        want = np.empty(nwin, np.int64)
        want[0] = 0
        want[1:] = exit_abs[:-1]
        bad = np.nonzero((want != entry_abs) | (final["exit"] < 0))[0]
        last_stats["redo_counts"].append(int(bad.size))
        if bad.size == 0:
            break
        if bad.size <= HOST_REDO_MAX:
            # Straggler repair: decoding a handful of windows on the host —
            # with the exact chain semantics — and patching the dense output
            # with one scatter beats another kernel launch.
            patches = _host_repair(bits, total_bits, codes, lens, offset,
                                   final, wstarts, nwin)
            last_stats["host_repaired"] = len(patches)
            break
        _t0 = _time.perf_counter()
        rel = want[bad] - wstarts[bad] + RUN_BITS
        if (rel < 0).any() or (rel >= RUN_BITS + W_BITS + 32).any():
            raise DecodeFallback("speculative chain out of range")
        # ---- compact rescan of the redo set at the worst-case cap
        nbad = bad.size
        nb2 = -(-nbad // BWIN)
        nbad_p = nb2 * BWIN
        bad_p = np.zeros(nbad_p, np.int64)
        bad_p[:nbad] = bad
        im = (bad_p[:, None] * W_WORDS
              + np.arange(-RUN_WORDS, W_WORDS + SPILL_WORDS)[None, :])
        tiles2 = _gather_tiles(words, jnp.asarray(im.astype(np.int32)), nb2)
        e2 = np.zeros(nbad_p, np.int32)
        e2[:nbad] = rel.astype(np.int32)
        ends2 = np.zeros(nbad_p, np.int32)   # pads: end 0 -> done at t==0
        ends2[:nbad] = ends[bad]
        s2, en2, ex2, ns2, no2 = _scan(
            tiles2, jnp.asarray(e2.reshape(nb2 * GROUPS, 128)),
            jnp.asarray(ends2.reshape(nb2 * GROUPS, 128)),
            l1, eyt, deep, nb2, cap_full, eyt_levels)
        final["entry"][bad] = np.asarray(en2).ravel()[:nbad].astype(np.int64)
        final["exit"][bad] = np.asarray(ex2).ravel()[:nbad].astype(np.int64)
        final["nskip"][bad] = np.asarray(ns2).ravel()[:nbad]
        final["nout"][bad] = np.asarray(no2).ravel()[:nbad]
        _t1 = _time.perf_counter()
        last_stats.setdefault("rescan_walls", []).append(round(_t1 - _t0, 4))
        symsT2 = _to_window_major(s2, nb2, cap_full, caprF)
        rows = (bad_p[:nbad, None] * caprF
                + np.arange(caprF)[None, :]).ravel()
        symsT = _scatter_rows(symsT, symsT2[:nbad * caprF],
                              jnp.asarray(rows.astype(np.int32)), caprF)
        symsT.block_until_ready()
        last_stats.setdefault("scatter_walls", []).append(
            round(_time.perf_counter() - _t1, 4))
        last_stats["passes"] = pass_i + 1
        last_stats["pass_walls"].append(round(_time.perf_counter() - _t0, 4))
    else:
        raise DecodeFallback("speculative chain failed to stabilize")

    nout_np = final["nout"].astype(np.int64)
    total = int(nout_np.sum())
    # the stream's final byte is zero-padded; the last window may decode a
    # few spurious symbols from the padding — trim them
    excess = total - count
    if excess < 0 or excess > int(nout_np[-1]):
        raise DecodeFallback(
            f"decoded symbol count {total} != archived count {count}")
    nout_np[-1] -= excess

    capr = caprF
    offs = np.zeros(nwinp, np.int64)
    offs[:nwin] = np.concatenate([[0], np.cumsum(nout_np)[:-1]])
    offs[nwin:] = count
    nfull = np.zeros(nwinp, np.int32)
    nfull[:nwin] = nout_np
    skf = np.zeros(nwinp, np.int32)
    skf[:nwin] = final["nskip"]
    ncb = nwinp // COMPACT_BATCH
    out_rows = -(-count // 128) + 256
    out = jnp.zeros((out_rows, 128), jnp.int32)
    dense = _compact(symsT, jnp.asarray(offs.astype(np.int32)),
                     jnp.asarray(skf), jnp.asarray(nfull), out, ncb, capr)
    if patches:
        # overwrite the host-repaired windows' symbols (their device syms
        # rows are stale speculation) with one scatter in archive order
        pos_l, val_l = [], []
        for w, ws in patches.items():
            n = int(nout_np[w])              # post-trim count for window w
            if n <= 0:
                continue
            pos_l.append(offs[w] + np.arange(n, dtype=np.int64))
            val_l.append(np.asarray(ws[:n], np.int32))
        if pos_l:
            pos = np.concatenate(pos_l)
            val = np.concatenate(val_l)
            dense = dense.at[(jnp.asarray(pos // 128),
                              jnp.asarray(pos % 128))].set(jnp.asarray(val))
    return dense
