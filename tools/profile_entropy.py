"""Per-stage device timings for the device-resident entropy encode path.

Measures, on the real chip, the stages of algos/device_encode:
  S1  quantize passes (interp_fast encode + decimation chain)
  S2  + stream layout (pass arrays -> padded archive order)
  S3  + histogram/literal kernel            == jit A
  B   code lookup + bit pack + splice       == jit B

axon quirk: block_until_ready does not block; every stage jit therefore
returns a tiny reduction so value-forcing a few bytes forces the whole
computation. Optionally captures an xplane trace (--trace) and prints the
leaf-op table via xprof.

Also prints Huffman tree statistics (code length distribution, escape-prefix
counts) that size the decode-side kernel tables.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def nyx_like(n: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    ax = np.linspace(0, 1, n, dtype=np.float64)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    f = (np.sin(4 * np.pi * X) * np.cos(6 * np.pi * Y) * np.sin(2 * np.pi * Z)
         + 0.5 * np.sin(16 * np.pi * (X + Y)) + 0.25 * np.cos(32 * np.pi * (Y - Z)))
    f += 0.05 * np.cumsum(rng.standard_normal((n, n, n)), axis=2) / np.sqrt(n)
    return np.ascontiguousarray(np.exp(f), dtype=np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--eb", type=float, default=1e-3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--trace", default="")
    ap.add_argument("--fast", action="store_true",
                    help="SZT_EXACT_F64=0 (fast quantize mode)")
    args = ap.parse_args()
    import os
    if args.fast:
        os.environ["SZT_EXACT_F64"] = "0"

    import jax
    import jax.numpy as jnp

    from sz3_tpu.algos import device_encode
    from sz3_tpu.config import ALGO, Config
    from sz3_tpu.ops import entropy_device as ed
    from sz3_tpu.ops.interp_fast import (_decimation_chain, build_fast_plan,
                                         encode_grid_fast)
    from sz3_tpu.ops.stream_layout import (SENTINEL, apply_stream_layout,
                                           build_stream_layout)
    from sz3_tpu import runtime

    assert jax.default_backend() == "tpu", "needs the real chip"

    data = nyx_like(args.n)
    nbytes = data.nbytes
    dims = data.shape
    conf = Config(dims=dims, cmprAlgo=ALGO.INTERP, absErrorBound=args.eb)
    conf.interpAnchorStride = 32

    plan, lp, jits = device_encode._static(
        tuple(dims), int(conf.interpAlgo), conf.interpDirection,
        conf.interpAnchorStride, conf.interpAlpha, conf.interpBeta,
        conf.absErrorBound, conf.quantbinCnt, "float32")
    jit_a, jit_b, nc, mp, cap_rows, gmap_dev = jits
    log(f"field {dims} {nbytes/1e6:.1f} MB  nc={nc} chunks  mp={mp}")

    @jax.jit
    def s1(x):
        bins_list, _b0, _ = encode_grid_fast(x, plan)
        _, curs = _decimation_chain(x, plan)
        acc = jnp.zeros((), jnp.int32)
        for b in bins_list:
            acc += jnp.sum(b, dtype=jnp.int32)
        for c in curs:
            acc += jnp.sum(c, dtype=jnp.int32).astype(jnp.int32) if c.dtype != jnp.float32 \
                else jnp.sum(c).astype(jnp.int32)
        return acc

    anchors_idx = tuple(slice(0, None, plan.anchor_stride) for _ in dims)

    @jax.jit
    def s2(x):
        bins_list, _b0, _ = encode_grid_fast(x, plan)
        _, curs = _decimation_chain(x, plan)
        bins_stream = apply_stream_layout(
            jnp, lp, bins_list, jnp.zeros_like(x[anchors_idx], jnp.int32),
            jnp.int32(SENTINEL))
        orig_stream = apply_stream_layout(jnp, lp, curs, x[anchors_idx],
                                          jnp.zeros((), x.dtype))
        return (jnp.sum(bins_stream, dtype=jnp.int32)
                + jnp.sum(orig_stream).astype(jnp.int32))

    @jax.jit
    def s3(x):
        bins_stream, hist, lits, nlit = jit_a(x, gmap_dev)
        return (jnp.sum(hist, dtype=jnp.int32) + nlit[0]
                + jnp.sum(bins_stream[:128], dtype=jnp.int32))

    def force(f, *xa):
        r = f(*xa)
        return np.asarray(jax.tree_util.tree_leaves(r)[0])

    def clock(name, f, *xa):
        force(f, *xa)  # compile + warm
        ts = []
        for _ in range(args.reps):
            t = time.time()
            force(f, *xa)
            ts.append(time.time() - t)
        best = min(ts)
        log(f"{name:28s} {best*1e3:8.2f} ms   {nbytes/best/1e9:6.2f} GB/s")
        return best

    xd = jnp.asarray(data)
    np.asarray(xd)[0, 0, 0]  # settle H2D

    t1 = clock("S1 quantize passes", s1, xd)
    t2 = clock("S2 + stream layout", s2, xd)
    t3 = clock("S3 + hist/literals (jitA)", s3, xd)

    # ---- host tree + tables (reuse orchestration innards) ----
    bins_stream, hist, lits, nlit = jit_a(xd, gmap_dev)
    hist_np = np.asarray(hist).ravel()
    wlo = conf.quantbinCnt // 2 - ed.W_HALF
    counts = {}
    if hist_np[0]:
        counts[0] = int(hist_np[0])
    win = hist_np[2:2 + 2 * ed.W_HALF]
    for r in np.nonzero(win)[0]:
        counts[wlo + int(r)] = int(win[r])
    syms = sorted(counts)
    offset = syms[0]
    state_num = syms[-1] - offset + 2
    freq = np.zeros(state_num, np.uint64)
    for s, c in counts.items():
        freq[s - offset] = c
    t = time.time()
    codes, lens, tree = runtime.huff_table(offset, freq)
    log(f"host tree build             {(time.time()-t)*1e3:8.2f} ms   "
        f"({state_num} states)")

    # ---- tree stats for the decode design ----
    present = lens > 0
    lv = lens[present].astype(np.int64)
    fv = freq[present].astype(np.float64)
    total = fv.sum()
    log(f"\ncode lengths: max {lv.max()}, mean(stream) "
        f"{(fv*lv).sum()/total:.2f} bits")
    hiscdf = {}
    for L in (8, 10, 11, 12, 13, 14, 16, 20, 24, 32):
        p = fv[lv > L].sum() / total
        ncode = int((lv > L).sum())
        hiscdf[L] = (p, ncode)
        log(f"  len > {L:2d}: stream prob {p:9.2e}  ({ncode} codes)")
    cv = codes[present].astype(np.uint64)
    for L1 in (10, 11, 12):
        deep = lv > L1
        if deep.any():
            pref = (cv[deep] << (32 - lv[deep].astype(np.uint64))
                    ).astype(np.uint64) >> np.uint64(32 - L1)
            npref = len(np.unique(pref))
            maxrest = int((lv[deep] - L1).max())
        else:
            npref, maxrest = 0, 0
        log(f"  L1={L1}: escape prefixes {npref}, max remaining bits {maxrest}")

    # ---- jit B ----
    total_bits = int((freq.astype(np.int64) * lens.astype(np.int64)).sum())
    log(f"\nstream: {total_bits/8/1e6:.2f} MB packed "
        f"({total_bits/total:.2f} bits/sym)")
    tbl = ed.TBL_ROWS * 128
    tc = np.zeros(tbl, np.uint32)
    tl = np.zeros(tbl, np.uint8)
    idx_syms = np.arange(2 * ed.W_HALF) + wlo
    inr = (idx_syms >= offset) & (idx_syms <= syms[-1])
    src = np.clip(idx_syms - offset, 0, state_num - 1)
    tc[2:2 + 2 * ed.W_HALF] = np.where(inr, codes[src], 0)
    tl[2:2 + 2 * ed.W_HALF] = np.where(inr, lens[src], 0)
    c0 = np.zeros(2, np.uint32)
    if 0 in counts:
        c0[0] = codes[0 - offset]
        c0[1] = lens[0 - offset]
    c0 = c0.view(np.int32)
    tc_dev = jnp.asarray(tc.astype(np.int32).reshape(ed.TBL_ROWS, 128))
    tl_dev = jnp.asarray(tl.astype(np.int32).reshape(ed.TBL_ROWS, 128))
    c0_dev = jnp.asarray(c0)

    @jax.jit
    def b_red(bs, tcd, tld, c0d):
        # force via tiny slices, NOT reductions: a jnp.sum over the outputs
        # measured 13 ms of reduce on its own (round-5 xplane trace artifact)
        words, cbits = jit_b(bs, tcd, tld, c0d)
        return words[:1, :8] + cbits[:8]

    tb = clock("jit B pack+splice", b_red, bins_stream, tc_dev, tl_dev, c0_dev)

    # split pack vs splice
    from sz3_tpu.ops.entropy_device import (_pack_chunks, SEGS_PER_CHUNK,
                                            SEG_SUB)

    @jax.jit
    def pack_only(bs, tcd, tld, c0d):
        x = bs.reshape((nc,) + (2,) * 7 + (ed.ROW_ELEMS,))
        x = jnp.transpose(x, (0, 8, 7, 6, 5, 4, 3, 2, 1))
        br = x.reshape(nc * ed.ROW_ELEMS, ed.LANES)
        frames, cbits = _pack_chunks(br, tcd, tld,
                                     jnp.int32(wlo + 0 * ed.W_HALF - wlo + wlo), c0d, nc)
        return frames[:8, 0] + cbits[:8]

    tp = clock("  pack kernel only", pack_only, bins_stream, tc_dev, tl_dev,
               c0_dev)
    log(f"  (splice ~= {max(tb-tp,0)*1e3:.2f} ms by difference)")

    log(f"\nstage deltas: layout {(t2-t1)*1e3:.1f} ms, hist {(t3-t2)*1e3:.1f} "
        f"ms, jitA {t3*1e3:.1f} ms, jitB {tb*1e3:.1f} ms")
    tot = t3 + tb
    log(f"device total {tot*1e3:.1f} ms -> {nbytes/tot/1e9:.2f} GB/s "
        f"(target >= 2)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            force(s3, xd)
            force(b_red, bins_stream, tc_dev, tl_dev, c0_dev)
        log(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
