"""Inverse device stream layout: dense archive-order bins -> per-pass arrays.

The decode mirror of ops/stream_layout.py. The entropy decoder
(ops/entropy_decode.py) produces the DENSE stream — the archive's symbol
sequence with no padding — while the grid decode (ops/interp_fast.py)
consumes per-pass arrays in memory order. Going dense -> per-pass is a
static, data-independent data-movement problem, but the dense stream is
RAGGED over the block structure (block classes contribute different slot
counts), so it cannot be a single reshape.

The key structural fact making this fast on TPU: per level, a block's dense
slot count factors per axis by BLOCK CLASS, and the classes along each axis
occupy contiguous index ranges:

  axis classes = [ b==0 ] [ 1 <= b <= nb-2 ] [ b == nb-1 ]
  (outer axes: block 0 owns an extra leading plane, the last block may be
   short; the pass direction dd: interior blocks own 16 odd positions, the
   last may own fewer)

so the dense level segment splits recursively, axis by axis, into class
chunks by STATIC offsets (slice), each chunk uniform (reshape). At the leaf
(every axis classed) the per-block dense content is a static concatenation
over passes and emission phases of contiguous sub-boxes, which expand to the
regular (w0..wN-1) within-block grid with pads and one small static
inverse-permutation along the pass direction (<= 17 indices — the same op
class the forward layout uses). Everything is slice / reshape / pad /
transpose / small-take / concat: HBM-speed on TPU, no gathers.

Wire-order reference: InterpolationDecomposition.hpp:121-135 + :309-402
(traversal), HuffmanEncoder.hpp:225-279 (the sequential decode this replaces);
forward layout and slot-order validation live in ops/stream_layout.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .interp_fast import FastPlan
from .stream_layout import (AxisFactor, LevelLayout, PassLayout,
                            StreamLayoutPlan, build_stream_layout)


# ---- host-side static structure -------------------------------------------------

@dataclass(frozen=True)
class _PassAx:
    """Per (pass, axis, class) dense structure: real within-slots occupy
    [start, start+r) of the w-wide within axis; for the pass direction,
    `phase_cols` lists the real emission columns per phase (local odd
    positions, in emission order)."""
    start: int
    r: int
    phase_cols: Optional[Tuple[np.ndarray, ...]]  # None for outer axes


def _outer_classes(f: AxisFactor) -> List[Tuple[int, _PassAx]]:
    """Refined-class table for an outer axis: entries for refined classes
    (b==0, mid, last) in order; count derived by the caller."""
    g = f.g
    out = []
    r0 = 1 + min(f.core, g - 1)
    out.append(_PassAx(start=0, r=r0, phase_cols=None))            # b == 0
    if f.nb > 2:
        out.append(_PassAx(start=1, r=f.core, phase_cols=None))    # mids
    if f.nb > 1:
        rl = max(0, min(f.core, (g - 1) - (f.nb - 1) * f.core))
        out.append(_PassAx(start=1, r=rl, phase_cols=None))        # last
    return out


def _dd_classes(f: AxisFactor, pl: PassLayout) -> List[_PassAx]:
    """Refined-class table for the pass direction (same refined grid as
    outer axes: {0}, {1..nb-2}, {nb-1})."""
    w = f.w
    r_last = f.g - (f.nb - 1) * w
    if pl.line_major:
        interior = (np.concatenate(pl.interior_phases),) \
            if pl.interior_phases is not None else None
        last = (np.concatenate(pl.last_phases),)
    else:
        interior = pl.interior_phases
        last = pl.last_phases

    def real(phases, r):
        return tuple(c[c < r] for c in phases)

    ent_int = _PassAx(start=0, r=w, phase_cols=real(interior, w)) \
        if interior is not None else None
    ent_last = _PassAx(start=0, r=r_last, phase_cols=real(last, r_last))
    out = []
    out.append(ent_int if f.nb > 1 else ent_last)                  # b == 0
    if f.nb > 2:
        out.append(ent_int)                                        # mids
    if f.nb > 1:
        out.append(ent_last)                                       # last
    return out


@dataclass(frozen=True)
class _LevelPlan:
    nb: Tuple[int, ...]
    segs: Tuple[Tuple[int, ...], ...]       # per axis: refined class counts
    # per pass: (plan pass index, layout, per-axis class tables)
    passes: Tuple[Tuple[int, PassLayout, Tuple[Tuple[_PassAx, ...], ...]], ...]
    dense_len: int


def _level_plan(lv: LevelLayout) -> _LevelPlan:
    N = len(lv.nb)
    segs = []
    for a in range(N):
        nb = lv.nb[a]
        s = [1]
        if nb > 2:
            s.append(nb - 2)
        if nb > 1:
            s.append(1)
        segs.append(tuple(s))
    passes = []
    total = 0
    for pi, pl in lv.passes:
        tables = []
        for a in range(N):
            f = pl.axes[a]
            tables.append(tuple(_dd_classes(f, pl) if a == pl.dd
                                else _outer_classes(f)))
        tables = tuple(tables)
        for combo in np.ndindex(*(len(s) for s in segs)):
            cnt = 1
            r = 1
            for a in range(N):
                cnt *= segs[a][combo[a]]
                r *= tables[a][combo[a]].r
            total += cnt * r
        passes.append((pi, pl, tables))
    return _LevelPlan(nb=lv.nb, segs=tuple(segs), passes=tuple(passes),
                      dense_len=total)


# ---- device-side (xp = numpy or jax.numpy) --------------------------------------

def _leaf_expand(xp, part, pl: PassLayout, axcls: Sequence[_PassAx],
                 nbatch: int):
    """One pass's dense leaf content -> the regular within-block grid.

    part: (batch..., prod(r_a)) for one class combo; returns
    (batch..., w_0, ..., w_{N-1}) with zeros in the pad slots."""
    N = len(axcls)
    dd = pl.dd
    batch = part.shape[:nbatch]
    rs = [axcls[a].r for a in range(N)]
    ws = [pl.axes[a].w for a in range(N)]
    ddc = axcls[dd]

    if pl.line_major:
        order = [a for a in range(N) if a != dd] + [dd]
    else:
        order = list(range(N))
    ddpos = order.index(dd)
    pre = [rs[a] for a in order[:ddpos]]
    post = [rs[a] for a in order[ddpos + 1:]]
    other = int(np.prod(pre + post)) if pre + post else 1

    parts = []
    cols_all = []
    off = 0
    flat = part.reshape(batch + (-1,))
    for cols in ddc.phase_cols:
        k = len(cols)
        if k == 0:
            continue
        ln = other * k
        sub = flat[..., off:off + ln]
        off += ln
        parts.append(sub.reshape(batch + tuple(pre) + (k,) + tuple(post)))
        cols_all.append(cols)
    if not parts:
        t = xp.zeros(batch + tuple(pre) + (0,) + tuple(post), part.dtype)
        cols_cat = np.zeros(0, np.int64)
    else:
        t = xp.concatenate(parts, axis=nbatch + ddpos) if len(parts) > 1 \
            else parts[0]
        cols_cat = np.concatenate(cols_all)
    assert off == flat.shape[-1], (off, flat.shape)
    # inverse emission permutation along dd -> ascending local odd index
    if cols_cat.size and not np.array_equal(cols_cat,
                                            np.arange(cols_cat.size)):
        inv = np.argsort(cols_cat, kind="stable")
        t = xp.take(t, xp.asarray(inv), axis=nbatch + ddpos)
    # pad every within axis to its w, placing the real range at its start
    pw = [(0, 0)] * t.ndim
    for j, a in enumerate(order):
        lo = axcls[a].start
        pw[nbatch + j] = (lo, ws[a] - lo - rs[a])
    t = xp.pad(t, pw)
    if pl.line_major and order != list(range(N)):
        perm = list(range(nbatch)) + [nbatch + order.index(a)
                                      for a in range(N)]
        t = xp.transpose(t, perm)
    return t


def _produce(xp, arr, depth: int, combo: Tuple[int, ...], lp: _LevelPlan):
    """arr: (class-counts so far ..., chunk); returns {pass pos -> array of
    shape (counts..., w...)} for the block rectangle `combo`."""
    N = len(lp.nb)
    if depth == N:
        out = {}
        off = 0
        flat_len = arr.shape[-1]
        for pos, (pi, pl, tables) in enumerate(lp.passes):
            axcls = [tables[a][combo[a]] for a in range(N)]
            ln = 1
            for a in range(N):
                ln *= axcls[a].r
            sub = arr[..., off:off + ln]
            off += ln
            out[pos] = _leaf_expand(xp, sub, pl, axcls, arr.ndim - 1)
        assert off == flat_len, (off, flat_len)
        return out

    # inner length per axis-`depth` block, given classes `combo + (ci,)`
    def inner_len(ci: int) -> int:
        total = 0
        for pi, pl, tables in lp.passes:
            v = 1
            for a in range(depth):
                v *= tables[a][combo[a]].r
            v *= tables[depth][ci].r
            for a in range(depth + 1, N):
                v *= sum(c * tables[a][k].r
                         for k, c in enumerate(lp.segs[a]))
            total += v
        return total

    results = []
    off = 0
    for ci, count in enumerate(lp.segs[depth]):
        inner = inner_len(ci)
        ln = count * inner
        sub = arr[..., off:off + ln]
        off += ln
        sub = sub.reshape(arr.shape[:-1] + (count, inner))
        results.append(_produce(xp, sub, depth + 1, combo + (ci,), lp))
    assert off == arr.shape[-1], (off, arr.shape)
    out = {}
    for pos in results[0]:
        parts = [r[pos] for r in results]
        out[pos] = xp.concatenate(parts, axis=depth) if len(parts) > 1 \
            else parts[0]
    return out


def _defactor(xp, t, pl: PassLayout, nb: Tuple[int, ...]):
    """(nb0..nbN-1, w0..wN-1) -> the pass array (memory order)."""
    N = len(nb)
    perm = []
    for a in range(N):
        perm += [a, N + a]
    t = xp.transpose(t, perm)
    # merge (nb_a, w_a) pairs from the last axis pair backwards
    for a in range(N - 1, -1, -1):
        f = pl.axes[a]
        ax = 2 * a
        if not f.outer:
            shape = t.shape[:ax] + (f.nb * f.w,) + t.shape[ax + 2:]
            t = t.reshape(shape)
            if f.g != f.nb * f.w:
                sl = [slice(None)] * t.ndim
                sl[ax] = slice(0, f.g)
                t = t[tuple(sl)]
        else:
            sl = [slice(None)] * t.ndim
            sl[ax] = slice(0, 1)
            sl[ax + 1] = slice(0, 1)
            lead = t[tuple(sl)]
            lead = lead.reshape(lead.shape[:ax] + (1,) + lead.shape[ax + 2:])
            sl = [slice(None)] * t.ndim
            sl[ax + 1] = slice(1, None)
            rest = t[tuple(sl)]
            rest = rest.reshape(rest.shape[:ax] + (f.nb * f.core,)
                                + rest.shape[ax + 2:])
            if f.g - 1 != f.nb * f.core:
                sl = [slice(None)] * rest.ndim
                sl[ax] = slice(0, f.g - 1)
                rest = rest[tuple(sl)]
            t = xp.concatenate([lead, rest], axis=ax)
    return t


def build_inverse_plan(lp: StreamLayoutPlan):
    """Host-side static structure; callers cache it next to the layout plan
    (the dataclasses hold numpy arrays, so they are not lru_cache keys)."""
    return tuple(_level_plan(lv) for lv in lp.levels)


def invert_stream_layout(xp, lp: StreamLayoutPlan, lplans, dense):
    """dense: 1-D array of the archive's real stream slots (anchors first).
    Returns (anchor_flat, pass_arrays) where pass_arrays[pi] is plan pass
    pi's array in memory order (same shapes decode_grid_fast consumes)."""
    anchor = dense[:lp.anchor_count]
    off = lp.anchor_count
    out = {}
    for lv, lvp in zip(lp.levels, lplans):
        seg = dense[off:off + lvp.dense_len]
        off += lvp.dense_len
        res = _produce(xp, seg, 0, (), lvp)
        for pos, (pi, pl, _tables) in enumerate(lvp.passes):
            out[pi] = _defactor(xp, res[pos], pl, lvp.nb)
    npass = len(out)
    return anchor, [out[pi] for pi in range(npass)]


def dense_count(lp: StreamLayoutPlan, lplans) -> int:
    """Total real stream slots (== the archived quant count)."""
    return lp.anchor_count + sum(p.dense_len for p in lplans)
