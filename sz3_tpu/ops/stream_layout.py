"""Device-side stream ordering: per-pass bins -> padded archive-stream order.

The archive stream order (reference InterpolationDecomposition.hpp:121-135 +
:309-402, mirrored by native/szt/interp.hpp) is, per level, a row-major sweep
of interpolation blocks of edge 32*stride; within each block the N directional
passes run in sequence; within a pass the emission is phase-major (N>=3,
SIGMOD'24 API: main run first, then the boundary phases) or line-major (N<=2,
ICDE'21 API: each line emits main+boundary before the next line), each phase
iterating the block's lattice row-major in memory-axis order.

Key facts that make this a static data-movement problem:
  * all stencil reads of a pass come from the coarser grid, so blocks affect
    only ORDER, never values -> the whole-array pass formulation of
    ops/interp_fast.py stays valid and this module just reorders its outputs;
  * levels are contiguous stream segments; anchors lead the stream;
  * per (level, dir) the pass array factors axis-by-axis into (block, within)
    where "within" is 16 odd positions along the pass direction and
    W(+1 owned plane) positions along the other axes.

The produced layout is PADDED: sentinel slots (bins == SENTINEL) may appear
anywhere; consumers treat them as zero-length symbols (they contribute no
bits, no histogram counts, no literals), so only the relative order of real
slots matters — and that is exactly the archive order (validated slot-by-slot
against the native walker in tests/test_stream_layout.py).

Everything here is shape arithmetic + pad/reshape/transpose/concat/where,
which XLA moves at HBM speed on TPU (measured ~0.2 ms per 64 MB relayout).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .interp_fast import FastPlan

SENTINEL = -1  # bins value marking padded slots (valid bins are >= 0)


# ---- within-block orders (mirror native/szt/interp.hpp) -----------------------

def _phase_cols(interp_id: int, n: int) -> List[np.ndarray]:
    """Per-phase local odd-position indices k (point = begin + (2k+1)*s) for
    one block whose dd extent has n grid points (pass_nd, interp.hpp:440-509).
    Phase list order is the emission order."""
    if n <= 1:
        return []
    ks = lambda a: np.asarray(a, dtype=np.int64)
    if interp_id == 0:  # linear
        main = np.arange(0, (n - 1) // 2, dtype=np.int64)  # j=1,3,..<n-1
        phases = [main]
        if n % 2 == 0:
            phases.append(ks([(n - 2) // 2]))  # j = n-1
        return phases
    # cubic: main j=3..<max(n-3,0) step 2, then bounds {1, n-2|n-3, n-1}
    end = n - 3 if n >= 3 else 0
    main = np.arange(1, (end - 3 + 1) // 2 + 1, dtype=np.int64) if end > 3 \
        else np.zeros(0, np.int64)
    phases = [main]
    bounds = [1]
    if n % 2 == 1 and n > 3:
        bounds.append(n - 2)
    if n % 2 == 0 and n > 4:
        bounds.append(n - 3)
    if n % 2 == 0 and n > 2:
        bounds.append(n - 1)
    for b in bounds:
        phases.append(ks([(b - 1) // 2]))
    return phases


def _line_sigma(interp_id: int, n: int) -> np.ndarray:
    """Within-line emission order for the N<=2 per-line API
    (line_1d, interp.hpp:369-417). Returns local odd-position indices."""
    if n <= 1:
        return np.zeros(0, np.int64)
    if interp_id == 0 or n < 5:
        main = np.arange(0, (n - 1) // 2, dtype=np.int64)  # i=1,3,..(i+1<n)
        out = [main]
        if n % 2 == 0:
            out.append(np.asarray([(n - 2) // 2], np.int64))
        return np.concatenate(out)
    # cubic: main i=3.. while i+3<n; then quad1(i=1), quad2(i=exit), quad3(n-1)
    m = (n - 7) // 2 + 1 if n >= 7 else 0
    main = np.arange(1, m + 1, dtype=np.int64)
    out = [main, np.asarray([0], np.int64), np.asarray([m + 1], np.int64)]
    if n % 2 == 0:
        out.append(np.asarray([(n - 2) // 2], np.int64))
    return np.concatenate(out)


# ---- static layout plan --------------------------------------------------------

@dataclass(frozen=True)
class AxisFactor:
    nb: int          # number of blocks along this axis
    w: int           # within-block slot count (16 for dd; W+1 for outer)
    core: int        # owned units per block excluding the extra plane
    outer: bool      # True: outer axis with owned plane-0 extra column
    g: int           # pass-array extent along this axis


@dataclass(frozen=True)
class PassLayout:
    axes: Tuple[AxisFactor, ...]   # per pass-array axis, in memory order
    dd: int
    # within-block dd-column order(s); each is a list of per-phase local-k
    # arrays over a (w_dd+1)-wide axis whose last column is the sentinel pad
    interior_phases: Optional[Tuple[np.ndarray, ...]]  # None when nb_dd == 1
    last_phases: Tuple[np.ndarray, ...]
    line_major: bool               # N<=2 (ICDE'21 line API)
    s_block: int                   # slots per block contributed by this pass


@dataclass(frozen=True)
class LevelLayout:
    level: int
    nb: Tuple[int, ...]            # block grid (memory order)
    passes: Tuple[Tuple[int, PassLayout], ...]  # (plan pass index, layout)


@dataclass(frozen=True)
class StreamLayoutPlan:
    dims: Tuple[int, ...]
    anchor_stride: int
    levels: Tuple[LevelLayout, ...]
    anchor_count: int
    padded_len: int                # total padded stream slots (pre chunk pad)


def _pad16(phases: Sequence[np.ndarray], w: int) -> Tuple[np.ndarray, ...]:
    """Pad the concatenated per-phase columns with sentinel-column refs (index
    w) so every class emits exactly w slots along dd."""
    total = sum(p.size for p in phases)
    assert total <= w
    if total == w:
        return tuple(phases)
    return tuple(list(phases) + [np.full(w - total, w, dtype=np.int64)])


def build_stream_layout(plan: FastPlan, interp_algo: int) -> StreamLayoutPlan:
    dims = plan.dims
    N = len(dims)
    if plan.anchor_stride == 0:
        raise ValueError("device stream layout requires an anchor grid")
    anchor_count = 1
    for d in dims:
        anchor_count *= (d - 1) // plan.anchor_stride + 1

    # group plan passes by level (plan.passes is already in stream order:
    # levels descending, directions in dm order within each level)
    by_level: dict = {}
    for pi, spec in enumerate(plan.passes):
        by_level.setdefault(spec.level, []).append((pi, spec))

    levels: List[LevelLayout] = []
    padded = anchor_count
    for level in sorted(by_level, reverse=True):
        s = 1 << (level - 1)
        ibs = 32 * s
        nb = tuple((d - 1) // ibs + 1 for d in dims)
        pls: List[Tuple[int, PassLayout]] = []
        for pi, spec in by_level[level]:
            dd = spec.dd
            axes: List[AxisFactor] = []
            for a in range(N):
                if a == dd:
                    w_core = ibs // (2 * s)           # 16 odd positions
                    axes.append(AxisFactor(nb=nb[a], w=w_core, core=w_core,
                                           outer=False, g=spec.p))
                else:
                    u = spec.out_steps[a] if a != dd else None
                    # outer unit: s for axes already refined this level
                    # (before dd in dm order), 2s otherwise == src_steps[a]
                    u = spec.src_steps[a]
                    w_core = ibs // u
                    g = spec.shape_in[a]
                    axes.append(AxisFactor(nb=nb[a], w=w_core + 1, core=w_core,
                                           outer=True, g=g))
            w_dd = axes[dd].w
            # dd extents: interior blocks have n = ibs/s + 1 = 33 grid points
            n_int = ibs // s + 1
            last_begin = (nb[dd] - 1) * ibs
            n_last = (min(dims[dd] - 1, last_begin + ibs) - last_begin) // s + 1
            line_major = N <= 2
            mk = (_line_sigma if line_major else _phase_cols)
            as_phases = lambda r: (r,) if isinstance(r, np.ndarray) else tuple(r)
            interior = _pad16(as_phases(mk(interp_algo, n_int)), w_dd) \
                if nb[dd] > 1 else None
            lastp = _pad16(as_phases(mk(interp_algo, n_last)), w_dd)
            s_block = 1
            for a in range(N):
                s_block *= axes[a].w
            pls.append((pi, PassLayout(axes=tuple(axes), dd=dd,
                                       interior_phases=interior,
                                       last_phases=lastp,
                                       line_major=line_major,
                                       s_block=s_block)))
            nblk = 1
            for a in range(N):
                nblk *= nb[a]
            padded += nblk * s_block
        levels.append(LevelLayout(level=level, nb=nb, passes=tuple(pls)))
    return StreamLayoutPlan(dims=dims, anchor_stride=plan.anchor_stride,
                            levels=tuple(levels), anchor_count=anchor_count,
                            padded_len=padded)


# ---- layout application (xp = numpy or jax.numpy) ------------------------------

def _factor_axis(xp, arr, axis: int, f: AxisFactor, fill):
    """Length-g axis -> (nb, w) axes at `axis` (block, within-block slots)."""
    g = arr.shape[axis]
    if not f.outer:
        pad_to = f.nb * f.w
        if pad_to > g:
            pw = [(0, 0)] * arr.ndim
            pw[axis] = (0, pad_to - g)
            arr = xp.pad(arr, pw, constant_values=fill)
        shape = arr.shape[:axis] + (f.nb, f.w) + arr.shape[axis + 1:]
        return arr.reshape(shape)
    # outer axis: unit 0 is block 0's extra leading plane; block b>0's slot 0
    # is a sentinel (its begin plane belongs to the previous block)
    sl0 = [slice(None)] * arr.ndim
    sl0[axis] = slice(0, 1)
    first = arr[tuple(sl0)]
    slr = [slice(None)] * arr.ndim
    slr[axis] = slice(1, None)
    rest = arr[tuple(slr)]
    pad_to = f.nb * f.core
    if pad_to > rest.shape[axis]:
        pw = [(0, 0)] * arr.ndim
        pw[axis] = (0, pad_to - rest.shape[axis])
        rest = xp.pad(rest, pw, constant_values=fill)
    shape = rest.shape[:axis] + (f.nb, f.core) + rest.shape[axis + 1:]
    rest = rest.reshape(shape)
    # extra column: block 0 -> first plane, others -> fill
    first = xp.expand_dims(first, axis)            # (.., 1, 1, ..) at (axis, axis+1)
    pw = [(0, 0)] * rest.ndim
    pw[axis] = (0, f.nb - 1)
    extra = xp.pad(first, pw, constant_values=fill)
    return xp.concatenate([extra, rest], axis=axis + 1)


def _take_cols(xp, t, cols: np.ndarray, axis: int):
    """Static column pick; contiguous runs become slices (a constant-index
    xp.take lowers to an XLA gather — measurably slower than a slice)."""
    cols = np.asarray(cols)
    if cols.size and np.array_equal(
            cols, np.arange(cols[0], cols[0] + cols.size)):
        sl = [slice(None)] * t.ndim
        sl[axis] = slice(int(cols[0]), int(cols[0] + cols.size))
        return t[tuple(sl)]
    return xp.take(t, xp.asarray(cols), axis=axis)


def _within_flatten(xp, t, n_nb: int, dd: int, phases, fill, bofs: int = 0):
    """t: ([B,] *nb, *w(+sentinel col on dd)) -> ([B,] *nb, S) in phase
    emission order. bofs = 1 when a leading batch axis is present."""
    dd_axis = n_nb + dd
    parts = []
    for cols in phases:
        sub = _take_cols(xp, t, cols, dd_axis)
        parts.append(sub.reshape(sub.shape[:n_nb] + (-1,)))
    return xp.concatenate(parts, axis=n_nb) if len(parts) > 1 else parts[0]


def _apply_pass(xp, arr, pl: PassLayout, nb: Tuple[int, ...], fill,
                batched: bool = False):
    """Pass array ([B,] *dims) -> ([B,] prod(nb), s_block) slots in
    within-block order. With batched=True, a leading axis rides along (the
    device encode lays bins and bitcast originals out in ONE application —
    half the relayout op count of two separate passes)."""
    N = len(nb)
    b = 1 if batched else 0
    t = arr
    for a in range(N):
        t = _factor_axis(xp, t, b + 2 * a, pl.axes[a], fill)
    # axes now ([B,] nb0, w0, nb1, w1, ...) -> ([B,] nb..., w...)
    perm = tuple(range(b)) + tuple(range(b, b + 2 * N, 2)) \
        + tuple(range(b + 1, b + 2 * N, 2))
    t = xp.transpose(t, perm)
    # append a sentinel column on the dd within-axis for short-block padding
    dd_axis = b + N + pl.dd
    pw = [(0, 0)] * t.ndim
    pw[dd_axis] = (0, 1)
    t = xp.pad(t, pw, constant_values=fill)

    if pl.line_major:
        # line-major (N<=2): each line along dd emits fully (in sigma order)
        # before the next outer position -> within-block order = (outer, dd)
        # with dd FASTEST, independent of memory order (block_interpolation
        # N==2 iterates j over the outer axis, then the whole line)
        if pl.dd != N - 1:
            w_perm = tuple(range(b + N)) + tuple(
                b + N + a for a in range(N) if a != pl.dd) + (b + N + pl.dd,)
            t = xp.transpose(t, w_perm)
            dd_w = N - 1  # dd within-axis now last
        else:
            dd_w = pl.dd
        phases_a = [np.concatenate(pl.interior_phases)] \
            if pl.interior_phases is not None else None
        phases_b = [np.concatenate(pl.last_phases)]
    else:
        dd_w = pl.dd
        phases_a = pl.interior_phases
        phases_b = pl.last_phases
    if phases_a is None:
        v = _within_flatten(xp, t, b + N, dd_w, phases_b, fill)
    else:
        # only the LAST block along dd uses the last-class column order:
        # reorder it on its own slice and concatenate (materializing the full
        # last-class variant + a select doubled the relayout traffic)
        nb_axis = b + pl.dd
        sl_a = [slice(None)] * t.ndim
        sl_a[nb_axis] = slice(0, nb[pl.dd] - 1)
        sl_b = [slice(None)] * t.ndim
        sl_b[nb_axis] = slice(nb[pl.dd] - 1, nb[pl.dd])
        vA = _within_flatten(xp, t[tuple(sl_a)], b + N, dd_w, phases_a, fill)
        vB = _within_flatten(xp, t[tuple(sl_b)], b + N, dd_w, phases_b, fill)
        v = xp.concatenate([vA, vB], axis=nb_axis)
    if batched:
        return v.reshape(v.shape[0], -1, pl.s_block)
    return v.reshape(-1, pl.s_block)


def apply_stream_layout(xp, lp: StreamLayoutPlan, pass_arrays: Sequence,
                        anchor_arr, fill, batched: bool = False):
    """pass_arrays: one array per plan pass (bins or values), in plan order.
    anchor_arr: values for the anchor segment (anchor-lattice array) or None
    to emit `fill`-valued anchor slots. Returns the 1-D padded stream — or,
    with batched=True (leading axis B on every array), a (B, padded) batch
    laid out in one application."""
    b = 1 if batched else 0
    segs = []
    if anchor_arr is not None:
        segs.append(anchor_arr.reshape(anchor_arr.shape[:b] + (-1,)))
    for lv in lp.levels:
        parts = [
            _apply_pass(xp, pass_arrays[pi], pl, lv.nb, fill, batched)
            for pi, pl in lv.passes
        ]
        lvl = xp.concatenate(parts, axis=1 + b) if len(parts) > 1 else parts[0]
        segs.append(lvl.reshape(lvl.shape[:b] + (-1,)))
    return xp.concatenate(segs, axis=b)


# ---- validation helper ---------------------------------------------------------

def layout_grid_indices(plan: FastPlan, lp: StreamLayoutPlan) -> np.ndarray:
    """Flat-grid index occupying each padded stream slot (SENTINEL for pads);
    compares against the native walker's interp_order in tests."""
    dims = plan.dims
    N = len(dims)
    grid = np.arange(int(np.prod(dims)), dtype=np.int64).reshape(dims)
    passes = []
    for spec in plan.passes:
        counts = list(spec.shape_in)
        counts[spec.dd] = spec.p
        idx = tuple(slice(spec.cur_start[a], spec.cur_start[a] +
                          (counts[a] - 1) * spec.cur_steps[a] + 1,
                          spec.cur_steps[a]) for a in range(N))
        passes.append(np.ascontiguousarray(grid[idx]))
    anchors = grid[tuple(slice(0, None, plan.anchor_stride) for _ in range(N))]
    return apply_stream_layout(np, lp, passes, anchors, np.int64(SENTINEL))
