"""Gather-free device formulation of the interpolation decomposition.

Per (level, pass) every predicted point sits at an odd multiple of the level
stride s along the pass direction, and its stencil neighbors sit at even
multiples — i.e. at indices j-2..j+2 of the *coarse* array the pass reads.
So the whole pass is: 5 shifted slices of the coarse array -> all basis
functions on the VPU -> per-position kind select (static table) -> vectorized
quantize/recover -> interleave (stack+reshape) with the coarse array to form
the next-resolution array. No gathers, no scatters: the XLA program is a
chain of slices, elementwise ops and reshapes — the memory-bandwidth-optimal
shape of this algorithm on TPU.

Bins cross host<->device as one flat array per pass (shapes are static); the
host assembles/dissects the bins grid with numpy strided views, and the
native walk (bridge.hpp) converts grid order <-> archive stream order.

Numerical contract matches native/szt/interp.hpp. On IEEE-f64 backends (CPU)
the produced bins are bit-identical to the host engine; on TPU, f64 is
float-float emulated, so bins can differ in ulp-borderline cases — archives
remain valid and error-bounded, just not sha-identical (see test markers).
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interp_plan import (K_COPY, K_CUBIC, K_LIN1_NEW, K_LIN1_OLD, K_LINEAR, K_QUAD1,
                          K_QUAD2, K_QUAD3, direction_table, level_eb)
from .quantize import quantize, recover

jax.config.update("jax_enable_x64", True)


def _grid_count(D: int, step: int) -> int:
    return (D - 1) // step + 1


@dataclass(frozen=True)
class FastPass:
    level: int
    eb: float                 # resolved level eb (static-eb path)
    eb_ratio: float           # base_eb / eb_ratio == eb (traced-eb path)
    dd: int
    kind: np.ndarray            # per odd position j (len P), predictor kind
    src_steps: Tuple[int, ...]  # element strides of the coarse array per axis
    out_steps: Tuple[int, ...]  # element strides after this pass
    cur_start: Tuple[int, ...]  # slice origin in the original grid (s on dd)
    cur_steps: Tuple[int, ...]  # slice strides in the original grid
    shape_in: Tuple[int, ...]   # coarse array shape
    shape_out: Tuple[int, ...]  # array shape after interleave
    p: int                      # number of predicted positions along dd
    has_stage2: bool            # linear-mode tail reads a same-pass point


@dataclass(frozen=True)
class FastPlan:
    dims: Tuple[int, ...]
    anchor_stride: int
    base_eb: float
    radius: int
    passes: Tuple[FastPass, ...]
    init_steps: Tuple[int, ...]  # strides of the initial coarse grid


def build_fast_plan(dims: Tuple[int, ...], *, interp_algo: int, direction: int,
                    anchor_stride: int, alpha: float, beta: float, eb: float,
                    quantbin_cnt: int, blocksize: int = 32) -> FastPlan:
    N = len(dims)
    cubic = interp_algo == 1
    old_api = N <= 2

    levels = max(int(math.ceil(math.log2(d))) for d in dims)
    use_anchor = any(d > anchor_stride for d in dims)
    astride = anchor_stride if use_anchor else 0
    if astride > 0:
        max_level = int(math.log2(astride)) + 1
        if max_level <= levels:
            levels = max_level
    seq = list(itertools.permutations(range(N)))[direction]

    top = levels - 1 if astride > 0 else levels
    passes: List[FastPass] = []
    # initial coarse grid stride: in anchored mode 2^top equals the anchor
    # stride (levels is clamped to log2(astride)+1), so the initial grid is
    # exactly the anchor grid
    init_steps = tuple((1 << top) if astride == 0 else astride for _ in dims)

    cur = list(init_steps)
    for level in range(top, 0, -1):
        s = 1 << (level - 1)
        ibs = blocksize * s
        cur_eb = level_eb(eb, level, alpha, beta)
        if alpha < 0:
            eb_ratio = 2.0 if level >= 3 else 1.0
        elif alpha >= 1:
            eb_ratio = min(alpha ** (level - 1), beta)
        else:
            eb_ratio = 1.0
        for pi, dd in enumerate(seq):
            D = dims[dd]
            g = _grid_count(D, s)
            c = _grid_count(D, 2 * s)
            P = g - c
            if P <= 0:
                # nothing to predict along this axis at this level; the
                # "coarse" and "fine" grids coincide
                continue
            pos, kind_pos, _ = direction_table(D, s, ibs, cubic, old_api)
            kind = np.zeros(P, dtype=np.int32)
            for p_abs, k in zip(pos, kind_pos):
                kind[(p_abs // s - 1) // 2] = k
            src_steps = tuple(cur)
            shape_in = tuple(_grid_count(dims[a], cur[a]) for a in range(N))
            cur_start = tuple(s if a == dd else 0 for a in range(N))
            cur_steps = tuple(2 * s if a == dd else cur[a] for a in range(N))
            cur_out = list(cur)
            cur_out[dd] = s
            shape_out = tuple(_grid_count(dims[a], cur_out[a]) for a in range(N))
            has_stage2 = (not old_api) and (not cubic) and bool((kind == K_LIN1_NEW).any())
            passes.append(FastPass(level=level, eb=cur_eb, eb_ratio=eb_ratio, dd=dd, kind=kind,
                                   src_steps=src_steps, out_steps=tuple(cur_out),
                                   cur_start=cur_start, cur_steps=cur_steps,
                                   shape_in=shape_in, shape_out=shape_out, p=P,
                                   has_stage2=has_stage2))
            cur = cur_out
    return FastPlan(dims=tuple(dims), anchor_stride=astride, base_eb=eb,
                    radius=quantbin_cnt // 2, passes=tuple(passes),
                    init_steps=init_steps)


def _strided_slice(x, start: Tuple[int, ...], steps: Tuple[int, ...],
                   counts: Tuple[int, ...]):
    lim = tuple(start[a] + (counts[a] - 1) * steps[a] + 1 for a in range(x.ndim))
    return jax.lax.slice(x, start, lim, steps)


def _shift(apad, delta: int, dd: int, p: int):
    """apad is the coarse array edge-padded by 2 along dd; neighbor j+delta
    for odd positions j=0..P-1."""
    start = [0] * apad.ndim
    stop = list(apad.shape)
    start[dd] = 2 + delta
    stop[dd] = 2 + delta + p
    return jax.lax.slice(apad, start, stop)


def _linear1(a, b):
    """f32(-0.5*a + 1.5*b) promoted through f64 (Interpolators.hpp linear1).
    The softfloat path keeps the f64 rounding exact on TPU backends."""
    from .quantize import exact_mode
    if exact_mode(0.0) and a.dtype == jnp.float32:
        from .exactf64 import linear1_exact
        return linear1_exact(a, b)
    return (-0.5 * a.astype(jnp.float64) +
            1.5 * b.astype(jnp.float64)).astype(a.dtype)


def _predict_kinds(kind, m2, m1, z0, p1, p2):
    """All basis functions from the 5 coarse shifts (A[j-2..j+2]); T-precision
    op order matches reference utils/Interpolators.hpp:12-39."""
    cubic = (-m1 + 9 * z0 + 9 * p1 - p2) / 16
    quad1 = (3 * z0 + 6 * p1 - p2) / 8
    quad2 = (-m1 + 6 * z0 + 3 * p1) / 8
    quad3 = (3 * m2 - 10 * m1 + 15 * z0) / 8
    linear = (z0 + p1) / 2
    lin1_old = _linear1(m1, z0)
    return jnp.select(
        [kind == K_CUBIC, kind == K_QUAD1, kind == K_QUAD2, kind == K_QUAD3,
         kind == K_LINEAR, kind == K_LIN1_OLD],
        [cubic, quad1, quad2, quad3, linear, lin1_old],
        z0,  # K_COPY; K_LIN1_NEW fixed up in stage 2
    )


def _kindvec(spec: FastPass, ndim: int):
    shape = [1] * ndim
    shape[spec.dd] = -1
    return jnp.asarray(spec.kind).reshape(shape)


def _interleave(a, r, dd: int, g_out: int):
    """[a0, r0, a1, r1, ...][:g_out] along axis dd (pure stack+reshape)."""
    c = a.shape[dd]
    p = r.shape[dd]
    if p < c:  # pad r with one dummy plane
        pad = [(0, 0)] * a.ndim
        pad[dd] = (0, c - p)
        r = jnp.pad(r, pad)
    z = jnp.stack([a, r], axis=dd + 1)
    shape = list(a.shape)
    shape[dd] = 2 * c
    z = z.reshape(shape)
    if shape[dd] != g_out:
        z = jax.lax.slice_in_dim(z, 0, g_out, 1, axis=dd)
    return z


def _stage2_fix(spec: FastPass, a, pred, recon_s1):
    """linear-mode block tails read the reconstruction of the previous odd
    point (same pass): pred = f32(-0.5*recon[j-1] + 1.5*A[j])
    (reference InterpolationDecomposition.hpp:341-350)."""
    prev = jnp.pad(recon_s1, [(1, 0) if i == spec.dd else (0, 0)
                              for i in range(a.ndim)], mode="edge")
    prev = jax.lax.slice_in_dim(prev, 0, spec.p, 1, axis=spec.dd)
    lin1 = _linear1(prev, a)
    kind = _kindvec(spec, a.ndim)
    return jnp.where(kind == K_LIN1_NEW, lin1, pred)


def encode_pass_fast(cur, coarse, spec: FastPass, radius: int, eb=None):
    """cur: original-data values at this pass's predicted (odd) positions."""
    if eb is None:
        eb = spec.eb
    pad = [(2, 2) if i == spec.dd else (0, 0) for i in range(coarse.ndim)]
    apad = jnp.pad(coarse, pad, mode="edge")
    m2, m1, z0, p1, p2 = (_shift(apad, d, spec.dd, spec.p) for d in (-2, -1, 0, 1, 2))
    kind = _kindvec(spec, coarse.ndim)
    pred = _predict_kinds(kind, m2, m1, z0, p1, p2)
    bins, recon = quantize(cur, pred, eb, radius)
    if spec.has_stage2:
        pred2 = _stage2_fix(spec, z0, pred, recon)
        bins2, recon2 = quantize(cur, pred2, eb, radius)
        m = kind == K_LIN1_NEW
        bins = jnp.where(m, bins2, bins)
        recon = jnp.where(m, recon2, recon)
    out = _interleave(coarse, recon, spec.dd, spec.shape_out[spec.dd])
    return out, bins


def decode_pass_fast(coarse, bins, literal, spec: FastPass, radius: int, eb=None):
    if eb is None:
        eb = spec.eb
    pad = [(2, 2) if i == spec.dd else (0, 0) for i in range(coarse.ndim)]
    apad = jnp.pad(coarse, pad, mode="edge")
    m2, m1, z0, p1, p2 = (_shift(apad, d, spec.dd, spec.p) for d in (-2, -1, 0, 1, 2))
    kind = _kindvec(spec, coarse.ndim)
    pred = _predict_kinds(kind, m2, m1, z0, p1, p2)
    rec = recover(pred, bins, literal, eb, radius)
    if spec.has_stage2:
        pred2 = _stage2_fix(spec, z0, pred, rec)
        rec2 = recover(pred2, bins, literal, eb, radius)
        rec = jnp.where(kind == K_LIN1_NEW, rec2, rec)
    return _interleave(coarse, rec, spec.dd, spec.shape_out[spec.dd])


def _decimation_chain(x, plan: FastPlan):
    """Original-data values on each pass's grids, built with single-axis
    stride-2 slices of progressively smaller arrays instead of strided
    gathers over the full array (TPU-unfriendly).

    Returns (coarse0, curs): coarse0 = x on the initial grid; curs[k] = x at
    pass k's predicted (odd) positions along its axis.
    """
    # fine[k] = x decimated to pass k's OUTPUT grid; walk backward from x
    fine = [None] * len(plan.passes)
    cur_arr = x
    for k in range(len(plan.passes) - 1, -1, -1):
        fine[k] = cur_arr
        dd = plan.passes[k].dd
        idx = tuple(slice(None, None, 2) if a == dd else slice(None)
                    for a in range(x.ndim))
        cur_arr = cur_arr[idx]  # even positions = the pass's input grid
    curs = []
    for k, spec in enumerate(plan.passes):
        dd = spec.dd
        idx = tuple(slice(1, None, 2) if a == dd else slice(None)
                    for a in range(x.ndim))
        curs.append(fine[k][idx])
    return cur_arr, curs


def encode_grid_fast(x, plan: FastPlan, eb=None):
    """original grid -> (list of per-pass bins, first-point bin or None).

    `eb` (traced f64 scalar) overrides the plan's static base eb — used by
    the sharded path where REL-style bounds derive from collectives.
    """
    coarse, curs = _decimation_chain(x, plan)
    bins_out = []
    b0 = None
    base_eb = plan.base_eb if eb is None else eb
    if plan.anchor_stride == 0:
        i0 = (0,) * x.ndim
        b0, r0 = quantize(x[i0], jnp.zeros((), x.dtype), base_eb, plan.radius)
        coarse = coarse.at[i0].set(r0)
    for spec, cur in zip(plan.passes, curs):
        pass_eb = None if eb is None else eb / spec.eb_ratio
        coarse, b = encode_pass_fast(cur, coarse, spec, plan.radius, eb=pass_eb)
        bins_out.append(b)
    return bins_out, b0, coarse


def decode_grid_fast(bins_list, literal_list, plan: FastPlan, lit0, b0, dtype):
    """per-pass bins + literal slices -> reconstruction grid."""
    coarse = lit0.astype(dtype)  # initial coarse grid: anchors are literals
    if plan.anchor_stride == 0:
        i0 = (0,) * coarse.ndim
        r0 = recover(jnp.zeros((), dtype), b0, lit0[i0], plan.base_eb, plan.radius)
        coarse = coarse.at[i0].set(r0)
    for spec, b, lit in zip(plan.passes, bins_list, literal_list):
        coarse = decode_pass_fast(coarse, b, lit, spec, plan.radius)
    return coarse


# ---- host-side grid assembly --------------------------------------------------

def _pass_view(grid: np.ndarray, spec: FastPass):
    """numpy strided view of the bins/literal grid for one pass."""
    idx = tuple(slice(spec.cur_start[a], None, spec.cur_steps[a]) for a in range(grid.ndim))
    return grid[idx]


def bins_to_grid(bins_list, plan: FastPlan, b0) -> np.ndarray:
    grid = np.zeros(plan.dims, dtype=np.int32)
    if plan.anchor_stride == 0:
        grid[(0,) * len(plan.dims)] = int(b0)
    for spec, b in zip(plan.passes, bins_list):
        _pass_view(grid, spec)[...] = np.asarray(b)
    return grid


def grid_to_pass_slices(grid: np.ndarray, plan: FastPlan):
    return [np.ascontiguousarray(_pass_view(grid, spec)) for spec in plan.passes]


def initial_literal(literal: np.ndarray, plan: FastPlan) -> np.ndarray:
    idx = tuple(slice(0, None, s) for s in plan.init_steps)
    return np.ascontiguousarray(literal[idx])


@lru_cache(maxsize=32)
def _jit_encode(dims, interp_algo, direction, anchor_stride, alpha, beta, eb,
                quantbin_cnt, dtype_name):
    plan = build_fast_plan(dims, interp_algo=interp_algo, direction=direction,
                           anchor_stride=anchor_stride, alpha=alpha, beta=beta, eb=eb,
                           quantbin_cnt=quantbin_cnt)

    @jax.jit
    def run(x):
        bins_list, b0, recon = encode_grid_fast(x, plan)
        # one flat device->host transfer instead of one per pass
        flat = jnp.concatenate([b.ravel() for b in bins_list]) if bins_list else \
            jnp.zeros((0,), jnp.int32)
        return flat, (b0 if b0 is not None else jnp.int32(0))

    return plan, run


@lru_cache(maxsize=32)
def _jit_decode(dims, interp_algo, direction, anchor_stride, alpha, beta, eb,
                quantbin_cnt, dtype_name):
    plan = build_fast_plan(dims, interp_algo=interp_algo, direction=direction,
                           anchor_stride=anchor_stride, alpha=alpha, beta=beta, eb=eb,
                           quantbin_cnt=quantbin_cnt)
    dtype = jnp.dtype(dtype_name)
    sizes, shapes = [], []
    for spec in plan.passes:
        counts = list(spec.shape_in)
        counts[spec.dd] = spec.p
        shapes.append(tuple(counts))
        sizes.append(int(np.prod(counts)))

    @jax.jit
    def run(bins_flat, lit_flat, lit0, b0):
        bins_list, lit_list = [], []
        off = 0
        for sz, shp in zip(sizes, shapes):
            bins_list.append(jax.lax.slice(bins_flat, (off,), (off + sz,)).reshape(shp))
            lit_list.append(jax.lax.slice(lit_flat, (off,), (off + sz,)).reshape(shp))
            off += sz
        return decode_grid_fast(bins_list, lit_list, plan, lit0, b0, dtype)

    return plan, run


def exec_device():
    """Execution device for the codec kernels.

    SZT_JAX_DEVICE=cpu forces the host XLA backend — required for bit-exact
    f64 (some TPU runtimes ignore JAX_PLATFORMS and emulate f64 as
    float-float, which misrounds ulp-borderline quantization ties; archives
    stay valid and error-bounded but are not sha-identical to the host
    engine's).
    """
    import os
    name = os.environ.get("SZT_JAX_DEVICE", "")
    return jax.devices(name)[0] if name else None


def _maybe_on(dev):
    import contextlib
    return jax.default_device(dev) if dev is not None else contextlib.nullcontext()


def _split_flat(flat: np.ndarray, plan: FastPlan):
    out, off = [], 0
    for spec in plan.passes:
        counts = list(spec.shape_in)
        counts[spec.dd] = spec.p
        n = int(np.prod(counts))
        out.append(flat[off:off + n].reshape(counts))
        off += n
    return out


def interp_encode_bins_grid(x: np.ndarray, **kw) -> np.ndarray:
    """numpy in, bins grid (numpy, data layout) out."""
    plan, run = _jit_encode(tuple(x.shape), int(kw["interp_algo"]), int(kw["direction"]),
                            int(kw["anchor_stride"]), float(kw["alpha"]), float(kw["beta"]),
                            float(kw["eb"]), int(kw["quantbin_cnt"]), str(x.dtype))
    with _maybe_on(exec_device()):
        flat, b0 = run(jnp.asarray(x))
        flat, b0 = np.asarray(flat), np.asarray(b0)
    return bins_to_grid(_split_flat(flat, plan), plan,
                        b0 if plan.anchor_stride == 0 else None)


def interp_decode_grid(bins_grid: np.ndarray, literal: np.ndarray, dtype, **kw) -> np.ndarray:
    plan, run = _jit_decode(tuple(bins_grid.shape), int(kw["interp_algo"]), int(kw["direction"]),
                            int(kw["anchor_stride"]), float(kw["alpha"]), float(kw["beta"]),
                            float(kw["eb"]), int(kw["quantbin_cnt"]), str(np.dtype(dtype)))
    lit = literal.astype(dtype)
    bins_flat = np.concatenate([b.ravel() for b in grid_to_pass_slices(bins_grid, plan)]) \
        if plan.passes else np.zeros(0, np.int32)
    lit_flat = np.concatenate([l.ravel() for l in grid_to_pass_slices(lit, plan)]) \
        if plan.passes else np.zeros(0, dtype)
    with _maybe_on(exec_device()):
        out = run(jnp.asarray(bins_flat), jnp.asarray(lit_flat),
                  jnp.asarray(initial_literal(lit, plan)),
                  jnp.asarray(np.int32(bins_grid[(0,) * bins_grid.ndim])))
        out = np.asarray(out)
    return out
