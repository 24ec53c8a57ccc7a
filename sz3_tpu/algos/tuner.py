"""Device-vectorized INTERP_LORENZO auto-tuner.

Mirrors the native sampling tuner decision-for-decision (reference
SZAlgoInterp.hpp:122-286, native/szt/pipeline.hpp::tune_interp_lorenzo) but
runs the trial ENCODES on the device: all sampled blocks of a trial stage
ride one vmapped jit program instead of ~6 serial scalar compressions on one
core. Sampling (profiling + block extraction) is vectorized numpy; the
decision logic — sealed trial sizes (host Huffman+zstd, format-exact),
ratio comparisons, 1.02/1.1 thresholds — stays on the host and is
bit-identical to the native tuner's (asserted by tests/test_tuner.py across
a field matrix, and by the golden corpus: a different decision would change
archive bytes).

Stages keep the native trial ORDER (later trials depend on earlier
winners): [linear, cubic] -> [reversed direction] -> [three alpha/beta
pairs]. 1D fields fall back to the native tuner (its lorenzo trial arm;
1D tuning is cheap and rare)."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

from .. import runtime
from ..config import ALGO, Config
from ..stats import cal_abs_error_bound


def _default_anchor_stride(conf: Config) -> None:
    if conf.interpAnchorStride < 0:
        conf.interpAnchorStride = [4096, 128, 32, 16][conf.N - 1]


def _profiling_starts(data: np.ndarray, bs: int, abseb: float,
                      stride: int) -> np.ndarray:
    """Row-major origins of blocks whose sampled range exceeds abseb
    (pipeline.hpp::profiling_block; reference utils/Sample.hpp:8-127).
    Returns (K, N) int64 element origins."""
    dims = data.shape
    N = data.ndim
    for d in dims:
        if d <= bs:
            return np.zeros((0, N), np.int64)
    if stride == 0:
        stride = bs
    axes_o = [np.arange(0, d - bs, bs, dtype=np.int64) for d in dims]
    s = np.arange(0, bs + 1, stride, dtype=np.int64)
    flat = [(o[:, None] + s[None, :]).ravel() for o in axes_o]
    sub = data[np.ix_(*flat)]
    shape = []
    for o in axes_o:
        shape += [o.size, s.size]
    sub = sub.reshape(shape)
    perm = tuple(range(0, 2 * N, 2)) + tuple(range(1, 2 * N, 2))
    sub = np.transpose(sub, perm)
    red = tuple(range(N, 2 * N))
    # replicate the scalar walk's arithmetic exactly (pipeline.hpp
    # profiling_block): the range is a T-typed subtraction promoted to
    # double — `double(mx - mn) > abseb` — NOT an f64-exact difference
    # (1-ulp divergence flips block membership at the threshold); and the
    # comparison chain `v < mn / v > mx` IGNORES NaNs unless the block's
    # ORIGIN value is NaN (then mn/mx stay NaN and the block never
    # profiles). fmax/fmin.reduce give the NaN-ignoring min/max.
    mx = np.fmax.reduce(sub, axis=red)
    mn = np.fmin.reduce(sub, axis=red)
    rng = (mx - mn).astype(np.float64)
    origin_ok = ~np.isnan(sub[(...,) + (0,) * N])
    mask = origin_ok & (rng > abseb)
    idx = np.argwhere(mask)      # row-major — matches the native walk order
    out = np.empty_like(idx)
    for a in range(N):
        out[:, a] = axes_o[a][idx[:, a]]
    return out


def _extract_blocks(data: np.ndarray, origins: np.ndarray,
                    edge: int) -> np.ndarray:
    """(K, N) origins -> (K, edge, .., edge) sample blocks."""
    N = data.ndim
    if origins.shape[0] == 0:
        return np.zeros((0,) + (edge,) * N, data.dtype)
    e = np.arange(edge, dtype=np.int64)
    out = np.empty((origins.shape[0],) + (edge,) * N, data.dtype)
    for k, o in enumerate(origins):
        sl = tuple(slice(int(o[a]), int(o[a]) + edge) for a in range(N))
        out[k] = data[sl]
    return out


def _sample_blocks(data: np.ndarray, sbs: int, rate: float, profiling: bool,
                   starts: np.ndarray) -> np.ndarray:
    """pipeline.hpp::sample_blocks (reference utils/Sample.hpp:129-289)."""
    dims = data.shape
    N = data.ndim
    empty = np.zeros((0,) + (sbs + 1,) * N, data.dtype)
    for d in dims:
        if d < sbs:
            return empty
    if not profiling:
        for d in dims:
            if d <= sbs:
                return empty
    totalblocks = 1
    for d in dims:
        totalblocks *= (d - 1) // sbs
    if profiling:
        stride = int(float(starts.shape[0]) / (float(totalblocks) * rate))
        if stride == 0:
            stride = 1
        return _extract_blocks(data, starts[::stride], sbs + 1)
    # regular grid: origins 0..dims-sbs (exclusive) step sbs, row-major,
    # every `stride`-th taken
    axes_o = [np.arange(0, max(d - sbs, 1), sbs, dtype=np.int64)
              for d in dims]
    grid = np.stack(np.meshgrid(*axes_o, indexing="ij"),
                    axis=-1).reshape(-1, N)
    stride = int(1.0 / rate)
    if stride == 0:
        stride = 1
    return _extract_blocks(data, grid[::stride], sbs + 1)


@lru_cache(maxsize=32)
def _trial_encoder(dims, interp_algo, direction, anchor_stride, alpha, beta,
                   eb, quantbin_cnt, dtype_name):
    """One trial config's vmapped block encoder + its stream permutation."""
    import jax
    import jax.numpy as jnp

    from ..ops.interp_fast import build_fast_plan, encode_grid_fast

    plan = build_fast_plan(dims, interp_algo=interp_algo, direction=direction,
                           anchor_stride=anchor_stride, alpha=alpha,
                           beta=beta, eb=eb, quantbin_cnt=quantbin_cnt)

    def one(x):
        bins_list, b0, _ = encode_grid_fast(x, plan)
        flat = jnp.concatenate([b.ravel() for b in bins_list]) if bins_list \
            else jnp.zeros((0,), jnp.int32)
        return flat, (b0 if b0 is not None else jnp.int32(0))

    return plan, jax.jit(jax.vmap(one))


def _trial_conf(conf: Config, edge: int, algo: int, direction: int,
                alpha: float, beta: float) -> Config:
    t = Config(dims=(edge,) * conf.N, cmprAlgo=ALGO.INTERP,
               absErrorBound=conf.absErrorBound)
    t.interpAlgo = algo
    t.interpDirection = direction
    t.interpAnchorStride = conf.interpAnchorStride
    t.interpAlpha = alpha
    t.interpBeta = beta
    t.quantbinCnt = conf.quantbinCnt
    return t


def _interp_trial(blocks: np.ndarray, conf: Config, edge: int, algo: int,
                  direction: int, alpha: float, beta: float,
                  trial_cap: int) -> float:
    """Ratio of one trial config over the sampled blocks; the seal is the
    format-exact native path so the ratio equals the native trial's."""
    import jax.numpy as jnp

    from ..ops.interp_fast import (_maybe_on, _split_flat, bins_to_grid,
                                   exec_device)

    t = _trial_conf(conf, edge, algo, direction, alpha, beta)
    plan, run = _trial_encoder((edge,) * conf.N, algo, direction,
                               t.interpAnchorStride, alpha, beta,
                               conf.absErrorBound, conf.quantbinCnt,
                               str(blocks.dtype))
    with _maybe_on(exec_device()):
        flat, b0 = run(jnp.asarray(blocks))
        flat, b0 = np.asarray(flat), np.asarray(b0)
    perm = runtime.interp_order(_trial_conf(conf, edge, algo, direction,
                                            alpha, beta))
    streams: List[np.ndarray] = []
    unpreds: List[np.ndarray] = []
    for k in range(blocks.shape[0]):
        grid = bins_to_grid(_split_flat(flat[k], plan), plan,
                            b0[k] if plan.anchor_stride == 0 else None)
        s, u = runtime.perm_emit(perm, grid.ravel(),
                                 np.ascontiguousarray(blocks[k]).ravel())
        streams.append(s)
        unpreds.append(u)
    stream = np.concatenate(streams) if streams else np.zeros(0, np.int32)
    unpred = np.concatenate(unpreds) if unpreds else \
        np.zeros(0, blocks.dtype)
    sealed = runtime.interp_seal(_trial_conf(conf, edge, algo, direction,
                                             alpha, beta),
                                 stream, unpred, trial_cap)
    num = edge ** conf.N
    return float(num * blocks.shape[0] * blocks.dtype.itemsize) / len(sealed)


def tune(conf: Config, data: np.ndarray) -> bool:
    """Vectorized tuner; rewrites conf like the native tune_interp_lorenzo.
    Returns False when outside the profile (caller uses the native tuner)."""
    if conf.N == 1 or data.dtype not in (np.float32, np.float64):
        return False
    cal_abs_error_bound(conf, data)
    _default_anchor_stride(conf)
    N = conf.N
    data = data.reshape(conf.dims)

    sample_rate = 0.005
    sbs = [4096, 128, 32, 16][N - 1]
    shortest = min(conf.dims)
    while sbs >= shortest:
        sbs //= 2
    while sbs >= 16 and (sbs + 1) ** N / conf.num > 1.5 * sample_rate:
        sbs //= 2
    if sbs < 8:
        sbs = 8

    to_tune = (sbs + 1) ** N <= 0.05 * conf.num and \
        all(d >= sbs for d in conf.dims)
    if not to_tune:
        conf.cmprAlgo = ALGO.INTERP
        return True

    starts = _profiling_starts(data, sbs, conf.absErrorBound, sbs // 4)
    per_block = (sbs + 1) ** N
    profiling = float(starts.shape[0] * per_block) >= \
        0.5 * sample_rate * float(conf.num)
    blocks = _sample_blocks(data, sbs, sample_rate, profiling, starts)
    sampling_num = blocks.shape[0] * per_block
    if sampling_num == 0 or sampling_num >= conf.num * 0.2:
        conf.cmprAlgo = ALGO.INTERP
        return True

    trial_cap = conf.num * data.dtype.itemsize
    edge = sbs + 1
    conf.interpDirection = 0
    conf.interpAlpha = 1.25
    conf.interpBeta = 2.0

    best_interp = 0.0
    for op in (0, 1):                                   # linear, cubic
        ratio = _interp_trial(blocks, conf, edge, op, 0, 1.25, 2.0,
                              trial_cap)
        if ratio > best_interp:
            best_interp = ratio
            conf.interpAlgo = op
    fact = 1
    for i in range(2, N + 1):
        fact *= i
    ratio = _interp_trial(blocks, conf, edge, int(conf.interpAlgo),
                          fact - 1, 1.25, 2.0, trial_cap)
    if ratio > best_interp * 1.02:
        best_interp = ratio
        conf.interpDirection = fact - 1
    for a, b in ((1.0, 1.0), (1.5, 2.5), (2.0, 3.0)):
        ratio = _interp_trial(blocks, conf, edge, int(conf.interpAlgo),
                              conf.interpDirection, a, b, trial_cap)
        if ratio > best_interp * 1.02:
            best_interp = ratio
            conf.interpAlpha = a
            conf.interpBeta = b
    # N >= 2: the reference runs its lorenzo arm for 1D only
    # (SZAlgoInterp.hpp:227-241) -> use_interp is always true here
    conf.cmprAlgo = ALGO.INTERP
    return True
