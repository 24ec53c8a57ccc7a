"""Fully device-resident decode paths: archive payload -> array with the
Huffman bit-walk on the TPU.

Mirrors algos/device_encode.py in the decode direction (VERDICT r2 item 2:
the reference decodes everything in one engine, HuffmanEncoder.hpp:225-279 +
SZGenericCompressor.hpp:65-84; a TPU-native framework must close the loop):

  host : zstd + payload framing open WITHOUT the bit-walk
         (runtime.open_packed -> raw bitstream + exported code table)
  device: speculative window decode of the Huffman stream to the dense
         archive-order symbol sequence (ops/entropy_decode.py; host
         validates the window chain, stragglers re-decode on device)
  device: literal scatter (unpredictables land at their zero-bin slots via
         cumsum + searchsorted + a small scatter) and the structured inverse
         stream layout (ops/stream_unlayout.py) -> per-pass bins/literals
  device: multi-level grid recovery (ops/interp_fast.decode_grid_fast)

NOPRED skips the layout step (stream order == element order,
reference NoPredictionDecomposition.hpp) and recovers vs zero.

Fallbacks (non-f32, no anchor grid, tree outside the window-decode profile,
tiny streams) are counted with reasons like the encode side."""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .. import runtime
from ..config import Config
from ..ops.entropy_decode import DecodeFallback, decode_stream
from ..ops.interp_fast import (build_fast_plan, decode_grid_fast, _maybe_on,
                               exec_device)
from ..ops.stream_layout import build_stream_layout
from ..ops.stream_unlayout import (build_inverse_plan, dense_count,
                                   invert_stream_layout)
from .device_encode import Fallback, _fall, _native_x64


@lru_cache(maxsize=16)
def _static_dec(dims, interp_algo, direction, anchor_stride, alpha, beta, eb,
                quantbin_cnt, dtype_name, screen=False):
    # `screen` = field-screen verdict for the pow2 softfloat bypass (see
    # device_encode._static): part of the key because the lazy trace of
    # `finish` reads it via ops.quantize's contextvar.
    plan = build_fast_plan(dims, interp_algo=interp_algo, direction=direction,
                           anchor_stride=anchor_stride, alpha=alpha, beta=beta,
                           eb=eb, quantbin_cnt=quantbin_cnt)
    if plan.anchor_stride == 0:
        return None, None
    lp = build_stream_layout(plan, interp_algo)
    lplans = build_inverse_plan(lp)
    need = dense_count(lp, lplans)
    anchor_dims = tuple((d - 1) // plan.anchor_stride + 1 for d in dims)
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def finish(dense2d, unpred):
        dense = dense2d.reshape(-1)[:need]
        nzero = jnp.sum((dense == 0).astype(jnp.int32), dtype=jnp.int32)
        lit_dense = _place_literals(dense, unpred, dtype)
        _anc_b, bins_list = invert_stream_layout(jnp, lp, lplans, dense)
        anc_l, lit_list = invert_stream_layout(jnp, lp, lplans, lit_dense)
        lit0 = anc_l.reshape(anchor_dims)
        out = decode_grid_fast(bins_list, lit_list, plan, lit0, None, dtype)
        return out, nzero

    return need, finish


def _place_literals(dense, unpred, dtype):
    """Literal values to their zero-bin slots, in stream order: the k-th
    zero bin consumes unpred[k] (LinearQuantizer.hpp:74-86 recover order).
    cumsum + searchsorted + an unpred-sized scatter — never a dense gather.

    `unpred` arrives PADDED to a bucketed length (_pad_unpred) so the jit
    cache doesn't key on the archive's exact literal count; pad entries have
    k > nzero, searchsorted returns dense.size, and JAX drops out-of-range
    scatters. A literal count that disagrees with the stream's zero count is
    caught by the caller via the returned nzero (the host path raises on
    such archives; the device path must not silently misplace)."""
    if unpred.shape[0] == 0:
        return jnp.zeros(dense.shape[0], dtype)
    ranks = jnp.cumsum((dense == 0).astype(jnp.int32))
    ks = jnp.arange(1, unpred.shape[0] + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(ranks, ks, side="left")
    return jnp.zeros(dense.shape[0], dtype).at[pos].set(unpred)


def _pad_unpred(unpred: np.ndarray, dtype) -> np.ndarray:
    """Pad the literal stream to the next power-of-two bucket (min 128) so
    the decode program compiles once per bucket, not once per archive."""
    n = unpred.size
    if n == 0:
        return np.zeros(0, dtype)
    bucket = 128
    while bucket < n:
        bucket *= 2
    out = np.zeros(bucket, dtype)
    out[:n] = unpred
    return out


def _dense_bins(bits: bytes, count: int, offset: int, codes, lens,
                const_sym: int):
    """Huffman stream -> dense device symbol array (rows, 128)."""
    if const_sym >= 0:
        rows = -(-count // 128) + 1
        return jnp.full((rows, 128), jnp.int32(const_sym))
    try:
        return decode_stream(bits, count, np.asarray(codes, np.int64),
                             np.asarray(lens, np.int64), offset)
    except DecodeFallback as e:
        raise _fall(f"device entropy decode: {e}")


def decode_payload_device(conf: Config, payload: bytes, dtype) -> np.ndarray:
    """INTERP payload -> array with the whole decode on-device (f32/f64; the
    f64 literal scatter and recover are dtype-parameterized throughout — on
    IEEE-f64 backends the output is bit-identical to the host engine's, on
    TPU f64 rides the float-float emulation like the non-packed route)."""
    if np.dtype(dtype) not in (np.float32, np.float64):
        raise _fall("device decode path is float-only")
    if np.dtype(dtype) == np.float64 and not _native_x64():
        # see encode_payload_device: TPU float-float f64 storage is lossy
        raise _fall("f64 device route needs a native-x64 backend")
    # The payload open MUST precede the static plan: the archive's Config
    # tail records the tuner's interp choice, but the payload header is
    # authoritative (the interp compressor re-tunes and can store a different
    # interpolator — reference InterpolationDecomposition serializes its own
    # params). A tail/payload interpAlgo disagreement keeps the stream count
    # identical, so planning from the tail reconstructed with the wrong
    # interpolator SILENTLY (caught on real hardware, round 4). The cost is
    # one extra zstd open when we later fall back — correctness wins.
    bits, count, offset, codes, lens, const_sym, unpred = \
        runtime.open_packed(conf, payload, dtype, algo=2)
    statics = (tuple(conf.dims), int(conf.interpAlgo), conf.interpDirection,
               conf.interpAnchorStride, conf.interpAlpha, conf.interpBeta,
               conf.absErrorBound, conf.quantbinCnt, np.dtype(dtype).name)
    need, finish = _static_dec(*statics)
    if finish is None:
        raise _fall("no anchor grid")
    if count != need:
        raise _fall(f"archived count {count} != layout count {need}")
    # Decode-side field screen for the pow2 softfloat bypass: the inputs the
    # flush-safety proof must clear are the literal stream values (the
    # quantized lattice is safe by the eb argument — quantize.pow2_sha_safe).
    from ..ops import quantize as qz
    screen = (qz.pow2_sha_safe(conf.absErrorBound, conf.quantbinCnt // 2)
              and qz.screen_ok(unpred))
    if screen:  # re-key the jit variant on the screen verdict
        need, finish = _static_dec(*statics, screen)
    n_lit = unpred.size
    dev = exec_device()
    with _maybe_on(dev), qz.screened(screen):
        dense = _dense_bins(bits, count, offset, codes, lens, const_sym)
        out, nzero = finish(dense, jnp.asarray(_pad_unpred(unpred, dtype)))
        out = np.asarray(out)
    if int(nzero) != n_lit:
        raise _fall(f"literal stream length {n_lit} != zero bins {int(nzero)}")
    return out


def decode_payload_device_nopred(conf: Config, payload: bytes,
                                 dtype) -> np.ndarray:
    """NOPRED payload -> array; stream order is element order."""
    if np.dtype(dtype) != np.float32:
        raise _fall("device decode path is f32-only")
    bits, count, offset, codes, lens, const_sym, unpred = \
        runtime.open_packed(conf, payload, dtype, algo=3)
    num = conf.num
    if count != num:
        raise _fall(f"archived count {count} != num {num}")
    n_lit = unpred.size
    dev = exec_device()
    with _maybe_on(dev):
        dense = _dense_bins(bits, count, offset, codes, lens, const_sym)
        out, nzero = _nopred_finish(
            num, conf.absErrorBound, conf.quantbinCnt,
            np.dtype(dtype).name)(dense, jnp.asarray(_pad_unpred(unpred, np.dtype(dtype))))
        out = np.asarray(out)
    if int(nzero) != n_lit:
        raise _fall(f"literal stream length {n_lit} != zero bins {int(nzero)}")
    return out


def decode_payload_device_biomd(conf: Config, payload: bytes,
                                dtype) -> np.ndarray:
    """ALGO_BIOMD payload -> array with the frames>0 recover scan on-device
    (ops/biomd_device.py). The HuffmanV2 + zstd open and frame 0's sequential
    recover chain run in the native engine."""
    if np.dtype(dtype) != np.float32:
        raise _fall("biomd device path is f32-only")
    if len(conf.dims) != 3:
        raise _fall("biomd device path is 3D-only")
    from ..ops import biomd_device as bd

    bins, unpred, site, first_fill, fill = runtime.biomd_open(conf, payload)
    frames, atoms, cols = conf.dims
    last = min(frames, first_fill)
    if site == 0 or last < 2:
        raise _fall("biomd device decode: aperiodic or short trajectory")
    if bins.size != conf.num:
        raise _fall(f"biomd bins count {bins.size} != num {conf.num}")
    eb = conf.absErrorBound
    radius = conf.quantbinCnt // 2
    acols = atoms * cols
    bins0 = bins[:acols].reshape(atoms, cols)
    n0 = int((bins0 == 0).sum())
    bins_rest = bins[acols:last * acols].reshape(last - 1, atoms, cols)
    n_rest = int((bins_rest == 0).sum())
    if unpred.size < n0 + n_rest:
        # short/corrupt literal stream: fall back (counted) rather than crash
        # inside decode_frames' lit[bins==0] = unpred placement
        raise _fall(f"biomd literal stream {unpred.size} < zero bins "
                    f"{n0 + n_rest}")
    recon0 = runtime.biomd_frame0_open(eb, radius, site, bins0, unpred[:n0])
    recs = bd.decode_frames(bins_rest, unpred[n0:n0 + n_rest], recon0,
                            eb, radius, site)
    out = np.empty((frames, atoms, cols), np.float32)
    out[0] = recon0
    out[1:last] = recs
    if first_fill < frames:
        out[first_fill:] = fill
    return out


def decode_payload_device_biomdxtc(conf: Config, payload: bytes,
                                   dtype) -> np.ndarray:
    """ALGO_BIOMDXTC payload -> array: native XTC triplet decode to stored
    bins, then the vectorized recover (one product per cell, pred == 0) on
    device (ops/xtc_device.py; reference biomd.hpp:266-276)."""
    if np.dtype(dtype) != np.float32:
        raise _fall("biomdxtc device path is f32-only")
    from ..ops.interp_fast import _maybe_on, exec_device
    from ..ops.xtc_device import XTC_RADIUS, xtc_recover

    stored, unpred, first_fill, fill = runtime.biomdxtc_open(conf, payload)
    literal = np.zeros(stored.size, np.float32)
    nlit = int((stored == -XTC_RADIUS).sum())
    if nlit != unpred.size:
        raise _fall(f"biomdxtc literal count {nlit} != stream {unpred.size}")
    if nlit:
        literal[stored == -XTC_RADIUS] = unpred
    dev = exec_device()
    with _maybe_on(dev):
        rec = np.asarray(xtc_recover(jnp.asarray(stored),
                                     jnp.asarray(literal),
                                     float(conf.absErrorBound)))
    dims = conf.dims
    if len(dims) == 3:
        out = np.empty(tuple(dims), np.float32)
        fstride = dims[1] * dims[2]
        last = min(dims[0], first_fill)
        if rec.size != last * fstride:
            raise _fall(f"biomdxtc bins {rec.size} != live {last * fstride}")
        out.reshape(-1)[:rec.size] = rec
        if last < dims[0]:
            out[last:] = fill
        return out
    if rec.size != conf.num:
        raise _fall(f"biomdxtc bins {rec.size} != num {conf.num}")
    return rec.reshape(tuple(dims))


# ---- LORENZO_REG: payload -> array with bit-walk + wavefront on-chip ---------


@lru_cache(maxsize=16)
def _jit_blockwise_prep(dims, nb, eb, radius):
    """Dense device symbols -> the wavefront scan's skewed inputs, all on
    device: literal placement (stream order), the static class-split stream
    -> blocked layout, REG pre-placement via recover() (softfloat-exact on
    TPU, IEEE f64 on CPU — matching the scan's recover), blocked -> grid,
    and the two-stage shear skew. No gathers anywhere except the
    literal-count-sized scatter."""
    from ..ops.blockwise_device import BS
    from ..ops.blockwise_wavefront import (LEAD, T_KEEP, skew_device,
                                           stream_to_blocked)
    from ..ops.quantize import recover

    E = BS ** 3
    NX, NY, NZ = (nb[0] * BS, nb[1] * BS, nb[2] * BS)
    TOT = LEAD + NX + NY + NZ - 2
    num = int(np.prod(dims))
    i32 = jnp.int32

    def to_grid(blk):
        return blk.transpose(0, 3, 1, 4, 2, 5).reshape(NX, NY, NZ)

    @jax.jit
    def prep(dense2d, unpred_padded, coef_b, type_b):
        dense = dense2d.reshape(-1)[:num]
        nzero = jnp.sum((dense == 0).astype(i32), dtype=i32)
        lit_dense = _place_literals(dense, unpred_padded, jnp.float32)
        bins_blk = stream_to_blocked(dense, dims, nb)
        lit_blk = stream_to_blocked(lit_dense, dims, nb).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(i32, (BS, BS, BS), 0)
        ys = jax.lax.broadcasted_iota(i32, (BS, BS, BS), 1)
        zs = jax.lax.broadcasted_iota(i32, (BS, BS, BS), 2)
        v = ((jnp.arange(nb[0], dtype=i32)[:, None, None, None, None, None]
              * BS + xs < dims[0])
             & (jnp.arange(nb[1], dtype=i32)[None, :, None, None, None, None]
                * BS + ys < dims[1])
             & (jnp.arange(nb[2], dtype=i32)[None, None, :, None, None, None]
                * BS + zs < dims[2]))
        tb = type_b.reshape(nb[0], nb[1], nb[2], 1, 1, 1)
        type_cells = jnp.where(v, tb, jnp.uint8(T_KEEP))
        c = coef_b.reshape(nb[0], nb[1], nb[2], 1, 1, 1, 4)
        pred = (c[..., 0] * xs.astype(jnp.float32)
                + c[..., 1] * ys.astype(jnp.float32)
                + c[..., 2] * zs.astype(jnp.float32) + c[..., 3])
        rec = recover(pred, bins_blk, lit_blk, eb, radius)
        is_reg_cell = (type_cells == jnp.uint8(T_KEEP)) & v
        G_init = to_grid(jnp.where(is_reg_cell, rec, jnp.float32(0)))
        bins_g = to_grid(jnp.where(v, bins_blk, i32(0)))
        lit_g = to_grid(jnp.where(v, lit_blk, jnp.float32(0)))
        type_g = to_grid(type_cells)
        S0 = skew_device(G_init, TOT, lead=LEAD, off=2)
        bins_s = skew_device(bins_g, TOT - LEAD)
        lit_s = skew_device(lit_g, TOT - LEAD)
        type_s = skew_device(type_g, TOT - LEAD, fill=T_KEEP)
        return S0, bins_s, lit_s, type_s, nzero

    return prep


def decode_payload_device_blockwise(conf: Config, payload: bytes,
                                    dtype) -> np.ndarray:
    """LORENZO_REG payload -> array fully on-device: the bins Huffman
    bit-walk (speculative windows), literal placement, the stream->blocked
    class-split, REG pre-placement, the shear skew, and the anti-diagonal
    wavefront scan all run on the chip; the host opens the payload framing
    and replays the (tiny) coefficient chain. Output is byte-identical to
    the host engine's."""
    if np.dtype(dtype) != np.float32:
        raise _fall("device blockwise decode is f32-only")
    if len(conf.dims) != 3:
        raise _fall("device blockwise decode is 3D-only")
    from ..ops.blockwise_device import BS
    from ..ops import blockwise_wavefront as wf

    roster = [p for p, on in (("L1", conf.lorenzo), ("L2", conf.lorenzo2),
                              ("REG", conf.regression)) if on]
    if not roster:
        raise _fall("all predictors disabled")
    (bits, count, offset, codes, lens, const_sym, sel, regb, qlu, qiu,
     unpred) = runtime.blockwise_open_packed(conf, payload)
    dims = tuple(int(d) for d in conf.dims)
    num = int(np.prod(dims))
    if count != num:
        raise _fall(f"archived count {count} != num {num}")
    nb = tuple(-(-d // BS) for d in dims)
    eb = conf.absErrorBound
    radius = conf.quantbinCnt // 2

    sel_kind, commit_b, coef_b = wf._selection_info(
        dims, nb, roster, sel, regb, qlu, qiu, eb)
    kindmap = {"L1": wf.T_L1, "L2": wf.T_L2, "REG": wf.T_KEEP}
    type_b = np.fromiter((kindmap[k] for k in sel_kind), np.uint8,
                         len(sel_kind))

    prep = _jit_blockwise_prep(dims, nb, float(eb), int(radius))
    run = wf._jit_wavefront((nb[0] * BS, nb[1] * BS, nb[2] * BS),
                            float(eb), int(radius))
    unsk = wf._jit_unskew((nb[0] * BS, nb[1] * BS, nb[2] * BS))
    n_lit = unpred.size
    dev = exec_device()
    with _maybe_on(dev):
        dense = _dense_bins(bits, count, offset, codes, lens, const_sym)
        S0, bins_s, lit_s, type_s, nzero = prep(
            dense, jnp.asarray(_pad_unpred(unpred, np.float32)),
            jnp.asarray(coef_b), jnp.asarray(type_b))
        S = run(S0, bins_s, lit_s, type_s)
        out = np.asarray(unsk(S))
    if int(nzero) != n_lit:
        raise _fall(f"literal stream length {n_lit} != zero bins {int(nzero)}")
    return out[:dims[0], :dims[1], :dims[2]]


@lru_cache(maxsize=16)
def _nopred_finish(num, eb, quantbin_cnt, dtype_name):
    from ..ops.quantize import recover
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def finish(dense2d, unpred):
        bins = dense2d.reshape(-1)[:num]
        nzero = jnp.sum((bins == 0).astype(jnp.int32), dtype=jnp.int32)
        literal = _place_literals(bins, unpred, dtype)
        return recover(jnp.zeros(num, dtype), bins, literal, eb,
                       quantbin_cnt // 2), nzero

    return finish
