"""Device sweeps for the MDZ/Exaalt time-series methods.

The MDZ per-batch quantize is where the compute is, and each method maps
cleanly onto the device (native/szt/mdz.hpp, from reference tools/mdz +
SZExaaltCompressor.hpp + TimeSeriesDecomposition.hpp):

  VQ  (0): level index l = round((v - start)/offset) is ELEMENTWISE (the
           prediction reads the original value, not a reconstruction), the
           pred stream is a first difference of l — one vectorized pass.
  VQT (1): VQ over frame 0's atoms, then frames>0 quantize against the
           previous frame's RECONSTRUCTION — a lax.scan over frames with the
           atom axis vectorized (the BIOMD pattern).
  MT  (2): frame 0 quantizes against the pinned global first frame
           (vectorized), frames>0 the same scan as VQT.
  TS  (4): frame 0 is a sequential previous-atom chain -> host engine.
  LR  (3): blockwise -> host engine.

Archive-order marshalling matters: ExaaltCodec/TimeSeriesCodec visit
frames>0 in (atom, frame) order (mdz.hpp:88-106), so bins and literal
streams transpose between the scan's (frame, atom) layout and the archive.

Level arithmetic replicates the scalar engine bit-for-bit: the index is
int(std::round(f32((v-start)/offset))) — round HALF AWAY FROM ZERO — done
here in f64 (exact for any f32 input); the level value is
f32(start + f32(l)*offset). The quantizer is the standard strict
LinearQuantizer (ops/quantize, exact-f64 softfloat on TPU).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .quantize import quantize, recover

jax.config.update("jax_enable_x64", True)

MARGIN = 200  # reference set_level margin (mdz.hpp:303, SZExaalt :186)


def _round_half_away(y):
    """int(std::round(y)) for f32 y, exact: f64 floor/ceil with the half
    offset (0.5 adds exactly in f64 for |y| < 2^52)."""
    y64 = y.astype(jnp.float64)
    r = jnp.where(y64 >= 0, jnp.floor(y64 + 0.5), jnp.ceil(y64 - 0.5))
    return r.astype(jnp.int32)


def _to_level(v, ls: float, lo: float):
    return _round_half_away((v - jnp.float32(ls)) / jnp.float32(lo))


def _level_value(l, ls: float, lo: float):
    return jnp.float32(ls) + l.astype(jnp.float32) * jnp.float32(lo)


# ---- VQ: one vectorized pass ---------------------------------------------------

@lru_cache(maxsize=32)
def _jit_vq_encode(eb: float, radius: int, ls: float, lo: float, ln: int):
    @jax.jit
    def run(x):
        l = _to_level(x, ls, lo)
        pred_inds = jnp.concatenate(
            [l[:1] + jnp.int32(ln), jnp.diff(l) + jnp.int32(ln)])
        bins, _ = quantize(x, _level_value(l, ls, lo), eb, radius)
        return bins, pred_inds

    return run


@lru_cache(maxsize=32)
def _jit_vq_decode(eb: float, radius: int, ls: float, lo: float, ln: int):
    @jax.jit
    def run(qinds, pinds, literal):
        l = jnp.cumsum(pinds - jnp.int32(ln), dtype=jnp.int32)
        return recover(_level_value(l, ls, lo), qinds, literal, eb, radius)

    return run


def vq_encode(data: np.ndarray, eb: float, radius: int, ls: float, lo: float,
              ln: int):
    """Flat data -> (quant_inds, pred_inds, unpred) in archive order."""
    x = jnp.asarray(data.ravel())
    bins, pinds = _jit_vq_encode(float(eb), int(radius), float(ls),
                                 float(lo), int(ln))(x)
    bins = np.asarray(bins)
    return bins, np.asarray(pinds), data.ravel()[bins == 0]


def vq_decode(qinds: np.ndarray, pinds: np.ndarray, unpred: np.ndarray,
              eb: float, radius: int, ls: float, lo: float, ln: int):
    literal = np.zeros(qinds.size, np.float32)
    if unpred.size:
        literal[qinds == 0] = unpred
    out = _jit_vq_decode(float(eb), int(radius), float(ls), float(lo),
                         int(ln))(jnp.asarray(qinds), jnp.asarray(pinds),
                                  jnp.asarray(literal))
    return np.asarray(out)


# ---- frames>0 scan (VQT and MT share it) ---------------------------------------

@lru_cache(maxsize=32)
def _jit_frames_encode(eb: float, radius: int):
    @jax.jit
    def run(frames, recon0):
        def step(prev, x):
            bins, rec = quantize(x, prev, eb, radius)
            return rec, bins

        _, bins = jax.lax.scan(step, recon0, frames)
        return bins

    return run


@lru_cache(maxsize=32)
def _jit_frames_decode(eb: float, radius: int):
    @jax.jit
    def run(bins, lits, recon0):
        def step(prev, blt):
            b, lt = blt
            rec = recover(prev, b, lt, eb, radius)
            return rec, rec

        _, recs = jax.lax.scan(step, recon0, (bins, lits))
        return recs

    return run


def frames_encode(frames: np.ndarray, recon0: np.ndarray, eb: float,
                  radius: int):
    """frames (F-1, A) + frame-0 recon -> (bins (F-1, A), unpred in the
    archive's (atom, frame) order)."""
    bins = np.asarray(_jit_frames_encode(float(eb), int(radius))(
        jnp.asarray(frames), jnp.asarray(recon0)))
    unpred = frames.T[bins.T == 0]
    return bins, unpred


def frames_decode(bins: np.ndarray, unpred: np.ndarray, recon0: np.ndarray,
                  eb: float, radius: int) -> np.ndarray:
    lit = np.zeros(bins.shape, np.float32)
    lit_t = lit.T
    lit_t[bins.T == 0] = unpred  # literal stream is (atom, frame) ordered
    return np.asarray(_jit_frames_decode(float(eb), int(radius))(
        jnp.asarray(bins), jnp.asarray(lit), jnp.asarray(recon0)))


# ---- per-method assembly (archive stream order) --------------------------------

@lru_cache(maxsize=32)
def _jit_quant_vs(eb: float, radius: int):
    @jax.jit
    def run(x, pred):
        return quantize(x, pred, eb, radius)

    return run


@lru_cache(maxsize=32)
def _jit_recover_vs(eb: float, radius: int):
    @jax.jit
    def run(pred, bins, literal):
        return recover(pred, bins, literal, eb, radius)

    return run


def exaalt_encode(data: np.ndarray, method: int, eb: float, radius: int,
                  ls: float, lo: float, ln_margin: int):
    """(frames, atoms) data -> (quant_inds, pred_inds, unpred) exactly as
    ExaaltCodec::compress emits them (mdz.hpp:65-107). method 0 = VQ,
    1 = VQT. ln_margin already includes the +200."""
    frames, atoms = data.shape
    if method == 0:
        return vq_encode(data, eb, radius, ls, lo, ln_margin)
    # VQT: frame 0 is VQ over atoms; frames>0 scan against prev recon
    x0 = jnp.asarray(data[0])
    l0 = _to_level(x0, ls, lo)
    pred_inds = np.asarray(jnp.concatenate(
        [l0[:1] + jnp.int32(ln_margin), jnp.diff(l0) + jnp.int32(ln_margin)]))
    b0, r0 = _jit_quant_vs(float(eb), int(radius))(
        x0, _level_value(l0, ls, lo))
    b0 = np.asarray(b0)
    un0 = data[0][b0 == 0]
    if frames > 1:
        bins_rest, un_rest = frames_encode(data[1:], np.asarray(r0), eb, radius)
        quant_inds = np.concatenate([b0, bins_rest.T.ravel()])
        unpred = np.concatenate([un0, un_rest])
    else:
        quant_inds, unpred = b0, un0
    return quant_inds, pred_inds, unpred


def exaalt_decode(quant_inds: np.ndarray, pred_inds: np.ndarray,
                  unpred: np.ndarray, method: int, frames: int, atoms: int,
                  eb: float, radius: int, ls: float, lo: float,
                  ln_margin: int) -> np.ndarray:
    if method == 0:
        return vq_decode(quant_inds, pred_inds, unpred, eb, radius, ls, lo,
                         ln_margin).reshape(frames, atoms)
    b0 = quant_inds[:atoms]
    n0 = int((b0 == 0).sum())
    out0 = vq_decode(b0, pred_inds, unpred[:n0], eb, radius, ls, lo, ln_margin)
    if frames == 1:
        return out0.reshape(1, atoms)
    bins_rest = quant_inds[atoms:].reshape(atoms, frames - 1).T.copy()
    recs = frames_decode(bins_rest, unpred[n0:], out0, eb, radius)
    return np.concatenate([out0[None], recs], axis=0)


def mt_encode(data: np.ndarray, ts0: np.ndarray, eb: float, radius: int):
    """(frames, atoms) data + pinned first frame -> (bins, unpred) exactly as
    TimeSeriesCodec::compress with ts0 set (mdz.hpp:184-202): frame 0
    vectorized against ts0, frames>0 the shared scan; bins/unpred in the
    archive's frame0-then-(atom, frame) order."""
    frames, atoms = data.shape
    b0, r0 = _jit_quant_vs(float(eb), int(radius))(
        jnp.asarray(data[0]), jnp.asarray(ts0))
    b0 = np.asarray(b0)
    un0 = data[0][b0 == 0]
    if frames > 1:
        bins_rest, un_rest = frames_encode(data[1:], np.asarray(r0), eb, radius)
        bins = np.concatenate([b0, bins_rest.T.ravel()])
        unpred = np.concatenate([un0, un_rest])
    else:
        bins, unpred = b0, un0
    return bins, unpred


def mt_decode(bins: np.ndarray, unpred: np.ndarray, ts0: np.ndarray,
              frames: int, atoms: int, eb: float, radius: int) -> np.ndarray:
    b0 = bins[:atoms]
    lit0 = np.zeros(atoms, np.float32)
    n0 = int((b0 == 0).sum())
    if n0:
        lit0[b0 == 0] = unpred[:n0]
    out0 = np.asarray(_jit_recover_vs(float(eb), int(radius))(
        jnp.asarray(ts0), jnp.asarray(b0), jnp.asarray(lit0)))
    if frames == 1:
        return out0.reshape(1, atoms)
    bins_rest = bins[atoms:].reshape(atoms, frames - 1).T.copy()
    recs = frames_decode(bins_rest, unpred[n0:], out0, eb, radius)
    return np.concatenate([out0[None], recs], axis=0)
