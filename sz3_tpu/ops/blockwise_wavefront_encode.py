"""Wavefront device ENCODE for ALGO_LORENZO_REG (3D, f32).

The encode analysis (ARCHITECTURE.md "Wavefront parallelization") identified
three entangled phases in the format's compress sweep
(reference BlockwiseDecomposition.hpp:28-47, ComposedPredictor.hpp:25-40,
RegressionPredictor.hpp:148-155):
  1. per-block least-squares fits — read only the block's own ORIGINAL
     cells (blocks are visited row-major and a block is quantized only
     after its fit), so they are embarrassingly parallel;
  2. predictor selection + the regression coefficient chain — selection
     samples reconstructed PAD cells of row-major-earlier blocks; the chain
     quantizes each committing block's coefficients against the previous
     committing block's reconstruction in global row-major order;
  3. the element sweep — the same anti-diagonal dependency the decode
     wavefront exploits (ops/blockwise_wavefront.py).

This module breaks the selection->sweep cycle SPECULATIVELY instead of
scheduling it: selection is first computed with ORIGINAL values standing in
for the reconstructed pads (pass B, fully parallel), the chain replays
natively from the speculated commit pattern (runtime.blockwise_coef_chain_
encode — a few scalar ops per block), the element sweep runs once as the
skewed anti-diagonal scan (pass C, same schedule as the decode wavefront
with quantize() in place of recover()), and the TRUE selection is then
recomputed from the actual reconstructed pads (pass D) and compared.

Certification: if pass D reproduces pass B's selection for EVERY block, the
result equals the host engine's byte-for-byte, by induction over the
row-major block order — a block's selection depends only on its own original
cells, its own fit (original cells), and reconstructed pads of earlier
blocks; if all earlier selections match the host's, the chain state and the
reconstruction match, so the recomputed selection is the host's selection,
and its agreement with the speculated one closes the induction. On mismatch
the corrected selection seeds another sweep (selection flips are rare: the
speculation error per pad tap is bounded by eb); after MAX_PASSES without a
fixpoint the caller falls back to the host engine.

Scope: f32, 3D, rosters without Lorenzo-2 (lorenzo2 is default-off in the
reference; rosters containing it raise Fallback and route to the host
engine). Byte parity with the host engine is asserted on the golden matrix
by tests/test_blockwise_wavefront_encode.py (CPU backend, true IEEE f64).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .quantize import quantize
from .blockwise_device import BS, _element_masks, _noise
from .blockwise_wavefront import (LEAD, T_L1, T_L2, T_KEEP, _skew_view,
                                  _blocks_to_grid)

jax.config.update("jax_enable_x64", True)

E = BS ** 3
DBL_MAX = float(np.finfo(np.float64).max)
MAX_PASSES = 3

from .blockwise_wavefront import jit_skew as _jit_skew  # noqa: E402


@lru_cache(maxsize=8)
def _jit_blocksT(gdims: Tuple[int, int, int], nb: Tuple[int, int, int]):
    """Jitted (NX,NY,NZ) grid -> (E, NBLK) block-transposed layout for the
    regression fits (device-side _grid_to_blocks + transpose)."""
    NX, NY, NZ = gdims

    @jax.jit
    def run(G):
        b = G.reshape(nb[0], BS, nb[1], BS, nb[2], BS)
        b = jnp.transpose(b, (0, 2, 4, 1, 3, 5)).reshape(-1, BS ** 3)
        return jnp.transpose(b, (1, 0))

    return run


@lru_cache(maxsize=8)
def _jit_frontpad(gdims: Tuple[int, int, int]):
    return jax.jit(lambda G: jnp.pad(G, ((2, 0), (2, 0), (2, 0))))


class Fallback(Exception):
    """Raised when the speculative schedule cannot certify byte parity
    (selection fixpoint not reached in MAX_PASSES, or unsupported roster);
    the caller routes to the host engine."""


def _grid_to_blocks(G: np.ndarray, nb) -> np.ndarray:
    """(nb0*6, nb1*6, nb2*6) grid -> (nblocks, 216) block-major (inverse of
    blockwise_wavefront._blocks_to_grid)."""
    a = G.reshape(nb[0], BS, nb[1], BS, nb[2], BS)
    return np.ascontiguousarray(
        a.transpose(0, 2, 4, 1, 3, 5).reshape(-1, E))


# ---------------------------------------------------------------------------
# pass A: least-squares fits (parallel across blocks)
# ---------------------------------------------------------------------------

@jax.jit
def _fits(ob, ex):
    """ob: (216, NBLK) f32 blocked original values (row-major in-block order,
    zeros beyond extents); ex: (3, NBLK) i32 per-dim extents. Returns raw
    coefficients (4, NBLK) f32 with the reference's exact narrowing points
    (RegressionPredictor.hpp:28-55; accumulation is ordered f64 of f32
    index*value products, replicated from ops/blockwise_device.py)."""
    f64 = jnp.float64
    NBLK = ob.shape[1]

    def step(t, sums):
        x = t // (BS * BS)
        y = (t // BS) % BS
        z = t % BS
        v = (x < ex[0]) & (y < ex[1]) & (z < ex[2])
        c = ob[t]
        add = lambda s, term: s + jnp.where(v, term.astype(f64), f64(0))
        s0, s1, s2, s3 = sums
        s0 = add(s0, x.astype(jnp.float32) * c)
        s1 = add(s1, y.astype(jnp.float32) * c)
        s2 = add(s2, z.astype(jnp.float32) * c)
        s3 = add(s3, c)
        return (s0, s1, s2, s3)

    z = jnp.zeros((NBLK,), f64)
    sums = jax.lax.fori_loop(0, E, step, (z, z, z, z))
    bd = [ex[i].astype(f64) for i in range(3)]
    nelem = bd[0] * bd[1] * bd[2]
    coefs = []
    for i in range(3):
        ci = ((2 * sums[i] / (bd[i] - 1) - sums[3]) * 6 / nelem
              / (bd[i] + 1)).astype(jnp.float32)
        coefs.append(ci)
    cN = (sums[3] / nelem).astype(jnp.float32)
    for i in range(3):
        cN = (cN.astype(f64) - (bd[i] - 1) * coefs[i].astype(f64) / 2
              ).astype(jnp.float32)
    coefs.append(cN)
    return jnp.stack(coefs)


# ---------------------------------------------------------------------------
# pass B/D: predictor selection (parallel; pads speculated then validated)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _jit_select(dims: Tuple[int, int, int], eb: float):
    """Sampled-error selection for the {L1, REG} roster, vectorized over the
    whole block grid with strided slices (no gathers). Inputs: the padded
    ORIGINAL grid and the padded TAP grid (original for pass B's
    speculation, reconstruction for pass D's validation) — a tap reads the
    original grid when it lands inside the block being selected (those cells
    are pre-sweep in the host engine) and the tap grid when it crosses into
    a pad (row-major-earlier blocks, reconstructed by sweep time). Returns
    is_reg (nb-grid bool): selection == REGRESSION and the fit is valid.

    Sample order is the reference diagonal pattern
    (BlockwiseIterator.hpp:151-184): i ascending, four points per i, with
    j = m-1-i. Every (i, j) pair with i+j <= 5 is computed statically and
    masked by [j == m-1-i][i < m]; adding the masked-out exact zeros keeps
    the f64 accumulation order identical to the host's."""
    dims = tuple(int(d) for d in dims)
    nb = tuple(-(-d // BS) for d in dims)
    noise1 = np.float32(_noise(1, 3, eb))

    def build(orig_p, tap_p, ex, m, coefs):
        cache = {}

        def val(a, b, c):
            """Block-strided value at static offset (a, b, c) from each
            block's base; negative coordinates cross into pads."""
            grid = orig_p if (a >= 0 and b >= 0 and c >= 0) else tap_p
            key = (a, b, c, a >= 0 and b >= 0 and c >= 0)
            if key not in cache:
                cache[key] = jax.lax.slice(
                    grid, (2 + a, 2 + b, 2 + c),
                    (2 + a + BS * (nb[0] - 1) + 1,
                     2 + b + BS * (nb[1] - 1) + 1,
                     2 + c + BS * (nb[2] - 1) + 1),
                    (BS, BS, BS))
            return cache[key]

        def l1(px, py, pz):
            # reference prev3(k,j,i) reads (x-j, y-k, z-i); exact f32 order
            at = lambda dk, dj, di: val(px - dj, py - dk, pz - di)
            return (at(0, 0, 1) + at(0, 1, 0) + at(1, 0, 0) - at(0, 1, 1)
                    - at(1, 0, 1) - at(1, 1, 0) + at(1, 1, 1))

        def sample_errs(px, py, pz):
            c = val(px, py, pz)
            e1 = jnp.abs(c - l1(px, py, pz)) + noise1
            fpx = jnp.float32(px)
            fpy = jnp.float32(py)
            fpz = jnp.float32(pz)
            pr = coefs[0] * fpx + coefs[1] * fpy + coefs[2] * fpz + coefs[3]
            er = jnp.abs(c - pr)
            return e1, er

        f64 = jnp.float64
        err1 = jnp.zeros(nb, f64)
        errR = jnp.zeros(nb, f64)
        for i in range(BS):
            for j in range(BS - i):
                mask = (m - 1 - i == j) & (i < m)
                for (px, py, pz) in ((i, i, i), (i, i, j), (i, j, i),
                                     (i, j, j)):
                    e1, er = sample_errs(px, py, pz)
                    err1 = err1 + jnp.where(mask, e1.astype(f64), f64(0))
                    errR = errR + jnp.where(mask, er.astype(f64), f64(0))
        reg_valid = (ex[0] > 1) & (ex[1] > 1) & (ex[2] > 1)
        errR = jnp.where(reg_valid, errR, f64(DBL_MAX))
        # roster order [L1, REG]: strict less-than, first index wins
        sid_reg = errR < err1
        # ok = valid[sid] (ComposedPredictor): only REG can be invalid; an
        # invalid REG wins only against a non-finite L1 error (inf/NaN data)
        return sid_reg & reg_valid

    return jax.jit(build)


# ---------------------------------------------------------------------------
# REG pre-placement (host, exact IEEE): quantize REG blocks' cells against
# their reconstructed-coefficient plane predictions — no neighbor reads.
# ---------------------------------------------------------------------------

def _np_quantize(data, pred, eb: float, radius: int):
    """Vectorized numpy replica of LinearQuantizer::quantize
    (native/szt/quantizer.hpp:39-62; same clamp trick as
    ops/quantize._quantize_native). Returns (bins i32, recon f32)."""
    recip = 1.0 / eb
    diff = (data - pred).astype(np.float32)
    scaled = np.abs(diff).astype(np.float64) * recip
    qi = np.minimum(scaled, np.float64(2 * radius)).astype(np.int32) + 1
    half = qi >> 1
    qeven = half << 1
    neg = diff < 0
    q = np.where(neg, -qeven, qeven)
    shifted = np.where(neg, radius - half, radius + half)
    dec = (pred.astype(np.float64) + q.astype(np.float64) * eb
           ).astype(np.float32)
    err = np.abs((dec - data).astype(np.float32).astype(np.float64))
    ok = (qi < 2 * radius) & (err <= eb)
    bins = np.where(ok, shifted, 0).astype(np.int32)
    recon = np.where(ok, dec, data).astype(np.float32)
    return bins, recon


def _reg_preplace(orig_b, coef_recon_b, reg_pred_b, masks, eb, radius):
    """Quantize all REG-predicted blocks' cells in parallel. orig_b:
    (NBLK, E) f32; coef_recon_b: (NBLK, 4) reconstructed coefficients;
    reg_pred_b: (NBLK,) bool. Returns (bins_b, recon_b) with zeros outside
    REG blocks / extents."""
    nblk = orig_b.shape[0]
    bins_b = np.zeros((nblk, E), np.int32)
    recon_b = np.zeros((nblk, E), np.float32)
    idx = np.nonzero(reg_pred_b)[0]
    if idx.size == 0:
        return bins_b, recon_b
    t = np.arange(E)
    lx = (t // (BS * BS)).astype(np.float32)
    ly = ((t // BS) % BS).astype(np.float32)
    lz = (t % BS).astype(np.float32)
    c = coef_recon_b[idx]
    pred = (c[:, 0:1] * lx + c[:, 1:2] * ly + c[:, 2:3] * lz + c[:, 3:4]
            ).astype(np.float32)
    b, r = _np_quantize(orig_b[idx], pred, eb, radius)
    mk = masks[idx]
    bins_b[idx] = np.where(mk, b, 0)
    recon_b[idx] = np.where(mk, r, np.float32(0))
    return bins_b, recon_b


# ---------------------------------------------------------------------------
# pass C: the element sweep as the skewed anti-diagonal scan (quantize form
# of blockwise_wavefront._jit_wavefront)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _jit_wavefront_enc(gdims: Tuple[int, int, int], eb: float, radius: int):
    NX, NY, NZ = gdims
    TOT = LEAD + NX + NY + NZ - 2
    i32 = jnp.int32

    def plane(S, s, dk, di):
        return jax.lax.dynamic_slice(S, (s, 2 - dk, 2 - di), (1, NY, NZ))[0]

    def step(S, xs):
        t0, orig_t, type_t = xs
        win = jax.lax.dynamic_slice(S, (t0 - 6, i32(0), i32(0)),
                                    (6, NY + 2, NZ + 2))
        at = lambda dk, dj, di: plane(win, 6 - (dj + dk + di), dk, di)
        p1 = (at(0, 0, 1) + at(0, 1, 0) + at(1, 0, 0) - at(0, 1, 1)
              - at(1, 0, 1) - at(1, 1, 0) + at(1, 1, 1))
        p2 = (2 * at(0, 0, 1) - at(0, 0, 2) + 2 * at(0, 1, 0) - 4 * at(0, 1, 1)
              + 2 * at(0, 1, 2) - at(0, 2, 0) + 2 * at(0, 2, 1) - at(0, 2, 2)
              + 2 * at(1, 0, 0) - 4 * at(1, 0, 1) + 2 * at(1, 0, 2)
              - 4 * at(1, 1, 0) + 8 * at(1, 1, 1) - 4 * at(1, 1, 2)
              + 2 * at(1, 2, 0) - 4 * at(1, 2, 1) + 2 * at(1, 2, 2)
              - at(2, 0, 0) + 2 * at(2, 0, 1) - at(2, 0, 2) + 2 * at(2, 1, 0)
              - 4 * at(2, 1, 1) + 2 * at(2, 1, 2) - at(2, 2, 0)
              + 2 * at(2, 2, 1) - at(2, 2, 2))
        pred = jnp.where(type_t == T_L2, p2, p1)
        bins, rec = quantize(orig_t, pred, eb, radius)
        keep = jax.lax.dynamic_slice(S, (t0, i32(2), i32(2)), (1, NY, NZ))[0]
        lorz = type_t < T_KEEP
        out = jnp.where(lorz, rec, keep)
        bins_out = jnp.where(lorz, bins, i32(0))
        S = jax.lax.dynamic_update_slice(S, out[None], (t0, i32(2), i32(2)))
        return S, bins_out

    @jax.jit
    def run(S0, orig_s, type_s):
        ts = jnp.arange(LEAD, TOT, dtype=i32)
        S, bins_s = jax.lax.scan(step, S0, (ts, orig_s, type_s))
        return S, bins_s

    return run


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def encode_blocks_wavefront(data: np.ndarray, eb: float, radius: int,
                            use_l1: bool, use_l2: bool, use_reg: bool,
                            device_streams: bool = False):
    """Device wavefront compress sweep; returns host-side streams matching
    ops/blockwise_device.encode_blocks:
    (bins_stream, selection, reg_bins, ql_unpred, qi_unpred, unpred).
    Raises Fallback for unsupported rosters/shapes or when the speculative
    selection cannot be certified.

    device_streams=True returns instead the pieces the device entropy stage
    consumes WITHOUT reading the element bins back to the host:
    (bins_skew_dev, orig_skew_dev, bins_reg_grid_host, selection, reg_bins,
    ql_unpred, qi_unpred, nb) — see algos/device_encode.
    encode_payload_device_blockwise."""
    from .interp_fast import _maybe_on, exec_device
    from .. import runtime

    dims = tuple(int(d) for d in data.shape)
    if len(dims) != 3 or data.dtype != np.float32:
        raise Fallback("wavefront encode: f32 3D only")
    if use_l2 or not (use_l1 or use_reg):
        raise Fallback("wavefront encode: lorenzo2 rosters route to host")
    eb = float(eb)
    radius = int(radius)
    single = not (use_l1 and use_reg)
    nb = tuple(-(-d // BS) for d in dims)
    nblk = int(np.prod(nb))
    NX, NY, NZ = (nb[0] * BS, nb[1] * BS, nb[2] * BS)
    masks = _element_masks(dims, nb)

    # rounded-up original grid (zeros beyond dims — never read by valid
    # cells: Lorenzo offsets are strictly negative); the front-padded
    # selection variant derives on-device (_jit_frontpad)
    G = np.zeros((NX, NY, NZ), np.float32)
    G[:dims[0], :dims[1], :dims[2]] = data
    orig_b = _grid_to_blocks(G, nb)

    # per-block extents + m
    bi = np.arange(nb[0])[:, None, None]
    bj = np.arange(nb[1])[None, :, None]
    bk = np.arange(nb[2])[None, None, :]
    ex_g = np.stack([np.broadcast_to(np.minimum(BS, dims[0] - bi * BS),
                                     nb).astype(np.int32),
                     np.broadcast_to(np.minimum(BS, dims[1] - bj * BS),
                                     nb).astype(np.int32),
                     np.broadcast_to(np.minimum(BS, dims[2] - bk * BS),
                                     nb).astype(np.int32)])
    m_g = ex_g.min(axis=0)
    reg_valid = (ex_g > 1).all(axis=0)  # (nb) bool

    dev = exec_device()
    with _maybe_on(dev):
        # the rounded grid uploads ONCE; the fits' block-transposed layout
        # and the front-padded selection grid derive on-device (the tunnel
        # link is latency-bound, round-5 trace: the encode wall was ~4 s of
        # transfer for ~215 ms of device compute)
        G_dev = jnp.asarray(G)
        # ---- pass A: fits
        if use_reg:
            coefs_raw = np.asarray(_fits(
                _jit_blocksT((NX, NY, NZ), tuple(nb))(G_dev),
                jnp.asarray(ex_g.reshape(3, -1))))  # (4, NBLK)
        else:
            coefs_raw = np.zeros((4, nblk), np.float32)
        coefs_g = coefs_raw.reshape(4, *nb)

        # ---- pass B: speculative selection (pads = original values)
        orig_p_dev = _jit_frontpad((NX, NY, NZ))(G_dev)
        ex_dev = jnp.asarray(ex_g)
        m_dev = jnp.asarray(m_g)
        if single:
            is_reg = reg_valid if use_reg else np.zeros(nb, bool)
        else:
            sel_fn = _jit_select(dims, eb)
            is_reg = np.asarray(sel_fn(orig_p_dev, orig_p_dev, ex_dev,
                                       m_dev, jnp.asarray(coefs_g)))

        run = _jit_wavefront_enc((NX, NY, NZ), eb, radius)
        TOT = LEAD + NX + NY + NZ - 2
        # skew ON DEVICE: the numpy strided-view writes into the ~3x slabs
        # cost seconds per pass at 256^3 (round-5 wall autopsy of the 18.8 s
        # end-to-end encode); shear-reshapes on the chip are ~ms
        orig_s_dev = _jit_skew((NX, NY, NZ), TOT - LEAD, 0, 0, "float32",
                               0.0)(G_dev)
        certified = single  # single-predictor rosters are not speculative
        for _ in range(MAX_PASSES):
            is_reg_f = is_reg.reshape(-1)
            # ---- chain (native, exact) over committing blocks
            n_dims = 3
            if is_reg_f.any():
                raw_commit = coefs_raw.T[is_reg_f]  # (ncommit, 4) row-major
                regb_c, creg_c = runtime.blockwise_coef_chain_encode(
                    eb / (n_dims + 1) / BS, eb / (n_dims + 1), raw_commit)
            else:
                raw_commit = np.zeros((0, 4), np.float32)
                regb_c = np.zeros((0, 4), np.int32)
                creg_c = np.zeros((0, 4), np.float32)
            coef_recon_b = np.zeros((nblk, 4), np.float32)
            coef_recon_b[is_reg_f] = creg_c

            # ---- REG pre-placement (host, exact IEEE)
            bins_reg_b, recon_reg_b = _reg_preplace(
                orig_b, coef_recon_b, is_reg_f, masks, eb, radius)
            G_init = _blocks_to_grid(recon_reg_b, nb, np.float32)
            bins_reg_g = _blocks_to_grid(bins_reg_b, nb, np.int32)

            # ---- per-cell types: L1 in the wavefront, REG/out-of-dims kept
            type_b = np.where(is_reg_f[:, None] & masks, T_KEEP, T_L1
                              ).astype(np.uint8)
            type_b[~masks] = T_KEEP
            type_g = _blocks_to_grid(type_b, nb, np.uint8)

            # ---- skew + scan (shears on-device; only the compact 67 MB
            # unskewed grids cross H2D)
            S0_dev = _jit_skew((NX, NY, NZ), TOT, LEAD, 2, "float32",
                               0.0)(jnp.asarray(G_init))
            type_s_dev = _jit_skew((NX, NY, NZ), TOT - LEAD, 0, 0, "uint8",
                                   T_KEEP)(jnp.asarray(type_g))
            S, bins_s = run(S0_dev, orig_s_dev, type_s_dev)

            if certified:
                break
            # ---- pass D: validation — true selection from recon pads.
            # The unskew + front-pad + selection all run ON DEVICE: only the
            # (nb) selection mask crosses D2H. (Reading the full skewed slab
            # back per pass is ~3x the field in bytes — on a remote-attached
            # chip that single transfer dominated the whole encode.)
            from .blockwise_wavefront import _jit_unskew
            recon_dev = _jit_unskew((NX, NY, NZ))(S)
            Rp_dev = jnp.pad(recon_dev, ((2, 0), (2, 0), (2, 0)))
            is_reg_true = np.asarray(sel_fn(
                orig_p_dev, Rp_dev, ex_dev, m_dev,
                jnp.asarray(coefs_g)))
            if np.array_equal(is_reg_true, is_reg):
                certified = True
                break
            is_reg = is_reg_true
        if not certified:
            _count_fallback("blockwise_wavefront_encode_fixpoint")
            raise Fallback("selection fixpoint not reached in "
                           f"{MAX_PASSES} passes")

        if not device_streams:
            bins_host = np.asarray(bins_s)

    is_reg_f = is_reg.reshape(-1)
    if single:
        selection = np.zeros(0, np.int32)
    else:
        # one entry per block with a valid pick; REG is roster index 1.
        # ok=false (invalid REG argmin, non-finite data only) emits nothing —
        # _jit_select folds that into is_reg=False/L1, and ok=false cannot
        # occur with finite data (an invalid fit's DBL_MAX never beats a
        # finite L1 error), so every block emits here like the host.
        selection = np.where(is_reg_f, np.int32(1), np.int32(0))
    reg_bins = regb_c.reshape(-1).astype(np.int32)
    ql_unpred = raw_commit[:, :3][regb_c[:, :3] == 0].astype(np.float32)
    qi_unpred = raw_commit[:, 3][regb_c[:, 3] == 0].astype(np.float32)

    if device_streams:
        # element bins stay on device; orig_s is already resident — the
        # entropy stage derives both streams there (device_encode)
        return (bins_s, orig_s_dev, bins_reg_g, selection, reg_bins,
                ql_unpred, qi_unpred, nb)

    # ---- streams (row-major block order; literal order mirrors the host)
    bins_scan_g = _skew_view(bins_host, NX, NY, NZ).copy()
    bins_g = bins_scan_g + bins_reg_g
    bins_b = _grid_to_blocks(bins_g, nb)
    bins_stream = bins_b[masks].astype(np.int32)
    orig_stream = orig_b[masks]
    unpred = np.ascontiguousarray(orig_stream[bins_stream == 0])
    return (bins_stream, selection, reg_bins, ql_unpred, qi_unpred, unpred)


def _count_fallback(key: str) -> None:
    try:
        from ..algos.device_encode import fallback_counts
        fallback_counts[key] = fallback_counts.get(key, 0) + 1
    except Exception:
        pass
