"""Device execution of ALGO_LORENZO_REG (the SZ2-era blockwise path).

Semantics replicated from native/szt/blockwise.hpp (itself byte-parity with
reference BlockwiseDecomposition/ComposedPredictor/RegressionPredictor):
front-padded grid, row-major 6^3 block sweep, per-block predictor selection
by ordered-f64 sampled error, least-squares regression fits over ORIGINAL
cells, the global row-major coefficient chain, and per-element
predict+quantize against reconstructed neighbors.

Execution shape: a lax.scan over blocks in row-major order (the coefficient
chain and cross-block reconstructed reads are true sequential dependencies
of the FORMAT — see ARCHITECTURE.md for the wavefront analysis), with the
fit/selection/element loops as masked fori over the padded 8^3 block
neighborhood. This is a correctness-first formulation: it runs on any
backend and is byte-parity with the host engine under real-f64 backends
(golden + config matrix in tests/test_blockwise_device.py); the
block-parallel wavefront is the round-3 performance plan.

f32, N in {1,2,3} (4D lorenzo2 is unsupported in the reference too; 4D
routes to the host engine).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .quantize import quantize, recover

jax.config.update("jax_enable_x64", True)

BS = 6          # reference blockSize for 3D (Config.hpp:175)
PAD = 2

DBL_MAX = float(np.finfo(np.float64).max)


def _noise(order: int, n_dims: int, eb: float) -> float:
    n1 = [0, 0.5, 0.81, 1.22, 1.79]
    n2 = [0, 1.08, 2.76, 6.8]
    return (n1[n_dims] if order == 1 else (n2[n_dims] if n_dims <= 3 else 0.0)) * eb


def _l1_3d(loc, x, y, z):
    """1st-order Lorenzo, exact reference summation order.

    Reference prev3(k,j,i) = *(d - (k*ds[1] + j*ds[0] + i)) reads grid cell
    (x-j, y-k, z-i) — the j argument moves PLANES and k moves ROWS
    (LorenzoPredictor.hpp:66-68,104-106). The stencil set is axis-symmetric,
    but the f32 summation order is not: mapping (k,j) the intuitive way
    round swaps two terms in the chain and drifts the prediction by an ulp
    at rounding boundaries (bit-parity breaker)."""
    at = lambda dk, dj, di: jax.lax.dynamic_slice(
        loc, (x - dj, y - dk, z - di), (1, 1, 1))[0, 0, 0]
    return (at(0, 0, 1) + at(0, 1, 0) + at(1, 0, 0) - at(0, 1, 1)
            - at(1, 0, 1) - at(1, 1, 0) + at(1, 1, 1))


def _l2_3d(loc, x, y, z):
    at = lambda dk, dj, di: jax.lax.dynamic_slice(
        loc, (x - dj, y - dk, z - di), (1, 1, 1))[0, 0, 0]
    return (2 * at(0, 0, 1) - at(0, 0, 2) + 2 * at(0, 1, 0) - 4 * at(0, 1, 1)
            + 2 * at(0, 1, 2) - at(0, 2, 0) + 2 * at(0, 2, 1) - at(0, 2, 2)
            + 2 * at(1, 0, 0) - 4 * at(1, 0, 1) + 2 * at(1, 0, 2)
            - 4 * at(1, 1, 0) + 8 * at(1, 1, 1) - 4 * at(1, 1, 2)
            + 2 * at(1, 2, 0) - 4 * at(1, 2, 1) + 2 * at(1, 2, 2)
            - at(2, 0, 0) + 2 * at(2, 0, 1) - at(2, 0, 2) + 2 * at(2, 1, 0)
            - 4 * at(2, 1, 1) + 2 * at(2, 1, 2) - at(2, 2, 0)
            + 2 * at(2, 2, 1) - at(2, 2, 2))


@lru_cache(maxsize=8)
def _jit_encode_blocks(dims: Tuple[int, ...], eb: float, radius: int,
                       use_l1: bool, use_l2: bool, use_reg: bool):
    """Returns (nblocks tuple, jitted fn(x_padded) -> per-block streams)."""
    n_dims = len(dims)
    if n_dims != 3:
        raise NotImplementedError("device blockwise: 3D first")
    nb = tuple(-(-d // BS) for d in dims)
    nblocks = int(np.prod(nb))
    roster = []
    if use_l1:
        roster.append("L1")
    if use_l2:
        roster.append("L2")
    if use_reg:
        roster.append("REG")
    if not roster:
        raise ValueError("all predictors disabled")
    single = len(roster) == 1
    noise1 = _noise(1, n_dims, eb)
    noise2 = _noise(2, n_dims, eb)
    eb_ql = eb / (n_dims + 1) / BS
    eb_qi = eb / (n_dims + 1)
    creg = 32768  # coef quantizer default radius (LinearQuantizer ctor)
    E = BS * BS * BS
    i32 = jnp.int32
    f64 = jnp.float64

    def block_body(carry, bidx):
        grid, prev_coef = carry
        bi = bidx // (nb[1] * nb[2])
        bj = (bidx // nb[2]) % nb[1]
        bk = bidx % nb[2]
        b0 = (bi * BS, bj * BS, bk * BS)
        ex = (jnp.minimum(i32(BS), i32(dims[0]) - b0[0]),
              jnp.minimum(i32(BS), i32(dims[1]) - b0[1]),
              jnp.minimum(i32(BS), i32(dims[2]) - b0[2]))
        loc = jax.lax.dynamic_slice(grid, b0, (BS + PAD, BS + PAD, BS + PAD))

        # ---- regression fit: ordered f64 sums over the block's own cells
        # (original values; T(li)*c products computed in f32 like the
        # reference's index-to-T conversion)
        def fit_step(t, sums):
            x = t // (BS * BS)
            y = (t // BS) % BS
            z = t % BS
            v = (x < ex[0]) & (y < ex[1]) & (z < ex[2])
            c = jax.lax.dynamic_slice(loc, (PAD + x, PAD + y, PAD + z),
                                      (1, 1, 1))[0, 0, 0]
            add = lambda s, term: s + jnp.where(v, term.astype(f64), f64(0))
            s0, s1, s2, s3 = sums
            s0 = add(s0, x.astype(jnp.float32) * c)
            s1 = add(s1, y.astype(jnp.float32) * c)
            s2 = add(s2, z.astype(jnp.float32) * c)
            s3 = add(s3, c)
            return (s0, s1, s2, s3)

        sums = jax.lax.fori_loop(0, E, fit_step,
                                 (f64(0), f64(0), f64(0), f64(0)))
        bd = [e.astype(f64) for e in ex]
        nelem = bd[0] * bd[1] * bd[2]
        reg_valid = (ex[0] > 1) & (ex[1] > 1) & (ex[2] > 1)
        # reference RegressionPredictor.hpp:41-53: each coefficient narrows
        # to T as computed; the intercept re-narrows after every axis update
        coefs_raw = []
        for i in range(3):
            ci = ((2 * sums[i] / (bd[i] - 1) - sums[3]) * 6 / nelem
                  / (bd[i] + 1)).astype(jnp.float32)
            coefs_raw.append(ci)
        cN = (sums[3] / nelem).astype(jnp.float32)
        for i in range(3):
            cN = (cN.astype(f64)
                  - (bd[i] - 1) * coefs_raw[i].astype(f64) / 2
                  ).astype(jnp.float32)
        coefs_raw.append(cN)
        coefs_raw = jnp.stack(coefs_raw)

        # ---- selection: sampled diagonal error in sampling order
        m = jnp.minimum(jnp.minimum(ex[0], ex[1]), ex[2])

        def sample_err(pred_kind):
            def step(i, acc):
                jdx = m - 1 - i
                pts = ((i, i, i), (i, i, jdx), (i, jdx, i), (i, jdx, jdx))
                for (px, py, pz) in pts:
                    px = jnp.asarray(px, i32)
                    py = jnp.asarray(py, i32)
                    pz = jnp.asarray(pz, i32)
                    x = PAD + px
                    y = PAD + py
                    z = PAD + pz
                    c = jax.lax.dynamic_slice(loc, (x, y, z), (1, 1, 1))[0, 0, 0]
                    # estimate_error stays in T: std::fabs(float) is the
                    # float overload, noise narrows to T before the add
                    if pred_kind == "L1":
                        e = jnp.abs(c - _l1_3d(loc, x, y, z)) + jnp.float32(noise1)
                    elif pred_kind == "L2":
                        e = jnp.abs(c - _l2_3d(loc, x, y, z)) + jnp.float32(noise2)
                    else:
                        pr = (coefs_raw[0] * px.astype(jnp.float32)
                              + coefs_raw[1] * py.astype(jnp.float32)
                              + coefs_raw[2] * pz.astype(jnp.float32)
                              + coefs_raw[3])
                        e = jnp.abs(c - pr)
                    acc = acc + jnp.where(i < m, e.astype(f64), f64(0))
                return acc
            return jax.lax.fori_loop(0, BS, step, f64(0))

        if single:
            sid = i32(0)
            active = roster[0]
            ok = reg_valid if active == "REG" else jnp.bool_(True)
        else:
            errs = []
            for p in roster:
                e = sample_err(p)
                if p == "REG":
                    e = jnp.where(reg_valid, e, f64(DBL_MAX))
                errs.append(e)
            errs = jnp.stack(errs)
            sid = i32(0)
            best = errs[0]
            for i in range(1, len(roster)):
                take = errs[i] < best
                sid = jnp.where(take, i32(i), sid)
                best = jnp.where(take, errs[i], best)
            ok = jnp.bool_(True)  # composed rosters always contain a valid pick
            if all(p == "REG" for p in roster):
                ok = reg_valid

        # ---- coefficient chain (row-major commit order is the scan order)
        is_reg_sel = jnp.zeros((), jnp.bool_)
        for i, p in enumerate(roster):
            if p == "REG":
                is_reg_sel = is_reg_sel | (sid == i32(i))
        commit_reg = is_reg_sel & ok & reg_valid if not single else \
            (jnp.bool_(roster[0] == "REG") & reg_valid)
        reg_bins = []
        cur_list = []
        for i in range(4):
            ceb = eb_ql if i < 3 else eb_qi
            bq, rq = quantize(coefs_raw[i], prev_coef[i], ceb, creg)
            # rq already carries the by-reference semantics (reconstruction
            # on success, the raw value on fallback)
            reg_bins.append(jnp.where(commit_reg, bq, i32(0)))
            cur_list.append(jnp.where(commit_reg, rq, coefs_raw[i]))
        reg_bins = jnp.stack(reg_bins)
        cur_coef = jnp.stack(cur_list)
        new_prev = jnp.where(commit_reg, cur_coef, prev_coef)

        use_reg_pred = is_reg_sel & ok if not single else \
            jnp.bool_(roster[0] == "REG") & reg_valid
        use_l2_pred = jnp.zeros((), jnp.bool_)
        for i, p in enumerate(roster):
            if p == "L2":
                use_l2_pred = use_l2_pred | ((sid == i32(i)) if not single
                                             else jnp.bool_(True))

        # ---- element sweep (sequential in-block recurrence)
        def elem_step(t, st):
            lc, bins_buf = st
            x = t // (BS * BS)
            y = (t // BS) % BS
            z = t % BS
            v = (x < ex[0]) & (y < ex[1]) & (z < ex[2])
            gx, gy, gz = PAD + x, PAD + y, PAD + z
            c = jax.lax.dynamic_slice(lc, (gx, gy, gz), (1, 1, 1))[0, 0, 0]
            p1 = _l1_3d(lc, gx, gy, gz)
            p2 = _l2_3d(lc, gx, gy, gz)
            pr = (cur_coef[0] * x.astype(jnp.float32)
                  + cur_coef[1] * y.astype(jnp.float32)
                  + cur_coef[2] * z.astype(jnp.float32) + cur_coef[3])
            pred = jnp.where(use_reg_pred, pr, jnp.where(use_l2_pred, p2, p1))
            bq, rec = quantize(c, pred, eb, radius)
            lc = jnp.where(v, jax.lax.dynamic_update_slice(
                lc, rec.reshape(1, 1, 1), (gx, gy, gz)), lc)
            bins_buf = bins_buf.at[t].set(jnp.where(v, bq, i32(0)))
            return (lc, bins_buf)

        loc2, bins_buf = jax.lax.fori_loop(
            0, E, elem_step, (loc, jnp.zeros((E,), i32)))
        grid = jax.lax.dynamic_update_slice(grid, loc2, b0)

        emit_sel = jnp.bool_(not single) & ok
        ys = (bins_buf, jnp.where(emit_sel, sid, i32(-1)),
              reg_bins, coefs_raw, commit_reg)
        return (grid, new_prev), ys

    import os
    debug_grid = bool(os.environ.get("SZT_BW_DEBUG_GRID"))  # note: lru-cached

    @jax.jit
    def run(x_padded):
        carry0 = (x_padded, jnp.zeros((4,), jnp.float32))
        (grid, _), ys = jax.lax.scan(block_body, carry0,
                                     jnp.arange(nblocks, dtype=i32))
        return ys + (grid,) if debug_grid else ys

    return nb, run


def encode_blocks(data: np.ndarray, eb: float, radius: int, use_l1: bool,
                  use_l2: bool, use_reg: bool):
    """Run the device block sweep; returns host-side streams:
    (bins_stream, selection, reg_bins, ql_unpred, qi_unpred, unpred)."""
    from .interp_fast import _maybe_on, exec_device

    dims = data.shape
    nb, run = _jit_encode_blocks(tuple(dims), float(eb), int(radius),
                                 bool(use_l1), bool(use_l2), bool(use_reg))
    padded_shape = tuple(PAD + nb[i] * BS + PAD for i in range(3))
    xp = np.zeros(padded_shape, data.dtype)
    xp[PAD:PAD + dims[0], PAD:PAD + dims[1], PAD:PAD + dims[2]] = data
    with _maybe_on(exec_device()):
        bins_b, sel_b, regb_b, coef_b, commit_b = run(jnp.asarray(xp))
    bins_b = np.asarray(bins_b)
    sel_b = np.asarray(sel_b)
    regb_b = np.asarray(regb_b)
    coef_b = np.asarray(coef_b)
    commit_b = np.asarray(commit_b)

    # static per-block element masks -> ordered streams
    masks = _element_masks(tuple(dims), tuple(nb))
    bins_stream = np.concatenate(
        [bins_b[i][masks[i]] for i in range(len(bins_b))]).astype(np.int32)
    selection = sel_b[sel_b >= 0].astype(np.int32)
    reg_bins = regb_b[commit_b].reshape(-1).astype(np.int32)
    ql_unpred, qi_unpred = [], []
    for i in np.nonzero(commit_b)[0]:
        for k in range(3):
            if regb_b[i][k] == 0:
                ql_unpred.append(coef_b[i][k])
        if regb_b[i][3] == 0:
            qi_unpred.append(coef_b[i][3])
    ql_unpred = np.asarray(ql_unpred, data.dtype)
    qi_unpred = np.asarray(qi_unpred, data.dtype)
    orig_stream = np.concatenate(
        [_block_vals(data, nb, i)[masks[i]] for i in range(len(bins_b))])
    unpred = np.ascontiguousarray(orig_stream[bins_stream == 0])
    return bins_stream, selection, reg_bins, ql_unpred, qi_unpred, unpred


@lru_cache(maxsize=8)
def _jit_decode_blocks(dims: Tuple[int, ...], eb: float, radius: int,
                       use_l1: bool, use_l2: bool, use_reg: bool):
    """Decode counterpart of _jit_encode_blocks: replays the block sweep with
    recover() (reference BlockwiseDecomposition.hpp decompress +
    RegressionPredictor predecompress chain). Returns (nb, jitted fn)."""
    n_dims = len(dims)
    if n_dims != 3:
        raise NotImplementedError("device blockwise: 3D first")
    nb = tuple(-(-d // BS) for d in dims)
    nblocks = int(np.prod(nb))
    roster = []
    if use_l1:
        roster.append("L1")
    if use_l2:
        roster.append("L2")
    if use_reg:
        roster.append("REG")
    if not roster:
        raise ValueError("all predictors disabled")
    single = len(roster) == 1
    eb_ql = eb / (n_dims + 1) / BS
    eb_qi = eb / (n_dims + 1)
    creg = 32768
    E = BS * BS * BS
    i32 = jnp.int32

    def block_body(carry, xs):
        grid, prev_coef = carry
        bidx, binrow, regrow, litcoef, commit, sel, litrow = xs
        bi = bidx // (nb[1] * nb[2])
        bj = (bidx // nb[2]) % nb[1]
        bk = bidx % nb[2]
        b0 = (bi * BS, bj * BS, bk * BS)
        ex = (jnp.minimum(i32(BS), i32(dims[0]) - b0[0]),
              jnp.minimum(i32(BS), i32(dims[1]) - b0[1]),
              jnp.minimum(i32(BS), i32(dims[2]) - b0[2]))
        reg_valid = (ex[0] > 1) & (ex[1] > 1) & (ex[2] > 1)
        loc = jax.lax.dynamic_slice(grid, b0, (BS + PAD, BS + PAD, BS + PAD))

        # coefficient chain (regression_recover: pred is the previous
        # selected block's reconstructed coefficient)
        cur_list = []
        for i in range(4):
            ceb = eb_ql if i < 3 else eb_qi
            rec = recover(prev_coef[i], regrow[i], litcoef[i], ceb, creg)
            cur_list.append(jnp.where(commit, rec, prev_coef[i]))
        cur_coef = jnp.stack(cur_list)

        if single:
            use_reg_pred = jnp.bool_(roster[0] == "REG") & reg_valid
            use_l2_pred = jnp.bool_(roster[0] == "L2")
        else:
            use_reg_pred = jnp.zeros((), jnp.bool_)
            use_l2_pred = jnp.zeros((), jnp.bool_)
            for i, p in enumerate(roster):
                if p == "REG":
                    use_reg_pred = use_reg_pred | (sel == i32(i))
                if p == "L2":
                    use_l2_pred = use_l2_pred | (sel == i32(i))

        def elem_step(t, lc):
            x = t // (BS * BS)
            y = (t // BS) % BS
            z = t % BS
            v = (x < ex[0]) & (y < ex[1]) & (z < ex[2])
            gx, gy, gz = PAD + x, PAD + y, PAD + z
            p1 = _l1_3d(lc, gx, gy, gz)
            p2 = _l2_3d(lc, gx, gy, gz)
            pr = (cur_coef[0] * x.astype(jnp.float32)
                  + cur_coef[1] * y.astype(jnp.float32)
                  + cur_coef[2] * z.astype(jnp.float32) + cur_coef[3])
            pred = jnp.where(use_reg_pred, pr, jnp.where(use_l2_pred, p2, p1))
            val = recover(pred, binrow[t], litrow[t], eb, radius)
            return jnp.where(v, jax.lax.dynamic_update_slice(
                lc, val.reshape(1, 1, 1), (gx, gy, gz)), lc)

        loc2 = jax.lax.fori_loop(0, E, elem_step, loc)
        grid = jax.lax.dynamic_update_slice(grid, loc2, b0)
        return (grid, cur_coef), None

    @jax.jit
    def run(bins_b, regb_b, litcoef_b, commit_b, sel_b, lit_b):
        padded_shape = tuple(PAD + nb[i] * BS + PAD for i in range(3))
        grid0 = jnp.zeros(padded_shape, jnp.float32)
        carry0 = (grid0, jnp.zeros((4,), jnp.float32))
        xs = (jnp.arange(nblocks, dtype=i32), bins_b, regb_b, litcoef_b,
              commit_b, sel_b, lit_b)
        (grid, _), _ = jax.lax.scan(block_body, carry0, xs)
        return jax.lax.slice(grid, (PAD, PAD, PAD),
                             (PAD + dims[0], PAD + dims[1], PAD + dims[2]))

    return nb, run


def decode_blocks(dims, eb: float, radius: int, use_l1: bool, use_l2: bool,
                  use_reg: bool, bins_stream: np.ndarray, selection: np.ndarray,
                  reg_bins: np.ndarray, ql_unpred: np.ndarray,
                  qi_unpred: np.ndarray, unpred: np.ndarray) -> np.ndarray:
    """Replay the block sweep on device from archive streams; returns the
    reconstructed grid (f32, shape dims)."""
    from .interp_fast import _maybe_on, exec_device

    dims = tuple(dims)
    nb, run = _jit_decode_blocks(dims, float(eb), int(radius),
                                 bool(use_l1), bool(use_l2), bool(use_reg))
    nblocks = int(np.prod(nb))
    masks = _element_masks(dims, nb)
    E = BS ** 3
    bins_b = np.zeros((nblocks, E), np.int32)
    bins_b[masks] = bins_stream
    roster = [p for p, on in (("L1", use_l1), ("L2", use_l2), ("REG", use_reg))
              if on]
    single = len(roster) == 1
    if single:
        sel_b = np.zeros(nblocks, np.int32)
        if roster[0] == "REG":
            commit_b = _reg_valid_static(dims, nb)
        else:
            commit_b = np.zeros(nblocks, bool)
    else:
        sel_b = np.asarray(selection, np.int32)
        reg_idx = roster.index("REG") if "REG" in roster else -1
        commit_b = sel_b == reg_idx
    regb_b = np.zeros((nblocks, 4), np.int32)
    if commit_b.any():
        regb_b[commit_b] = np.asarray(reg_bins, np.int32).reshape(-1, 4)
    litcoef_b = np.zeros((nblocks, 4), np.float32)
    il = ii = 0
    for b in np.nonzero(commit_b)[0]:
        for k in range(3):
            if regb_b[b, k] == 0:
                litcoef_b[b, k] = ql_unpred[il]
                il += 1
        if regb_b[b, 3] == 0:
            litcoef_b[b, 3] = qi_unpred[ii]
            ii += 1
    lit_b = np.zeros((nblocks, E), np.float32)
    lit_b[masks & (bins_b == 0)] = unpred
    with _maybe_on(exec_device()):
        out = run(jnp.asarray(bins_b), jnp.asarray(regb_b),
                  jnp.asarray(litcoef_b), jnp.asarray(commit_b),
                  jnp.asarray(sel_b), jnp.asarray(lit_b))
    return np.asarray(out)


@lru_cache(maxsize=8)
def _reg_valid_static(dims, nb):
    valid = np.zeros(int(np.prod(nb)), bool)
    idx = 0
    for bi in range(nb[0]):
        for bj in range(nb[1]):
            for bk in range(nb[2]):
                valid[idx] = (min(BS, dims[0] - bi * BS) > 1
                              and min(BS, dims[1] - bj * BS) > 1
                              and min(BS, dims[2] - bk * BS) > 1)
                idx += 1
    return valid


@lru_cache(maxsize=8)
def _element_masks(dims, nb):
    E = BS ** 3
    nblocks = int(np.prod(nb))
    masks = np.zeros((nblocks, E), bool)
    t = np.arange(E)
    x, y, z = t // (BS * BS), (t // BS) % BS, t % BS
    idx = 0
    for bi in range(nb[0]):
        for bj in range(nb[1]):
            for bk in range(nb[2]):
                e0 = min(BS, dims[0] - bi * BS)
                e1 = min(BS, dims[1] - bj * BS)
                e2 = min(BS, dims[2] - bk * BS)
                masks[idx] = (x < e0) & (y < e1) & (z < e2)
                idx += 1
    return masks


def _block_vals(data, nb, blk_idx):
    bi = blk_idx // (nb[1] * nb[2])
    bj = (blk_idx // nb[2]) % nb[1]
    bk = blk_idx % nb[2]
    out = np.zeros(BS ** 3, data.dtype)
    b = data[bi * BS:bi * BS + BS, bj * BS:bj * BS + BS, bk * BS:bk * BS + BS]
    pad = np.zeros((BS, BS, BS), data.dtype)
    pad[:b.shape[0], :b.shape[1], :b.shape[2]] = b
    return pad.reshape(-1)
