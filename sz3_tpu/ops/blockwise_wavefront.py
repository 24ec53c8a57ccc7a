"""Wavefront device decode for ALGO_LORENZO_REG (3D).

Decompression has no predictor-selection step (selections are archive
streams) and the regression coefficient chain — the format's one global
sequential dependency (reference RegressionPredictor.hpp:157-164) — is a few
scalar ops per committing block, replayed exactly in the native engine
(runtime.blockwise_coef_chain). What remains is the element sweep
(BlockwiseDecomposition.hpp decompress): REG-predicted cells depend only on
their block's reconstructed coefficients (pre-placed, embarrassingly
parallel), and Lorenzo cells read reconstructed neighbors at strictly
negative offsets — a pure anti-diagonal dependency over the GLOBAL element
grid (in-block recurrence and cross-block pad reads are the same stencil).

Execution shape: skew the grid as S[x+y+z, y, z] = G[x, y, z] — this map has
constant strides, so skew/unskew are strided host copies (no gathers) — and
run one lax.scan over the NX+NY+NZ-2 anti-diagonal planes; each step is ~30
statically-shifted vector reads over a (NY, NZ) plane plus the f64 recover.
No gathers, no per-block control flow: every sequential step the format
admits is a wide vector op.

Encode CANNOT be scheduled this way — see ARCHITECTURE.md "Why the encode
sweep is block-sequential": predictor selection samples reconstructed pad
cells of the row-major-previous block whose own recon lands at a LATER
global anti-diagonal than the block's first element, and the coefficient
chain crosses row wraps. The byte-parity encode path stays the lax.scan in
ops/blockwise_device.py (off by default; host engine otherwise).

f32, 3D. Byte parity with the host engine asserted by
tests/test_blockwise_wavefront.py on the golden corpus and the roster
matrix.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .quantize import recover
from .blockwise_device import BS, _element_masks, _reg_valid_static

jax.config.update("jax_enable_x64", True)

LEAD = 8  # zero planes ahead of t=0 (max stencil plane lookback is 6)

# per-cell predictor types
T_L1, T_L2, T_KEEP = 0, 1, 2


def _skew_view(S: np.ndarray, nx: int, ny: int, nz: int) -> np.ndarray:
    """View V of the skewed slab S (TOT, ny, nz) with V[x,y,z] = S[x+y+z,y,z]
    — constant strides, so V[:] = G / G = V.copy() are strided copies."""
    st, sy, sz = S.strides
    return np.lib.stride_tricks.as_strided(
        S, shape=(nx, ny, nz), strides=(st, st + sy, st + sz))


def _fshear(a, nout: int, fill=0):
    """Forward shear along the middle axis: out[x, y, z] = a[x + y, y, z]
    for x in [0, nout), nout <= a.shape[0] + 1 - ... (callers guarantee all
    reads land inside a or in the flat end-pad).

    Implemented as the flat strided-view trick — transpose y-major, flatten,
    end-pad, reshape with row stride (X+1)*Z — so XLA lowers it to a few
    whole-slab copies. The naive alternative (one lax.slice per y,
    concatenated) materializes Y tensors of shape (X, 1, Z) each padded to a
    full (8,128) vreg tile: at 256^3 that was 131x memory expansion and a
    16.7 GB HBM OOM on real hardware (round 4)."""
    X, Y, Z = a.shape
    stride = (X + 1) * Z
    flat = jnp.transpose(a, (1, 0, 2)).reshape(-1)       # [y, x, z] row-major
    flat = jnp.pad(flat, (0, Y * stride - flat.size), constant_values=fill)
    # out[y, x, z] = flat[y*X*Z + (x+y)*Z + z] = flat[y*stride + x*Z + z]
    R = flat.reshape(Y, stride)[:, : nout * Z].reshape(Y, nout, Z)
    return jnp.transpose(R, (1, 0, 2))


def _fshear_z(a, nout: int, fill=0):
    """out[x, y, z] = a[x + z, y, z] via _fshear with y<->z swapped."""
    return jnp.transpose(
        _fshear(jnp.transpose(a, (0, 2, 1)), nout, fill), (0, 2, 1))


def skew_device(G, tot: int, lead: int = 0, off: int = 0, fill=0):
    """Device-side skew: S[lead+x+y+z, off+y, off+z] = G[x,y,z], the inverse
    of unskew_device, as two shear stages. Each INVERSE shear
    (A[x', y, z] = G[x' - y, y, z], fill outside) is expressed as a FORWARD
    shear of the y-flipped, x-padded slab: with Gf = flip_y(G) and
    Gp[x''] = Gf[x'' - (ny-1)] (x padded by ny-1 fills on BOTH sides so
    every shear read lands on data or fill), flip_y(_fshear(Gp)) == A."""
    nx, ny, nz = G.shape
    # stage 1: A[x', y, z] = G[x' - y, y, z]  -> (nx+ny-1, ny, nz)
    nxy = nx + ny - 1
    Gp = jnp.pad(G[:, ::-1, :], ((ny - 1, ny - 1), (0, 0), (0, 0)),
                 constant_values=fill)
    A = _fshear(Gp, nxy, fill)[:, ::-1, :]
    # stage 2: S[x'+z, y, z] = A[x', y, z] -> (nx+ny+nz-2, ny, nz)
    nxyz = nx + ny + nz - 2
    Ap = jnp.pad(A[:, :, ::-1], ((nz - 1, nz - 1), (0, 0), (0, 0)),
                 constant_values=fill)
    S = _fshear_z(Ap, nxyz, fill)[:, :, ::-1]
    pad0 = (lead, tot - lead - nxyz)
    return jnp.pad(S, (pad0, (off, 0), (off, 0)), constant_values=fill)


def stream_to_blocked(stream, dims, nb):
    """Archive block-major stream (row-major blocks, row-major in-block
    VALID cells) -> (nb0, nb1, nb2, 6, 6, 6) blocked tensor with zeros at
    out-of-extent slots — all static slices/reshapes/pads (the per-block
    element count varies only with the interior/tail class per axis, so the
    stream splits hierarchically at static offsets; no gathers)."""
    d0, d1, d2 = (int(d) for d in dims)
    nb0, nb1, nb2 = (int(n) for n in nb)
    t0 = d0 - BS * (nb0 - 1)
    t1 = d1 - BS * (nb1 - 1)
    t2 = d2 - BS * (nb2 - 1)

    def pad6(a, axes):
        cfg = [(0, 0)] * a.ndim
        for ax, cur in axes:
            cfg[ax] = (0, BS - cur)
        return jnp.pad(a, cfg)

    def split_rows(r, n, e0, e1):
        """r: (n, m, e0*e1*d2) one bj-class -> (n, m, nb2, 6, 6, 6)."""
        m = r.shape[1]
        lk = e0 * e1 * BS
        parts = []
        if nb2 > 1:
            U = r[:, :, : (nb2 - 1) * lk].reshape(n, m, nb2 - 1, e0, e1, BS)
            parts.append(pad6(U, [(3, e0), (4, e1)]))
        V = r[:, :, (nb2 - 1) * lk:].reshape(n, m, 1, e0, e1, t2)
        parts.append(pad6(V, [(3, e0), (4, e1), (5, t2)]))
        return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]

    def split_layer(t, n, e0):
        """t: (n, e0*d1*d2) one bi-class -> (n, nb1, nb2, 6, 6, 6)."""
        lj = e0 * BS * d2
        parts = []
        if nb1 > 1:
            P = t[:, : (nb1 - 1) * lj].reshape(n, nb1 - 1, e0 * BS * d2)
            parts.append(split_rows(P, n, e0, BS))
        Q = t[:, (nb1 - 1) * lj:].reshape(n, 1, e0 * t1 * d2)
        parts.append(split_rows(Q, n, e0, t1))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    s = stream.reshape(-1)[: d0 * d1 * d2]
    li = BS * d1 * d2
    parts = []
    if nb0 > 1:
        A = s[: (nb0 - 1) * li].reshape(nb0 - 1, BS * d1 * d2)
        parts.append(split_layer(A, nb0 - 1, BS))
    Bt = s[(nb0 - 1) * li:].reshape(1, t0 * d1 * d2)
    parts.append(split_layer(Bt, 1, t0))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def unskew_device(S, nx: int, ny: int, nz: int, lead: int = LEAD,
                  off: int = 2):
    """Device-side unskew: G[x,y,z] = S[lead+x+y+z, off+y, off+z] without
    gathers — two static shear stages (z then y), each a chain of
    statically-offset slices concatenated along the sheared axis. Reading
    back G (1x the field) instead of S (~3x for cubes) is the difference
    between a PCIe blip and the dominant cost on remote-attached chips."""
    body = jax.lax.slice(S, (lead, off, off),
                         (S.shape[0], off + ny, off + nz))
    # stage 1: A[x', y, z] = body[x' + z, y, z]   (x' in [0, nx+ny-1))
    A = _fshear_z(body, nx + ny - 1)
    # stage 2: G[x, y, z] = A[x + y, y, z]
    return _fshear(A, nx)


@lru_cache(maxsize=8)
def _jit_wavefront(gdims: Tuple[int, int, int], eb: float, radius: int):
    """Scan over anti-diagonal planes of the skewed grid. Carry: the padded
    skewed recon slab (TOT, NY+2, NZ+2) pre-initialized with REG recons and
    zeros. xs: per-plane bins (i32), literals (f32), types (u8)."""
    NX, NY, NZ = gdims
    TOT = LEAD + NX + NY + NZ - 2
    i32 = jnp.int32

    def plane(S, s, dk, di):
        """Value plane for offset (x-dj, y-dk, z-di) with s = dj+dk+di: the
        (NY, NZ) window of skewed plane t-s starting at (2-dk, 2-di)."""
        return jax.lax.dynamic_slice(S, (s, 2 - dk, 2 - di), (1, NY, NZ))[0]

    def step(S, xs):
        t0, bins_t, lit_t, type_t = xs
        # slice the six lookback planes once (relative indexing via a shifted
        # window so only one dynamic offset exists)
        win = jax.lax.dynamic_slice(S, (t0 - 6, i32(0), i32(0)),
                                    (6, NY + 2, NZ + 2))
        at = lambda dk, dj, di: plane(win, 6 - (dj + dk + di), dk, di)
        # exact reference f32 summation orders (blockwise_device._l1_3d/_l2_3d)
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
        rec = recover(pred, bins_t, lit_t, eb, radius)
        keep = jax.lax.dynamic_slice(S, (t0, i32(2), i32(2)), (1, NY, NZ))[0]
        out = jnp.where(type_t < T_KEEP, rec, keep)
        return jax.lax.dynamic_update_slice(S, out[None], (t0, i32(2), i32(2))), None

    @jax.jit
    def run(S0, bins_s, lit_s, type_s):
        ts = jnp.arange(LEAD, TOT, dtype=i32)
        S, _ = jax.lax.scan(step, S0, (ts, bins_s, lit_s, type_s))
        return S

    return run


def _selection_info(dims, nb, roster, selection, reg_bins, ql_unpred,
                    qi_unpred, eb):
    """Side streams -> (sel_kind, commit_b, coef_b): per-block predictor
    kind ('L1'/'L2'/'REG'; thin REG singles fall back to 'L1'), the commit
    pattern, and reconstructed regression coefficients via the native chain
    replay."""
    from .. import runtime

    nblocks = int(np.prod(nb))
    single = len(roster) == 1
    if single:
        if roster[0] == "REG":
            commit_b = _reg_valid_static(tuple(dims), tuple(nb)).copy()
        else:
            commit_b = np.zeros(nblocks, bool)
        sel_kind = np.full(nblocks, roster[0], dtype=object)
        if roster[0] == "REG":
            # thin blocks can't regress: scalar engine predicts Lorenzo1
            sel_kind[~commit_b] = "L1"
    else:
        sel_b = np.asarray(selection, np.int32)
        kinds = np.asarray(roster, dtype=object)
        sel_kind = kinds[sel_b]
        reg_idx = roster.index("REG") if "REG" in roster else -1
        commit_b = sel_b == reg_idx
    coef_b = np.zeros((nblocks, 4), np.float32)
    if commit_b.any():
        n_dims = len(dims)
        coefs = runtime.blockwise_coef_chain(
            eb / (n_dims + 1) / BS, eb / (n_dims + 1),
            np.asarray(reg_bins, np.int32).reshape(-1, 4),
            ql_unpred, qi_unpred)
        coef_b[commit_b] = coefs
    return sel_kind, commit_b, coef_b


def _unpack_streams(dims, nb, roster, bins_stream, selection, reg_bins,
                    ql_unpred, qi_unpred, unpred, eb):
    """Archive streams -> per-block bins/lits/types + reconstructed coefs
    (native chain replay). Mirrors blockwise_device.decode_blocks' placement
    semantics exactly."""
    nblocks = int(np.prod(nb))
    E = BS ** 3
    masks = _element_masks(tuple(dims), tuple(nb))
    bins_b = np.zeros((nblocks, E), np.int32)
    bins_b[masks] = bins_stream
    lit_b = np.zeros((nblocks, E), np.float32)
    lit_b[masks & (bins_b == 0)] = unpred
    sel_kind, commit_b, coef_b = _selection_info(
        dims, nb, roster, selection, reg_bins, ql_unpred, qi_unpred, eb)
    return bins_b, lit_b, sel_kind, commit_b, coef_b, masks


def _blocks_to_grid(arr_b: np.ndarray, nb, dtype) -> np.ndarray:
    """(nblocks, 216) block-major -> (nb0*6, nb1*6, nb2*6) grid."""
    a = arr_b.reshape(nb[0], nb[1], nb[2], BS, BS, BS)
    return np.ascontiguousarray(
        a.transpose(0, 3, 1, 4, 2, 5).reshape(nb[0] * BS, nb[1] * BS, nb[2] * BS)
    ).astype(dtype, copy=False)


def prepare_wavefront(dims, eb: float, radius: int, use_l1: bool,
                      use_l2: bool, use_reg: bool,
                      bins_stream: np.ndarray, selection: np.ndarray,
                      reg_bins: np.ndarray, ql_unpred: np.ndarray,
                      qi_unpred: np.ndarray, unpred: np.ndarray):
    """Archive streams -> (run, S0, bins_s, lit_s, type_s, unskew) — the
    jitted scan plus its skewed device inputs. Split from
    decode_blocks_wavefront so bench.py can time the device scan in
    isolation (chained iterations amortize per-call RPC latency on
    remote-attached chips)."""
    dims = tuple(int(d) for d in dims)
    if len(dims) != 3:
        raise NotImplementedError("wavefront decode: 3D only")
    roster = [p for p, on in (("L1", use_l1), ("L2", use_l2), ("REG", use_reg))
              if on]
    if not roster:
        raise ValueError("all predictors disabled")
    nb = tuple(-(-d // BS) for d in dims)
    bins_b, lit_b, sel_kind, commit_b, coef_b, masks = _unpack_streams(
        dims, nb, roster, bins_stream, selection, reg_bins, ql_unpred,
        qi_unpred, unpred, float(eb))
    E = BS ** 3

    # ---- REG blocks: recon from own coefs only (vectorized, exact f64 host)
    reg_blocks = np.asarray(sel_kind == "REG")
    G_init = np.zeros((nb[0] * BS, nb[1] * BS, nb[2] * BS), np.float32)
    if reg_blocks.any():
        idx = np.nonzero(reg_blocks)[0]
        t = np.arange(E)
        lx = (t // (BS * BS)).astype(np.float32)
        ly = ((t // BS) % BS).astype(np.float32)
        lz = (t % BS).astype(np.float32)
        c = coef_b[idx]  # (n, 4) f32
        pred = (c[:, 0:1] * lx + c[:, 1:2] * ly + c[:, 2:3] * lz
                + c[:, 3:4]).astype(np.float32)
        b = bins_b[idx]
        rec = (pred.astype(np.float64)
               + 2.0 * (b.astype(np.float64) - radius) * float(eb)
               ).astype(np.float32)
        rec = np.where(b != 0, rec, lit_b[idx])
        rec = np.where(masks[idx], rec, np.float32(0))
        full = np.zeros((len(bins_b), E), np.float32)
        full[idx] = rec
        G_init = _blocks_to_grid(full, nb, np.float32)

    # ---- per-cell types: L1/L2 computed in the wavefront, REG + out-of-dims
    # cells kept from the init grid
    kindmap = {"L1": T_L1, "L2": T_L2, "REG": T_KEEP}
    type_b = np.fromiter((kindmap[k] for k in sel_kind), np.uint8,
                         len(sel_kind))
    type_e = np.broadcast_to(type_b[:, None], (len(type_b), E)).copy()
    type_e[~masks] = T_KEEP
    type_g = _blocks_to_grid(type_e, nb, np.uint8)
    bins_g = _blocks_to_grid(bins_b, nb, np.int32)
    lit_g = _blocks_to_grid(lit_b, nb, np.float32)

    # ---- skew ON DEVICE (the host strided-view writes into the ~3x slabs
    # cost seconds at 256^3 and tripled H2D; only the compact grids upload)
    NX, NY, NZ = G_init.shape
    TOT = LEAD + NX + NY + NZ - 2
    S0 = jit_skew((NX, NY, NZ), TOT, LEAD, 2, "float32", 0.0)(
        jnp.asarray(G_init))
    bins_s = jit_skew((NX, NY, NZ), TOT - LEAD, 0, 0, "int32", 0)(
        jnp.asarray(bins_g))
    lit_s = jit_skew((NX, NY, NZ), TOT - LEAD, 0, 0, "float32", 0.0)(
        jnp.asarray(lit_g))
    type_s = jit_skew((NX, NY, NZ), TOT - LEAD, 0, 0, "uint8", T_KEEP)(
        jnp.asarray(type_g))

    run = _jit_wavefront((NX, NY, NZ), float(eb), int(radius))

    def unskew(S: np.ndarray) -> np.ndarray:
        out = _skew_view(S[LEAD:, 2:, 2:], NX, NY, NZ).copy()
        return out[:dims[0], :dims[1], :dims[2]]

    return run, S0, bins_s, lit_s, type_s, unskew


def decode_blocks_wavefront(dims, eb: float, radius: int, use_l1: bool,
                            use_l2: bool, use_reg: bool,
                            bins_stream: np.ndarray, selection: np.ndarray,
                            reg_bins: np.ndarray, ql_unpred: np.ndarray,
                            qi_unpred: np.ndarray, unpred: np.ndarray
                            ) -> np.ndarray:
    """Archive streams -> reconstructed grid (f32, shape dims) with the
    element sweep as an anti-diagonal wavefront on device."""
    from .interp_fast import _maybe_on, exec_device

    nb = tuple(-(-int(d) // BS) for d in dims)
    gdims = tuple(n * BS for n in nb)
    with _maybe_on(exec_device()):
        run, S0, bins_s, lit_s, type_s, unskew = prepare_wavefront(
            dims, eb, radius, use_l1, use_l2, use_reg, bins_stream, selection,
            reg_bins, ql_unpred, qi_unpred, unpred)
        S = run(jnp.asarray(S0), jnp.asarray(bins_s), jnp.asarray(lit_s),
                jnp.asarray(type_s))
        # unskew on device and read back only the field (S is ~3x it)
        G = _jit_unskew(gdims)(S)
        return np.asarray(G)[:dims[0], :dims[1], :dims[2]]


@lru_cache(maxsize=8)
def _jit_unskew(gdims: Tuple[int, int, int]):
    NX, NY, NZ = gdims
    return jax.jit(lambda S: unskew_device(S, NX, NY, NZ))


@lru_cache(maxsize=16)
def jit_skew(gdims: Tuple[int, int, int], tot: int, lead: int, off: int,
             dtype_name: str, fill):
    """Jitted on-device skew (cached per geometry): unskewed grid -> slab.
    The host strided-view writes into the ~3x slabs cost seconds per call
    at 256^3 and tripled the H2D bytes; shears on the chip are ~ms."""
    dt = np.dtype(dtype_name)

    @jax.jit
    def run(G):
        return skew_device(G.astype(dt), tot, lead=lead, off=off,
                           fill=dt.type(fill))

    return run
