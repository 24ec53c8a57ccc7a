"""Device execution of the ALGO_BIOMD 3D trajectory recurrence.

Behavior contract: reference decomposition/SZBioMDDecomposition.hpp:229-285.
Frames t>0 use previous-frame prediction at water-model site boundaries
(j % site == 0) and a 2D (time, atom) Lorenzo elsewhere whose atom reference
is j - (j % site) — i.e. the molecule's OWN boundary atom. Because boundary
atoms depend only on the previous frame and non-boundary atoms depend only
on boundary atoms of the same frame (plus the previous frame), every frame
is exactly TWO vectorized quantize steps; the frame loop is a lax.scan
carrying the previous frame's reconstruction. This turns the reference's
triple scalar loop into F sequential steps of atoms*3-wide vector work.

Frame 0's atom chain (j predicted from j - max(1, j%site), a genuinely
sequential recurrence) runs in the native engine (runtime.biomd_frame0);
site == 0 data (no periodicity -> previous-atom chain in every frame) has no
parallel shape and stays on the host engine entirely.

The atom axis is reshaped to (groups, site) so the boundary reference is a
broadcast of lane 0 — no gathers (TPU gathers serialize; see
memory/mosaic-pallas-constraints). Atoms are padded to a multiple of site;
padded slots ride the vector ops and are sliced off on the host.

Quantization reuses ops/quantize (f64 arithmetic, exactf64 softfloat under
TPU parity mode), so archives stay byte-identical to the host engine's.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .quantize import quantize, recover

jax.config.update("jax_enable_x64", True)


def cal_site(frame: np.ndarray) -> int:
    """Water-model site period from relative jumps down the atom axis
    (reference SZBioMDDecomposition.hpp:92-126; host mirror biomd.hpp:35-67).
    frame: (atoms, cols). Ties resolve first-seen; accepted iff 2 < p <= 10."""
    atoms, cols = frame.shape
    sites: list[int] = []
    f = frame.astype(frame.dtype, copy=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        for j in range(min(cols, 5)):
            lprev = 0
            for i in range(1, min(atoms, 100)):
                c = f[i, j]
                p = f[i - 1, j]
                if np.abs(c - p) / c > 0.5:  # T-precision ratio, sign kept
                    sites.append(i - lprev)
                    lprev = i
    freq: dict[int, int] = {}
    for s in sites:
        freq[s] = freq.get(s, 0) + 1
    res, max_count = 0, 0
    for s, n in freq.items():  # insertion order == first-seen
        if n > max_count:
            res, max_count = s, n
    return 0 if (res <= 2 or res > 10) else res


def find_fill(data: np.ndarray) -> tuple[int, float]:
    """Trailing constant-filled frames (reference :130-163). data: (F, ...).
    Returns (first_fill_frame, fill_value)."""
    frames = data.shape[0]
    if frames == 0:
        return 0, 0.0
    flat = data.reshape(frames, -1)
    fill = flat[-1, 0]
    first_fill = frames
    for i in range(frames - 1, 0, -1):
        if bool((flat[i] == fill).all()):
            first_fill = i
        else:
            break
    return first_fill, float(fill)


def _pad_groups(x: np.ndarray, site: int):
    """(F, A, C) -> (F, G, site, C) with atoms padded to a site multiple."""
    f, a, c = x.shape
    g = -(-a // site)
    pad = g * site - a
    if pad:
        x = np.concatenate([x, np.zeros((f, pad, c), x.dtype)], axis=1)
    return x.reshape(f, g, site, c)


@partial(jax.jit, static_argnames=("eb", "radius", "site"))
def _encode_scan(frames_g, recon0_g, eb, radius, site):
    """frames_g: (F-1, G, site, C) frames 1..last; recon0_g: (G, site, C)
    frame-0 reconstruction. Returns bins (F-1, G, site, C) i32 and recon of
    the same shape (bins==0 slots keep the original value, as the scalar
    engine leaves unpredictable data unmutated)."""

    def step(prev, cur):
        # site boundaries (lane 0 of each group): pred = recon(t-1, j)
        bins_b, recon_b = quantize(cur[:, :1, :], prev[:, :1, :], eb, radius)
        # others: pred = (recon(t-1,j) + recon(t,b)) - recon(t-1,b), f32
        # summation order as the scalar engine's (a + b) - c (biomd.hpp:138)
        pred_nb = (prev + recon_b) - prev[:, :1, :]
        bins_nb, recon_nb = quantize(cur, pred_nb, eb, radius)
        bins = jnp.concatenate([bins_b, bins_nb[:, 1:, :]], axis=1)
        recon = jnp.concatenate([recon_b, recon_nb[:, 1:, :]], axis=1)
        return recon, (bins, recon)

    _, (bins, recon) = jax.lax.scan(step, recon0_g, frames_g)
    return bins, recon


@partial(jax.jit, static_argnames=("eb", "radius", "site"))
def _decode_scan(bins_g, lit_g, recon0_g, eb, radius, site):
    """Inverse scan: bins + pre-placed literals (original values at bins==0
    slots) -> reconstructed frames 1..last."""

    def step(prev, x):
        b, lit = x
        rec_b = recover(prev[:, :1, :], b[:, :1, :], lit[:, :1, :], eb, radius)
        pred_nb = (prev + rec_b) - prev[:, :1, :]
        rec_nb = recover(pred_nb, b, lit, eb, radius)
        rec = jnp.concatenate([rec_b, rec_nb[:, 1:, :]], axis=1)
        return rec, rec

    _, recs = jax.lax.scan(step, recon0_g, (bins_g, lit_g))
    return recs


def encode_frames(data: np.ndarray, recon0: np.ndarray, eb: float,
                  radius: int, site: int):
    """Host wrapper: frames 1..last (F-1, A, C) + frame-0 recon (A, C) ->
    (bins (F-1, A, C) i32, unpred f32 in scan order)."""
    f1, a, c = data.shape
    dg = _pad_groups(data, site)
    rg = _pad_groups(recon0[None], site)[0]
    bins_g, _ = _encode_scan(jnp.asarray(dg), jnp.asarray(rg), eb, radius, site)
    bins = np.asarray(bins_g).reshape(f1, -1, c)[:, :a, :]
    unpred = data[bins == 0]
    return bins, unpred


def decode_frames(bins: np.ndarray, unpred: np.ndarray, recon0: np.ndarray,
                  eb: float, radius: int, site: int) -> np.ndarray:
    """Host wrapper: bins (F-1, A, C) + this range's unpred slice ->
    reconstructed frames 1..last."""
    f1, a, c = bins.shape
    lit = np.zeros((f1, a, c), recon0.dtype)
    lit[bins == 0] = unpred
    bg = _pad_groups(bins.astype(np.int32), site)
    lg = _pad_groups(lit, site)
    rg = _pad_groups(recon0[None], site)[0]
    recs = _decode_scan(jnp.asarray(bg), jnp.asarray(lg), jnp.asarray(rg),
                        eb, radius, site)
    return np.asarray(recs).reshape(f1, -1, c)[:, :a, :]
