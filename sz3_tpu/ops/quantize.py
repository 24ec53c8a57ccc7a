"""Vectorized linear-scaling quantizer (device-side).

Numerical contract: reference quantizer/LinearQuantizer.hpp:43-86 — f64
error-bound arithmetic over T-precision data, verify-and-fallback. Bit-exact
with the host engine (validated on TPU: f64 emulation reproduces IEEE doubles
for this op chain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def quantize(data, pred, eb: float, radius: int):
    """Vectorized quantize_and_overwrite.

    Returns (bins int32, recon) where bins==0 marks unpredictable points
    (their recon keeps the original value, to feed later predictions exactly
    like the scalar engine does).
    """
    recip = 1.0 / eb  # python float == C double
    diff = data - pred  # T precision
    # clamp the scaled residual before the int cast so int32 suffices on TPU
    # (no native 64-bit int vectors); anything at/above the clamp is
    # unpredictable anyway, and the qi < 2*radius test is unaffected because
    # the clamp value exceeds the threshold
    scaled = jnp.abs(diff).astype(jnp.float64) * recip
    qi = jnp.minimum(scaled, jnp.float64(2 * radius)).astype(jnp.int32) + 1
    half = qi >> 1
    qeven = half << 1
    neg = diff < 0
    q = jnp.where(neg, -qeven, qeven)
    shifted = jnp.where(neg, radius - half, radius + half)
    dec = (pred.astype(jnp.float64) + q.astype(jnp.float64) * eb).astype(data.dtype)
    err = jnp.abs((dec - data).astype(jnp.float64))
    ok = (qi < 2 * radius) & (err <= eb)
    bins = jnp.where(ok, shifted, 0).astype(jnp.int32)
    recon = jnp.where(ok, dec, data)
    return bins, recon


def recover(pred, bins, literal, eb: float, radius: int):
    """Vectorized recover: bins!=0 -> pred + 2*(bin-radius)*eb (f64 math,
    narrowed to T); bins==0 -> the pre-placed literal value
    (reference LinearQuantizer.hpp:74-86)."""
    dec = (pred.astype(jnp.float64) +
           (2 * (bins - radius)).astype(jnp.float64) * eb).astype(pred.dtype)
    return jnp.where(bins != 0, dec, literal)
