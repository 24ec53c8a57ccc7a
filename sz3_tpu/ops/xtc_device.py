"""Device quantize/recover for ALGO_BIOMDXTC's decomposition.

The BioMDXtc decomposition (reference SZBioMDXtcBasedDecomposition.hpp via
our native biomd.hpp:231-291) is a pure elementwise quantize against a ZERO
prediction with the XTC radius (INT32_MAX/16) and the relaxed tolerance
`err <= eb || err <= eb*1.1` (quantizer.hpp:55, strict=false) — no recurrence
at all, so the device path is one vectorized pass. The XTC bit-packing
itself (mixed-radix bignum, GROMACS format) stays in the native engine:
it is a sequential byte-stream format, and its cost is proportional to the
COMPRESSED size.

Exact mode (TPU parity) reuses the integer softfloat: with pred == 0 the
reconstruct is a single product f32(round53(q*eb)) — no f64 add — through
the wide multiply (_mul_m31_m53, q up to 2^28 exceeds the 2^24 fast-path
window). Fast mode keeps the backend's native f64.

Byte parity with the host engine asserted by tests/test_xtc_device.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

XTC_RADIUS = (2**31 - 1) // 16  # kXtcRadius, biomd.hpp:228
I32 = jnp.int32
I64 = jnp.int64


def _tol32(eb: float) -> np.float32:
    """Largest f32 <= round53(eb * 1.1): the relaxed acceptance threshold.
    err is an exact f32 value, so err <= f64(eb*1.1) reduces to this f32
    compare."""
    t = np.float64(eb) * np.float64(1.1)
    t32 = np.float32(t)
    if np.float64(t32) > t:
        t32 = np.nextafter(t32, np.float32(0))
    return t32


def xtc_quantize(data, eb: float):
    """data (f32) -> stored bins (int32, already offset by -XTC_RADIUS like
    the archive stream; -XTC_RADIUS marks unpredictable/literal cells)."""
    from .quantize import exact_mode
    if exact_mode(eb) and data.dtype == jnp.float32:
        return _xtc_quantize_exact(data, eb)
    return _xtc_quantize_native(data, eb)


def _xtc_quantize_native(data, eb: float):
    recip = 1.0 / eb
    scaled = jnp.abs(data).astype(jnp.float64) * recip
    clampv = 2 * XTC_RADIUS
    qi = (jnp.minimum(scaled, jnp.float64(clampv)).astype(jnp.int64)
          .astype(jnp.int32) + 1)
    half = qi >> 1
    qe = half << 1
    neg = data < 0
    q = jnp.where(neg, -qe, qe)
    dec = (q.astype(jnp.float64) * eb).astype(data.dtype)
    err = jnp.abs((dec - data).astype(jnp.float64))
    ok = (qi < clampv) & (err <= np.float64(_tol32(eb))) & jnp.isfinite(data)
    shifted = jnp.where(neg, I32(XTC_RADIUS) - half, I32(XTC_RADIUS) + half)
    return jnp.where(ok, shifted, I32(0)) - I32(XTC_RADIUS)


def _xtc_quantize_exact(data, eb: float):
    from .exactf64 import (_f32_decompose, _mul_m24_m53, _mul_m31_m53,
                           _narrow_f32, f64_parts)
    recip = float(np.float64(1.0) / np.float64(eb))
    _, Mr, Er = f64_parts(recip)
    _, Me, Ee = f64_parts(eb)
    clampv = 2 * XTC_RADIUS

    dneg, dm, de, dfin = _f32_decompose(data)
    Ps, Es = _mul_m24_m53(dm, de, Mr, Er)    # round53(|data| * recip)
    q_shift = jnp.clip(-Es, 0, 63).astype(I64)
    q0 = jnp.where(Es >= 0, I64(clampv), Ps >> q_shift)
    q0 = jnp.where(Es < I32(-53), I64(0), q0)
    q0 = jnp.minimum(q0, I64(clampv))
    q0 = jnp.where(dfin, q0, I64(clampv))
    qi = q0.astype(I32) + I32(1)

    half = qi >> 1
    qe = (half << 1).astype(I64)
    # dec = f32(round53(qe * eb)) — pred is zero, so no f64 add; the +0.0 in
    # the reference is exact (and cannot produce -0: qe*eb == 0 -> +0)
    Pv, Ev = _mul_m31_m53(qe, I32(0), Me, Ee)
    dec = _narrow_f32(dneg & (Pv != 0), Pv, Ev)
    err = jnp.abs(dec - data)                 # exact f32
    ok = (qi < I32(clampv)) & (err <= _tol32(eb)) & dfin
    shifted = jnp.where(dneg, I32(XTC_RADIUS) - half, I32(XTC_RADIUS) + half)
    return jnp.where(ok, shifted, I32(0)) - I32(XTC_RADIUS)


def xtc_recover(bins_stored, literal, eb: float):
    """Stored bins (archive stream, offset by -XTC_RADIUS) + pre-placed
    literals -> reconstruction: f32(2*stored*eb) for committed cells
    (quantizer.hpp recover with pred=0, q = stored + XTC_RADIUS)."""
    from .quantize import exact_mode
    if exact_mode(eb) and literal.dtype == jnp.float32:
        return _xtc_recover_exact(bins_stored, literal, eb)
    dec = ((2 * bins_stored.astype(jnp.int64)).astype(jnp.float64) * eb
           ).astype(literal.dtype)
    return jnp.where(bins_stored != I32(-XTC_RADIUS), dec, literal)


def _xtc_recover_exact(bins_stored, literal, eb: float):
    from .exactf64 import _mul_m31_m53, _narrow_f32, f64_parts
    _, Me, Ee = f64_parts(eb)
    q = 2 * bins_stored.astype(I64)           # |q| <= 2^28 < 2^31
    Pv, Ev = _mul_m31_m53(jnp.abs(q), I32(0), Me, Ee)
    dec = _narrow_f32((q < 0) & (Pv != 0), Pv, Ev)
    return jnp.where(bins_stored != I32(-XTC_RADIUS), dec, literal)
