"""Vectorized linear-scaling quantizer (device-side).

Numerical contract: reference quantizer/LinearQuantizer.hpp:43-86 — f64
error-bound arithmetic over T-precision data, verify-and-fallback. Bit-exact
with the host engine (validated on TPU: f64 emulation reproduces IEEE doubles
for this op chain).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def exact_mode(eb) -> bool:
    """True when the integer-softfloat f64 path should replace the backend's
    native f64 (TPU float-float emulation misrounds ulp ties, breaking
    archive parity; see ops/exactf64.py). Requires a static (host) eb — the
    sharded REL path traces eb from collectives and keeps the fast path.
    SZT_EXACT_F64: auto (default, on for TPU runs), 1 (force softfloat),
    verify (tie-screened fast path, see _quantize_verified), 0 (off)."""
    if not isinstance(eb, float):
        return False
    mode = os.environ.get("SZT_EXACT_F64", "auto")
    if mode == "0":
        return False
    if mode in ("1", "verify"):
        return True
    return (jax.default_backend() == "tpu"
            and os.environ.get("SZT_JAX_DEVICE", "") != "cpu")


def pow2_sha_safe(eb, radius: int) -> bool:
    """True when the FAST (float-float) mode provably reproduces the IEEE-f64
    quantizer bit-for-bit, so the softfloat can be skipped with parity intact
    (ARCHITECTURE.md "Power-of-two bounds need no softfloat"). Proof sketch:
    with eb = 2^k (normal, |k| <= 100) and 2*radius <= 2^24, every f64
    intermediate is EXACT in float-float —
      * |diff| * recip and q * eb are scalings by a power of two of a value
        with <= 24 significant bits (exactly representable; 2Mul exact);
      * pred + q*eb is a sum of two f32-representable values, whose f32
        addition error is itself an f32 (the 2Sum theorem), so the float-
        float pair holds the sum exactly and the narrow returns fl32(sum);
      * the IEEE path's intermediate round53 is the identity when the sum
        spans <= 53 bits (exponent gap <= 29) and irrelevant when it spans
        more (the addend is then < ulp32(pred)/32, both roundings give pred);
      * the verify compare err <= eb compares two exactly-represented values.
    Residual precondition — flush-to-zero (TPU) vs gradual underflow (IEEE):
    enforced at runtime via the FIELD SCREEN (screen_ok/screened below). With
    eb = 2^k >= 2^-100 the quantizer's own chain can never LAND in the
    subnormal range: dec = pred + q*eb with q != 0 forces |pred| >= 2*eb -
    2^-126, so pred is a multiple of 2^(k-23) and q*eb of 2^(k+1) — dec is 0
    or >= 2^(k-23) >= 2^-123, never in (0, 2^-126); a subnormal-exact diff
    (data - pred) flushes harmlessly because int(|diff|/eb) = 0 and the err
    compare accepts on both sides of the flush. The only remaining hazard is
    subnormal INPUT values (TPU ops treat subnormal operands as zero, DAZ),
    which the field screen excludes. In auto mode the bypass therefore fires
    only when the screen has positively cleared the field's data (encode) or
    literal streams (decode); SZT_POW2_BYPASS=1 force-asserts the screen,
    =0 disables the bypass outright."""
    if not isinstance(eb, float) or not (eb > 0):
        return False
    bits = int(np.float64(eb).view(np.uint64))
    frac = bits & ((1 << 52) - 1)
    expf = (bits >> 52) & 0x7FF
    k = expf - 1023
    return frac == 0 and -100 <= k <= 100 and 2 * radius <= (1 << 24)


# --- field screen: no subnormal / non-finite f32 inputs ---------------------
# The pow2 bypass's flush-safety proof needs every INPUT value (raw data on
# encode, literal streams on decode) to be zero, normal, or +-0.0 — TPU ops
# flush subnormal operands (DAZ) where IEEE keeps them, which is the one
# divergence the eb-lattice argument cannot exclude. Entry points that hold
# the concrete arrays evaluate screen_ok() once per field and publish the
# verdict here; quantize()/recover() consult it at trace time. Default is
# None = unscreened = NOT safe (softfloat), so forgetting to screen can only
# cost speed, never parity.
import contextlib
import contextvars

_FIELD_SCREEN: contextvars.ContextVar = contextvars.ContextVar(
    "szt_field_screen", default=None)

_FLT_MIN = float(np.finfo(np.float32).tiny)  # 2^-126


def screen_ok(*arrays) -> bool:
    """True iff every float32 array is free of NaN/Inf and of nonzero values
    with magnitude < 2^-126 (f32 subnormals). Device arrays reduce on-device
    (one scalar readback); host arrays reduce in numpy. Non-f32 arrays pass
    (the bypass only applies to f32 data)."""
    for a in arrays:
        if a is None or getattr(a, "dtype", None) != np.float32 or a.size == 0:
            continue
        if isinstance(a, np.ndarray):
            absa = np.abs(a)
            bad = (~np.isfinite(a)) | ((absa > 0) & (absa < _FLT_MIN))
            if bool(bad.any()):
                return False
        else:
            # bit test, NOT value test: XLA backends themselves flush f32
            # subnormals in arithmetic (the very behavior being screened),
            # so jnp.abs(x) < FLT_MIN would miss them. Bitcast reads raw bits.
            b = jax.lax.bitcast_convert_type(a, jnp.int32) & jnp.int32(
                0x7FFFFFFF)
            bad = ((b > 0) & (b < jnp.int32(0x00800000))) | (
                b >= jnp.int32(0x7F800000))
            if bool(jnp.any(bad)):
                return False
    return True


@contextlib.contextmanager
def screened(ok: bool):
    """Publish a field-screen verdict for the enclosed trace/execution."""
    tok = _FIELD_SCREEN.set(bool(ok))
    try:
        yield
    finally:
        _FIELD_SCREEN.reset(tok)


def _bypass_auto(eb, radius: int) -> bool:
    """Auto-mode pow2 bypass decision: env override, else static predicate
    AND a positive field screen."""
    mode = os.environ.get("SZT_POW2_BYPASS", "auto")
    if mode == "0":
        return False
    if not pow2_sha_safe(eb, radius):
        return False
    if mode == "1":  # user asserts the data is subnormal-free
        return True
    return _FIELD_SCREEN.get() is True


def quantize(data, pred, eb, radius: int):
    if exact_mode(eb) and data.dtype == jnp.float32:
        if os.environ.get("SZT_EXACT_F64", "auto") == "verify":
            return _quantize_verified(data, pred, eb, radius)
        if not (os.environ.get("SZT_EXACT_F64", "auto") == "auto"
                and _bypass_auto(eb, radius)):
            from .exactf64 import quantize_exact
            return quantize_exact(data, pred, eb, radius)
    return _quantize_native(data, pred, eb, radius)


def _quantize_native(data, pred, eb, radius: int):
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


def recover(pred, bins, literal, eb, radius: int):
    if exact_mode(eb) and pred.dtype == jnp.float32:
        if os.environ.get("SZT_EXACT_F64", "auto") == "verify":
            return _recover_verified(pred, bins, literal, eb, radius)
        if not (os.environ.get("SZT_EXACT_F64", "auto") == "auto"
                and _bypass_auto(eb, radius)):
            from .exactf64 import recover_exact
            return recover_exact(pred, bins, literal, eb, radius)
    return _recover_native(pred, bins, literal, eb, radius)


def _recover_native(pred, bins, literal, eb, radius: int):
    """Vectorized recover: bins!=0 -> pred + 2*(bin-radius)*eb (f64 math,
    narrowed to T); bins==0 -> the pre-placed literal value
    (reference LinearQuantizer.hpp:74-86)."""
    dec = (pred.astype(jnp.float64) +
           (2 * (bins - radius)).astype(jnp.float64) * eb).astype(pred.dtype)
    return jnp.where(bins != 0, dec, literal)


# --- verified fast mode (SZT_EXACT_F64=verify): float-float speed with ------
# --- softfloat parity for ARBITRARY error bounds -----------------------------
#
# The softfloat exists because TPU f64 emulation (float-float, ~48 mantissa
# bits) can round a DECISION differently from IEEE f64. But a decision only
# flips when the exact value sits within the emulation's error of a decision
# boundary — and every boundary in the quantizer is known:
#   (1) floor(|diff|*recip) and the qi < 2*radius test: integer boundaries;
#   (2) f32-narrowing of pred + q*eb: the f32 rounding midpoints (ulp/2 from
#       the nearest f32; ulp/4 at binade edges);
#   (3) err <= eb: the single point err == eb.
# Verified mode runs the fast float-float pipeline, flags every lane whose
# distance to a boundary is below a CONSERVATIVE relative tolerance
# (_VERIFY_EPS = 2^-42 >> the emulation's worst error and the flag
# computation's own error), and recomputes only the flagged lanes with the
# exact softfloat (compaction into a fixed _VERIFY_CAP buffer: cumsum +
# searchsorted + gather/scatter). If more than _VERIFY_CAP lanes flag
# (adversarially tied data), the whole call recomputes in softfloat via
# lax.cond — correctness never depends on the flag RATE, only on the flag
# PREDICATE being conservative. Non-finite operands flag outright (the
# softfloat reproduces the reference's NaN/Inf behavior bit-for-bit).
#
# On IEEE-f64 backends the fast path is already exact, so verified mode is a
# no-op detour; its value is on TPU, where it prices parity at the fast
# path's cost plus ~6 extra vector ops and a CAP-sized softfloat tail.

_VERIFY_EPS = 2.0 ** -42
_VERIFY_CAP = 8192
_F32_TINY = float(np.finfo(np.float32).tiny)      # 2^-126
_F32_HUGE = float(np.finfo(np.float32).max)


def _near_f32_boundary(s):
    """True where narrowing the (emulated) f64 value `s` to f32 sits within
    _VERIFY_EPS (relative) of a rounding boundary — the ulp/2 midpoints,
    plus ulp/4 at binade edges — or lands outside the normal f32 range."""
    n32 = s.astype(jnp.float32)
    a32 = jnp.abs(n32)
    special = ((a32 < np.float32(_F32_TINY)) | ~jnp.isfinite(n32)
               | (a32 >= np.float32(_F32_HUGE)))
    bits = jax.lax.bitcast_convert_type(n32, jnp.int32)
    ebits = (bits >> 23) & 0xFF
    ulp = jnp.exp2((ebits - 150).astype(jnp.float64))  # 2^(e-127-23)
    d = jnp.abs(s - n32.astype(jnp.float64))
    tol = jnp.abs(s) * _VERIFY_EPS + 1e-300
    near = (jnp.abs(d - ulp * 0.5) <= tol) | (jnp.abs(d - ulp * 0.25) <= tol)
    return near | special


def tie_flags_quantize(data, pred, eb, radius: int):
    """Conservative decision-boundary flags for the fast quantize path
    (exposed for the directed tests; see the section comment)."""
    recip = 1.0 / eb
    diff = data - pred
    ad = jnp.abs(diff).astype(jnp.float64)
    prod = ad * recip
    near_int = jnp.abs(prod - jnp.round(prod)) <= prod * _VERIFY_EPS + 1e-300
    qi = jnp.minimum(prod, jnp.float64(2 * radius)).astype(jnp.int32) + 1
    half = qi >> 1
    qeven = half << 1
    q = jnp.where(diff < 0, -qeven, qeven)
    s = pred.astype(jnp.float64) + q.astype(jnp.float64) * eb
    dec = s.astype(jnp.float32)
    err = jnp.abs((dec - data).astype(jnp.float64))
    near_eb = jnp.abs(err - eb) <= eb * _VERIFY_EPS
    bad = ~jnp.isfinite(data) | ~jnp.isfinite(pred)
    return near_int | _near_f32_boundary(s) | near_eb | bad


def _patch_flagged(flags, fast_outs, exact_fn, gather_arrays):
    """Recompute flagged lanes exactly. fast_outs: tuple of fast-path result
    arrays; exact_fn(sub_arrays...) -> tuple matching fast_outs; gather_
    arrays: inputs to gather per flagged lane. Falls back to exact_fn over
    ALL lanes when more than _VERIFY_CAP flags fire."""
    shape = flags.shape
    flat = flags.reshape(-1)
    n = flat.shape[0]
    cap = min(_VERIFY_CAP, n)
    ranks = jnp.cumsum(flat.astype(jnp.int32))
    nflag = ranks[-1]
    ins_flat = [a.reshape(-1) for a in gather_arrays]
    outs_flat = [o.reshape(-1) for o in fast_outs]

    def patched(operands):
        ins, outs = operands
        ks = jnp.arange(1, cap + 1, dtype=jnp.int32)
        pos = jnp.searchsorted(ranks, ks, side="left")
        posc = jnp.minimum(pos, n - 1)
        subs = [a[posc] for a in ins]
        ex = exact_fn(*subs)
        tgt = jnp.where(ks <= nflag, pos, n)  # out-of-range scatters drop
        return tuple(o.at[tgt].set(e) for o, e in zip(outs, ex))

    def full(operands):
        ins, _outs = operands
        return tuple(exact_fn(*ins))

    res = jax.lax.cond(nflag <= cap, patched, full, (ins_flat, outs_flat))
    return tuple(r.reshape(shape) for r in res)


def _quantize_verified(data, pred, eb, radius: int):
    from .exactf64 import quantize_exact

    bins_f, rec_f = _quantize_native(data, pred, eb, radius)
    flags = tie_flags_quantize(data, pred, eb, radius)
    return _patch_flagged(
        flags, (bins_f, rec_f),
        lambda d, p: quantize_exact(d, p, eb, radius), (data, pred))


def _recover_verified(pred, bins, literal, eb, radius: int):
    from .exactf64 import recover_exact

    rec_f = _recover_native(pred, bins, literal, eb, radius)
    s = (pred.astype(jnp.float64)
         + (2 * (bins - radius)).astype(jnp.float64) * eb)
    flags = (_near_f32_boundary(s) | ~jnp.isfinite(pred)) & (bins != 0)
    (out,) = _patch_flagged(
        flags, (rec_f,),
        lambda p, b, l: (recover_exact(p, b, l, eb, radius),),
        (pred, bins, literal))
    return out
