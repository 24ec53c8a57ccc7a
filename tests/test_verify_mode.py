"""Tie-screened verified fast mode (SZT_EXACT_F64=verify).

The mode prices exact-parity quantization at the fast float-float path's
cost for ARBITRARY error bounds (the pow2 bypass covers only eb = 2^k):
every lane whose exact value sits near a decision boundary — the only
places float-float emulation can flip a decision — is flagged by a
conservative predicate and recomputed with the softfloat
(ops/quantize.py "verified fast mode" section).

On this CPU backend the fast path is already IEEE-exact, so equality with
the softfloat holds trivially; what these tests pin down is the MACHINERY:
the flag predicate catches crafted boundary cases (that is the entire
correctness argument on TPU), the patch scatters exact results into the
right lanes, and the capacity-overflow path falls back to full softfloat.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sz3_tpu.ops import quantize as qz
from sz3_tpu.ops.exactf64 import quantize_exact, recover_exact

EB = 1e-3          # non-pow2: the bypass can't fire, softfloat is the oracle
RADIUS = 32768


def test_flags_catch_integer_boundary():
    """data - pred = k * eb exactly representable -> |diff|*recip sits ON an
    integer boundary; the predicate must flag it."""
    eb = 2.0 ** -10  # eb exact in f32 so diff = k*eb is exact
    pred = np.zeros(64, np.float32)
    data = (np.arange(1, 65, dtype=np.float32) * 2) * np.float32(eb)
    flags = np.asarray(qz.tie_flags_quantize(
        jnp.asarray(data), jnp.asarray(pred), eb, RADIUS))
    assert flags.all(), "exact integer-boundary products must flag"


def test_flags_catch_f32_midpoint():
    """pred + q*eb landing exactly between two f32s (the narrow midpoint):
    eb with a 25-bit mantissa makes q*eb = 2*eb = 2^-24 + 2^-48, which is
    precisely the midpoint of [2^-24, 2^-24 + 2^-47). data = 1.25*2^-24
    (exact f32) gives prod ~ 2.49999 -> q = 2, away from integer and err/eb
    boundaries, so ONLY the midpoint detector can flag it."""
    eb = float((2 ** 24 + 1) * np.float64(2.0) ** -49)
    pred = np.zeros(8, np.float32)
    data = np.full(8, np.float32(5 * 2.0 ** -26))
    s = 2 * eb
    n32 = np.float32(s)
    assert abs(s - float(np.float64(n32))) * 2 == float(
        np.spacing(np.abs(n32), dtype=np.float32)), "not a midpoint"
    flags = np.asarray(qz.tie_flags_quantize(
        jnp.asarray(data), jnp.asarray(pred), eb, RADIUS))
    assert flags.all(), "f32-narrow midpoints must flag"


def test_flags_catch_err_eq_eb():
    """err == eb exactly (accept/reject boundary of the verify compare)."""
    eb = 2.0 ** -12
    pred = np.zeros(4, np.float32)
    data = np.full(4, eb, np.float32)  # diff = eb -> qi = 2? err lands on eb
    flags = np.asarray(qz.tie_flags_quantize(
        jnp.asarray(data), jnp.asarray(pred), eb, RADIUS))
    assert flags.all()


def test_flags_catch_specials():
    data = np.array([np.nan, np.inf, -np.inf, 1.0], np.float32)
    pred = np.array([0.0, 0.0, 0.0, np.nan], np.float32)
    flags = np.asarray(qz.tie_flags_quantize(
        jnp.asarray(data), jnp.asarray(pred), EB, RADIUS))
    assert flags.all()


def _random_case(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.standard_normal(n).astype(np.float32)
    data = (pred + rng.standard_normal(n).astype(np.float32)
            * np.float32(50 * EB)).astype(np.float32)
    # salt in crafted boundary lanes + specials
    data[::97] = pred[::97] + np.float32(2 * EB)
    data[7] = np.nan
    data[11] = np.inf
    return data, pred


def test_verified_quantize_equals_softfloat(monkeypatch):
    data, pred = _random_case()
    monkeypatch.setenv("SZT_EXACT_F64", "verify")
    bins_v, rec_v = qz.quantize(jnp.asarray(data), jnp.asarray(pred), EB,
                                RADIUS)
    be, re_ = quantize_exact(jnp.asarray(data), jnp.asarray(pred), EB, RADIUS)
    assert np.array_equal(np.asarray(bins_v), np.asarray(be))
    assert np.asarray(rec_v).tobytes() == np.asarray(re_).tobytes()


def test_verified_recover_equals_softfloat(monkeypatch):
    data, pred = _random_case(seed=3)
    bins, _ = quantize_exact(jnp.asarray(data), jnp.asarray(pred), EB, RADIUS)
    lit = np.where(np.asarray(bins) == 0, data, np.float32(0))
    monkeypatch.setenv("SZT_EXACT_F64", "verify")
    out_v = qz.recover(jnp.asarray(pred), bins, jnp.asarray(lit), EB, RADIUS)
    out_e = recover_exact(jnp.asarray(pred), bins, jnp.asarray(lit), EB,
                          RADIUS)
    assert np.asarray(out_v).tobytes() == np.asarray(out_e).tobytes()


def test_cap_overflow_falls_back_to_full_softfloat(monkeypatch):
    """Every lane tied (adversarial): nflag > _VERIFY_CAP must route the
    whole call through the softfloat, not drop patches."""
    n = qz._VERIFY_CAP * 2
    eb = 2.0 ** -10
    pred = np.zeros(n, np.float32)
    data = np.full(n, 4 * eb, np.float32)   # integer-boundary product, all lanes
    monkeypatch.setenv("SZT_EXACT_F64", "verify")
    bins_v, rec_v = qz.quantize(jnp.asarray(data), jnp.asarray(pred), eb,
                                RADIUS)
    be, re_ = quantize_exact(jnp.asarray(data), jnp.asarray(pred), eb, RADIUS)
    assert np.array_equal(np.asarray(bins_v), np.asarray(be))
    assert np.asarray(rec_v).tobytes() == np.asarray(re_).tobytes()


def test_verified_mode_end_to_end_archive_parity(monkeypatch):
    """backend='jax' under SZT_EXACT_F64=verify produces archives
    byte-identical to the host engine (CPU backend oracle)."""
    import sz3_tpu as szt
    from sz3_tpu.config import ALGO, Config
    rng = np.random.default_rng(5)
    arr = (np.cumsum(rng.standard_normal((40, 36, 20)).astype(np.float32),
                     axis=1) / 4).astype(np.float32)
    monkeypatch.setenv("SZT_EXACT_F64", "verify")
    conf = Config(dims=arr.shape, cmprAlgo=ALGO.INTERP, absErrorBound=EB)
    bj = szt.compress(arr, conf.copy(), backend="jax", set_datatype=False)
    monkeypatch.setenv("SZT_EXACT_F64", "0")
    bn = szt.compress(arr, conf.copy(), backend="native", set_datatype=False)
    assert bj == bn
