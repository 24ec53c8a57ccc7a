"""Integer-softfloat f64 quantization must reproduce IEEE double semantics
bit-for-bit — property-tested against numpy float64 (a true IEEE
implementation), including directed ulp-tie and boundary cases.

These tests are meaningful on ANY backend (the module uses only integer and
f32 ops), and on TPU they prove the quantizer no longer depends on the
float-float f64 emulation that broke archive parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from sz3_tpu.ops.exactf64 import (linear1_exact, quantize_exact,
                                  recover_exact)

RADIUS = 32768


def np_quantize(data, pred, eb, radius):
    """Reference semantics in numpy float64 (mirrors native quantizer.hpp /
    reference LinearQuantizer.hpp:43-71)."""
    eb = np.float64(eb)
    recip = np.float64(1.0) / eb
    diff = data - pred                           # f32
    scaled = np.abs(diff.astype(np.float64)) * recip
    clampv = np.float64(2 * radius)
    sc = np.where(scaled < clampv, scaled, clampv)
    with np.errstate(invalid="ignore"):
        qi = sc.astype(np.int64).astype(np.int32) + 1
    half = qi >> 1
    qe = half << 1
    neg = diff < 0
    q = np.where(neg, -qe, qe).astype(np.int64)
    dec = (pred.astype(np.float64) + q.astype(np.float64) * eb
           ).astype(np.float32)
    err = np.abs((dec - data).astype(np.float64))
    ok = (qi < 2 * radius) & (err <= eb) & np.isfinite(diff)
    bins = np.where(ok, np.where(neg, radius - half, radius + half), 0)
    recon = np.where(ok, dec, data)
    return bins.astype(np.int32), recon


def np_recover(pred, bins, literal, eb, radius):
    eb = np.float64(eb)
    dec = (pred.astype(np.float64) +
           (2 * (bins.astype(np.int64) - radius)).astype(np.float64) * eb
           ).astype(np.float32)
    return np.where(bins != 0, dec, literal)


def _check(data, pred, eb, radius=RADIUS):
    bins_ref, recon_ref = np_quantize(data, pred, eb, radius)
    bins, recon = quantize_exact(jnp.asarray(data), jnp.asarray(pred), eb,
                                 radius)
    bins = np.asarray(bins)
    recon = np.asarray(recon)
    mism = np.nonzero(bins != bins_ref)[0]
    assert mism.size == 0, (
        f"bins mismatch at {mism[:5]}: got {bins[mism[:5]]} want "
        f"{bins_ref[mism[:5]]} data={data[mism[:5]]} pred={pred[mism[:5]]}")
    assert np.array_equal(recon.view(np.int32), recon_ref.view(np.int32))
    # recover side
    lit = data
    rec_ref = np_recover(pred, bins_ref, lit, eb, radius)
    rec = np.asarray(recover_exact(jnp.asarray(pred), jnp.asarray(bins_ref),
                                   jnp.asarray(lit), eb, radius))
    assert np.array_equal(rec.view(np.int32), rec_ref.view(np.int32))


EBS = [1e-3, 1e-4, 3.7e-2, 1.1920929e-07, 123.456, 1e-9]


@pytest.mark.parametrize("eb", EBS)
def test_random_uniform(eb):
    rng = np.random.default_rng(hash(eb) % 2**31)
    n = 1 << 16
    data = rng.standard_normal(n).astype(np.float32) * 10
    pred = data + rng.standard_normal(n).astype(np.float32) * np.float32(5 * eb)
    _check(data, pred, eb)


@pytest.mark.parametrize("eb", [1e-3, 7.3e-5])
def test_wide_scales(eb):
    rng = np.random.default_rng(7)
    n = 1 << 16
    scale = np.exp2(rng.integers(-40, 40, n)).astype(np.float32)
    data = (rng.standard_normal(n).astype(np.float32) * scale)
    pred = (data.astype(np.float64) *
            (1 + rng.standard_normal(n) * 1e-3)).astype(np.float32)
    _check(data, pred, eb)


@pytest.mark.parametrize("eb", [1e-3, 2.5e-4])
def test_directed_ulp_boundaries(eb):
    """Values engineered so scaled lands within a few f64 ulps of integer
    and half-integer boundaries — exactly where float-float emulation
    misrounds."""
    rng = np.random.default_rng(11)
    qs = rng.integers(0, 2 * RADIUS, 1 << 14)
    pred = rng.standard_normal(1 << 14).astype(np.float32)
    base = pred.astype(np.float64) + qs * np.float64(eb)
    outs = []
    for bump in (-2, -1, 0, 1, 2):
        d = base.astype(np.float32)
        step = np.where(bump >= 0, np.float32(np.inf), np.float32(-np.inf))
        v = d.copy()
        for _ in range(abs(bump)):
            v = np.nextafter(v, step)
        outs.append(v)
    data = np.concatenate(outs)
    predN = np.tile(pred, 5)
    _check(data, predN, eb)


def test_exact_halfway_and_err_equality():
    eb = 0.125  # power of two: products hit exact halves often
    rng = np.random.default_rng(3)
    pred = (rng.integers(-1000, 1000, 1 << 14) * np.float32(0.25)).astype(np.float32)
    q = rng.integers(-100, 100, 1 << 14)
    data = (pred.astype(np.float64) + (q + 0.5) * eb).astype(np.float32)
    _check(data, pred, eb)
    data2 = (pred.astype(np.float64) + q * eb + eb).astype(np.float32)
    _check(data2, pred, eb)


def test_specials_and_edges():
    eb = 1e-3
    data = np.array([0.0, -0.0, 1e-38, -1e-38, 3.4e38, -3.4e38,
                     np.inf, -np.inf, np.nan, 1e-44, 5.0], np.float32)
    pred = np.array([0.0, 0.0, 0.0, 1e-38, 3.4e38, 3.39e38,
                     1.0, 0.0, 0.0, 0.0, 5.0], np.float32)
    _check(data, pred, eb)


def test_zero_diff_and_tiny_eb():
    data = np.full(64, 1.2345678, np.float32)
    _check(data, data.copy(), 1e-12)


def test_flog2_near_2pow32():
    """Regression: words in [2^32-128, 2^32) convert to the f32 2^32 (e=32);
    the round-up guard must also fire for e >= 32 or _flog2_i64 returns 32
    instead of 31, denormalizing _norm53 downstream."""
    from sz3_tpu.ops.exactf64 import _flog2_i64
    vals = [2**32 - 128, 2**32 - 64, 2**32 - 8, 2**32 - 1, 2**32,
            2**32 + 1, 2**31 - 1, 2**31, 2**33 - 1, 1, 2, 3, 2**52 - 1]
    got = np.asarray(_flog2_i64(jnp.asarray(np.array(vals, np.int64))))
    want = np.array([v.bit_length() - 1 for v in vals], np.int32)
    assert np.array_equal(got, want), (got, want)


def test_add_signed_deep_cancellation():
    """Regression (ADVICE r2): subtraction leaving a mantissa difference in
    [2^32-128, 2^32) after the <<3 guard hit the _flog2_i64 e==32 bug and
    produced a grossly wrong normalization."""
    from sz3_tpu.ops.exactf64 import _add_signed, _narrow_f32
    # (MA - MB) << 3 lands in [2^32-128, 2^32): MA - MB in [2^29-16, 2^29)
    xs = [2**29 - 16, 2**29 - 15, 2**29 - 9, 2**29 - 8, 2**29 - 1,
          2**29, 2**29 - 17]  # last two: outside the bug window (control)
    n = len(xs)
    MA = np.array([2**52 + x for x in xs], np.int64)
    MB = np.full(n, 2**52, np.int64)
    E = np.zeros(n, np.int32)
    neg, M, Eo = _add_signed(
        jnp.zeros(n, bool), jnp.asarray(MA), jnp.asarray(E),
        jnp.ones(n, bool), jnp.asarray(MB), jnp.asarray(E))
    M = np.asarray(M)
    Eo = np.asarray(Eo)
    assert not np.asarray(neg).any()
    for i, x in enumerate(xs):
        # exact difference x * 2^0, normalized to [2^52, 2^53)
        lg = x.bit_length() - 1
        assert int(M[i]) == x << (52 - lg), (i, x, int(M[i]))
        assert int(Eo[i]) == lg - 52  # value = M * 2^E == x
        assert int(M[i]) << 11 >> 11 == int(M[i])  # still 53-bit
    f = np.asarray(_narrow_f32(np.asarray(neg), jnp.asarray(M),
                               jnp.asarray(Eo)))
    want = np.array(xs, np.float64).astype(np.float32)
    assert np.array_equal(f, want)


def test_linear1_matches_f64():
    rng = np.random.default_rng(5)
    for n in range(4):
        a = (rng.standard_normal(1 << 14) * np.exp2(
            rng.integers(-30, 30, 1 << 14))).astype(np.float32)
        b = (rng.standard_normal(1 << 14) * np.exp2(
            rng.integers(-30, 30, 1 << 14))).astype(np.float32)
        ref = (-0.5 * a.astype(np.float64) +
               1.5 * b.astype(np.float64)).astype(np.float32)
        got = np.asarray(linear1_exact(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(got.view(np.int32), ref.view(np.int32)), \
            np.nonzero(got.view(np.int32) != ref.view(np.int32))[0][:5]


def test_flog2_i32_exhaustive_boundaries():
    """The cheap 32-bit floor(log2) (round-3 specialization): exhaustive over
    [1, 2^17) plus every +-2 neighborhood of a power of two up to 2^26 (the
    f32-conversion round-up guard territory: integers >= 2^24 convert
    inexactly and can round up across the power)."""
    from sz3_tpu.ops.exactf64 import _flog2_i32
    vals = list(range(1, 1 << 17))
    for k in range(17, 27):
        for d in (-2, -1, 0, 1, 2):
            v = (1 << k) + d
            if 1 <= v < (1 << 27):
                vals.append(v)
    vals = np.array(sorted(set(vals)), np.int64)
    got = np.asarray(_flog2_i32(jnp.asarray(vals)))
    want = np.array([int(v).bit_length() - 1 for v in vals], np.int32)
    assert np.array_equal(got, want), vals[got != want][:10]


def test_norm53_small_exact():
    """_norm53_small must left-shift exactly (no rounding path) for any
    m < 2^30, including zero and subnormal-width mantissas."""
    from sz3_tpu.ops.exactf64 import _norm53_small
    rng = np.random.default_rng(11)
    m = np.concatenate([
        np.array([0, 1, 2, 3, (1 << 23) - 1, 1 << 23, (1 << 24) - 1,
                  1 << 24, 3 * ((1 << 24) - 1)], np.int64),
        rng.integers(1, 1 << 26, 4096).astype(np.int64)])
    e = rng.integers(-140, 100, m.size).astype(np.int32)
    M, E = _norm53_small(jnp.asarray(m), jnp.asarray(e))
    M, E = np.asarray(M), np.asarray(E)
    for i in range(m.size):
        if m[i] == 0:
            assert M[i] == 0
            continue
        lg = int(m[i]).bit_length() - 1
        assert int(M[i]) == int(m[i]) << (52 - lg)
        assert int(E[i]) == int(e[i]) - (52 - lg)
        assert (1 << 52) <= int(M[i]) < (1 << 53)


def test_radius_2pow23_and_guard():
    """radius = 2^23 drives qe to exactly 2^24 on clamped lanes (the
    _mul_m24_m53 m == 2^24 edge); anything larger must raise rather than
    silently misround."""
    rng = np.random.default_rng(3)
    data = rng.standard_normal(1 << 12).astype(np.float32)
    pred = np.zeros_like(data)
    _check(data, pred, 1e-5, radius=1 << 23)
    with pytest.raises(NotImplementedError):
        quantize_exact(jnp.asarray(data), jnp.asarray(pred), 1e-5,
                       (1 << 23) + 1)
    with pytest.raises(NotImplementedError):
        recover_exact(jnp.asarray(pred), jnp.zeros(data.size, jnp.int32),
                      jnp.asarray(data), 1e-5, (1 << 23) + 1)


def test_add_signed_lexicographic_ties():
    """The round-3 _add_signed relies on its inputs being normalized M53 (or
    zero): magnitude ordering is then the (E, M) lexicographic compare. Probe
    exact ties, +-1 ulp around ties, and zero operands on both sides."""
    from sz3_tpu.ops.exactf64 import _add_signed, _narrow_f32
    M0 = 1 << 52
    cases = [  # (MA, EA, MB, EB)
        (M0, 0, M0, 0),            # exact tie -> cancels to zero
        (M0 + 1, 0, M0, 0),        # 1-ulp difference
        (M0, 0, M0 + 1, 0),
        (M0, 1, (1 << 53) - 1, 0),  # EA > EB but close magnitudes
        ((1 << 53) - 1, 0, M0, 1),
        (0, 0, M0, 0),             # zero A (E field garbage-insensitive)
        (M0, 0, 0, 0),
        (0, 5, 0, -5),             # both zero
    ]
    MA = np.array([c[0] for c in cases], np.int64)
    EA = np.array([c[1] for c in cases], np.int32)
    MB = np.array([c[2] for c in cases], np.int64)
    EB = np.array([c[3] for c in cases], np.int32)
    for negA in (False, True):
        for negB in (False, True):
            neg, M, E = _add_signed(
                jnp.full(len(cases), negA), jnp.asarray(MA), jnp.asarray(EA),
                jnp.full(len(cases), negB), jnp.asarray(MB), jnp.asarray(EB))
            got = np.asarray(_narrow_f32(neg, M, E)).astype(np.float64)
            a = MA.astype(np.float64) * np.exp2(EA) * (-1 if negA else 1)
            b = MB.astype(np.float64) * np.exp2(EB) * (-1 if negB else 1)
            want = (a + b).astype(np.float32).astype(np.float64)
            assert np.array_equal(got, want), (negA, negB, got, want)


def test_pow2_sha_safe_predicate_and_routing(monkeypatch):
    """Power-of-two bounds provably need no softfloat (ARCHITECTURE.md):
    the predicate accepts exactly the proven range, auto mode routes fast
    for them, and the fast path's results equal the exact path's (trivially
    on the IEEE-f64 CPU backend — the derivation is the TPU claim)."""
    from sz3_tpu.ops.quantize import pow2_sha_safe, quantize

    assert pow2_sha_safe(2.0 ** -10, 32768)
    assert pow2_sha_safe(0.25, 512)
    assert pow2_sha_safe(1.0, 1 << 23)
    assert not pow2_sha_safe(1e-3, 32768)          # not a power of two
    assert not pow2_sha_safe(2.0 ** -10, (1 << 23) + 1)  # quantbin too big
    assert not pow2_sha_safe(2.0 ** -120, 32768)   # subnormal-product range
    assert not pow2_sha_safe(0.0, 32768)
    assert not pow2_sha_safe(float("nan"), 32768)

    # auto + pow2 -> the softfloat module must NOT be invoked
    monkeypatch.setenv("SZT_EXACT_F64", "1")       # force exact_mode() True
    import sz3_tpu.ops.quantize as q

    monkeypatch.setattr(q, "exact_mode", lambda eb: True)
    called = {}
    import sz3_tpu.ops.exactf64 as xf
    orig = xf.quantize_exact

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(xf, "quantize_exact", spy)
    monkeypatch.setenv("SZT_EXACT_F64", "auto")
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    pred = jnp.zeros(4096, jnp.float32)
    # the auto bypass additionally requires a POSITIVE field screen (the
    # flush-safety precondition is data-dependent: no subnormal inputs)
    with q.screened(True):
        b_fast, r_fast = q.quantize(data, pred, 2.0 ** -10, 32768)
    assert "hit" not in called                     # fast path taken
    b_soft, r_soft = orig(data, pred, 2.0 ** -10, 32768)
    assert np.array_equal(np.asarray(b_fast), np.asarray(b_soft))
    assert np.asarray(r_fast).tobytes() == np.asarray(r_soft).tobytes()
    # unscreened (default) -> softfloat even for pow2 eb
    q.quantize(data, pred, 2.0 ** -11, 32768)
    assert called.pop("hit")
    # negative screen -> softfloat
    with q.screened(False):
        q.quantize(data, pred, 2.0 ** -12, 32768)
    assert called.pop("hit")
    # SZT_POW2_BYPASS=0 disables even with a positive screen
    monkeypatch.setenv("SZT_POW2_BYPASS", "0")
    with q.screened(True):
        q.quantize(data, pred, 2.0 ** -13, 32768)
    assert called.pop("hit")
    # SZT_POW2_BYPASS=1 force-asserts the screen (user-declared safe data)
    monkeypatch.setenv("SZT_POW2_BYPASS", "1")
    q.quantize(data, pred, 2.0 ** -14, 32768)
    assert "hit" not in called
    monkeypatch.delenv("SZT_POW2_BYPASS")
    # non-pow2 under forced exact still routes softfloat
    monkeypatch.setenv("SZT_EXACT_F64", "1")
    q.quantize(data, pred, 1e-3, 32768)
    assert called.get("hit")


def test_field_screen_subnormals():
    """screen_ok: clears normal-range fields (zeros allowed — the eb-lattice
    argument covers them), rejects subnormals (TPU DAZ divergence), NaN, Inf;
    non-f32 arrays pass through (bypass is f32-scoped)."""
    from sz3_tpu.ops.quantize import screen_ok

    ok = np.array([0.0, 1.0, -3.5e-30, 1.2e38, np.float32(2 ** -126)],
                  np.float32)
    assert screen_ok(ok)
    assert screen_ok(np.zeros(0, np.float32))
    assert screen_ok(None)
    assert screen_ok(np.array([1, 2], np.int32))   # non-f32: not screened
    assert not screen_ok(np.array([1.0, 1e-45], np.float32))      # subnormal
    assert not screen_ok(np.array([np.nan], np.float32))
    assert not screen_ok(np.array([np.inf, 1.0], np.float32))
    assert not screen_ok(ok, np.array([-1e-40], np.float32))      # any-array
    # device arrays reduce on-device
    assert screen_ok(jnp.asarray(ok))
    assert not screen_ok(jnp.asarray(np.array([1e-44], np.float32)))


def test_pow2_screen_end_to_end(monkeypatch):
    """A subnormal-laden field must take the softfloat on the device INTERP
    route even with a pow2 eb (ADVICE r3 medium): archives stay byte-equal to
    the host engine's. A clean field with pow2 eb rides the bypass."""
    import sz3_tpu as szt
    from sz3_tpu.config import ALGO, Config
    import sz3_tpu.ops.exactf64 as xf

    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")  # force device route (CPU interpret)
    monkeypatch.setenv("SZT_EXACT_F64", "auto")
    rng = np.random.default_rng(7)
    shape = (16, 16, 16)
    clean = rng.standard_normal(shape).astype(np.float32)
    dirty = clean.copy()
    dirty[3, 5, 7] = 1e-42                          # f32 subnormal
    calls = []
    orig = xf.quantize_exact
    monkeypatch.setattr(xf, "quantize_exact",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    import sz3_tpu.ops.quantize as q
    monkeypatch.setattr(q, "exact_mode", lambda eb: True)

    def conf():
        c = Config(dims=shape, cmprAlgo=ALGO.INTERP, absErrorBound=2.0 ** -10)
        c.interpAnchorStride = 8
        # alpha=1 keeps every interp level's eb at the pow2 bound (the
        # default 1.25 gives eb/1.25^i levels, which correctly stay softfloat)
        c.interpAlpha = 1.0
        c.interpBeta = 1.0
        return c

    from sz3_tpu.algos import device_encode
    device_encode._static.cache_clear()
    blob_clean = szt.compress(clean, conf(), backend="jax")
    assert not calls                                # bypass engaged
    blob_dirty = szt.compress(dirty, conf(), backend="jax")
    assert calls                                    # softfloat engaged
    # both must decode exactly like the host engine's archives
    host_clean = szt.compress(clean, conf(), backend="native")
    host_dirty = szt.compress(dirty, conf(), backend="native")
    assert blob_clean == host_clean
    assert blob_dirty == host_dirty
