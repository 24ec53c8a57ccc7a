"""The vectorized tuner must reproduce the native sampling tuner's decisions
EXACTLY (conf rewrite + resulting archive bytes) — the trial seals ride the
same format-exact path, so any divergence is a bins or sampling bug."""

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.algos import tuner
from sz3_tpu.config import ALGO, EB, Config


def _fields():
    rng = np.random.default_rng(0)
    smooth = np.cumsum(np.cumsum(rng.standard_normal((60, 50, 40)), 0), 1)
    yield "smooth3d", (smooth * 0.01).astype(np.float32)
    yield "noise3d", rng.standard_normal((48, 48, 48)).astype(np.float32)
    x = np.linspace(0, 8 * np.pi, 96)
    wave = np.sin(x)[:, None, None] * np.cos(x * 0.5)[None, :, None] \
        * np.sin(x * 0.25)[None, None, :]
    yield "wave3d", wave.astype(np.float32)
    f2 = np.cumsum(rng.standard_normal((300, 257)), axis=0) * 0.1
    yield "smooth2d", f2.astype(np.float32)
    yield "tiny", rng.standard_normal((10, 10, 10)).astype(np.float32)
    yield "f64", (np.cumsum(rng.standard_normal((40, 40, 40)), 0)
                  * 0.05).astype(np.float64)
    yield "const", np.zeros((64, 64, 64), np.float32)


FIELDS = dict(_fields())


@pytest.mark.parametrize("name", list(FIELDS))
@pytest.mark.parametrize("eb", [1e-2, 1e-4])
def test_decisions_match_native(name, eb):
    data = FIELDS[name]
    c_jax = Config(dims=data.shape, cmprAlgo=ALGO.INTERP_LORENZO,
                   absErrorBound=eb)
    c_nat = Config(dims=data.shape, cmprAlgo=ALGO.INTERP_LORENZO,
                   absErrorBound=eb)
    ok = tuner.tune(c_jax, data.copy())
    if not ok:
        pytest.skip("outside the vectorized profile (native path used)")
    runtime.tune_interp(c_nat, data.copy())
    for f in ("cmprAlgo", "interpAlgo", "interpDirection", "interpAlpha",
              "interpBeta", "absErrorBound", "quantbinCnt", "errorBoundMode"):
        assert getattr(c_jax, f) == getattr(c_nat, f), f


@pytest.mark.parametrize("mode", [EB.ABS, EB.REL])
def test_archives_identical_through_public_api(mode):
    """backend='jax' INTERP_LORENZO archives (tuner + encode) equal the
    native engine's bytes."""
    data = FIELDS["smooth3d"]
    kw = dict(dims=data.shape, cmprAlgo=ALGO.INTERP_LORENZO,
              errorBoundMode=mode)
    if mode == EB.ABS:
        kw["absErrorBound"] = 1e-3
    else:
        kw["relErrorBound"] = 1e-4
    a = szt.compress(data, Config(**kw), set_datatype=False)
    b = szt.compress(data, Config(**kw), set_datatype=False, backend="jax")
    assert a == b


def test_profiling_range_arithmetic_matches_scalar_walk():
    """Round-3 review regression: the block range must be a T-typed (f32)
    subtraction promoted to double — `double(mx - mn) > abseb` — not an
    f64-exact difference, and non-origin NaNs are IGNORED by the scalar
    walk's comparison chain (origin NaN poisons the block instead)."""
    from sz3_tpu.algos.tuner import _profiling_starts

    bs, stride = 4, 4
    # mx - mn chosen so the f32 subtraction rounds UP across abseb while the
    # exact f64 difference stays below: mn tiny-positive, mx = abseb as f32.
    mn = np.float32(2.0 ** -26)   # f32(1 - 2^-26) rounds UP to 1.0
    mx = np.float32(1.0)
    abseb = 1.0 - 2.0 ** -27      # f64 diff (1 - 2^-26) < abseb < f32 diff (1.0)
    assert float(mx) - float(mn) <= abseb < float(np.float32(mx - mn))
    data = np.full((8, 8), mn, np.float32)
    data[0, 4] = mx               # sampled corner (si = (0, bs))
    starts = _profiling_starts(data, bs, abseb, stride)
    assert starts.shape[0] == 1 and tuple(starts[0]) == (0, 0)

    # non-origin NaN: ignored; the finite values still profile the block
    data2 = np.full((8, 8), 0.0, np.float32)
    data2[0, 4] = 5.0             # sampled corner (si = (0, bs))
    data2[4, 0] = np.nan          # sampled, non-origin
    starts2 = _profiling_starts(data2, bs, 1.0, stride)
    assert starts2.shape[0] == 1

    # origin NaN: comparisons never update mn/mx -> block never profiles
    data3 = np.full((8, 8), 0.0, np.float32)
    data3[0, 0] = np.nan
    data3[0, 4] = 5.0
    starts3 = _profiling_starts(data3, bs, 1.0, stride)
    assert starts3.shape[0] == 0
