"""f64 device routes (INTERP encode + decode) and device-route ENGAGEMENT.

VERDICT r3 missing #4: every device path gated on f32 while the reference's
one engine is dtype-generic (reference api/sz.hpp:43-117 instantiates
float/double/int32/int64). The INTERP device-entropy route now carries f64:
literals ride the (Mosaic f64-free) histogram/compaction kernel as lo/hi i32
half-streams and recombine on the host; the decode literal scatter and grid
recovery are dtype-parameterized throughout.

VERDICT r3 weak #5: nothing asserted the device routes actually ENGAGE
(zero fallbacks) where they matter. The engagement tests force the route
(SZT_DEVICE_ENTROPY=1) and assert fallback_counts stays flat — this is the
regression net for the archive-loaded-config anchor-stride bug (loaded
configs carry stride -1; the decode route must resolve it like the encode
side or it silently falls back on EVERY real archive)."""

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.config import ALGO, Config
from sz3_tpu.algos import device_encode


@pytest.fixture(autouse=True)
def _force_device_route(monkeypatch):
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")


def _field(dims, dtype, seed=8):
    rng = np.random.default_rng(seed)
    return (np.cumsum(rng.standard_normal(dims), axis=-1) / 8).astype(dtype)


def _no_new_fallbacks():
    class Ctx:
        def __enter__(self):
            self.before = dict(device_encode.fallback_counts)
            return self

        def __exit__(self, *exc):
            if exc[0] is None:
                after = device_encode.fallback_counts
                new = {k: v - self.before.get(k, 0) for k, v in after.items()
                       if v != self.before.get(k, 0)}
                assert not new, f"device route fell back: {new}"
    return Ctx()


@pytest.mark.parametrize("dtype", [np.float32, np.float64],
                         ids=["f32", "f64"])
def test_interp_device_route_engages_and_matches(dtype):
    """Encode AND decode ride the device route with ZERO fallbacks on a
    smooth field at the default eb, and the archive + reconstruction are
    byte-identical to the host engine's (CPU backend: true IEEE f64)."""
    arr = _field((40, 36, 20), dtype)
    conf = Config(dims=arr.shape, cmprAlgo=ALGO.INTERP, absErrorBound=1e-3)
    with _no_new_fallbacks():
        bj = szt.compress(arr, conf.copy(), backend="jax",
                          set_datatype=False)
    bn = szt.compress(arr, conf.copy(), backend="native", set_datatype=False)
    assert bj == bn
    with _no_new_fallbacks():
        oj, _ = szt.decompress(bj, backend="jax", dtype=dtype)
    on, _ = szt.decompress(bn, dtype=dtype)
    assert oj.tobytes() == on.tobytes()
    assert np.abs(oj.astype(np.float64) - arr.astype(np.float64)).max() <= 1e-3


@pytest.mark.slow
def test_f64_literal_recombination_under_fine_bound():
    """A fine bound forces real literal traffic through the lo/hi half-stream
    compaction; the literal stream must recombine bit-exactly (archive parity
    covers it: literals are archive bytes)."""
    arr = _field((40, 36, 20), np.float64, seed=3)
    arr[::7, ::5, ::3] *= 1e6          # outliers -> unpredictable points
    conf = Config(dims=arr.shape, cmprAlgo=ALGO.INTERP, absErrorBound=1e-6)
    bj = szt.compress(arr, conf.copy(), backend="jax", set_datatype=False)
    bn = szt.compress(arr, conf.copy(), backend="native", set_datatype=False)
    assert bj == bn
    oj, _ = szt.decompress(bj, backend="jax", dtype=np.float64)
    assert np.abs(oj - arr).max() <= 1e-6


def test_decode_engages_on_archive_loaded_config():
    """Decompress from the BARE archive bytes (config loaded from the
    container, anchor stride = -1): the decode route must resolve the stride
    and engage — the round-4 regression this file exists for."""
    arr = _field((40, 36, 20), np.float32, seed=5)
    conf = Config(dims=arr.shape, cmprAlgo=ALGO.INTERP, absErrorBound=1e-3)
    blob = szt.compress(arr, conf.copy(), backend="native",
                        set_datatype=False)
    called = {}
    from sz3_tpu.algos import device_decode as dd
    orig = dd.decode_payload_device

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    import unittest.mock as mock
    with mock.patch.object(dd, "decode_payload_device", side_effect=spy):
        with _no_new_fallbacks():
            out, _ = szt.decompress(blob, backend="jax", dtype=np.float32)
    assert called.get("hit"), "device decode was never attempted"
    on, _ = szt.decompress(blob, dtype=np.float32)
    assert out.tobytes() == on.tobytes()


@pytest.mark.slow
def test_f64_via_public_api_dtype_roundtrip():
    """Full container round-trip (dataType set): decompress infers f64 from
    the archive."""
    arr = _field((40, 36, 20), np.float64, seed=9)   # reuses compiled statics
    blob = szt.compress(arr, Config(dims=arr.shape, cmprAlgo=ALGO.INTERP,
                                    absErrorBound=1e-6), backend="jax")
    out, conf = szt.decompress(blob, backend="jax")
    assert out.dtype == np.float64
    assert np.abs(out - arr).max() <= 1e-6
