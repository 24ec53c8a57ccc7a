"""Preprocessor layer, timers, and binding-shim tests."""

import io
import os
import time

import numpy as np
import pytest

from sz3_tpu.preprocess import prefilter, transpose, wavelet_forward, wavelet_inverse
from sz3_tpu.utils import Timer, timed, timings_enabled


class TestPreprocess:
    def test_transpose_matches_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, (5, 7, 9, 3)).astype(np.float32)
        out = transpose(a, (3, 1, 0, 2))
        assert out.flags.c_contiguous
        assert np.array_equal(out, a.transpose(3, 1, 0, 2))

    def test_transpose_5d_rejected(self):
        with pytest.raises(ValueError):
            transpose(np.zeros((2,) * 5), (0, 1, 2, 3, 4))

    def test_prefilter(self):
        a = np.array([-5.0, 0.5, 3.0, 0.1], dtype=np.float32)
        out = prefilter(a, (-1.0, 1.0), 9.0)
        assert np.array_equal(out, np.array([9.0, 0.5, 9.0, 0.1], dtype=np.float32))
        assert a[0] == -5.0  # input untouched

    @pytest.mark.parametrize("n", [64, 1000, 4097])
    def test_wavelet_roundtrip(self, n):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, n)
        c = wavelet_forward(x)
        assert np.abs(wavelet_inverse(c, n) - x).max() < 1e-9

    def test_wavelet_compacts_smooth_signal(self):
        x = np.sin(np.linspace(0, 6 * np.pi, 1024))
        c = wavelet_forward(x)
        # energy concentrates in the coarse half for smooth input
        assert np.sum(c[:512] ** 2) > 50 * np.sum(c[512:] ** 2)


class TestTimer:
    def test_timer_measures(self):
        t = Timer(start=True)
        time.sleep(0.01)
        dt = t.stop("noop")
        assert dt >= 0.01

    def test_timed_context(self):
        with timed("block") as t:
            pass

    def test_gating(self, monkeypatch):
        monkeypatch.setenv("SZT_DEBUG_TIMINGS", "1")
        assert timings_enabled()
        monkeypatch.setenv("SZT_DEBUG_TIMINGS", "0")
        assert not timings_enabled()


class TestShims:
    def test_pysz_toplevel_import(self):
        from pysz import sz, szConfig, szErrorBoundMode

        data = np.fromfunction(lambda i, j: np.sin(i / 9) + j / 40, (60, 60)).astype(np.float32)
        conf = szConfig(data.shape)
        conf.errorBoundMode = szErrorBoundMode.ABS
        conf.absErrorBound = 1e-3
        blob, ratio = sz.compress(data, conf)
        out, _ = sz.decompress(blob, np.float32, data.shape)
        assert np.abs(out - data).max() <= 1e-3
