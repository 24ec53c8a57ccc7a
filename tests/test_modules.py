"""Module-level unit tests, mirroring the reference's GoogleTest tier
(tools/test/modules: test_encoder.cpp, test_lossless.cpp, test_quantizer.cpp).
"""

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import Config, EB, ALGO, INTERP_ALGO


class TestHuffman:
    def test_roundtrip_mod100(self):
        # reference test_encoder.cpp:10-41 pattern
        rng = np.random.default_rng(1)
        bins = (rng.integers(0, 1 << 30, 1000) % 100).astype(np.int32)
        blob = runtime.huff_encode(bins)
        out = runtime.huff_decode(blob, bins.size)
        assert np.array_equal(out, bins)

    def test_single_symbol(self):
        bins = np.full(5000, 42, dtype=np.int32)
        blob = runtime.huff_encode(bins)
        out = runtime.huff_decode(blob, bins.size)
        assert np.array_equal(out, bins)

    def test_negative_and_offset(self):
        rng = np.random.default_rng(2)
        bins = rng.integers(-50, 50, 10000).astype(np.int32)
        out = runtime.huff_decode(runtime.huff_encode(bins), bins.size)
        assert np.array_equal(out, bins)

    def test_wide_alphabet(self):
        rng = np.random.default_rng(3)
        bins = rng.integers(0, 65536, 200000).astype(np.int32)
        out = runtime.huff_decode(runtime.huff_encode(bins), bins.size)
        assert np.array_equal(out, bins)

    def test_skewed_distribution(self):
        rng = np.random.default_rng(4)
        bins = np.where(rng.random(100000) < 0.95, 32768,
                        rng.integers(0, 65536, 100000)).astype(np.int32)
        out = runtime.huff_decode(runtime.huff_encode(bins), bins.size)
        assert np.array_equal(out, bins)


class TestZstd:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(5)
        data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
        assert runtime.zstd_decompress(runtime.zstd_compress(data)) == data

    def test_roundtrip_compressible(self):
        data = b"scientific data " * 10000
        blob = runtime.zstd_compress(data)
        assert len(blob) < len(data) // 10
        assert runtime.zstd_decompress(blob) == data


class TestConfigBinary:
    def test_roundtrip_defaults(self):
        c = Config(dims=(128, 8, 8))
        blob = c.save()
        c2, n = Config.load(blob)
        assert n == len(blob)
        assert c2.dims == c.dims and c2.cmprAlgo == c.cmprAlgo
        assert c2.absErrorBound == c.absErrorBound
        assert c2.quantbinCnt == c.quantbinCnt and c2.blockSize == c.blockSize

    @pytest.mark.parametrize("mode", list(EB))
    def test_roundtrip_eb_modes(self, mode):
        c = Config(dims=(1000,), errorBoundMode=mode, absErrorBound=0.5,
                   relErrorBound=0.25, psnrErrorBound=60.0, l2normErrorBound=7.5)
        c2, _ = Config.load(c.save())
        assert c2.errorBoundMode == mode
        if mode == EB.ABS:
            assert c2.absErrorBound == 0.5
        elif mode == EB.REL:
            assert c2.relErrorBound == 0.25
        elif mode == EB.PSNR:
            assert c2.psnrErrorBound == 60.0
        elif mode == EB.L2NORM:
            assert c2.l2normErrorBound == 7.5
        else:
            assert c2.absErrorBound == 0.5 and c2.relErrorBound == 0.25

    def test_ini_roundtrip(self):
        c = Config(dims=(10, 20))
        c.cmprAlgo = ALGO.LORENZO_REG
        c.interpAlgo = INTERP_ALGO.LINEAR
        c.openmp = True
        c.lorenzo2 = True
        c2 = Config(dims=(10, 20))
        c2.load_ini(c.save_ini())
        assert c2.cmprAlgo == ALGO.LORENZO_REG
        assert c2.interpAlgo == INTERP_ALGO.LINEAR
        assert c2.openmp and c2.lorenzo2

    def test_set_dims_drops_unit_dims(self):
        c = Config(dims=(1, 100, 1, 200))
        assert c.dims == (100, 200)
        assert c.N == 2 and c.blockSize == 16


class TestQuantizerBehavior:
    """Indirect quantizer checks through the nopred path
    (reference test_quantizer.cpp semantics: |recovered - x| <= eb)."""

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_error_within_eb(self, dtype):
        rng = np.random.default_rng(6)
        x = (rng.standard_normal(5000) * 100).astype(dtype)
        conf = Config(dims=x.shape, cmprAlgo=ALGO.NOPRED, absErrorBound=1e-3)
        out, _ = szt.decompress(szt.compress(x, conf))
        assert np.abs(out.astype(np.float64) - x.astype(np.float64)).max() <= 1e-3

    def test_unpredictable_values_exact(self):
        # values too far from the prediction (0) for the bin range must be
        # stored literally (LinearQuantizer.hpp:62-69)
        x = np.array([1e30, -1e30, 0.0, 5e29], dtype=np.float32)
        x = np.tile(x, 500)
        conf = Config(dims=x.shape, cmprAlgo=ALGO.NOPRED, absErrorBound=1e-3)
        out, _ = szt.decompress(szt.compress(x, conf))
        assert np.array_equal(out, x)

    def test_nan_passthrough(self):
        x = np.linspace(0, 1, 4096).astype(np.float32)
        x[7] = np.nan
        conf = Config(dims=x.shape, cmprAlgo=ALGO.NOPRED, absErrorBound=1e-3)
        out, _ = szt.decompress(szt.compress(x, conf))
        assert np.isnan(out[7])


class TestRoundtripMatrix:
    @pytest.mark.parametrize("algo", [ALGO.NOPRED, ALGO.INTERP, ALGO.LORENZO_REG,
                                      ALGO.INTERP_LORENZO])
    @pytest.mark.parametrize("shape", [(4096,), (64, 80), (24, 25, 26), (8, 9, 10, 11)])
    def test_all_algos_all_ranks(self, algo, shape):
        rng = np.random.default_rng(8)
        x = np.cumsum(rng.standard_normal(shape).astype(np.float32), axis=-1) * 0.1
        conf = Config(dims=shape, cmprAlgo=algo, absErrorBound=1e-3)
        blob = szt.compress(x, conf)
        out, c = szt.decompress(blob)
        assert out.shape == tuple(s for s in shape if s > 1)
        err = np.abs(out.reshape(x.shape).astype(np.float64) - x.astype(np.float64)).max()
        assert err <= 1e-3 * 1.0000001

    def test_chunked_mode_roundtrip(self):
        rng = np.random.default_rng(9)
        x = np.cumsum(rng.standard_normal((64, 32, 32)).astype(np.float32), axis=0) * 0.1
        conf = Config(dims=x.shape, absErrorBound=1e-3, openmp=True)
        blob = szt.compress(x, conf, nthreads=4)
        out, c = szt.decompress(blob)
        assert np.abs(out - x).max() <= 1e-3 * 1.0000001

    def test_rel_mode_chunked_uses_global_range(self):
        rng = np.random.default_rng(10)
        x = rng.standard_normal((64, 16, 16)).astype(np.float32)
        x[:32] *= 100  # chunks see very different local ranges
        conf = Config(dims=x.shape, errorBoundMode=EB.REL, relErrorBound=1e-3, openmp=True)
        blob = szt.compress(x, conf, nthreads=4)
        out, c = szt.decompress(blob)
        rng_glob = float(x.max() - x.min())
        assert np.abs(out - x).max() <= rng_glob * 1e-3 * 1.01
