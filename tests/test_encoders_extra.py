"""Secondary encoder + truncate compressor tests (reference
tools/test/modules/test_encoder.cpp and SZTruncateCompressor)."""

import numpy as np
import pytest

from sz3_tpu.encoders import (arithmetic_decode, arithmetic_encode, runlength_decode,
                              runlength_encode, truncate_compress, truncate_decompress)


class TestArithmetic:
    def test_mod100_roundtrip(self):
        # reference test_encoder.cpp pattern: 1000 ints mod 100
        bins = (np.arange(1000) % 100).astype(np.int32)
        blob = arithmetic_encode(bins, 100)
        assert np.array_equal(arithmetic_decode(blob, bins.size), bins)

    def test_skewed_large(self):
        rng = np.random.default_rng(2)
        bins = np.where(rng.random(200000) < 0.9, 2048,
                        rng.integers(0, 4096, 200000)).astype(np.int32)
        blob = arithmetic_encode(bins, 4096)
        assert np.array_equal(arithmetic_decode(blob, bins.size), bins)
        assert bins.nbytes / len(blob) > 4  # beats raw comfortably on skew

    def test_transform_mode(self):
        rng = np.random.default_rng(3)
        bins = np.clip(rng.normal(2048, 10, 30000), 0, 4095).astype(np.int32)
        blob = arithmetic_encode(bins, 4096, transform=True)
        assert np.array_equal(arithmetic_decode(blob, bins.size, transform=True), bins)

    def test_single_symbol(self):
        bins = np.full(5000, 7, dtype=np.int32)
        blob = arithmetic_encode(bins, 100)
        assert np.array_equal(arithmetic_decode(blob, bins.size), bins)

    def test_state_limit(self):
        with pytest.raises(RuntimeError):
            arithmetic_encode(np.zeros(10, np.int32), 5000)


class TestRunlength:
    def test_mod100_roundtrip(self):
        bins = (np.arange(1000) % 100).astype(np.int32)
        blob = runlength_encode(bins)
        assert np.array_equal(runlength_decode(blob, bins.size), bins)

    def test_long_runs(self):
        bins = np.repeat(np.arange(20, dtype=np.int32), 1000)
        blob = runlength_encode(bins)
        assert len(blob) == 20 * 8
        assert np.array_equal(runlength_decode(blob, bins.size), bins)


class TestTruncate:
    def test_lossless_at_4(self):
        rng = np.random.default_rng(4)
        data = rng.normal(0, 1, 10000).astype(np.float32)
        blob = truncate_compress(data, 4)
        assert np.array_equal(truncate_decompress(blob, data.size, 4), data)

    @pytest.mark.parametrize("byte_len,rel_tol", [(2, 1e-2), (3, 1e-4)])
    def test_relative_precision(self, byte_len, rel_tol):
        rng = np.random.default_rng(5)
        data = rng.normal(0, 1, 10000).astype(np.float32)
        out = truncate_decompress(truncate_compress(data, byte_len), data.size, byte_len)
        rel = np.abs((out - data) / np.maximum(np.abs(data), 1e-9)).max()
        assert rel <= rel_tol
