"""Defensive format checks and the reference's integration-tier gates.

Mirrors: magic/version gating (reference api/sz.hpp:122-135), decompressed-
size check (SZDispatcher.hpp:85-87), read-bounds asserts (MemoryUtil.hpp),
and the integration matrix max_err <= eb*1.2 over {algo} x {eb}
(tools/test/integration/test_sz3_executable.py:152).
"""

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.config import ALGO, Config, EB


def field(shape=(40, 44, 48), seed=11):
    rng = np.random.default_rng(seed)
    g = np.meshgrid(*[np.linspace(0, 1, s) for s in shape], indexing="ij")
    f = sum(np.sin(2 * np.pi * (k + 1.5) * x) for k, x in enumerate(g))
    return np.ascontiguousarray(f + 0.05 * rng.standard_normal(shape), dtype=np.float32)


class TestDefensiveChecks:
    def test_bad_magic(self):
        blob = szt.compress(field((20, 20, 20)), Config(dims=(20, 20, 20), absErrorBound=1e-2))
        bad = b"\x00\x00\x00\x00" + blob[4:]
        with pytest.raises(ValueError, match="magic"):
            szt.decompress(bad)

    def test_bad_version(self):
        blob = szt.compress(field((20, 20, 20)), Config(dims=(20, 20, 20), absErrorBound=1e-2))
        bad = blob[:4] + b"\xff\xff\xff\x00" + blob[8:]
        with pytest.raises(ValueError, match="version"):
            szt.decompress(bad)

    def test_truncated_archive(self):
        blob = szt.compress(field((20, 20, 20)), Config(dims=(20, 20, 20), absErrorBound=1e-2))
        with pytest.raises(Exception):
            szt.decompress(blob[: len(blob) // 2])

    def test_corrupt_payload_no_crash(self):
        """Bit-flipped payloads may decode to garbage or raise — never crash."""
        arr = field((24, 24, 24))
        blob = bytearray(szt.compress(arr, Config(dims=arr.shape, absErrorBound=1e-2)))
        rng = np.random.default_rng(0)
        for _ in range(20):
            i = int(rng.integers(16, len(blob) - 40))
            corrupted = bytes(blob[:i]) + bytes([blob[i] ^ 0xFF]) + bytes(blob[i + 1:])
            try:
                szt.decompress(corrupted)
            except Exception:
                pass  # raising is fine; crashing the process is not

    def test_ndim_limit(self):
        arr = np.zeros((2, 2, 2, 2, 2), dtype=np.float32)
        with pytest.raises(ValueError, match="4"):
            szt.compress(arr, Config(dims=arr.shape, absErrorBound=1e-2))


class TestIntegrationMatrix:
    """The reference integration tier: {algo} x {eb in 1e-1..1e-4},
    PASS iff max_err <= eb*1.2 (x3 for BIOMDXTC)."""

    @pytest.mark.parametrize("eb", [1e-1, 1e-2, 1e-3, 1e-4])
    @pytest.mark.parametrize("algo,mult", [
        (ALGO.INTERP_LORENZO, 1.2), (ALGO.LORENZO_REG, 1.2), (ALGO.INTERP, 1.2),
        (ALGO.NOPRED, 1.2),
    ])
    def test_field_algos(self, algo, mult, eb):
        arr = field()
        conf = Config(dims=arr.shape, cmprAlgo=algo, absErrorBound=eb)
        out, _ = szt.decompress(szt.compress(arr, conf))
        assert np.abs(out - arr).max() <= eb * mult

    @pytest.mark.parametrize("eb", [1e-1, 1e-2, 1e-3, 1e-4])
    @pytest.mark.parametrize("algo,mult", [(ALGO.BIOMD, 1.2), (ALGO.BIOMDXTC, 3.0)])
    def test_md_algos(self, algo, mult, eb):
        rng = np.random.default_rng(7)
        traj = (rng.uniform(-5, 5, (1, 300, 3)) +
                np.cumsum(rng.normal(0, 0.01, (20, 300, 3)), axis=0)).astype(np.float32)
        conf = Config(dims=traj.shape, cmprAlgo=algo, absErrorBound=eb)
        out, _ = szt.decompress(szt.compress(traj, conf))
        assert np.abs(out - traj).max() <= eb * mult

    @pytest.mark.parametrize("mode,field_name,value", [
        (EB.REL, "relErrorBound", 1e-3),
        (EB.PSNR, "psnrErrorBound", 80.0),
        (EB.L2NORM, "l2normErrorBound", 1.0),
    ])
    def test_eb_modes_bound_holds(self, mode, field_name, value):
        arr = field()
        conf = Config(dims=arr.shape, errorBoundMode=mode)
        setattr(conf, field_name, value)
        blob = szt.compress(arr, conf)
        out, used = szt.decompress(blob)
        # archives record the resolved ABS bound
        assert used.errorBoundMode == EB.ABS
        assert np.abs(out - arr).max() <= used.absErrorBound * 1.2
