"""Level-detector (k-means) behavior and examples smoke run."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from sz3_tpu.mdz import mdz_compress, mdz_decompress


class TestLevelDetection:
    """get_cluster drives MDZ's VQ method choice (reference
    utils/KmeansUtil.hpp:286-365); exercised through the archive headers."""

    def test_lattice_data_detects_levels(self):
        rng = np.random.default_rng(0)
        levels = rng.integers(0, 10, 2000) * 2.0
        data = (levels + rng.normal(0, 0.05, 2000)).astype(np.float32)[None, :]
        blob = mdz_compress(np.repeat(data, 40, axis=0) +
                            rng.normal(0, 0.02, (40, 2000)).astype(np.float32),
                            rel_eb=1e-3, method="VQ")
        out = mdz_decompress(blob)
        assert out.shape == (40, 2000)

    def test_unstructured_data_has_no_levels(self):
        rng = np.random.default_rng(1)
        data = rng.uniform(0, 100, (10, 3000)).astype(np.float32)
        with pytest.raises(RuntimeError, match="VQ"):
            mdz_compress(data, rel_eb=1e-3, method="VQ")  # no level grid -> error
        # adaptive mode falls back to MT/LR instead of failing
        out = mdz_decompress(mdz_compress(data, rel_eb=1e-3))
        span = data.max() - data.min()
        assert np.abs(out - data).max() <= 1e-3 * span * 1.01


class TestExamples:
    def test_customized_demo_runs(self):
        import os
        repo = Path(__file__).resolve().parent.parent
        env = dict(os.environ, JAX_PLATFORMS="cpu")  # skip slow TPU-tunnel init
        r = subprocess.run([sys.executable, str(repo / "examples" / "customized_demo.py")],
                           capture_output=True, text=True, timeout=1200, env=env)
        assert r.returncode == 0, r.stderr
        assert "4. custom compressor" in r.stdout
