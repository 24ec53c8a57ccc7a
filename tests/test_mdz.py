"""MDZ adaptive time-series compressor tests (reference tools/mdz).

Mirrors mdz_smoke_test.cpp plus per-method round-trips, the k-means level
detector, batching, and the 3D per-axis decomposition.
"""

import numpy as np
import pytest

from sz3_tpu.mdz import METHODS, mdz_compress, mdz_decompress, mdz_peek


def lattice_traj(frames=400, atoms=800, seed=0, dtype=np.float32):
    """Solid-state-MD-like data: atoms vibrating around discrete lattice levels."""
    rng = np.random.default_rng(seed)
    levels = rng.integers(0, 12, atoms) * 1.5
    return (levels[None] + rng.normal(0, 0.05, (frames, atoms))).astype(dtype)


class TestMdz:
    def test_smoke(self):
        # reference tools/mdz/mdz_smoke_test.cpp: 100x200 synthetic field
        dims = (100, 200)
        i, j = np.meshgrid(np.arange(dims[0], dtype=np.float64),
                           np.arange(dims[1], dtype=np.float64), indexing="ij")
        x, y = i - dims[0] / 2, j - dims[1] / 2
        data = (1e-4 * y * np.sin(y) + 5e-4 * np.cos(x ** 2 + x)).astype(np.float32)
        blob = mdz_compress(data, abs_eb=1e-6, batch_size=10)
        out = mdz_decompress(blob)
        assert np.abs(out - data).max() <= 1e-6
        assert data.nbytes / len(blob) > 3

    @pytest.mark.parametrize("method", list(METHODS))
    def test_methods_roundtrip(self, method):
        traj = lattice_traj(frames=120, atoms=500)
        blob = mdz_compress(traj, rel_eb=1e-3, batch_size=40, method=method)
        out = mdz_decompress(blob)
        span = traj.max() - traj.min()
        assert np.abs(out - traj).max() <= 1e-3 * span * 1.01
        assert traj.nbytes / len(blob) > 2

    def test_adaptive_selects_vq_on_lattice_data(self):
        # on level-structured data the adaptive pipeline must find the level
        # grid and compress at least as well as the best fixed method
        traj = lattice_traj()
        adp = len(mdz_compress(traj, rel_eb=1e-3, batch_size=100))
        mt = len(mdz_compress(traj, rel_eb=1e-3, batch_size=100, method="MT"))
        lr = len(mdz_compress(traj, rel_eb=1e-3, batch_size=100, method="LR"))
        assert adp <= min(mt, lr) * 1.05

    def test_abs_eb(self):
        traj = lattice_traj(frames=60, atoms=300)
        blob = mdz_compress(traj, abs_eb=1e-4, batch_size=20)
        out = mdz_decompress(blob)
        assert np.abs(out - traj).max() <= 1e-4

    def test_3d_per_axis(self):
        traj = np.stack([lattice_traj(120, 200, seed=s) for s in range(3)], axis=-1)
        traj = np.ascontiguousarray(traj)
        blob = mdz_compress(traj, rel_eb=1e-3, batch_size=50)
        assert mdz_peek(blob)[0] == traj.shape
        out = mdz_decompress(blob)
        span = traj.max() - traj.min()
        assert np.abs(out - traj).max() <= 1e-3 * span * 1.01

    def test_1d(self):
        d = lattice_traj(frames=1, atoms=5000)[0]
        blob = mdz_compress(d, rel_eb=1e-3)
        out = mdz_decompress(blob)
        assert np.abs(out - d).max() <= 1e-3 * (d.max() - d.min()) * 1.01

    def test_float64(self):
        traj = lattice_traj(frames=50, atoms=400, dtype=np.float64)
        blob = mdz_compress(traj, rel_eb=1e-4, batch_size=25)
        out = mdz_decompress(blob)
        assert out.dtype == np.float64
        assert np.abs(out - traj).max() <= 1e-4 * (traj.max() - traj.min()) * 1.01

    def test_deterministic(self):
        traj = lattice_traj(frames=80, atoms=400)
        assert mdz_compress(traj, rel_eb=1e-3, batch_size=40) == \
               mdz_compress(traj, rel_eb=1e-3, batch_size=40)

    def test_smooth_data_falls_back_to_mt_or_lr(self):
        # no level structure -> k-means finds no clusters -> MT/LR chosen
        rng = np.random.default_rng(5)
        traj = np.cumsum(rng.normal(0, 0.01, (100, 600)), axis=0).astype(np.float32)
        blob = mdz_compress(traj, rel_eb=1e-3, batch_size=50)
        out = mdz_decompress(blob)
        span = traj.max() - traj.min()
        assert np.abs(out - traj).max() <= 1e-3 * span * 1.01

    def test_eb_arg_validation(self):
        with pytest.raises(ValueError):
            mdz_compress(np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError):
            mdz_compress(np.zeros((4, 4), np.float32), abs_eb=1, rel_eb=1)
