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


class TestLammpsHooks:
    """In-situ hooks mirroring the reference's LAMMPS_compress /
    LAMMPS_select_compressor (tools/mdz/include/mdz.hpp:283-359)."""

    def _traj(self, seed=0, steps=24, atoms=512):
        rng = np.random.default_rng(seed)
        sites = np.round(rng.uniform(-5, 5, atoms) * 4) / 4  # quantized sites
        walk = np.cumsum(rng.standard_normal((steps, atoms)) * 0.005, axis=0)
        return np.ascontiguousarray(sites[None, :] + walk, np.float32)

    def test_explicit_methods_round_trip(self):
        from sz3_tpu.mdz import lammps_compress, lammps_decompress
        traj = self._traj()
        eb = 1e-3
        for method, level in [(2, (0.0, 0.0, 0)), (3, (0.0, 0.0, 0)),
                              (4, (0.0, 0.0, 0))]:
            blob = lammps_compress(traj, method, abs_eb=eb, level=level,
                                   ts0=traj[0] if method == 2 else None)
            out = lammps_decompress(blob, method, *traj.shape, abs_eb=eb,
                                    level=level,
                                    ts0=traj[0] if method == 2 else None)
            assert np.abs(out - traj).max() <= eb * 1.0000001, method
            assert len(blob) < traj.nbytes, method

    def test_vq_with_level_grid(self):
        from sz3_tpu.mdz import (lammps_compress, lammps_decompress,
                                 lammps_select_compressor)
        rng = np.random.default_rng(3)
        # solid-state-like: atoms vibrate around a regular lattice
        lattice = np.arange(512, dtype=np.float32) * 0.25
        traj = lattice[None, :] + rng.standard_normal((24, 512)).astype(np.float32) * 0.01
        level = (float(lattice.min()), 0.25, 512)
        eb = 1e-3
        for method in (0, 1):
            blob = lammps_compress(traj, method, abs_eb=eb, level=level)
            out = lammps_decompress(blob, method, *traj.shape, abs_eb=eb,
                                    level=level)
            assert np.abs(out - traj).max() <= eb * 1.0000001, method
        m = lammps_select_compressor(traj, firsttime=True, abs_eb=eb,
                                     level=level)
        assert m in (0, 1, 2)

    def test_select_without_levels_prefers_lr_or_mt(self):
        from sz3_tpu.mdz import lammps_select_compressor
        traj = self._traj(seed=7)
        m = lammps_select_compressor(traj, firsttime=False, abs_eb=1e-3)
        assert m in (2, 3)

    def test_vq_without_levels_raises(self):
        from sz3_tpu.mdz import lammps_compress
        with pytest.raises(RuntimeError, match="VQ/VQT not available"):
            lammps_compress(self._traj(), 0, level=(0.0, 0.0, 0))
