"""Device (JAX) MDZ pipeline: archives byte-identical to the native engine.

The device path (algos/mdz_jax.py + ops/mdz_device.py) runs the VQ/VQT/MT
per-batch sweeps on device (VQ fully vectorized, VQT/MT as a frame scan) and
replays the adaptive pipeline — level learning, per-batch REL bound, method
selection trials, container layout — bit-for-bit; LR/TS batches route
through the native per-batch entry points. Every test asserts byte identity
of the archive AND the reconstruction against the host engine.
"""

import numpy as np
import pytest

from sz3_tpu.mdz import METHODS, mdz_compress, mdz_decompress

from test_mdz import lattice_traj


def _pair(data, **kw):
    host = mdz_compress(data, backend="native", **kw)
    dev = mdz_compress(data, backend="jax", **kw)
    assert host == dev, (len(host), len(dev))
    out_h = mdz_decompress(host, backend="native")
    out_d = mdz_decompress(host, backend="jax")
    assert out_h.tobytes() == out_d.tobytes()
    return host, out_h


class TestMdzDevice:
    @pytest.mark.parametrize("method", ["VQ", "VQT", "MT", "LR", "TS"])
    def test_pinned_methods(self, method):
        data = lattice_traj(frames=120, atoms=700, seed=3)
        _pair(data, rel_eb=1e-3, method=method)

    def test_adaptive_with_batches(self):
        """Batched adaptive run: selection trials + per-batch REL bounds must
        reproduce the native decisions (sizes compare equal only if every
        trial stream is byte-identical too)."""
        data = lattice_traj(frames=260, atoms=500, seed=9)
        blob, out = _pair(data, rel_eb=1e-3, batch_size=40)
        assert np.abs(out - data).max() <= 1e-3 * float(
            data.max() - data.min()) * 1.0000001

    def test_smooth_data_selects_mt_or_lr(self):
        """No level grid -> the adaptive pipeline trials LR/MT; both route
        (LR native, MT device) and the archive still matches."""
        rng = np.random.default_rng(4)
        data = np.cumsum(rng.normal(0, 0.01, (80, 600)),
                         axis=0).astype(np.float32)
        _pair(data, rel_eb=1e-3)

    def test_3d_per_axis(self):
        rng = np.random.default_rng(5)
        levels = rng.integers(0, 10, (300, 3)) * 1.2
        data = (levels[None] + rng.normal(0, 0.04, (60, 300, 3))
                ).astype(np.float32)
        _pair(data, rel_eb=1e-3, batch_size=25)

    def test_1d(self):
        data = lattice_traj(frames=1, atoms=4000, seed=7)[0]
        _pair(data, rel_eb=1e-3)

    def test_single_frame_batches(self):
        """batch_size=1 exercises the frames==1 paths of every codec."""
        data = lattice_traj(frames=6, atoms=300, seed=11)
        _pair(data, rel_eb=1e-3, batch_size=1)

    def test_constant_batch_zero_range(self):
        """A constant batch gives range 0 -> the eb=1.0 guard on both
        engines."""
        data = lattice_traj(frames=60, atoms=200, seed=13)
        data[30:] = 2.5
        _pair(data, rel_eb=1e-3, batch_size=30)

    def test_f64_falls_back_to_host(self):
        data = lattice_traj(frames=20, atoms=100, seed=1, dtype=np.float64)
        host = mdz_compress(data, backend="native", rel_eb=1e-3)
        dev = mdz_compress(data, backend="jax", rel_eb=1e-3)
        assert host == dev  # Fallback -> host engine, same bytes
        out = mdz_decompress(dev, backend="jax")
        assert out.dtype == np.float64

    def test_quantbin_override(self):
        data = lattice_traj(frames=50, atoms=400, seed=2)
        _pair(data, abs_eb=5e-4, quantbin=4096)
