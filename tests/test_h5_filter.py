"""HDF5 filter (id 32024) tests, mirroring the reference
tools/test/integration/test_h5_filter.py: write/read through the filter with
h5py across dtypes and error bounds, plus container-level interop."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import sz3_tpu as szt
import sz3_tpu.h5 as szh5
from sz3_tpu.config import EB


@pytest.fixture(scope="module", autouse=True)
def _register():
    szh5.register()
    assert h5py.h5z.filter_avail(szh5.FILTER_ID)


def field(shape, dtype=np.float32):
    f = np.fromfunction(lambda *ix: sum(np.sin(g / (7 + 2 * k)) for k, g in enumerate(ix)), shape)
    return f.astype(dtype)


class TestH5Filter:
    @pytest.mark.parametrize("eb", [1e-1, 1e-2, 1e-3, 1e-4])
    def test_f32_abs(self, tmp_path, eb):
        arr = field((30, 40, 50))
        p = tmp_path / "f.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=arr, chunks=arr.shape, compression=szh5.FILTER_ID,
                             compression_opts=szh5.cd_values(absErrorBound=eb))
        with h5py.File(p) as f:
            out = f["d"][:]
        # reference integration gate: max_err <= eb*1.2 (test_sz3_executable.py:152)
        assert np.abs(out - arr).max() <= eb * 1.2

    @pytest.mark.parametrize("dtype", [np.float64, np.int16, np.uint8, np.int32, np.int64,
                                       np.uint32, np.uint64, np.int8, np.uint16])
    def test_dtypes(self, tmp_path, dtype):
        f = field((24, 32, 16), np.float64) * 40
        if np.issubdtype(dtype, np.unsignedinteger):
            f = f - f.min()  # unsigned wraparound is out-of-domain for the codec
        arr = f.astype(dtype)
        p = tmp_path / "d.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=arr, chunks=arr.shape, compression=szh5.FILTER_ID,
                             compression_opts=szh5.cd_values(absErrorBound=1.0))
        with h5py.File(p) as f:
            out = f["d"][:]
        assert out.dtype == arr.dtype
        assert np.abs(out.astype(np.float64) - arr.astype(np.float64)).max() <= 1.0

    def test_rel_mode(self, tmp_path):
        arr = field((40, 40, 40)) * 123.0
        p = tmp_path / "r.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=arr, chunks=arr.shape, compression=szh5.FILTER_ID,
                             compression_opts=szh5.cd_values(errorBoundMode=EB.REL,
                                                             relErrorBound=1e-3))
        with h5py.File(p) as f:
            out = f["d"][:]
        span = arr.max() - arr.min()
        assert np.abs(out - arr).max() <= 1e-3 * span * 1.2

    def test_multi_chunk(self, tmp_path):
        arr = field((64, 64, 64))
        p = tmp_path / "c.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=arr, chunks=(16, 64, 64), compression=szh5.FILTER_ID,
                             compression_opts=szh5.cd_values(absErrorBound=1e-3))
        with h5py.File(p) as f:
            out = f["d"][:]
        assert np.abs(out - arr).max() <= 1e-3

    def test_tiny_dataset_passthrough(self, tmp_path):
        # arrays with fewer than 20 elements bypass the filter (reference :192)
        arr = np.arange(6, dtype=np.float32)
        p = tmp_path / "t.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=arr, chunks=arr.shape, compression=szh5.FILTER_ID,
                             compression_opts=szh5.cd_values(absErrorBound=1e-3))
        with h5py.File(p) as f:
            assert np.array_equal(f["d"][:], arr)

    def test_chunk_is_standard_container(self, tmp_path):
        arr = field((30, 40, 50))
        p = tmp_path / "x.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("d", data=arr, chunks=arr.shape, compression=szh5.FILTER_ID,
                             compression_opts=szh5.cd_values(absErrorBound=1e-3))
        with h5py.File(p) as f:
            _, raw = f["d"].id.read_direct_chunk((0, 0, 0))
        out, conf = szt.decompress(bytes(raw))
        assert np.abs(out.reshape(arr.shape) - arr).max() <= 1e-3

    def test_library_archive_readable_as_chunk(self, tmp_path):
        arr = field((30, 40, 50))
        blob = szt.compress(arr, szt.Config(dims=arr.shape, absErrorBound=1e-3),
                            set_datatype=False)
        p = tmp_path / "w.h5"
        with h5py.File(p, "w") as f:
            ds = f.create_dataset("d", shape=arr.shape, dtype=np.float32, chunks=arr.shape,
                                  compression=szh5.FILTER_ID,
                                  compression_opts=szh5.cd_values(absErrorBound=1e-3))
            ds.id.write_direct_chunk((0, 0, 0), blob)
        with h5py.File(p) as f:
            out = f["d"][:]
        assert np.abs(out - arr).max() <= 1e-3


class TestH5Tools:
    """The shipped helper tools (reference tools/H5Z-SZ3/test/*.cpp)."""

    def test_round_trip_through_tools(self, tmp_path, monkeypatch):
        h5py = pytest.importorskip("h5py")
        from sz3_tpu import h5tools
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(0)
        arr = np.cumsum(rng.standard_normal((20, 30, 40)).astype(np.float32),
                        axis=0) * 0.1
        arr.tofile("x.dat")
        (tmp_path / "sz3.config").write_text(
            "[GlobalSettings]\nCmprAlgo = ALGO_INTERP_LORENZO\n"
            "ErrorBoundMode = ABS\nAbsErrorBound = 1e-5\n")
        assert h5tools.main(["sz3ToHDF5", "FLOAT", "x.dat",
                             "40", "30", "20"]) == 0
        assert h5tools.main(["dsz3FromHDF5", "x.dat.sz3.h5"]) == 0
        out = np.fromfile("x.dat.sz3.h5.out", np.float32).reshape(arr.shape)
        err = np.abs(out - arr).max()
        assert err <= 1e-5 * 1.0000001   # the INI bound, not the default
        # compressed file materially smaller than raw HDF5
        assert h5tools.main(["convertBinToHDF5", "FLOAT", "v", "x.dat",
                             "40", "30", "20"]) == 0
        import os
        # eb 1e-5 on a noisy field compresses modestly; just require a win
        assert os.path.getsize("x.dat.sz3.h5") < os.path.getsize("x.dat.h5")

    def test_usage_errors(self, capsys):
        from sz3_tpu import h5tools
        assert h5tools.main([]) == 1
        assert h5tools.main(["sz3ToHDF5"]) == 1
