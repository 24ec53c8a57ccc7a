"""BioMD algorithm round-trips and the SZ2-compatible C API / pysz bindings.

Mirrors reference coverage: tools/test integration checks for ALGO_BIOMD /
ALGO_BIOMDXTC (max_err <= eb*1.2 / eb*3) plus the tools/sz3c and tools/pysz
binding surfaces.
"""

import ctypes as C

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.config import ALGO, Config
from sz3_tpu.native.build import build as build_native


def md_traj(frames=24, atoms=333, seed=0, fill_tail=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (atoms // 3 + 1, 1, 3)).repeat(3, axis=1)
    base = (base + rng.normal(0, 0.05, (atoms // 3 + 1, 3, 3))).reshape(-1, 3)[:atoms]
    traj = base[None] + np.cumsum(rng.normal(0, 0.01, (frames, atoms, 3)), axis=0)
    if fill_tail:
        traj[-fill_tail:] = -1.0
    return np.ascontiguousarray(traj, dtype=np.float32)


class TestBioMD:
    @pytest.mark.parametrize("algo,tol_mult", [(ALGO.BIOMD, 1.2), (ALGO.BIOMDXTC, 3.0)])
    def test_3d_roundtrip(self, algo, tol_mult):
        traj = md_traj()
        conf = Config(dims=traj.shape, cmprAlgo=algo, absErrorBound=1e-3)
        blob = szt.compress(traj, conf)
        out, _ = szt.decompress(blob)
        assert np.abs(out - traj).max() <= 1e-3 * tol_mult
        assert traj.nbytes / len(blob) > 1.5

    @pytest.mark.parametrize("algo", [ALGO.BIOMD, ALGO.BIOMDXTC])
    def test_fill_frames_elided(self, algo):
        traj = md_traj(frames=32, atoms=120, fill_tail=8)
        conf = Config(dims=traj.shape, cmprAlgo=algo, absErrorBound=1e-3)
        blob = szt.compress(traj, conf)
        out, _ = szt.decompress(blob)
        # fill frames reproduce exactly, not just within eb
        assert np.array_equal(out[-8:], traj[-8:])
        assert np.abs(out - traj).max() <= 3e-3

    @pytest.mark.parametrize("algo", [ALGO.BIOMD, ALGO.BIOMDXTC])
    @pytest.mark.parametrize("shape", [(2000,), (700, 3)])
    def test_low_rank(self, algo, shape):
        rng = np.random.default_rng(3)
        data = np.cumsum(rng.normal(0, 0.02, shape)).reshape(shape).astype(np.float32)
        conf = Config(dims=shape, cmprAlgo=algo, absErrorBound=1e-3)
        out, _ = szt.decompress(szt.compress(data, conf))
        assert np.abs(out - data).max() <= 3e-3

    def test_biomd_double(self):
        traj = md_traj().astype(np.float64)
        conf = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMD, absErrorBound=1e-6)
        out, _ = szt.decompress(szt.compress(traj, conf))
        assert np.abs(out - traj).max() <= 1e-6 * 1.2

    def test_xtc_remainder_elements(self):
        # stream length % 3 != 0 exercises the reminder1/reminder2 path
        rng = np.random.default_rng(4)
        data = np.cumsum(rng.normal(0, 0.02, 10001)).astype(np.float32)
        conf = Config(dims=data.shape, cmprAlgo=ALGO.BIOMDXTC, absErrorBound=1e-3)
        out, _ = szt.decompress(szt.compress(data, conf))
        assert np.abs(out - data).max() <= 3e-3


class TestPysz:
    def test_surface(self):
        from sz3_tpu.pysz import sz, szConfig, szErrorBoundMode, szAlgorithm

        data = np.fromfunction(lambda i, j, k: np.sin(i / 9) + np.cos(j / 7) + k / 50,
                               (30, 30, 30)).astype(np.float32)
        conf = szConfig(data.shape)
        conf.errorBoundMode = szErrorBoundMode.ABS
        conf.absErrorBound = 1e-3
        compressed, ratio = sz.compress(data, conf)
        assert isinstance(compressed, np.ndarray) and compressed.dtype == np.uint8
        assert ratio > 1
        out, used = sz.decompress(compressed, np.float32, data.shape)
        assert out.shape == data.shape
        assert np.abs(out - data).max() <= 1e-3
        max_diff, psnr, nrmse = sz.verify(data, out)
        assert max_diff <= 1e-3 and psnr > 40 and nrmse < 1e-2

    def test_config_validation(self):
        from sz3_tpu.pysz import szConfig

        with pytest.raises(ValueError):
            szConfig().setDims()
        with pytest.raises(ValueError):
            szConfig(0, 5)
        c = szConfig(10, 20)
        assert c.dims == (10, 20) and c.num_elements == 200 and c.ndim == 2


class TestSz3cApi:
    """SZ2-compatible C ABI (reference tools/sz3c)."""

    @pytest.fixture(scope="class")
    def lib(self):
        lib = C.CDLL(str(build_native()))
        lib.SZ_compress_args.restype = C.POINTER(C.c_ubyte)
        lib.SZ_compress_args.argtypes = [C.c_int, C.c_void_p, C.POINTER(C.c_size_t), C.c_int,
                                         C.c_double, C.c_double, C.c_double] + [C.c_size_t] * 5
        lib.SZ_decompress.restype = C.c_void_p
        lib.SZ_decompress.argtypes = [C.c_int, C.POINTER(C.c_ubyte), C.c_size_t] + [C.c_size_t] * 5
        lib.free_buf.restype = None
        lib.free_buf.argtypes = [C.c_void_p]
        return lib

    def test_float_abs_roundtrip(self, lib):
        data = np.fromfunction(lambda i, j, k: np.sin(i / 9) * np.cos(j / 7) + k / 50,
                               (20, 30, 40)).astype(np.float32)
        out_size = C.c_size_t()
        # SZ2 arg order: r5..r1 with r1 fastest
        cmp = lib.SZ_compress_args(0, data.ctypes.data_as(C.c_void_p), C.byref(out_size),
                                   0, 1e-3, 0.0, 0.0, 0, 0, 20, 30, 40)
        assert cmp
        blob = bytes(C.cast(cmp, C.POINTER(C.c_ubyte * out_size.value)).contents)
        lib.free_buf(cmp)
        # archive is a standard SZ3 container our Python API can open
        arr, conf = szt.decompress(blob, dtype=np.float32)
        assert np.abs(arr.reshape(data.shape) - data).max() <= 1e-3

        buf = (C.c_ubyte * len(blob)).from_buffer_copy(blob)
        dec = lib.SZ_decompress(0, buf, len(blob), 0, 0, 20, 30, 40)
        assert dec
        out = np.ctypeslib.as_array(C.cast(dec, C.POINTER(C.c_float)), shape=(data.size,)).copy()
        lib.free_buf(C.c_void_p(dec))
        assert np.abs(out.reshape(data.shape) - data).max() <= 1e-3

    def test_double_rel_roundtrip(self, lib):
        rng = np.random.default_rng(8)
        data = np.cumsum(rng.normal(0, 1, 5000)).astype(np.float64)
        out_size = C.c_size_t()
        cmp = lib.SZ_compress_args(1, data.ctypes.data_as(C.c_void_p), C.byref(out_size),
                                   1, 0.0, 1e-4, 0.0, 0, 0, 0, 0, 5000)
        assert cmp
        blob = bytes(C.cast(cmp, C.POINTER(C.c_ubyte * out_size.value)).contents)
        lib.free_buf(cmp)
        rng_span = data.max() - data.min()
        arr, _ = szt.decompress(blob, dtype=np.float64)
        assert np.abs(arr - data).max() <= 1e-4 * rng_span * 1.0000001

    def test_unsupported_mode_returns_null(self, lib):
        data = np.zeros(100, dtype=np.float32)
        out_size = C.c_size_t()
        cmp = lib.SZ_compress_args(0, data.ctypes.data_as(C.c_void_p), C.byref(out_size),
                                   10, 1e-3, 0.0, 0.0, 0, 0, 0, 0, 100)  # PW_REL unsupported
        assert not cmp
