"""Device (JAX) execution of the MDZ adaptive batch pipeline.

Replicates native/szt/mdz.hpp::mdz_compress/mdz_decompress byte-for-byte
with the per-batch quantize sweeps on device (ops/mdz_device.py):

  host   : VQ level learning (szt_mdz_levels: kmeans get_cluster + sampling
           rules), method selection trials (sizes compared like
           detail::mdz_select), per-batch REL->ABS bound derivation,
           container assembly (the MDZ1/MDZ3 layout of mdz.hpp:502-530),
           Huffman+zstd stream seals (szt_exaalt_seal / szt_mdz_ts_seal)
  device : VQ / VQT / MT quantize+recover sweeps
  native : LR (blockwise) and TS (sequential frame-0 chain) batches ride
           the LAMMPS per-batch entry points unchanged

f32 only (the device profile); f64 series route to the host engine via
Fallback, counted like every other device fallback (device_encode._fall).
"""

from __future__ import annotations

import ctypes as C
import struct

import numpy as np

from .. import runtime
from ..mdz import lammps_compress, lammps_decompress
from .device_encode import Fallback, _fall

_ERRCAP = runtime._ERRCAP

_bound = False


def _l():
    global _bound
    l = runtime.lib()
    if not _bound:
        u64, i32, f32 = C.c_uint64, C.c_int32, C.c_float
        u8p = C.POINTER(C.c_uint8)
        l.szt_mdz_levels.restype = C.c_int
        l.szt_mdz_levels.argtypes = [C.c_void_p, u64, C.POINTER(f32),
                                     C.POINTER(f32), C.POINTER(i32),
                                     C.c_char_p, u64]
        l.szt_exaalt_seal.restype = C.c_int
        l.szt_exaalt_seal.argtypes = [C.c_double, i32, C.c_void_p, u64,
                                      C.c_void_p, u64, C.c_void_p, u64, u64,
                                      C.POINTER(u8p), C.POINTER(u64),
                                      C.c_char_p, u64]
        l.szt_exaalt_open.restype = C.c_int
        l.szt_exaalt_open.argtypes = [C.c_char_p, u64, u64, u64, C.c_void_p,
                                      C.c_void_p, C.POINTER(C.POINTER(f32)),
                                      C.POINTER(u64), C.c_char_p, u64]
        l.szt_mdz_ts_seal.restype = C.c_int
        l.szt_mdz_ts_seal.argtypes = [C.c_double, i32, C.c_void_p, u64,
                                      C.c_void_p, u64, u64, C.POINTER(u8p),
                                      C.POINTER(u64), C.c_char_p, u64]
        l.szt_mdz_ts_open.restype = C.c_int
        l.szt_mdz_ts_open.argtypes = [C.c_char_p, u64, u64, C.c_void_p,
                                      C.POINTER(C.POINTER(f32)),
                                      C.POINTER(u64), C.c_char_p, u64]
        _bound = True
    return l


def mdz_levels(frame0: np.ndarray):
    """(level_start, level_offset, level_num) with the pipeline's sampling
    rules (mdz.hpp:456-462); level_num excludes the +200 margin."""
    frame0 = np.ascontiguousarray(frame0, np.float32)
    ls, lo, ln = C.c_float(), C.c_float(), C.c_int32()
    err = C.create_string_buffer(_ERRCAP)
    rc = _l().szt_mdz_levels(frame0.ctypes.data_as(C.c_void_p),
                             C.c_uint64(frame0.size), C.byref(ls),
                             C.byref(lo), C.byref(ln), err, _ERRCAP)
    if rc != 0:
        raise RuntimeError(f"szt_mdz_levels: {err.value.decode()}")
    return float(ls.value), float(lo.value), int(ln.value)


def _exaalt_seal(eb, radius, qinds, pinds, unpred, cap) -> bytes:
    qinds = np.ascontiguousarray(qinds, np.int32)
    pinds = np.ascontiguousarray(pinds, np.int32)
    unpred = np.ascontiguousarray(unpred, np.float32)
    out = C.POINTER(C.c_uint8)()
    out_len = C.c_uint64()
    err = C.create_string_buffer(_ERRCAP)
    rc = _l().szt_exaalt_seal(
        C.c_double(eb), C.c_int32(radius),
        qinds.ctypes.data_as(C.c_void_p), C.c_uint64(qinds.size),
        pinds.ctypes.data_as(C.c_void_p), C.c_uint64(pinds.size),
        unpred.ctypes.data_as(C.c_void_p), C.c_uint64(unpred.size),
        C.c_uint64(cap), C.byref(out), C.byref(out_len), err, _ERRCAP)
    if rc != 0:
        raise RuntimeError(f"szt_exaalt_seal: {err.value.decode()}")
    return runtime._take(out, out_len)


def _exaalt_open(stream: bytes, n: int, pn: int):
    qinds = np.empty(n, np.int32)
    pinds = np.empty(pn, np.int32)
    up = C.POINTER(C.c_float)()
    nun = C.c_uint64()
    err = C.create_string_buffer(_ERRCAP)
    rc = _l().szt_exaalt_open(
        stream, C.c_uint64(len(stream)), C.c_uint64(n), C.c_uint64(pn),
        qinds.ctypes.data_as(C.c_void_p), pinds.ctypes.data_as(C.c_void_p),
        C.byref(up), C.byref(nun), err, _ERRCAP)
    if rc != 0:
        raise RuntimeError(f"szt_exaalt_open: {err.value.decode()}")
    unpred = np.ctypeslib.as_array(up, shape=(nun.value,)).astype(
        np.float32, copy=True)
    runtime.lib().szt_free(C.cast(up, C.c_void_p))
    return qinds, pinds, unpred


def _ts_seal(eb, radius, bins, unpred, cap) -> bytes:
    bins = np.ascontiguousarray(bins, np.int32)
    unpred = np.ascontiguousarray(unpred, np.float32)
    out = C.POINTER(C.c_uint8)()
    out_len = C.c_uint64()
    err = C.create_string_buffer(_ERRCAP)
    rc = _l().szt_mdz_ts_seal(
        C.c_double(eb), C.c_int32(radius),
        bins.ctypes.data_as(C.c_void_p), C.c_uint64(bins.size),
        unpred.ctypes.data_as(C.c_void_p), C.c_uint64(unpred.size),
        C.c_uint64(cap), C.byref(out), C.byref(out_len), err, _ERRCAP)
    if rc != 0:
        raise RuntimeError(f"szt_mdz_ts_seal: {err.value.decode()}")
    return runtime._take(out, out_len)


def _ts_open(stream: bytes, n: int):
    bins = np.empty(n, np.int32)
    up = C.POINTER(C.c_float)()
    nun = C.c_uint64()
    err = C.create_string_buffer(_ERRCAP)
    rc = _l().szt_mdz_ts_open(
        stream, C.c_uint64(len(stream)), C.c_uint64(n),
        bins.ctypes.data_as(C.c_void_p), C.byref(up), C.byref(nun),
        err, _ERRCAP)
    if rc != 0:
        raise RuntimeError(f"szt_mdz_ts_open: {err.value.decode()}")
    unpred = np.ctypeslib.as_array(up, shape=(nun.value,)).astype(
        np.float32, copy=True)
    runtime.lib().szt_free(C.cast(up, C.c_void_p))
    return bins, unpred


# ---- per-batch method run (device where profiled, native otherwise) -----------

def _run_method(method: int, batch: np.ndarray, abs_eb: float, quantbin: int,
                block_size: int, ls: float, lo: float, ln: int,
                ts0: np.ndarray) -> bytes:
    """One (frames, atoms) batch -> method stream, byte-identical to
    detail::mdz_run_method (mdz.hpp:293-319)."""
    from ..ops import mdz_device as md
    from ..ops.interp_fast import _maybe_on, exec_device

    frames, atoms = batch.shape
    radius = quantbin // 2
    cap = 2 * batch.nbytes + 4096
    if method in (0, 1):
        if ln == 0:
            raise RuntimeError("VQ/VQT not available: no level grid detected")
        with _maybe_on(exec_device()):
            qinds, pinds, unpred = md.exaalt_encode(
                batch, method, float(abs_eb), radius, ls, lo, ln + md.MARGIN)
        return _exaalt_seal(abs_eb, radius, qinds, pinds, unpred, cap)
    if method == 2:
        with _maybe_on(exec_device()):
            bins, unpred = md.mt_encode(batch, ts0, float(abs_eb), radius)
        return _ts_seal(abs_eb, radius, bins, unpred, cap)
    # LR (3) and TS (4): native per-batch entry points
    return lammps_compress(batch, method, abs_eb=abs_eb,
                           level=(ls, lo, ln), ts0=ts0, quantbin=quantbin,
                           block_size=block_size)


def _select(ts: int, batch_frames: int, atoms: int, abs_eb: float,
            batch_size: int, quantbin: int, block_size: int, ls: float,
            lo: float, ln: int, ts0: np.ndarray, series: np.ndarray,
            total_frames: int) -> int:
    """detail::mdz_select (mdz.hpp:408-440): trial-compress candidates on up
    to 10 frames, keep the smallest stream (first minimum on ties)."""
    t, frames = ts, batch_frames
    if ts == 0:
        if batch_frames == 1:
            return 0 if ln > 0 else 3
        t = batch_frames // 2
        frames = batch_frames // 2
    if batch_size > 10 or (batch_size == 0 and frames > 10):
        frames = min(frames, 10)
    frames = min(frames, total_frames - t)
    sample = series[t:t + frames]
    sizes = np.full(5, np.iinfo(np.int64).max, np.int64)

    def trial(m):
        try:
            sizes[m] = len(_run_method(m, sample, abs_eb, quantbin,
                                       block_size, ls, lo, ln, ts0))
        except RuntimeError:
            pass

    if ln > 0:
        trial(0)
        trial(1)
    else:
        trial(3)
    trial(2)
    if not (sizes < np.iinfo(np.int64).max).any():
        # every trial raised: argmin would return method 0 (VQ) even when
        # ln == 0 and _run_method(0) then raises a RuntimeError that escapes
        # mdz_compress_jax — route to the host engine instead
        raise _fall("mdz select: no trial method succeeded on device")
    return int(np.argmin(sizes))


# ---- full pipeline --------------------------------------------------------------

def _compress_2d(series: np.ndarray, dims, eb_mode: int, eb: float,
                 batch_size: int, quantbin: int, method: int,
                 block_size: int = 128) -> bytes:
    """mdz_compress_2d (mdz.hpp:444-530) with device batch sweeps."""
    total_frames = dims[0] if len(dims) == 2 else 1
    atoms = dims[-1]
    series = series.reshape(total_frames, atoms)
    batch = batch_size if batch_size else total_frames
    method_batch = 50 if method == -1 else 0

    ts0 = series[0].copy()
    ls, lo, ln = 0.0, 1.0, 0
    if method not in (2, 3, 4):
        ls, lo, ln = mdz_levels(series[0])

    current = method
    used_mt = False
    recs = []
    for ts in range(0, total_frames, batch):
        frames = min(batch, total_frames - ts)
        data = series[ts:ts + frames]
        abs_eb = eb
        if eb_mode == 1:
            rng = float(np.float32(data.max()) - np.float32(data.min()))
            abs_eb = eb * rng
        if not abs_eb > 0:
            abs_eb = 1.0
        if method_batch > 0 and (ts // batch) % method_batch == 0:
            current = _select(ts, frames, atoms, abs_eb, batch_size,
                              quantbin, block_size, ls, lo, ln, ts0, series,
                              total_frames)
        if current == 2:
            used_mt = True
        stream = _run_method(current, data, abs_eb, quantbin, block_size,
                             ls, lo, ln, ts0)
        recs.append((current, ls, lo, ln, abs_eb, stream))

    out = bytearray()
    out += b"MDZ1"
    out += struct.pack("<BB", 0, len(dims))
    for d in dims:
        out += struct.pack("<Q", d)
    out += struct.pack("<Bd", eb_mode, eb)
    out += struct.pack("<QiiB", batch, quantbin, block_size,
                       1 if used_mt else 0)
    if used_mt:
        z = runtime.zstd_compress(ts0.tobytes())
        out += struct.pack("<Q", len(z)) + z
    out += struct.pack("<I", len(recs))
    for m, s, o, n, e, stream in recs:
        out += struct.pack("<BffidQ", m, s, o, n, e, len(stream))
    for rec in recs:
        out += rec[5]
    return bytes(out)


def mdz_compress_jax(data: np.ndarray, *, abs_eb=None, rel_eb=None,
                     batch_size: int = 0, method: int = -1,
                     quantbin: int = 1024) -> bytes:
    """Device-path equivalent of mdz.mdz_compress; archives byte-identical."""
    if (abs_eb is None) == (rel_eb is None):
        raise ValueError("specify exactly one of abs_eb / rel_eb")
    if data.dtype != np.float32:
        raise _fall("mdz device path is f32-only")
    if data.ndim > 3:
        raise ValueError("MDZ supports 1D-3D data")
    data = np.ascontiguousarray(data)
    eb_mode = 0 if abs_eb is not None else 1
    eb = float(abs_eb if abs_eb is not None else rel_eb)
    if data.ndim <= 2:
        return _compress_2d(data, data.shape, eb_mode, eb, batch_size,
                            quantbin, method)
    F, A, X = data.shape
    out = bytearray()
    out += b"MDZ3"
    out += struct.pack("<B", 0)
    for d in data.shape:
        out += struct.pack("<Q", d)
    for x in range(X):
        sub = _compress_2d(np.ascontiguousarray(data[:, :, x]), (F, A),
                           eb_mode, eb, batch_size, quantbin, method)
        out += struct.pack("<Q", len(sub)) + sub
    return bytes(out)


def _decompress_2d(src: memoryview, dims, batch: int, quantbin: int,
                   block_size: int) -> tuple[np.ndarray, int]:
    """Returns (array, bytes consumed) for one MDZ1 body after the shared
    prefix (mdz_decompress_2d, mdz.hpp:533-590)."""
    from ..ops import mdz_device as md
    from ..ops.interp_fast import _maybe_on, exec_device

    pos = 0
    total_frames = dims[0] if len(dims) == 2 else 1
    atoms = dims[-1]
    radius = quantbin // 2
    has_ts0 = src[pos]
    pos += 1
    ts0 = None
    if has_ts0:
        (zlen,) = struct.unpack_from("<Q", src, pos)
        pos += 8
        ts0 = np.frombuffer(
            runtime.zstd_decompress(bytes(src[pos:pos + zlen])), np.float32)
        pos += zlen
    (nbatches,) = struct.unpack_from("<I", src, pos)
    pos += 4
    hdrs = []
    for _ in range(nbatches):
        m, s, o, n, e, ln_ = struct.unpack_from("<BffidQ", src, pos)
        pos += struct.calcsize("<BffidQ")
        hdrs.append((m, s, o, n, e, ln_))
    out = np.empty((total_frames, atoms), np.float32)
    ts = 0
    for m, ls, lo, ln, abs_eb, slen in hdrs:
        frames = min(batch if batch else total_frames, total_frames - ts)
        stream = bytes(src[pos:pos + slen])
        pos += slen
        n = frames * atoms
        if m in (0, 1):
            pn = atoms if m == 1 else n
            qinds, pinds, unpred = _exaalt_open(stream, n, pn)
            with _maybe_on(exec_device()):
                out[ts:ts + frames] = md.exaalt_decode(
                    qinds, pinds, unpred, m, frames, atoms, abs_eb, radius,
                    ls, lo, ln + md.MARGIN)
        elif m == 2:
            bins, unpred = _ts_open(stream, n)
            with _maybe_on(exec_device()):
                out[ts:ts + frames] = md.mt_decode(bins, unpred, ts0, frames,
                                                   atoms, abs_eb, radius)
        else:
            out[ts:ts + frames] = lammps_decompress(
                stream, m, frames, atoms, abs_eb=abs_eb, level=(ls, lo, ln),
                ts0=ts0, quantbin=quantbin, block_size=block_size)
        ts += frames
    return out.reshape(dims), pos


def mdz_decompress_jax(blob: bytes) -> np.ndarray:
    """Device-path equivalent of mdz.mdz_decompress."""
    magic = blob[:4]
    if magic == b"MDZ3":
        dtype = blob[4]
        if dtype != 0:
            raise _fall("mdz device path is f32-only")
        F, A, X = struct.unpack_from("<QQQ", blob, 5)
        pos = 5 + 24
        out = np.empty((F, A, X), np.float32)
        for x in range(X):
            (slen,) = struct.unpack_from("<Q", blob, pos)
            pos += 8
            sub = mdz_decompress_jax(blob[pos:pos + slen])
            pos += slen
            out[:, :, x] = sub.reshape(F, A)
        return out
    if magic != b"MDZ1":
        raise ValueError("not an MDZ archive")
    dtype = blob[4]
    if dtype != 0:
        raise _fall("mdz device path is f32-only")
    nd = blob[5]
    dims = struct.unpack_from(f"<{nd}Q", blob, 6)
    pos = 6 + 8 * nd
    _eb_mode, _eb = struct.unpack_from("<Bd", blob, pos)
    pos += 9
    batch, quantbin, block_size = struct.unpack_from("<Qii", blob, pos)
    pos += 16
    arr, _used = _decompress_2d(memoryview(blob)[pos:], dims, batch,
                                quantbin, block_size)
    return arr
