"""Top-level compress/decompress: the SZ3 container format around the payload.

Container layout (reference api/sz.hpp:7-19):
  [magic u32][data-version u32][payload size u64] [payload] [Config]
All little-endian. The Config rides the tail so decompression is
self-describing.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

from .config import ALGO, Config, DataType, SZ3_MAGIC_NUMBER, version_int, version_str
from . import runtime

_HDR = struct.Struct("<IIQ")
_DATA_VER = version_int((3, 3, 2))


def zstd_compress_bound(n: int) -> int:
    """ZSTD_COMPRESSBOUND (zstd.h macro)."""
    margin = ((128 << 10) - n) >> 11 if n < (128 << 10) else 0
    return n + (n >> 8) + margin


def compress_size_bound(conf: Config, itemsize: int = 0) -> int:
    """Worst-case archive size (reference api/impl/SZImpl.hpp:33-44).

    `itemsize` is the byte width of the actual element type (the reference is
    templated on T); falls back to conf.dataType when omitted.
    """
    item = itemsize or np.dtype(runtime.np_dtype_of(conf.dataType)).itemsize
    if conf.openmp:
        # chunk-level worst case (SZImplOMP.hpp:188-209), computed generously
        n_chunks = min(64, conf.dims[0]) if conf.dims else 1
        return (4096 + 4 + n_chunks * (conf.size_est() + 8) +
                zstd_compress_bound(conf.num * item) + n_chunks * 4096)
    return 4096 + conf.size_est() + zstd_compress_bound(conf.num * item)


def _conf_for(data: np.ndarray, conf: Optional[Config], set_datatype: bool) -> Config:
    c = conf.copy() if conf is not None else Config(dims=data.shape)
    c.set_dims(data.shape)
    if set_datatype:
        c.dataType = runtime.np_dtype_id(data)
    return c


def compress(data: np.ndarray, conf: Optional[Config] = None, *, backend: str = "native",
             nthreads: int = 0, set_datatype: bool = True) -> bytes:
    """Compress an array into an SZ3 archive.

    `conf` carries algorithm/error-bound settings; dims and dtype are taken
    from `data`. Returns the full self-describing archive.

    set_datatype=False leaves conf.dataType untouched in the archive tail —
    the reference CLI's behavior (it never records the dtype; decompression
    then needs an explicit dtype). Needed for byte parity with CLI archives.
    """
    if data.ndim > 4:
        raise ValueError("data dimension higher than 4 is not supported")
    c = _conf_for(data, conf, set_datatype)
    cap = compress_size_bound(c, data.dtype.itemsize) - 16 - c.size_est() * 2  # api/sz.hpp:60
    if backend == "native":
        payload = runtime.compress_payload(c, data, cap, nthreads)
    elif backend == "jax":
        from .algos.jax_backend import compress_payload_jax
        payload = compress_payload_jax(c, data, cap, nthreads=nthreads)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    head = _HDR.pack(SZ3_MAGIC_NUMBER, _DATA_VER, len(payload))
    return head + payload + c.save()


def decompress(blob: bytes, *, backend: str = "native",
               dtype=None) -> Tuple[np.ndarray, Config]:
    """Decompress an SZ3 archive; returns (array, effective config).

    `dtype` (numpy dtype or DataType) overrides the archive's dataType byte —
    required for archives from callers that don't record it (e.g. the
    reference CLI on non-float data).
    """
    magic, ver, size = _HDR.unpack_from(blob, 0)
    if magic != SZ3_MAGIC_NUMBER:
        raise ValueError("magic number mismatch: not an SZ3 archive")
    if ver != _DATA_VER:
        raise ValueError(
            f"archive data version {version_str(ver)} != supported {version_str(_DATA_VER)}")
    conf, _ = Config.load(blob, 16 + size)
    payload = blob[16:16 + size]
    dt = None
    if dtype is not None:
        dt = dtype if isinstance(dtype, DataType) else runtime.np_dtype_id(np.empty(0, dtype=dtype))
    if backend == "native":
        out = runtime.decompress_payload(conf, payload, dtype=dt)
    elif backend == "jax":
        from .algos.jax_backend import decompress_payload_jax
        out = decompress_payload_jax(conf, payload, dtype=dt).reshape(conf.dims)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return out, conf
