"""Chunk-parallel archives (reference OpenMP format) driven from Python with
device execution per chunk.

Archive payload layout matches api/impl/SZImplOMP.hpp:100-107 exactly:
  [nChunks i32][Config x n][sizes u64 x n][chunk streams...]
so these archives interoperate with any SZ3 build's OpenMP decompressor, and
the native engine's threaded path produces identical bytes (tests assert it).
"""

from __future__ import annotations

import struct
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

from .. import runtime
from ..config import Config, EB
from ..stats import cal_abs_error_bound


def _chunk_bounds(dim0: int, n: int) -> List[tuple]:
    return [(t * dim0 // n, (t + 1) * dim0 // n) for t in range(n)]


def compress_chunked_jax(conf: Config, data: np.ndarray, n_chunks: int) -> bytes:
    """OpenMP-format payload with per-chunk device encoding."""
    from ..algos.jax_backend import compress_payload_jax

    # the native engine chunks on the squeezed conf.dims[0]
    # (pipeline.hpp compress_chunked), not the raw leading axis
    conf.set_dims(data.shape)
    data = data.reshape(conf.dims)
    if conf.dims[0] < n_chunks:
        n_chunks = conf.dims[0]
    if conf.errorBoundMode != EB.ABS:
        # global range reduce before chunking (reference SZImplOMP.hpp:57-68);
        # chunk-wise minmax combined == global minmax
        rng = float(data.max() - data.min())
        cal_abs_error_bound(conf, data, rng)

    bounds = _chunk_bounds(data.shape[0], n_chunks)
    confs = []
    for lo, hi in bounds:
        c = conf.copy()  # chunk configs keep the openmp bit, like the reference
        c.set_dims((hi - lo,) + data.shape[1:])
        confs.append(c)

    from ..api import zstd_compress_bound

    def one(t):
        lo, hi = bounds[t]
        chunk = np.ascontiguousarray(data[lo:hi])
        # per-chunk cap (SZImplOMP.hpp:73) + the same headroom the native
        # chunked path adds so its lossless fallback stays viable — the two
        # backends must make identical downgrade decisions for byte parity
        cap = zstd_compress_bound(chunk.nbytes) + 4096
        work = confs[t].copy()
        work.openmp = False  # the chunk itself is a plain dispatcher stream
        payload = compress_payload_jax(work, chunk, cap)
        work.openmp = confs[t].openmp
        confs[t] = work  # fold back algo/eb decisions for the chunk header
        return payload

    with ThreadPoolExecutor(max_workers=min(8, n_chunks)) as ex:
        streams = list(ex.map(one, range(n_chunks)))

    out = bytearray()
    out += struct.pack("<i", n_chunks)
    for c in confs:
        out += c.save()
    for s in streams:
        out += struct.pack("<Q", len(s))
    for s in streams:
        out += s
    return bytes(out)


def decompress_chunked_jax(conf: Config, payload: bytes, dtype) -> np.ndarray:
    from ..algos.jax_backend import decompress_payload_jax

    n = struct.unpack_from("<i", payload, 0)[0]
    pos = 4
    confs = []
    for _ in range(n):
        c, used = Config.load(payload, pos)
        confs.append(c)
        pos += used
    sizes = list(struct.unpack_from(f"<{n}Q", payload, pos))
    pos += 8 * n
    bounds = _chunk_bounds(conf.dims[0], n)
    out = np.empty(conf.dims, dtype=dtype)

    offsets = [pos]
    for sz_t in sizes:
        offsets.append(offsets[-1] + sz_t)

    def one(t):
        start = offsets[t]
        lo, hi = bounds[t]
        c = confs[t]
        c.openmp = False  # chunk streams are plain dispatcher streams
        chunk = decompress_payload_jax(c, payload[start:start + sizes[t]],
                                       dtype=runtime.np_dtype_id(np.empty(0, dtype=dtype)))
        out[lo:hi] = chunk.reshape((hi - lo,) + tuple(conf.dims[1:]))

    with ThreadPoolExecutor(max_workers=min(8, n)) as ex:
        list(ex.map(one, range(n)))
    return out
