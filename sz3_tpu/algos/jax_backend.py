"""JAX/TPU execution backend.

Division of labor (see ARCHITECTURE.md): the device runs the numerically
heavy multi-level prediction+quantization as dense vectorized passes; the
native host engine handles stream ordering, Huffman and zstd. Payloads are
byte-identical to the host engine's (the golden corpus asserts this), so the
backend choice is purely an execution detail.

Dispatcher semantics mirror the host path (reference SZDispatcher.hpp:13-76):
eb-mode conversion, lossless mode for eb==0, lossy-ratio<3 zstd preference,
buffer-too-small downgrade.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import runtime
from ..config import ALGO, Config, EB
from ..stats import cal_abs_error_bound
from ..ops.interp_fast import interp_decode_grid, interp_encode_bins_grid


@lru_cache(maxsize=16)
def _stream_perm(dims, interp_algo, direction, anchor_stride):
    """Cached stream-order permutation (data-independent; ~num*8 bytes).
    interp_algo matters: linear and cubic emit block-boundary points in a
    different order (reference InterpolationDecomposition.hpp:247-402)."""
    c = Config(dims=dims, cmprAlgo=ALGO.INTERP)
    c.interpAlgo = interp_algo
    c.interpDirection = direction
    c.interpAnchorStride = anchor_stride
    return runtime.interp_order(c)


def _device_entropy_mode() -> str:
    """SZT_DEVICE_ENTROPY: auto (default; on when a real TPU backend is
    present), 1 (force, incl. interpret-mode on CPU — tests), 0 (off)."""
    import os
    return os.environ.get("SZT_DEVICE_ENTROPY", "auto")


def _device_routed() -> bool:
    """One policy for every device route (encode and decode, all
    algorithms): SZT_DEVICE_ENTROPY=1 forces it, =0 disables it, and auto
    requires a real TPU default backend not pinned to cpu via
    SZT_JAX_DEVICE. Callers wrap the device attempt in
    try/except device_*.Fallback and fall through to the host engine."""
    import os
    mode = _device_entropy_mode()
    if mode == "0":
        return False
    if mode == "1":
        return True
    import jax
    return (os.environ.get("SZT_JAX_DEVICE", "") != "cpu"
            and jax.default_backend() == "tpu")


def _interp_encode_payload(conf: Config, data: np.ndarray, cap: int) -> bytes:
    if conf.interpAnchorStride < 0:
        conf.interpAnchorStride = [4096, 128, 32, 16][conf.N - 1]
    if _device_routed():
        from . import device_encode
        try:
            return device_encode.encode_payload_device(conf, data, cap)
        except device_encode.Fallback:
            pass
    # conf.dims drops size-1 axes (reference setDims semantics); the device
    # plan, the stream permutation, and the archive must all use that shape
    data = data.reshape(conf.dims)
    bins = interp_encode_bins_grid(
        data,
        interp_algo=int(conf.interpAlgo), direction=conf.interpDirection,
        anchor_stride=conf.interpAnchorStride, alpha=conf.interpAlpha,
        beta=conf.interpBeta, eb=conf.absErrorBound, quantbin_cnt=conf.quantbinCnt)
    # grid order -> archive stream order as one gather; unpredictable slots
    # (bins==0, incl. anchors) carry the original values as literals, in
    # stream order — exactly what the scalar walk (bridge.hpp) produces
    perm = _stream_perm(tuple(conf.dims), int(conf.interpAlgo), conf.interpDirection, conf.interpAnchorStride)
    stream, unpred = runtime.perm_emit(perm, np.ascontiguousarray(bins).ravel(),
                                       np.ascontiguousarray(data).ravel())
    return runtime.interp_seal(conf, stream, unpred, cap)


def _interp_decode_payload(conf: Config, payload: bytes, dtype) -> np.ndarray:
    # The archive's Config tail (reference format) does not serialize the
    # anchor stride; loaded configs carry -1 and the value is DERIVED at
    # decompression, identically to the encode-side resolution above. The
    # device route must resolve it BEFORE building its static plan — with -1
    # the plan mismatches the archived stream count and the route silently
    # fell back on every archive-loaded config (round-4 fix; the host path
    # was immune because runtime.interp_open resolves it natively).
    if conf.interpAnchorStride < 0:
        conf.interpAnchorStride = [4096, 128, 32, 16][conf.N - 1]
    if _device_routed():
        from . import device_decode
        try:
            return device_decode.decode_payload_device(conf, payload, dtype)
        except device_decode.Fallback:
            pass
    stream, unpred = runtime.interp_open(conf, payload, dtype)
    perm = _stream_perm(tuple(conf.dims), int(conf.interpAlgo), conf.interpDirection, conf.interpAnchorStride)
    bins_grid, literal = runtime.perm_place(perm, stream, unpred, tuple(conf.dims), dtype)
    return interp_decode_grid(
        bins_grid, literal, dtype,
        interp_algo=int(conf.interpAlgo), direction=conf.interpDirection,
        anchor_stride=conf.interpAnchorStride, alpha=conf.interpAlpha,
        beta=conf.interpBeta, eb=conf.absErrorBound, quantbin_cnt=conf.quantbinCnt)


def _nopred_encode_payload(conf: Config, data: np.ndarray, cap: int) -> bytes:
    """NOPRED with the quantize-vs-zero pass and the entropy stage on-device
    (reference SZAlgoNopred.hpp:13-36); host engine on fallback."""
    if _device_routed():
        from . import device_encode
        try:
            return device_encode.encode_payload_device_nopred(conf, data, cap)
        except device_encode.Fallback:
            pass
    return runtime.compress_payload(conf, data, cap)


def _nopred_decode_payload(conf: Config, payload: bytes, dtype) -> np.ndarray:
    """NOPRED decode: device entropy decode + vectorized recover; host
    entropy open on fallback."""
    if _device_routed():
        from . import device_decode
        try:
            return device_decode.decode_payload_device_nopred(
            conf, payload, dtype)
        except device_decode.Fallback:
            pass
    bins, unpred = runtime.nopred_open(conf, payload, dtype)
    literal = np.zeros(conf.num, dtype=dtype)
    if unpred.size:
        literal[bins == 0] = unpred
    import jax.numpy as jnp

    from ..ops.interp_fast import _maybe_on, exec_device
    from ..ops.quantize import recover

    with _maybe_on(exec_device()):
        out = recover(jnp.zeros(conf.num, dtype=dtype), jnp.asarray(bins),
                      jnp.asarray(literal), conf.absErrorBound,
                      conf.quantbinCnt // 2)
        return np.asarray(out)


def _biomd_encode_payload(conf: Config, data: np.ndarray, cap: int) -> bytes:
    """ALGO_BIOMD with the frames>0 recurrence on-device (two vectorized
    quantize steps per frame; reference SZBioMDDecomposition.hpp:229-285);
    host engine on fallback."""
    if _device_routed():
        from . import device_encode
        try:
            return device_encode.encode_payload_device_biomd(conf, data, cap)
        except device_encode.Fallback:
            pass
    return runtime.compress_payload(conf, data, cap)


def _biomd_decode_payload(conf: Config, payload: bytes, dtype) -> np.ndarray:
    """ALGO_BIOMD decode with the frames>0 recover scan on-device; host
    engine on fallback."""
    if _device_routed():
        from . import device_decode
        try:
            return device_decode.decode_payload_device_biomd(
            conf, payload, dtype)
        except device_decode.Fallback:
            pass
    return runtime.decompress_payload(
        conf, payload, dtype=runtime.np_dtype_id(np.empty(0, dtype=dtype)))


def _biomdxtc_encode_payload(conf: Config, data: np.ndarray, cap: int) -> bytes:
    """ALGO_BIOMDXTC with the elementwise XTC-radius quantize on-device
    (ops/xtc_device.py); host engine on fallback. The XTC triplet coder is
    the native engine either way."""
    if _device_routed():
        from . import device_encode
        try:
            return device_encode.encode_payload_device_biomdxtc(conf, data, cap)
        except device_encode.Fallback:
            pass
    return runtime.compress_payload(conf, data, cap)


def _biomdxtc_decode_payload(conf: Config, payload: bytes, dtype) -> np.ndarray:
    """ALGO_BIOMDXTC decode with the vectorized recover on-device; host
    engine on fallback."""
    if _device_routed():
        from . import device_decode
        try:
            return device_decode.decode_payload_device_biomdxtc(
            conf, payload, dtype)
        except device_decode.Fallback:
            pass
    return runtime.decompress_payload(
        conf, payload, dtype=runtime.np_dtype_id(np.empty(0, dtype=dtype)))


def _device_blockwise_mode() -> str:
    """SZT_DEVICE_BLOCKWISE: auto (default — decode runs the device
    anti-diagonal wavefront for f32 3D, ops/blockwise_wavefront.py; encode
    stays on the host engine, whose sweep the format serializes — see
    ARCHITECTURE.md), 1 (force the lax.scan device formulation BOTH
    directions, ops/blockwise_device.py — parity tests), 0 (host engine
    only)."""
    import os
    return os.environ.get("SZT_DEVICE_BLOCKWISE", "auto")


def _blockwise_encode_payload(conf: Config, data: np.ndarray, cap: int) -> bytes:
    """LORENZO_REG device encode. Mode auto (default): the speculative
    anti-diagonal wavefront (ops/blockwise_wavefront_encode.py — one skewed
    scan of depth NX+NY+NZ, selection validated against the true
    reconstruction, host fallback when the fixpoint is not certified).
    Mode 1: the block-sequential lax.scan (ops/blockwise_device.py), the
    parity oracle for the wavefront."""
    data = data.reshape(conf.dims)
    if _device_blockwise_mode() == "auto":
        if _device_routed():
            # entropy stage on-device too: bins never leave the chip
            from . import device_encode
            try:
                return device_encode.encode_payload_device_blockwise(
                    conf, data, cap)
            except device_encode.Fallback:
                pass
        from ..ops.blockwise_wavefront_encode import (Fallback,
                                                      encode_blocks_wavefront)
        try:
            bins, sel, regb, qlu, qiu, unp = encode_blocks_wavefront(
                data, conf.absErrorBound, conf.quantbinCnt // 2,
                conf.lorenzo, conf.lorenzo2, conf.regression)
        except Fallback:
            return runtime.compress_payload(conf, data, cap)  # host engine
    else:
        from ..ops.blockwise_device import encode_blocks
        bins, sel, regb, qlu, qiu, unp = encode_blocks(
            data, conf.absErrorBound, conf.quantbinCnt // 2,
            conf.lorenzo, conf.lorenzo2, conf.regression)
    return runtime.blockwise_seal(conf, bins, sel, regb, qlu, qiu, unp, cap)


def _blockwise_decode_payload(conf: Config, payload: bytes) -> np.ndarray:
    from ..ops.blockwise_device import decode_blocks
    bins, sel, regb, qlu, qiu, unp = runtime.blockwise_open(conf, payload)
    return decode_blocks(conf.dims, conf.absErrorBound, conf.quantbinCnt // 2,
                         conf.lorenzo, conf.lorenzo2, conf.regression,
                         bins, sel, regb, qlu, qiu, unp)


def _blockwise_decode_wavefront(conf: Config, payload: bytes) -> np.ndarray:
    """LORENZO_REG decode with the element sweep as an anti-diagonal
    wavefront (ops/blockwise_wavefront.py) — the default device decode for
    f32 3D. Under the device-entropy policy the bins Huffman bit-walk and
    the stream->skewed-slab layout run on-chip too (device_decode.
    decode_payload_device_blockwise); otherwise the entropy open and the
    sequential coefficient chain run in the native engine."""
    if _device_routed():
        from . import device_decode
        try:
            return device_decode.decode_payload_device_blockwise(
                conf, payload, np.float32)
        except device_decode.Fallback:
            pass
    from ..ops.blockwise_wavefront import decode_blocks_wavefront
    bins, sel, regb, qlu, qiu, unp = runtime.blockwise_open(conf, payload)
    return decode_blocks_wavefront(
        conf.dims, conf.absErrorBound, conf.quantbinCnt // 2,
        conf.lorenzo, conf.lorenzo2, conf.regression,
        bins, sel, regb, qlu, qiu, unp)


def compress_payload_jax(conf: Config, data: np.ndarray, cap: int,
                         nthreads: int = 0) -> bytes:
    """JAX-path equivalent of the native dispatcher."""
    if conf.openmp:
        from ..parallel.chunked import compress_chunked_jax
        import os
        n = nthreads or min(os.cpu_count() or 1, data.shape[0])
        return compress_chunked_jax(conf, data, n)
    cal_abs_error_bound(conf, data)
    if conf.absErrorBound == 0:
        conf.cmprAlgo = ALGO.LOSSLESS
    if conf.cmprAlgo == ALGO.INTERP_LORENZO:
        from . import tuner
        if not tuner.tune(conf, data):          # vmapped trials on device
            runtime.tune_interp(conf, data)     # native tuner (1D / non-f32)
    if conf.cmprAlgo == ALGO.LOSSLESS:
        return runtime.zstd_compress(data.tobytes())
    if conf.cmprAlgo == ALGO.INTERP and data.dtype not in (np.float32,
                                                           np.float64):
        # integer dtypes ride the host engine end-to-end (the device interp
        # kernels and the packed seal are float-only)
        return runtime.compress_payload(conf, data, cap)
    if conf.cmprAlgo == ALGO.INTERP:
        try:
            payload = _interp_encode_payload(conf, data, cap)  # read-only path
        except RuntimeError as e:
            if "buffer too small" not in str(e):
                raise
            conf.cmprAlgo = ALGO.LOSSLESS
            return runtime.zstd_compress(data.tobytes())
    elif conf.cmprAlgo == ALGO.NOPRED:
        try:
            payload = _nopred_encode_payload(conf, data, cap)
        except RuntimeError as e:
            if "buffer too small" not in str(e):
                raise
            conf.cmprAlgo = ALGO.LOSSLESS
            return runtime.zstd_compress(data.tobytes())
    elif conf.cmprAlgo == ALGO.BIOMD and data.dtype == np.float32 \
            and len(conf.dims) == 3:
        # BioMD returns directly — no ratio fallback (SZDispatcher.hpp:36-39)
        try:
            return _biomd_encode_payload(conf, data, cap)
        except RuntimeError as e:
            if "buffer too small" not in str(e):
                raise
            conf.cmprAlgo = ALGO.LOSSLESS
            return runtime.zstd_compress(data.tobytes())
    elif conf.cmprAlgo == ALGO.BIOMDXTC and data.dtype == np.float32:
        # XTC bypass container — no zstd-ratio fallback (SZAlgoBioMD.hpp:46-48)
        try:
            return _biomdxtc_encode_payload(conf, data, cap)
        except RuntimeError as e:
            if "buffer too small" not in str(e):
                raise
            conf.cmprAlgo = ALGO.LOSSLESS
            return runtime.zstd_compress(data.tobytes())
    elif (conf.cmprAlgo == ALGO.LORENZO_REG and _device_blockwise_mode() != "0"
          and data.dtype == np.float32 and len(conf.dims) == 3):
        try:
            payload = _blockwise_encode_payload(conf, data, cap)
        except RuntimeError as e:
            if "buffer too small" not in str(e):
                raise
            conf.cmprAlgo = ALGO.LOSSLESS
            return runtime.zstd_compress(data.tobytes())
    else:
        # algorithms without a device path yet run on the host engine
        return runtime.compress_payload(conf, data, cap)
    # lossy ratio < 3 -> prefer plain zstd when smaller (SZDispatcher.hpp:61-74)
    if data.nbytes / len(payload) < 3:
        z = runtime.zstd_compress(data.tobytes())
        if len(z) < len(payload) and len(z) <= cap:
            conf.cmprAlgo = ALGO.LOSSLESS
            return z
    return payload


def decompress_payload_jax(conf: Config, payload: bytes, dtype=None) -> np.ndarray:
    dt = runtime.np_dtype_of(dtype if dtype is not None else conf.dataType)
    if conf.openmp:
        from ..parallel.chunked import decompress_chunked_jax
        return decompress_chunked_jax(conf, payload, dt)
    if conf.cmprAlgo == ALGO.LOSSLESS:
        raw = runtime.zstd_decompress(payload)
        return np.frombuffer(raw, dtype=dt).reshape(conf.dims).copy()
    if conf.cmprAlgo == ALGO.INTERP and dt in (np.float32, np.float64):
        return _interp_decode_payload(conf, payload, dt).reshape(conf.dims)
    if conf.cmprAlgo == ALGO.NOPRED and dt == np.float32:
        # f32 only: f64 recover on TPU would ride the float-float emulation
        # and could misround vs the host engine's IEEE doubles
        return _nopred_decode_payload(conf, payload, dt).reshape(conf.dims)
    if conf.cmprAlgo == ALGO.BIOMD and dt == np.float32 and len(conf.dims) == 3:
        return _biomd_decode_payload(conf, payload, dt).reshape(conf.dims)
    if conf.cmprAlgo == ALGO.BIOMDXTC and dt == np.float32:
        return _biomdxtc_decode_payload(conf, payload, dt).reshape(conf.dims)
    if (conf.cmprAlgo == ALGO.LORENZO_REG and dt == np.float32
            and len(conf.dims) == 3):
        mode = _device_blockwise_mode()
        if mode == "1":   # the sequential-scan formulation (parity tests)
            return _blockwise_decode_payload(conf, payload).reshape(conf.dims)
        if mode != "0":   # default: anti-diagonal wavefront on device
            return _blockwise_decode_wavefront(conf, payload).reshape(conf.dims)
    return runtime.decompress_payload(conf, payload,
                                      dtype=runtime.np_dtype_id(np.empty(0, dtype=dt)))
