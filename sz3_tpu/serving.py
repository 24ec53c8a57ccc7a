"""Throughput-oriented batch API: compress/decompress many same-shape fields
in one device program.

Production pipelines (simulation checkpointing, in-situ analysis) compress
streams of equally-shaped snapshots; batching them through `jax.vmap` keeps
the TPU busy across fields and amortizes dispatch overhead, while the host
entropy stage drains the resulting bin batches. Archives are the standard
per-field SZ3 containers — each element of the returned list decompresses
anywhere, including the reference binary.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import numpy as np

from . import runtime
from .api import compress_size_bound
from .config import ALGO, SZ3_MAGIC_NUMBER, Config, version_int
from .algos.jax_backend import _stream_perm


@lru_cache(maxsize=8)
def _jit_encode_batch(dims, interp_algo, direction, anchor_stride, alpha, beta, eb,
                      quantbin_cnt, dtype_name):
    import jax
    from .ops.interp_fast import _jit_encode

    plan, run = _jit_encode(dims, interp_algo, direction, anchor_stride, alpha, beta, eb,
                            quantbin_cnt, dtype_name)
    return plan, jax.jit(jax.vmap(run))


@lru_cache(maxsize=8)
def _jit_encode_batch_dynamic(dims, interp_algo, direction, anchor_stride, alpha,
                              beta, mode_name, abs_v, rel_v, psnr_v,
                              quantbin_cnt, dtype_name):
    """Batched encode for range-dependent bound modes: each field's ABS bound
    resolves on-device from its own min/max (the vmapped analog of
    calAbsErrorBound, Statistic.hpp:31-56), traced into the level-eb
    schedule. The quantizer keeps the reference arithmetic: range = T-typed
    max-min (f32 subtraction) promoted to f64."""
    import jax
    import jax.numpy as jnp
    from .config import EB
    from .ops.interp_fast import build_fast_plan, encode_grid_fast

    plan = build_fast_plan(dims, interp_algo=interp_algo, direction=direction,
                           anchor_stride=anchor_stride, alpha=alpha, beta=beta,
                           eb=1.0, quantbin_cnt=quantbin_cnt)
    mode = EB[mode_name]

    def one(x):
        rng = (jnp.max(x) - jnp.min(x)).astype(jnp.float64)
        if mode == EB.REL:
            eb = rel_v * rng
        elif mode == EB.PSNR:
            import math
            v1 = psnr_v + 10 * math.log10(1 - 2.0 / 3.0 * 0.99)
            eb = rng * (10.0 ** (v1 / -20))
        elif mode == EB.ABS_AND_REL:
            eb = jnp.minimum(jnp.float64(abs_v), rel_v * rng)
        elif mode == EB.ABS_OR_REL:
            eb = jnp.maximum(jnp.float64(abs_v), rel_v * rng)
        else:
            raise ValueError(f"unsupported batched mode {mode}")
        bins_list, b0, _ = encode_grid_fast(x, plan, eb=eb)
        flat = jnp.concatenate([b.ravel() for b in bins_list]) if bins_list \
            else jnp.zeros((0,), jnp.int32)
        return flat, (b0 if b0 is not None else jnp.int32(0)), eb

    return plan, jax.jit(jax.vmap(one))


def _device_entropy_route(base: Config) -> bool:
    """Serving uses the device-resident entropy stage (archive bytes produced
    on-chip, ops/entropy_device.py) when the backend routes it: the same
    auto/1/0 policy as single-field encode (jax_backend._device_entropy_mode).
    Only the static-ABS bound qualifies — the device program's code tables
    are built per field on the host, but the quantize schedule must be
    compile-time (range-relative modes trace eb and would recompile per
    field)."""
    from .algos.jax_backend import _device_routed
    from .config import EB
    return base.errorBoundMode == EB.ABS and _device_routed()


def _compress_batch_device_entropy(stack: np.ndarray, base: Config,
                                   depth: int = 3) -> List[bytes]:
    """Pipelined device-entropy serving: the per-field device programs (jit A
    quantize+layout+histogram, jit B pack+splice) are dispatched ahead of the
    host stages, so the host Huffman-tree build and the zstd/framing of field
    i overlap the device compute of fields i+1..i+depth. JAX dispatch is
    async — the pipeline needs no threads, only dispatch-before-force
    ordering. `depth` bounds device-resident intermediates (~5x field bytes
    per in-flight field)."""
    import jax
    import jax.numpy as jnp

    from .algos import device_encode as de
    from .api import compress as _compress
    from .ops.interp_fast import _maybe_on, exec_device

    b = stack.shape[0]
    if stack.dtype != np.float32:
        # f64 device encode needs a native-x64 backend; per-field encode
        # handles (and gates) it
        raise de._fall("pipelined serving is f32-only")
    dims = tuple(base.dims)
    num = int(np.prod(dims))
    cap = compress_size_bound(base, stack.dtype.itemsize)
    plan, lp, jits = de._static(dims, int(base.interpAlgo),
                                base.interpDirection, base.interpAnchorStride,
                                base.interpAlpha, base.interpBeta,
                                base.absErrorBound, base.quantbinCnt,
                                str(stack.dtype))
    if lp is None:
        raise de._fall("no anchor grid")
    jit_a, jit_b, nc, mp, cap_rows, gmap_dev = jits

    import struct
    hdr = struct.Struct("<IIQ")
    ver = version_int((3, 3, 2))
    out: List[bytes] = [b""] * b
    dev = exec_device()
    with _maybe_on(dev):
        a_q = {}     # i -> jit A outputs (device values, dispatched)
        b_q = {}     # i -> (tree, total_bits, n_lit, lits, words)
        nxt_a = 0

        def pump_a():
            nonlocal nxt_a
            while nxt_a < b and len(a_q) + len(b_q) < depth:
                x = jnp.asarray(np.ascontiguousarray(stack[nxt_a]))
                a_q[nxt_a] = jit_a(x, gmap_dev)
                nxt_a += 1

        def drain_oldest():
            # force the OLDEST packed stream, then do the host zstd while
            # the device runs ahead on queued work
            j = min(b_q)
            tree_j, tb_j, nl_j, lits_j, words_j = b_q.pop(j)
            bits = de._stream_bytes(words_j, tb_j)
            unpred = de._literals(lits_j, nl_j, stack.dtype)
            c = base.copy()
            payload = runtime.interp_seal_packed(c, tree_j, bits, tb_j,
                                                 num, unpred, cap)
            out[j] = hdr.pack(SZ3_MAGIC_NUMBER, ver, len(payload)) \
                + payload + c.save()
            pump_a()

        pump_a()
        for i in range(b):
            bins_stream, hist, lits, nlit = a_q.pop(i)
            try:
                # forces hist/nlit (tiny); device continues with queued work
                tree, total_bits, n_lit, tc, tl, c0 = de._tree_and_tables(
                    hist, nlit, cap_rows, base.quantbinCnt, num)
            except de.Fallback:
                out[i] = _compress(stack[i], base.copy(), backend="jax")
                pump_a()
                continue
            words, _ = jit_b(bins_stream, tc, tl, c0)   # dispatched async
            b_q[i] = (tree, total_bits, n_lit, lits, words)
            pump_a()
            while len(b_q) >= 2:
                drain_oldest()
        while b_q:   # final flush (must run even when the LAST field fell
            drain_oldest()  # back — a `continue` above skips the loop body)
    return out


def compress_batch(fields: np.ndarray, conf: Optional[Config] = None) -> List[bytes]:
    """Compress a [B, *dims] stack of same-shape fields.

    The multi-level prediction+quantization of ALL fields runs as one
    vmapped device program; stream ordering and entropy code per field on
    the host. Returns one standard SZ3 archive per field, byte-identical to
    single-field compression of the same data.

    Non-ABS error modes resolve per field (the bound depends on each
    field's range), so they route through the single-field path; the
    batched device program needs one static bound.
    """
    import jax.numpy as jnp
    from .ops.interp_fast import _maybe_on, exec_device

    if fields.ndim < 2:
        raise ValueError("expected a [B, *dims] stack")
    b = fields.shape[0]
    base = conf.copy() if conf is not None else Config(dims=fields.shape[1:])
    base.set_dims(fields.shape[1:])  # drops size-1 axes like the reference
    base.dataType = runtime.np_dtype_id(fields[0])
    if base.cmprAlgo == ALGO.INTERP_LORENZO:
        base.cmprAlgo = ALGO.INTERP  # batch path pins the device algorithm
    from .config import EB
    dynamic_modes = (EB.REL, EB.PSNR, EB.ABS_AND_REL, EB.ABS_OR_REL)
    if (base.cmprAlgo != ALGO.INTERP
            or (base.errorBoundMode == EB.ABS and base.absErrorBound <= 0)
            or base.errorBoundMode not in (EB.ABS,) + dynamic_modes):
        # other algorithms / lossless / L2NORM (size-dependent, host path)
        from . import compress
        return [compress(np.ascontiguousarray(f), base.copy(), backend="jax") for f in fields]
    if base.interpAnchorStride < 0:
        base.interpAnchorStride = [4096, 128, 32, 16][base.N - 1]

    dims = tuple(base.dims)
    stack = np.ascontiguousarray(fields.reshape((b,) + dims))
    if _device_entropy_route(base):
        from .algos import device_encode as de
        try:
            return _compress_batch_device_entropy(stack, base)
        except de.Fallback:
            pass  # counted in de.fallback_counts; bins-readback path below
    ebs = None
    if base.errorBoundMode == EB.ABS:
        plan, run_b = _jit_encode_batch(dims, int(base.interpAlgo), base.interpDirection,
                                        base.interpAnchorStride, base.interpAlpha, base.interpBeta,
                                        base.absErrorBound, base.quantbinCnt, str(fields.dtype))
        with _maybe_on(exec_device()):
            flat_b, b0_b = run_b(jnp.asarray(stack))
            flat_b = np.asarray(flat_b)
            b0_b = np.asarray(b0_b)
    else:
        # per-field range-relative bounds resolve inside the device program
        plan, run_b = _jit_encode_batch_dynamic(
            dims, int(base.interpAlgo), base.interpDirection,
            base.interpAnchorStride, base.interpAlpha, base.interpBeta,
            base.errorBoundMode.name, base.absErrorBound, base.relErrorBound,
            base.psnrErrorBound, base.quantbinCnt, str(fields.dtype))
        with _maybe_on(exec_device()):
            flat_b, b0_b, ebs_dev = run_b(jnp.asarray(stack))
            flat_b = np.asarray(flat_b)
            b0_b = np.asarray(b0_b)
            ebs = np.asarray(ebs_dev)

    perm = _stream_perm(dims, int(base.interpAlgo), base.interpDirection,
                        base.interpAnchorStride)
    out: List[bytes] = []
    import struct
    hdr = struct.Struct("<IIQ")
    ver = version_int((3, 3, 2))
    cap = compress_size_bound(base, fields.dtype.itemsize)
    for i in range(b):
        c = base.copy()
        if ebs is not None:
            c.absErrorBound = float(ebs[i])
            c.errorBoundMode = EB.ABS
        bins = _grid_from_flat(flat_b[i], plan, b0_b[i])
        stream = bins.ravel()[perm]
        unpred = np.ascontiguousarray(stack[i].ravel()[perm[stream == 0]])
        try:
            payload = runtime.interp_seal(c, stream, unpred, cap)
        except RuntimeError as e:
            if "buffer too small" not in str(e):
                raise
            # dispatcher semantics: downgrade this field to lossless
            from . import compress
            out.append(compress(stack[i], base.copy(), backend="jax"))
            continue
        out.append(hdr.pack(SZ3_MAGIC_NUMBER, ver, len(payload)) + payload + c.save())
    return out


def _grid_from_flat(flat: np.ndarray, plan, b0) -> np.ndarray:
    from .ops.interp_fast import _split_flat, bins_to_grid

    return bins_to_grid(_split_flat(flat, plan), plan,
                        b0 if plan.anchor_stride == 0 else None)


def decompress_batch(blobs: List[bytes], dtype=None) -> np.ndarray:
    """Decompress a list of same-shape archives into a [B, *dims] stack.

    dtype=None defers to the dataType each archive recorded (compress_batch
    always records it)."""
    from . import decompress

    outs = [decompress(blob, dtype=dtype)[0] for blob in blobs]
    return np.stack(outs)
