"""Multi-chip data-parallel compression over a jax.sharding.Mesh.

This is the TPU-native analog of the reference's OpenMP mode
(api/impl/SZImplOMP.hpp): dim0 is chunked across devices, each chunk is an
independent SZ3 stream, and the archive carries per-chunk configs + sizes.
Cross-device communication is exactly what the reference's shared-memory path
needs (SZImplOMP.hpp:57-68): a global min/max all-reduce for range-relative
error bounds — expressed as pmin/pmax collectives inside shard_map so XLA
routes them over ICI. Per-chunk quantization runs fully sharded; the
variable-length entropy stage and the ordered stream gather happen on host
(mirroring cmp_start_t, SZImplOMP.hpp:93-107).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EB
from ..ops.interp_fast import build_fast_plan, encode_grid_fast

jax.config.update("jax_enable_x64", True)

AXIS = "chunks"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def make_sharded_encode_step(mesh: Mesh, chunk_dims: Tuple[int, ...], dtype, *,
                             interp_algo: int, direction: int, anchor_stride: int,
                             alpha: float, beta: float, quantbin_cnt: int,
                             eb_mode: EB, eb_value: float,
                             eb_abs: Optional[float] = None,
                             eb_rel: Optional[float] = None):
    """Build the jitted multi-chip encode step.

    Input: the full array sharded on dim0 over `mesh` (every chunk the same
    shape). Output: per-chunk flat bins (still sharded), the per-chunk
    first-point bin, and the resolved ABS error bound (replicated).
    """
    plan = build_fast_plan(chunk_dims, interp_algo=interp_algo, direction=direction,
                           anchor_stride=anchor_stride, alpha=alpha, beta=beta,
                           eb=eb_value, quantbin_cnt=quantbin_cnt)
    n_passes = len(plan.passes)

    def local_encode(x_chunk):
        x_chunk = x_chunk.reshape(chunk_dims)
        if eb_mode == EB.ABS:
            eb = jnp.float64(eb_value)
        else:
            # global range all-reduce over ICI (reference SZImplOMP.hpp:57-68)
            gmax = jax.lax.pmax(jnp.max(x_chunk), AXIS)
            gmin = jax.lax.pmin(jnp.min(x_chunk), AXIS)
            rng = (gmax - gmin).astype(jnp.float64)
            if eb_mode == EB.REL:
                eb = eb_value * rng
            elif eb_mode in (EB.ABS_AND_REL, EB.ABS_OR_REL):
                # combined modes take two distinct bounds
                # (reference Statistic.hpp:48-55)
                a = eb_abs if eb_abs is not None else eb_value
                r = eb_rel if eb_rel is not None else eb_value
                pick = jnp.minimum if eb_mode == EB.ABS_AND_REL else jnp.maximum
                eb = pick(jnp.float64(a), r * rng)
            else:
                raise ValueError(f"unsupported sharded eb mode {eb_mode}")
        bins_list, b0, _recon = encode_grid_fast(x_chunk, plan, eb=eb)
        flat = jnp.concatenate([b.ravel() for b in bins_list]) if bins_list else \
            jnp.zeros((0,), jnp.int32)
        b0 = b0 if b0 is not None else jnp.int32(0)
        return flat[None], b0[None], eb

    shard_fn = jax.shard_map(
        local_encode, mesh=mesh,
        in_specs=P(AXIS),
        out_specs=(P(AXIS), P(AXIS), P()),
    )

    @jax.jit
    def step(x2d):
        # x2d: (n_chunks * chunk_dims[0], prod(chunk_dims[1:])) row-sharded
        return shard_fn(x2d)

    return plan, step


def chunk_bounds(dim0: int, n: int):
    """The reference's dim0 split (SZImplOMP.hpp:48-50): floor splits, so
    chunk heights differ by at most one — ragged dim0 is the NORM (Hurricane
    dim0=100 on 8 chips -> heights 12/13)."""
    return [(t * dim0 // n, (t + 1) * dim0 // n) for t in range(n)]


def _put_chunk_rows(data2d: np.ndarray, mesh: Mesh, starts, h: int):
    """Global (n*h, cols) array whose device-t shard holds rows
    [starts[t], starts[t]+h) of data2d (clamped, pad row repeated). Explicit
    per-device placement because ragged chunk offsets aren't an equal split."""
    sharding = NamedSharding(mesh, P(AXIS))
    shards = []
    for t, dev in enumerate(mesh.devices.ravel()):
        lo = starts[t]
        hi = min(lo + h, data2d.shape[0])
        block = data2d[lo:hi]
        if block.shape[0] < h:
            pad = np.repeat(block[-1:], h - block.shape[0], axis=0)
            block = np.concatenate([block, pad], axis=0)
        shards.append(jax.device_put(block, dev))
    return jax.make_array_from_single_device_arrays(
        (len(shards) * h, data2d.shape[1]), sharding, shards)


@lru_cache(maxsize=32)
def _decode_step(mesh_key, chunk_dims, interp_algo, direction, anchor_stride,
                 alpha, beta, eb, quantbin_cnt, dtype_name):
    """Jitted multi-chip decode step (the inverse of the encode step): each
    device rebuilds its chunk with the decimation-pyramid level passes.
    Mirrors the reference's parallel per-chunk decompression into offsets
    (SZImplOMP.hpp:157-182)."""
    mesh = _MESHES[mesh_key]
    plan = build_fast_plan(chunk_dims, interp_algo=interp_algo,
                           direction=direction, anchor_stride=anchor_stride,
                           alpha=alpha, beta=beta, eb=eb,
                           quantbin_cnt=quantbin_cnt)
    from ..ops.interp_fast import decode_grid_fast
    dtype = jnp.dtype(dtype_name)
    sizes, shapes = [], []
    for spec in plan.passes:
        counts = list(spec.shape_in)
        counts[spec.dd] = spec.p
        shapes.append(tuple(counts))
        sizes.append(int(np.prod(counts)))
    lit0_shape = tuple((d - 1) // s + 1 for d, s in
                       zip(chunk_dims, plan.init_steps))

    def local_decode(bins_flat, lit_flat, lit0, b0):
        bins_flat = bins_flat.reshape(-1)
        lit_flat = lit_flat.reshape(-1)
        bins_list, lit_list = [], []
        off = 0
        for sz, shp in zip(sizes, shapes):
            bins_list.append(jax.lax.slice(bins_flat, (off,), (off + sz,)).reshape(shp))
            lit_list.append(jax.lax.slice(lit_flat, (off,), (off + sz,)).reshape(shp))
            off += sz
        out = decode_grid_fast(bins_list, lit_list, plan,
                               lit0.reshape(lit0_shape), b0[0, 0], dtype)
        return out.reshape(1, -1)

    shard_fn = jax.shard_map(local_decode, mesh=mesh,
                             in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                             out_specs=P(AXIS))
    return plan, jax.jit(shard_fn)


_MESHES = {}


def _mesh_key(mesh: Mesh):
    key = tuple(str(d) for d in mesh.devices.ravel())
    _MESHES[key] = mesh
    return key


def sharded_encode_payload(conf, data: np.ndarray, mesh: Mesh) -> bytes:
    """Full OpenMP-format archive payload with the per-chunk prediction+
    quantization running data-parallel over the mesh (ragged dim0 supported:
    the two chunk heights run as two uniform shard_map passes and each chunk
    keeps the pass matching its height). Byte-identical to the native
    engine's chunked payload for explicit-INTERP configs (asserted in
    tests/test_parallel.py)."""
    import struct

    from .. import runtime
    from ..api import zstd_compress_bound
    from ..config import ALGO
    from ..stats import cal_abs_error_bound

    conf.set_dims(data.shape)
    data = data.reshape(conf.dims)
    n = int(mesh.devices.size)
    if conf.dims[0] < n:
        raise ValueError("fewer dim0 rows than devices")
    if conf.cmprAlgo not in (ALGO.INTERP,):
        raise ValueError("sharded payload path supports explicit ALGO_INTERP "
                         "(the INTERP_LORENZO tuner is a host-side per-chunk "
                         "decision; use the chunked host path)")
    if conf.interpAnchorStride < 0:
        conf.interpAnchorStride = [4096, 128, 32, 16][conf.N - 1]
    if conf.errorBoundMode != EB.ABS:
        rng = float(data.max() - data.min())
        cal_abs_error_bound(conf, data, rng)

    bounds = chunk_bounds(conf.dims[0], n)
    rest = tuple(conf.dims[1:])
    cols = int(np.prod(rest)) if rest else 1
    data2d = data.reshape(conf.dims[0], cols)
    heights = sorted({hi - lo for lo, hi in bounds})
    starts = [lo for lo, _ in bounds]

    per_chunk = [None] * n
    for h in heights:
        chunk_dims = (h,) + rest
        plan, step = make_sharded_encode_step(
            mesh, chunk_dims, data.dtype, interp_algo=int(conf.interpAlgo),
            direction=conf.interpDirection,
            anchor_stride=conf.interpAnchorStride, alpha=conf.interpAlpha,
            beta=conf.interpBeta, quantbin_cnt=conf.quantbinCnt,
            eb_mode=EB.ABS, eb_value=conf.absErrorBound)
        xs = _put_chunk_rows(data2d, mesh, starts, h)
        flat, b0, _ = step(xs)
        flat = np.asarray(flat)
        b0 = np.asarray(b0)
        for t, (lo, hi) in enumerate(bounds):
            if hi - lo == h:
                per_chunk[t] = (plan, flat[t], b0[t])

    from concurrent.futures import ThreadPoolExecutor

    from ..ops.interp_fast import _split_flat, bins_to_grid

    confs = [None] * n
    perm_cache = {}

    def seal(t):
        lo, hi = bounds[t]
        plan, flat, b0 = per_chunk[t]
        c = conf.copy()
        c.set_dims((hi - lo,) + rest)
        bins = bins_to_grid(_split_flat(flat, plan), plan,
                            b0 if plan.anchor_stride == 0 else None)
        key = tuple(c.dims)
        if key not in perm_cache:
            cc = c.copy()
            cc.openmp = False
            perm_cache[key] = runtime.interp_order(cc)
        perm = perm_cache[key]
        chunk = np.ascontiguousarray(data[lo:hi])
        stream, unpred = runtime.perm_emit(perm, bins.ravel(), chunk.ravel())
        cap = zstd_compress_bound(chunk.nbytes) + 4096
        work = c.copy()
        work.openmp = False
        try:
            payload = runtime.interp_seal(work, stream, unpred, cap)
        except RuntimeError as e:
            if "buffer too small" not in str(e):
                raise
            work.cmprAlgo = ALGO.LOSSLESS
            payload = runtime.zstd_compress(chunk.tobytes())
        if work.cmprAlgo != ALGO.LOSSLESS and chunk.nbytes / len(payload) < 3:
            z = runtime.zstd_compress(chunk.tobytes())
            if len(z) < len(payload) and len(z) <= cap:
                work.cmprAlgo = ALGO.LOSSLESS
                payload = z
        work.openmp = c.openmp
        confs[t] = work
        return payload

    # interp_order per distinct height first (thread-unsafe cache fill)
    for t in range(n):
        key = tuple((bounds[t][1] - bounds[t][0],) + rest)
        if key not in perm_cache:
            cc = conf.copy()
            cc.set_dims(key)
            cc.openmp = False
            perm_cache[key] = runtime.interp_order(cc)
    with ThreadPoolExecutor(max_workers=min(8, n)) as ex:
        streams = list(ex.map(seal, range(n)))

    out = bytearray()
    out += struct.pack("<i", n)
    for c in confs:
        out += c.save()
    for s_ in streams:
        out += struct.pack("<Q", len(s_))
    for s_ in streams:
        out += s_
    return bytes(out)


def sharded_decode_payload(conf, payload: bytes, mesh: Mesh, dtype) -> np.ndarray:
    """Decode an OpenMP-format payload with the per-chunk reconstruction
    running data-parallel over the mesh (reference SZImplOMP.hpp:157-182).
    Host does the per-chunk entropy decode + stream placement; every level
    pass of every chunk runs on its device. Ragged dim0 = two uniform passes."""
    import struct

    from concurrent.futures import ThreadPoolExecutor

    from .. import runtime
    from ..config import ALGO, Config
    from ..ops.interp_fast import grid_to_pass_slices, initial_literal

    n = struct.unpack_from("<i", payload, 0)[0]
    pos = 4
    confs = []
    for _ in range(n):
        c, used = Config.load(payload, pos)
        confs.append(c)
        pos += used
    sizes = list(struct.unpack_from(f"<{n}Q", payload, pos))
    pos += 8 * n
    offsets = [pos]
    for sz_t in sizes:
        offsets.append(offsets[-1] + sz_t)
    bounds = chunk_bounds(conf.dims[0], n)
    rest = tuple(conf.dims[1:])
    out = np.empty(conf.dims, dtype=dtype)

    placed = [None] * n

    def host_open(t):
        c = confs[t]
        c.openmp = False
        blob = payload[offsets[t]:offsets[t] + sizes[t]]
        if c.cmprAlgo not in (ALGO.LOSSLESS, ALGO.INTERP):
            raise ValueError(
                f"unsupported chunk algorithm {c.cmprAlgo!r} for mesh decode "
                "(chunked archives with non-INTERP per-chunk streams must go "
                "through the host engine)")
        if c.cmprAlgo == ALGO.LOSSLESS:
            raw = runtime.zstd_decompress(blob)
            lo, hi = bounds[t]
            out[lo:hi] = np.frombuffer(raw, dtype=dtype).reshape(
                (hi - lo,) + rest)
            return
        stream, unpred = runtime.interp_open(c, blob, dtype)
        perm = runtime.interp_order(c)
        bins_grid, literal = runtime.perm_place(perm, stream, unpred,
                                                tuple(c.dims), dtype)
        placed[t] = (c, bins_grid, literal)

    # fill the interp_order cache height-by-height is handled inside
    for t in range(n):
        host_open(t)

    dev_list = list(mesh.devices.ravel())
    sharding = NamedSharding(mesh, P(AXIS))
    mesh_key = _mesh_key(mesh)
    heights = sorted({hi - lo for lo, hi in bounds})
    for h in heights:
        idxs = [t for t in range(n) if placed[t] is not None and
                bounds[t][1] - bounds[t][0] == h]
        if not idxs:
            continue
        c0 = placed[idxs[0]][0]
        chunk_dims = (h,) + rest
        plan, step = _decode_step(
            mesh_key, chunk_dims, int(c0.interpAlgo), c0.interpDirection,
            c0.interpAnchorStride, c0.interpAlpha, c0.interpBeta,
            c0.absErrorBound, c0.quantbinCnt, str(np.dtype(dtype)))

        def flat_inputs(t):
            c, bg, lit = placed[t]
            bins_flat = np.concatenate(
                [b.ravel() for b in grid_to_pass_slices(bg, plan)]) \
                if plan.passes else np.zeros(0, np.int32)
            lit_flat = np.concatenate(
                [l.ravel() for l in grid_to_pass_slices(
                    lit.astype(dtype), plan)]) \
                if plan.passes else np.zeros(0, dtype)
            lit0 = np.ascontiguousarray(initial_literal(lit.astype(dtype), plan))
            b0 = np.int32(bg.ravel()[0])
            return bins_flat, lit_flat, lit0.ravel(), np.asarray([b0])

        # every device needs a shard; devices whose chunk has another height
        # decode a donor chunk (results discarded)
        donor = idxs[0]
        rows = [flat_inputs(t if (placed[t] is not None and
                                  bounds[t][1] - bounds[t][0] == h) else donor)
                for t in range(n)]
        gathered = []
        for part in range(4):
            shards = [jax.device_put(rows[t][part][None], dev_list[t])
                      for t in range(n)]
            gathered.append(jax.make_array_from_single_device_arrays(
                (n,) + rows[0][part].shape, sharding, shards))
        res = np.asarray(step(*gathered))
        for t in idxs:
            lo, hi = bounds[t]
            out[lo:hi] = res[t].reshape((hi - lo,) + rest)
    return out


def sharded_encode(data: np.ndarray, mesh: Mesh, *, interp_algo: int, direction: int,
                   anchor_stride: int, alpha: float, beta: float, quantbin_cnt: int,
                   eb_mode: EB, eb_value: float, eb_abs: Optional[float] = None,
                   eb_rel: Optional[float] = None):
    """Run the multi-chip encode on equally-chunked data (dim0 divisible by
    mesh size). Returns (plan, per-chunk bins [n, num_chunk], per-chunk b0,
    resolved abs eb)."""
    n = mesh.devices.size
    if data.shape[0] % n != 0:
        raise ValueError(f"dim0 {data.shape[0]} not divisible by mesh size {n}")
    chunk_dims = (data.shape[0] // n,) + data.shape[1:]
    plan, step = make_sharded_encode_step(
        mesh, chunk_dims, data.dtype, interp_algo=interp_algo, direction=direction,
        anchor_stride=anchor_stride, alpha=alpha, beta=beta, quantbin_cnt=quantbin_cnt,
        eb_mode=eb_mode, eb_value=eb_value, eb_abs=eb_abs, eb_rel=eb_rel)
    x2d = data.reshape(data.shape[0], -1)
    sharding = NamedSharding(mesh, P(AXIS))
    xs = jax.device_put(x2d, sharding)
    flat, b0, eb = step(xs)
    return plan, np.asarray(flat), np.asarray(b0), float(np.asarray(eb))
