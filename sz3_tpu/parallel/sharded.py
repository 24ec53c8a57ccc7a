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
