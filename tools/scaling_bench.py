"""Scaling measurements for the data-parallel (OpenMP-analog) paths.

Two measurements, honestly labeled:

1. Virtual-mesh device-count scaling (1..8 XLA host devices): wall time of
   the sharded encode step and per-chunk device times. NOTE: all virtual
   devices share this host's single physical core, so wall time cannot drop
   with n — the measurement validates that per-chunk WORK stays flat (the
   parallel efficiency argument: chunks are independent; the only
   cross-device op is a scalar min/max all-reduce) and prices the
   orchestration overhead.

2. Real-chip throughput vs chunk size on the attached TPU: per-chunk device
   pipeline time for the chunk shapes an n-way split of a 256^3 field would
   produce. Since chunks are independent streams, n chips each processing a
   1/n chunk at the measured rate IS the scaling model (the all-reduce adds
   one ~us-scale scalar collective per field).

Usage: python tools/scaling_bench.py [--json out.json]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import numpy as np


def virtual_mesh_scaling():
    import jax
    from jax.sharding import Mesh
    from sz3_tpu.config import EB
    from sz3_tpu.parallel.sharded import make_sharded_encode_step, _put_chunk_rows

    devs = jax.devices("cpu")
    results = []
    rng = np.random.default_rng(0)
    full = np.cumsum(rng.standard_normal((64, 64, 64)).astype(np.float32),
                     axis=-1) * 0.1
    data2d = full.reshape(64, -1)
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devs[:n]), ("chunks",))
        h = 64 // n
        plan, step = make_sharded_encode_step(
            mesh, (h, 64, 64), np.float32, interp_algo=1, direction=0,
            anchor_stride=32, alpha=1.25, beta=2.0, quantbin_cnt=65536,
            eb_mode=EB.REL, eb_value=1e-3)
        starts = [t * h for t in range(n)]
        xs = _put_chunk_rows(data2d, mesh, starts, h)
        r = step(xs)
        jax.block_until_ready(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(step(xs))
            ts.append(time.perf_counter() - t0)
        wall = min(ts)
        results.append({"n_devices": n, "chunk_rows": h,
                        "wall_ms": round(wall * 1e3, 2),
                        "wall_x_n_ms": round(wall * n * 1e3, 2)})
        print(f"virtual mesh n={n}: wall {wall*1e3:7.2f} ms  "
              f"(wall*n = {wall*n*1e3:7.2f} ms of single-core work)")
    return results


def real_chip_chunk_model():
    import jax
    import jax.numpy as jnp
    from sz3_tpu.ops.interp_fast import build_fast_plan, encode_grid_fast

    if jax.default_backend() != "tpu":
        print("real-chip model skipped: no TPU")
        return []
    rng = np.random.default_rng(0)
    results = []
    K = 10
    base = int(os.environ.get("SZT_SCALE_BASE", "256"))
    for n in (1, 2, 4, 8):
        shape = (base // n, base, base)
        plan = build_fast_plan(shape, interp_algo=1, direction=0,
                               anchor_stride=32, alpha=1.25, beta=2.0,
                               eb=1e-3, quantbin_cnt=65536)
        x = jnp.asarray(np.cumsum(rng.standard_normal(shape).astype(np.float32),
                                  axis=-1) * 0.1)

        @jax.jit
        def run_k(x):
            def body(i, acc):
                bins, b0, recon = encode_grid_fast(x + acc * 1e-20, plan)
                s = sum(jnp.sum(b, dtype=jnp.int32) for b in bins).astype(jnp.float32)
                return acc + s + jnp.sum(recon)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        float(np.asarray(run_k(x)))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(run_k(x)))
            ts.append(time.perf_counter() - t0)
        per_chunk = min(ts) / K
        nbytes = np.prod(shape) * 4
        eff = (nbytes / per_chunk) / 1e9
        results.append({"base": base, "n_way_split": n,
                        "chunk_shape": list(shape),
                        "chunk_ms": round(per_chunk * 1e3, 2),
                        "chunk_gbs": round(eff, 2),
                        "modeled_total_gbs": round(eff * n, 2)})
        print(f"{base}^3 split {n}-way: chunk {per_chunk*1e3:6.2f} ms "
              f"({eff:5.2f} GB/s/chip) -> modeled {n}-chip {eff*n:6.2f} GB/s")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    out = {"virtual_mesh": virtual_mesh_scaling(),
           "real_chip_chunks": real_chip_chunk_model()}
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))
        print("wrote", args.json)
