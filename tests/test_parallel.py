"""Multi-chip parallel layer tests on the virtual 8-device CPU mesh
(conftest forces --xla_force_host_platform_device_count=8).

Validates the TPU analog of the reference's OpenMP mode (SZImplOMP.hpp):
per-chunk independent streams, global-range collectives for REL-style
bounds, OMP-format archive assembly, and cross-engine compatibility.
"""

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.config import ALGO, Config, EB


def field(shape, seed=3):
    rng = np.random.default_rng(seed)
    return np.ascontiguousarray(
        np.cumsum(rng.standard_normal(shape), axis=-1) * 0.1, dtype=np.float32)


@pytest.fixture(scope="module")
def mesh():
    import jax
    from sz3_tpu.parallel.sharded import make_mesh
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(devs[:8])


class TestShardedEncode:
    def test_chunks_match_single_device(self, mesh):
        """Per-chunk bins from the mesh equal a single-device encode of each
        chunk — sharding is purely an execution layout."""
        from sz3_tpu.ops.interp_fast import build_fast_plan, encode_grid_fast
        from sz3_tpu.parallel.sharded import sharded_encode
        import jax.numpy as jnp

        data = field((16, 8, 8))  # small dims = few levels = fast mesh compile
        plan, bins, b0, eb = sharded_encode(
            data, mesh, interp_algo=1, direction=0, anchor_stride=32, alpha=1.25,
            beta=2.0, quantbin_cnt=65536, eb_mode=EB.ABS, eb_value=1e-3)
        assert bins.shape[0] == 8
        chunk = data[:2]
        p1 = build_fast_plan(chunk.shape, interp_algo=1, direction=0, anchor_stride=32,
                             alpha=1.25, beta=2.0, eb=1e-3, quantbin_cnt=65536)
        ref_bins, ref_b0, _ = encode_grid_fast(jnp.asarray(chunk), p1)
        ref_flat = np.concatenate([np.asarray(b).ravel() for b in ref_bins])
        assert np.array_equal(bins[0], ref_flat)
        assert int(b0[0]) == int(np.asarray(ref_b0))

    def test_rel_mode_uses_global_range(self, mesh):
        """REL bound must derive from the GLOBAL range (pmax/pmin collective),
        not each chunk's local range (reference SZImplOMP.hpp:57-68)."""
        from sz3_tpu.parallel.sharded import sharded_encode

        data = field((16, 8, 8))
        data[0, 0, 0] = 50.0  # global max lives in chunk 0 only
        plan, bins, b0, eb = sharded_encode(
            data, mesh, interp_algo=1, direction=0, anchor_stride=32, alpha=1.25,
            beta=2.0, quantbin_cnt=65536, eb_mode=EB.REL, eb_value=1e-3)
        expected = 1e-3 * (data.max() - data.min())
        assert eb == pytest.approx(float(np.float32(data.max()) - np.float32(data.min())) * 1e-3,
                                   rel=1e-6)
        assert eb == pytest.approx(expected, rel=1e-3)


class TestChunkedArchive:
    def test_jax_chunked_matches_native_omp(self):
        """The jax chunked path writes the reference OpenMP wire format:
        byte-identical to the native chunked engine."""
        data = field((64, 24, 24))
        c1 = Config(dims=data.shape, absErrorBound=1e-3, openmp=True)
        native = szt.compress(data, c1, nthreads=4, set_datatype=False)
        c2 = Config(dims=data.shape, absErrorBound=1e-3, openmp=True)
        jaxb = szt.compress(data, c2, backend="jax", nthreads=4, set_datatype=False)
        assert native == jaxb

    def test_chunked_cross_decode(self):
        data = field((40, 20, 20))
        conf = Config(dims=data.shape, absErrorBound=1e-3, openmp=True)
        blob = szt.compress(data, conf, nthreads=4)
        for backend in ("native", "jax"):
            out, _ = szt.decompress(blob, backend=backend)
            assert np.abs(out - data).max() <= 1e-3

    def test_graft_entry_dryrun(self):
        """The driver's multi-chip dry run must pass on the virtual mesh."""
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestShardedPayload:
    """Full mesh encode->archive->decode with ragged dim0 (VERDICT r1 item 2):
    the device path must accept dim0 % n != 0 (reference SZImplOMP.hpp:48-50
    splits unevenly) and its archives/reconstructions must be byte-identical
    to the native chunked engine's."""

    def test_ragged_rel_payload_parity_and_mesh_decode(self, mesh):
        from sz3_tpu import runtime
        from sz3_tpu.config import ALGO
        from sz3_tpu.parallel.sharded import (sharded_decode_payload,
                                              sharded_encode_payload)

        data = field((52, 12, 10))  # 52 rows / 8 devices -> heights 6 and 7
        conf = Config(dims=data.shape, cmprAlgo=ALGO.INTERP,
                      errorBoundMode=EB.REL, relErrorBound=1e-3, openmp=True)
        payload = sharded_encode_payload(conf, data, mesh)

        conf_n = Config(dims=data.shape, cmprAlgo=ALGO.INTERP,
                        errorBoundMode=EB.REL, relErrorBound=1e-3, openmp=True)
        native = runtime.compress_payload(conf_n, data, 2 * data.nbytes + 4096,
                                          nthreads=8)
        assert payload == native

        conf_d = Config(dims=data.shape, openmp=True)
        out = sharded_decode_payload(conf_d, payload, mesh, np.float32)
        out_host = runtime.decompress_payload(conf_n, native)
        assert np.array_equal(out, out_host)

    def test_even_abs_payload(self, mesh):
        from sz3_tpu import runtime
        from sz3_tpu.config import ALGO
        from sz3_tpu.parallel.sharded import (sharded_decode_payload,
                                              sharded_encode_payload)

        data = field((16, 10, 12))
        conf = Config(dims=data.shape, cmprAlgo=ALGO.INTERP,
                      absErrorBound=1e-3, openmp=True)
        payload = sharded_encode_payload(conf, data, mesh)
        conf_n = Config(dims=data.shape, cmprAlgo=ALGO.INTERP,
                        absErrorBound=1e-3, openmp=True)
        native = runtime.compress_payload(conf_n, data, 2 * data.nbytes + 4096,
                                          nthreads=8)
        assert payload == native
        conf_d = Config(dims=data.shape, openmp=True)
        out = sharded_decode_payload(conf_d, payload, mesh, np.float32)
        assert np.abs(out - data).max() <= 1e-3 * 1.0000001
