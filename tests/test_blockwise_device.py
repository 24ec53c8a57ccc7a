"""Device (JAX) execution of ALGO_LORENZO_REG: byte parity with the host
engine and with reference-produced golden archives.

The device sweep (sz3_tpu/ops/blockwise_device.py) reproduces the blockwise
format's sequential semantics — predictor selection by sampled f64 error
(reference ComposedPredictor.hpp estimate_error voting), the global row-major
regression-coefficient chain (RegressionPredictor.hpp precompress_block /
save state), per-element predict+quantize against reconstructed neighbors
(LorenzoPredictor.hpp stencils) — as a lax.scan; runtime.blockwise_seal then
wraps the device streams into the payload with the native entropy/zstd stage.
Every test asserts byte-identity, not tolerance."""

import hashlib

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config
from sz3_tpu.ops.blockwise_device import encode_blocks

from conftest import GOLDEN, synth_input

# the sequential lax.scan formulation runs in XLA:CPU interpreter-speed on
# this host (~10 min for the module) — slow tier; the wavefront path's tests
# (test_blockwise_wavefront.py) cover the default device route quickly
pytestmark = pytest.mark.slow


def _field(shape, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal(shape).astype(np.float32)
    return (np.cumsum(f, axis=0) * 0.1 + np.cumsum(f, axis=-1) * 0.05
            ).astype(np.float32)


def _device_payload(conf, data, cap):
    bins, sel, regb, qlu, qiu, unp = encode_blocks(
        data, conf.absErrorBound, conf.quantbinCnt // 2,
        conf.lorenzo, conf.lorenzo2, conf.regression)
    return runtime.blockwise_seal(conf, bins, sel, regb, qlu, qiu, unp, cap)


ROSTERS = {
    "default": (True, False, True),
    "lorenzo_only": (True, False, False),
    "lorenzo2_reg": (False, True, True),
    "reg_only": (False, False, True),
    "all_three": (True, True, True),
    "lorenzo2_only": (False, True, False),
}

SHAPES = [(18, 18, 18), (20, 19, 17), (7, 13, 5)]


@pytest.mark.parametrize("roster", ROSTERS, ids=ROSTERS.keys())
@pytest.mark.parametrize("shape", SHAPES, ids=["x".join(map(str, s)) for s in SHAPES])
def test_archive_matches_host_engine(roster, shape, monkeypatch):
    """Full archive through both backends. The native path applies the
    dispatcher's zstd-ratio/lossless downgrades; the routed jax path must
    reproduce them bit for bit, payload included."""
    l1, l2, reg = ROSTERS[roster]
    seed = (sum(ord(c) for c in roster) * 1000003 + sum(shape)) % 2**31
    data = _field(shape, seed=seed)
    conf = Config(dims=shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    conf.lorenzo, conf.lorenzo2, conf.regression = l1, l2, reg
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "1")
    host = szt.compress(data, conf.copy(), backend="native")
    dev = szt.compress(data, conf.copy(), backend="jax")
    assert host == dev


@pytest.mark.parametrize("eb", [1e-1, 1e-2, 1e-4])
def test_archive_matches_across_error_bounds(eb, monkeypatch):
    data = _field((20, 19, 17), seed=7)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=eb)
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "1")
    host = szt.compress(data, conf.copy(), backend="native")
    dev = szt.compress(data, conf.copy(), backend="jax")
    assert host == dev


def test_constant_field_all_predicted(monkeypatch):
    """Degenerate input: every bin hits the predictor exactly; empty unpred."""
    data = np.full((13, 12, 11), 2.5, np.float32)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "1")
    host = szt.compress(data, conf.copy(), backend="native")
    dev = szt.compress(data, conf.copy(), backend="jax")
    assert host == dev


def test_raw_payload_parity_when_not_downgraded():
    """Direct seal-level parity (no dispatcher): host sweep payload equals
    device sweep payload byte for byte."""
    data = _field((20, 19, 17), seed=3)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    cap = 2 * data.nbytes + 4096
    host = runtime.compress_payload(conf.copy(), data, cap)
    dev = _device_payload(conf.copy(), data, cap)
    assert host == dev


@pytest.mark.parametrize("name", ["f32_3d_lorenzo_reg", "f32_3d_lorenzo_only",
                                  "f32_3d_lorenzo2"])
def test_golden_archive_via_jax_backend(name, golden_manifest, monkeypatch):
    """Full-archive sha vs the reference binary's output, produced through
    the routed backend path (SZT_DEVICE_BLOCKWISE=1 -> device sweep)."""
    case = next(c for c in golden_manifest if c["name"] == name)
    arr = synth_input(case)
    conf = Config(dims=arr.shape)
    if case["ini"]:
        conf.load_ini(case["ini"])
    conf.absErrorBound = float(case["args"][case["args"].index("-M") + 2])
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "1")
    blob = szt.compress(arr, conf, backend="jax", set_datatype=False)
    assert hashlib.sha256(blob).hexdigest() == case["sz_sha"]
    ref = (GOLDEN / f"{name}.sz").read_bytes()
    assert blob == ref


def test_backend_roundtrip_decode(monkeypatch):
    """Device-encoded archive decodes identically through the native engine
    and the device decode sweep."""
    data = _field((25, 14, 9), seed=11)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "1")
    blob = szt.compress(data, conf.copy(), backend="jax")
    out_n, _ = szt.decompress(blob)
    out_j, _ = szt.decompress(blob, backend="jax")
    assert np.abs(out_n.reshape(data.shape) - data).max() <= 1e-3 * 1.0000001
    assert out_n.tobytes() == out_j.tobytes()


@pytest.mark.parametrize("roster", ROSTERS, ids=ROSTERS.keys())
def test_device_decode_matches_native(roster, monkeypatch):
    """Native-compressed archive replayed by the device decode sweep is
    bit-identical to the native decoder's output."""
    l1, l2, reg = ROSTERS[roster]
    seed = (sum(ord(c) for c in roster) * 31 + 5) % 2**31
    data = _field((20, 19, 17), seed=seed)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    conf.lorenzo, conf.lorenzo2, conf.regression = l1, l2, reg
    blob = szt.compress(data, conf.copy(), backend="native")
    out_n, _ = szt.decompress(blob)
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "1")
    out_d, _ = szt.decompress(blob, backend="jax")
    assert out_n.tobytes() == out_d.tobytes()


@pytest.mark.parametrize("name", ["f32_3d_lorenzo_reg", "f32_3d_lorenzo_only",
                                  "f32_3d_lorenzo2"])
def test_golden_decode_via_device(name, golden_manifest, monkeypatch):
    """Reference-binary archives decoded by the device sweep reproduce the
    reference binary's decompressed bytes exactly."""
    case = next(c for c in golden_manifest if c["name"] == name)
    ref = (GOLDEN / f"{name}.sz").read_bytes()
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "1")
    out, _ = szt.decompress(ref, backend="jax", dtype=np.float32)
    assert hashlib.sha256(out.tobytes()).hexdigest() == case["out_sha"]
