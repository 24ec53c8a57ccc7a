"""Wavefront device decode for ALGO_LORENZO_REG (the default device route
for f32 3D archives): byte parity with the host engine and with
reference-binary golden archives.

The sweep (sz3_tpu/ops/blockwise_wavefront.py) reconstructs the blockwise
format's element grid as one lax.scan over global anti-diagonal planes of a
skewed slab — the element stencil (reference LorenzoPredictor.hpp) only ever
reads strictly-negative offsets, so every plane is data-parallel — while the
sequential regression coefficient chain (RegressionPredictor.hpp:157-164)
replays in the native engine. Every test asserts byte-identity, not
tolerance. Unlike the lax.scan formulation (test_blockwise_device.py, slow
tier), these run in seconds: one device step per anti-diagonal instead of
one per block."""

import hashlib

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config

from conftest import GOLDEN, synth_input


def _field(shape, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal(shape).astype(np.float32)
    return (np.cumsum(f, axis=0) * 0.1 + np.cumsum(f, axis=-1) * 0.05
            ).astype(np.float32)


ROSTERS = {
    "default": (True, False, True),
    "lorenzo_only": (True, False, False),
    "lorenzo2_reg": (False, True, True),
    "reg_only": (False, False, True),
    "all_three": (True, True, True),
    "lorenzo2_only": (False, True, False),
}

SHAPES = [(18, 18, 18), (20, 19, 17), (11, 25, 9), (33, 6, 47)]


def _wavefront_decode(conf, payload):
    from sz3_tpu.algos.jax_backend import _blockwise_decode_wavefront
    return _blockwise_decode_wavefront(conf, payload)


@pytest.mark.parametrize("roster", ROSTERS, ids=ROSTERS.keys())
@pytest.mark.parametrize("shape", SHAPES, ids=["x".join(map(str, s)) for s in SHAPES])
def test_payload_decode_matches_host(roster, shape):
    """Host-sealed payload replayed by the wavefront is bit-identical to the
    host engine's reconstruction (payload level: no dispatcher downgrades)."""
    l1, l2, reg = ROSTERS[roster]
    seed = (sum(ord(c) for c in roster) * 1000003 + sum(shape)) % 2**31
    data = _field(shape, seed=seed)
    conf = Config(dims=shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    conf.lorenzo, conf.lorenzo2, conf.regression = l1, l2, reg
    cap = 2 * data.nbytes + 4096
    cc = conf.copy()
    payload = runtime.compress_payload(cc, data, cap)
    if cc.cmprAlgo != ALGO.LORENZO_REG:  # tiny/degenerate: lossless downgrade
        pytest.skip("dispatcher downgraded; no blockwise payload")
    host = runtime.decompress_payload(cc.copy(), payload,
                                      dtype=runtime.np_dtype_id(data))
    dev = _wavefront_decode(cc.copy(), payload)
    assert host.reshape(shape).tobytes() == dev.tobytes()


@pytest.mark.parametrize("eb", [1e-1, 1e-2, 1e-4, 1e-6])
def test_decode_matches_across_error_bounds(eb):
    """Fine bounds push cells into literal (unpred) placement; coarse bounds
    exercise saturated bins. Both must replay bit-exactly."""
    data = _field((20, 19, 17), seed=7)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=eb)
    blob = szt.compress(data, conf.copy(), backend="native")
    out_n, _ = szt.decompress(blob)
    out_d, _ = szt.decompress(blob, backend="jax")  # auto -> wavefront
    assert out_n.tobytes() == out_d.tobytes()


def test_default_route_is_wavefront(monkeypatch):
    """backend='jax' with SZT_DEVICE_BLOCKWISE unset routes LORENZO_REG f32
    3D decode through the wavefront (asserted by poisoning the scan path)."""
    data = _field((20, 19, 17), seed=3)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    blob = szt.compress(data, conf.copy(), backend="native")
    monkeypatch.delenv("SZT_DEVICE_BLOCKWISE", raising=False)
    called = {}
    import sz3_tpu.ops.blockwise_wavefront as wf
    orig = wf.decode_blocks_wavefront

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(wf, "decode_blocks_wavefront", spy)
    out_n, _ = szt.decompress(blob)
    out_d, _ = szt.decompress(blob, backend="jax")
    assert called.get("hit")
    assert out_n.tobytes() == out_d.tobytes()


def test_mode_zero_disables_device_route(monkeypatch):
    data = _field((12, 11, 10), seed=9)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    blob = szt.compress(data, conf.copy(), backend="native")
    monkeypatch.setenv("SZT_DEVICE_BLOCKWISE", "0")
    import sz3_tpu.ops.blockwise_wavefront as wf

    def boom(*a, **k):  # pragma: no cover - must not run
        raise AssertionError("device route taken under SZT_DEVICE_BLOCKWISE=0")

    monkeypatch.setattr(wf, "decode_blocks_wavefront", boom)
    out_n, _ = szt.decompress(blob)
    out_d, _ = szt.decompress(blob, backend="jax")
    assert out_n.tobytes() == out_d.tobytes()


@pytest.mark.parametrize("name", ["f32_3d_lorenzo_reg", "f32_3d_lorenzo_only",
                                  "f32_3d_lorenzo2"])
def test_golden_decode_via_wavefront(name, golden_manifest):
    """Reference-binary archives decoded by the wavefront reproduce the
    reference binary's decompressed bytes exactly (default device route)."""
    case = next(c for c in golden_manifest if c["name"] == name)
    ref = (GOLDEN / f"{name}.sz").read_bytes()
    out, _ = szt.decompress(ref, backend="jax", dtype=np.float32)
    assert hashlib.sha256(out.tobytes()).hexdigest() == case["out_sha"]


def test_constant_field():
    """Every bin hits the predictor exactly: no literals anywhere."""
    data = np.full((13, 12, 11), 2.5, np.float32)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    blob = szt.compress(data, conf.copy(), backend="native")
    out_n, _ = szt.decompress(blob)
    out_d, _ = szt.decompress(blob, backend="jax")
    assert out_n.tobytes() == out_d.tobytes()


def test_larger_grid_multiblock():
    """A grid spanning many 6^3 blocks in every axis (pad reads cross block
    boundaries on all faces)."""
    data = _field((40, 37, 29), seed=21)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG, absErrorBound=1e-3)
    blob = szt.compress(data, conf.copy(), backend="native")
    out_n, _ = szt.decompress(blob)
    out_d, _ = szt.decompress(blob, backend="jax")
    assert out_n.tobytes() == out_d.tobytes()
