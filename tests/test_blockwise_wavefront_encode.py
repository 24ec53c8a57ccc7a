"""Speculative wavefront device ENCODE for ALGO_LORENZO_REG: byte parity
with the host engine at the archive level.

The encode (sz3_tpu/ops/blockwise_wavefront_encode.py) runs least-squares
fits and predictor selection in parallel (selection speculated with original
values standing in for reconstructed pads), replays the regression
coefficient chain natively, sweeps the elements as the skewed anti-diagonal
scan, then CERTIFIES the speculation by recomputing selection from the true
reconstruction — so parity is guaranteed-or-fallback, never silent. Every
test asserts byte identity with the host engine (reference semantics:
BlockwiseDecomposition.hpp:28-47, ComposedPredictor.hpp:25-40,
RegressionPredictor.hpp:148-155)."""

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config
from sz3_tpu.ops.blockwise_device import encode_blocks
from sz3_tpu.ops.blockwise_wavefront_encode import (Fallback,
                                                    encode_blocks_wavefront)


def _field(shape, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal(shape).astype(np.float32)
    return (np.cumsum(f, axis=0) * 0.1 + np.cumsum(f, axis=-1) * 0.05
            ).astype(np.float32)


ROSTERS = {
    "default": (True, False, True),
    "lorenzo_only": (True, False, False),
    "reg_only": (False, False, True),
}

SHAPES = [(18, 18, 18), (20, 19, 17), (11, 25, 9), (33, 6, 47)]

STREAMS = ["bins", "selection", "reg_bins", "ql_unpred", "qi_unpred",
           "unpred"]


@pytest.mark.parametrize("roster", ROSTERS, ids=ROSTERS.keys())
@pytest.mark.parametrize("shape", SHAPES,
                         ids=["x".join(map(str, s)) for s in SHAPES])
def test_streams_match_scan_oracle(roster, shape):
    """Every stream equals the block-sequential lax.scan formulation's
    (itself golden-parity with the host engine, test_blockwise_device)."""
    l1, l2, reg = ROSTERS[roster]
    seed = (sum(ord(c) for c in roster) * 999983 + sum(shape)) % 2**31
    data = _field(shape, seed=seed)
    wf = encode_blocks_wavefront(data, 1e-3, 32768, l1, l2, reg)
    sc = encode_blocks(data, 1e-3, 32768, l1, l2, reg)
    for name, a, b in zip(STREAMS, wf, sc):
        assert np.array_equal(a, b), f"{name} differs ({roster}, {shape})"


@pytest.mark.parametrize("eb", [1e-1, 1e-2, 1e-4, 1e-6])
def test_archive_parity_across_error_bounds(eb):
    """backend='jax' compress (auto -> wavefront encode) produces archives
    byte-identical to the host engine's; fine bounds force literal traffic,
    coarse bounds saturate bins."""
    data = _field((20, 19, 17), seed=7)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=eb)
    bn = szt.compress(data, conf.copy(), backend="native")
    bj = szt.compress(data, conf.copy(), backend="jax")
    assert bn == bj
    out_n, _ = szt.decompress(bn)
    out_j, _ = szt.decompress(bj, backend="jax")
    assert out_n.tobytes() == out_j.tobytes()


def test_default_route_is_wavefront_encode(monkeypatch):
    """backend='jax' with SZT_DEVICE_BLOCKWISE unset routes LORENZO_REG f32
    3D ENCODE through the wavefront (spy on the module entry)."""
    data = _field((20, 19, 17), seed=3)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=1e-3)
    monkeypatch.delenv("SZT_DEVICE_BLOCKWISE", raising=False)
    called = {}
    import sz3_tpu.ops.blockwise_wavefront_encode as wfe
    import sz3_tpu.algos.jax_backend  # noqa: F401 (route imports lazily)
    orig = wfe.encode_blocks_wavefront

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(wfe, "encode_blocks_wavefront", spy)
    bn = szt.compress(data, conf.copy(), backend="native")
    bj = szt.compress(data, conf.copy(), backend="jax")
    assert called.get("hit")
    assert bn == bj


def test_lorenzo2_roster_falls_back_to_host():
    """Rosters containing Lorenzo-2 raise Fallback at the module level and
    the jax backend still produces a host-identical archive."""
    data = _field((18, 18, 18), seed=5)
    with pytest.raises(Fallback):
        encode_blocks_wavefront(data, 1e-3, 32768, True, True, True)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=1e-3)
    conf.lorenzo2 = True
    bn = szt.compress(data, conf.copy(), backend="native")
    bj = szt.compress(data, conf.copy(), backend="jax")
    assert bn == bj


def test_constant_field_and_thin_blocks():
    """Constant data (no literals) on a shape with single-cell tail blocks
    (13 = 2*6+1: regression-invalid tails select the Lorenzo fallback)."""
    data = np.full((13, 12, 7), 2.5, np.float32)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=1e-3)
    bn = szt.compress(data, conf.copy(), backend="native")
    bj = szt.compress(data, conf.copy(), backend="jax")
    assert bn == bj


def test_speculation_flip_reconverges():
    """A field engineered so recon-vs-orig pads sit near selection margins:
    smooth base + per-block alternating structure at ~eb scale. Whatever the
    speculation does, the archive must equal the host's (certification or
    fallback — never silent divergence)."""
    rng = np.random.default_rng(11)
    base = _field((24, 24, 24), seed=11)
    jitter = (rng.integers(0, 3, base.shape) - 1).astype(np.float32) * 9e-4
    data = (base + jitter).astype(np.float32)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=1e-3)
    bn = szt.compress(data, conf.copy(), backend="native")
    bj = szt.compress(data, conf.copy(), backend="jax")
    assert bn == bj


def test_device_entropy_blockwise_engages(monkeypatch):
    """With the device-entropy route forced, the LORENZO_REG encode runs
    fully on-device (wavefront bins -> on-chip Huffman pack -> packed seal)
    with ZERO fallbacks and archive byte parity (incl. ragged tails)."""
    from sz3_tpu.algos import device_encode
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    data = _field((20, 19, 23), seed=13)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=1e-3)
    before = dict(device_encode.fallback_counts)
    called = {}
    orig = device_encode.encode_payload_device_blockwise

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(device_encode, "encode_payload_device_blockwise",
                        spy)
    bj = szt.compress(data, conf.copy(), backend="jax", set_datatype=False)
    assert called.get("hit"), "device blockwise entropy was never attempted"
    new = {k: v - before.get(k, 0)
           for k, v in device_encode.fallback_counts.items()
           if v != before.get(k, 0)}
    assert not new, f"device blockwise route fell back: {new}"
    bn = szt.compress(data, conf.copy(), backend="native",
                      set_datatype=False)
    assert bj == bn


def test_device_entropy_blockwise_decode_engages(monkeypatch):
    """Forced device-entropy route: the LORENZO_REG DECODE runs fully
    on-chip (bit-walk, literal placement, class-split layout, shear skew,
    wavefront) with zero fallbacks and byte parity."""
    from sz3_tpu.algos import device_decode, device_encode
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    data = _field((20, 19, 23), seed=17)
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=1e-3)
    bn = szt.compress(data, conf.copy(), backend="native",
                      set_datatype=False)
    before = dict(device_encode.fallback_counts)
    called = {}
    orig = device_decode.decode_payload_device_blockwise

    def spy(*a, **k):
        called["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(device_decode, "decode_payload_device_blockwise",
                        spy)
    oj, _ = szt.decompress(bn, backend="jax", dtype=np.float32)
    assert called.get("hit"), "device blockwise decode never attempted"
    new = {k: v - before.get(k, 0)
           for k, v in device_encode.fallback_counts.items()
           if v != before.get(k, 0)}
    assert not new, f"device blockwise decode fell back: {new}"
    on, _ = szt.decompress(bn, dtype=np.float32)
    assert oj.tobytes() == on.tobytes()


def test_roundtrip_error_bound():
    data = _field((40, 37, 29), seed=21)
    eb = 1e-3
    conf = Config(dims=data.shape, cmprAlgo=ALGO.LORENZO_REG,
                  absErrorBound=eb)
    bj = szt.compress(data, conf.copy(), backend="jax")
    out, _ = szt.decompress(bj, backend="jax")
    assert np.abs(out.astype(np.float64) - data.astype(np.float64)).max() <= eb
