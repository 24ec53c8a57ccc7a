"""Device BIOMD path: the frames>0 trajectory recurrence as a lax.scan of two
vectorized quantize steps per frame (ops/biomd_device.py), frame-0 chain and
HuffmanV2+zstd sealing in the native engine.

Payload bytes must equal the host engine's (itself golden-verified against the
reference binary) bit-for-bit, in both directions. Pure-JAX scan (no Pallas),
so the parity tier runs on the suite's pinned CPU backend with x64 arithmetic
— the same basis as the interp parity tier.

Behavior contract: reference decomposition/SZBioMDDecomposition.hpp:229-285,
api/impl/SZAlgoBioMD.hpp:24-27.
"""

import hashlib

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config
from sz3_tpu.algos import device_decode, device_encode
from sz3_tpu.ops import biomd_device as bd

from conftest import GOLDEN, synth_input


def md_traj(frames=24, atoms=333, seed=0, fill_tail=0, site_atoms=3):
    rng = np.random.default_rng(seed)
    g = atoms // site_atoms + 1
    base = rng.uniform(-5, 5, (g, 1, 3)).repeat(site_atoms, axis=1)
    base = (base + rng.normal(0, 0.05, (g, site_atoms, 3))).reshape(-1, 3)[:atoms]
    traj = base[None] + np.cumsum(rng.normal(0, 0.01, (frames, atoms, 3)), axis=0)
    if fill_tail:
        traj[-fill_tail:] = -1.0
    return np.ascontiguousarray(traj, dtype=np.float32)


def _payload_pair(traj, eb=1e-3):
    cap = 2 * traj.nbytes + 4096
    ch = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMD, absErrorBound=eb)
    p_host = runtime.compress_payload(ch, traj.copy(), cap)
    cd = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMD, absErrorBound=eb)
    p_dev = device_encode.encode_payload_device_biomd(cd, traj.copy(), cap)
    return ch, p_host, p_dev


CASES = [
    dict(),                                     # site=3 water-like
    dict(fill_tail=8, frames=32, atoms=120),    # trailing fill frames
    dict(site_atoms=4, atoms=332),              # 4-site molecules
    dict(frames=2, atoms=64),                   # minimum live frames
    dict(atoms=7),                              # atoms not a site multiple
]


@pytest.mark.parametrize("kw", CASES)
def test_encode_payload_equals_host(kw):
    traj = md_traj(**kw)
    _, p_host, p_dev = _payload_pair(traj)
    assert p_dev == p_host


@pytest.mark.parametrize("kw", CASES)
def test_decode_matches_host(kw):
    traj = md_traj(**kw)
    ch, p_host, _ = _payload_pair(traj)
    out_h = runtime.decompress_payload(
        ch, p_host, dtype=runtime.np_dtype_id(np.empty(0, np.float32)))
    out_d = device_decode.decode_payload_device_biomd(ch, p_host, np.float32)
    assert np.array_equal(np.asarray(out_h).reshape(traj.shape), out_d)
    assert np.abs(out_d - traj).max() <= 1e-3 * 1.2


@pytest.mark.parametrize("name", ["f32_3d_biomd", "f32_3d_biomd_fill"])
def test_golden_archive_via_jax_backend(name, monkeypatch):
    """Full archive through backend='jax' with the device route forced is
    sha256-identical to the reference binary's golden archive."""
    import json
    case = next(c for c in json.loads((GOLDEN / "manifest.json").read_text())
                if c["name"] == name)
    arr = synth_input(case)
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    conf = szt.Config(dims=arr.shape, cmprAlgo=ALGO.BIOMD, absErrorBound=1e-3)
    blob = szt.compress(arr, conf, backend="jax")
    assert hashlib.sha256(blob).hexdigest() == case["sz_sha"]
    out, _ = szt.decompress(blob, backend="jax")
    assert hashlib.sha256(np.ascontiguousarray(out).tobytes()).hexdigest() \
        == case["out_sha"]


def test_aperiodic_falls_back():
    """site==0 data (no molecular periodicity) has no parallel shape — the
    device route must raise a counted Fallback and dispatch must still
    produce the host archive."""
    rng = np.random.default_rng(5)
    traj = np.cumsum(rng.normal(0, 1, (16, 100, 3)), axis=0).astype(np.float32)
    assert bd.cal_site(traj[1]) == 0
    conf = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMD, absErrorBound=1e-3)
    before = dict(device_encode.fallback_counts)
    with pytest.raises(device_encode.Fallback):
        device_encode.encode_payload_device_biomd(conf, traj, 2 * traj.nbytes)
    diff = {k: v - before.get(k, 0)
            for k, v in device_encode.fallback_counts.items() if v != before.get(k, 0)}
    assert any("aperiodic" in k for k in diff)
    # dispatch-level: backend="jax" still round-trips via the host engine
    import os
    os.environ["SZT_DEVICE_ENTROPY"] = "1"
    try:
        blob = szt.compress(traj, Config(dims=traj.shape, cmprAlgo=ALGO.BIOMD,
                                         absErrorBound=1e-3), backend="jax")
        out, _ = szt.decompress(blob, backend="jax")
    finally:
        del os.environ["SZT_DEVICE_ENTROPY"]
    assert np.abs(out - traj).max() <= 1.2e-3


def test_f64_falls_back():
    traj = md_traj().astype(np.float64)
    conf = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMD, absErrorBound=1e-6)
    with pytest.raises(device_encode.Fallback):
        device_encode.encode_payload_device_biomd(conf, traj, 2 * traj.nbytes)


def test_short_trajectory_falls_back():
    traj = md_traj(frames=1)
    conf = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMD, absErrorBound=1e-3)
    with pytest.raises(device_encode.Fallback):
        device_encode.encode_payload_device_biomd(conf, traj, 2 * traj.nbytes)


def test_cal_site_matches_native():
    """Python site detector agrees with the native engine's on varied data
    (periodic, aperiodic, short)."""
    for kw, want_periodic in [(dict(), True), (dict(site_atoms=4, atoms=332), True),
                              (dict(atoms=50), True)]:
        frame = md_traj(**kw)[1]
        s = bd.cal_site(frame)
        if want_periodic:
            assert s == kw.get("site_atoms", 3)
