"""Device BIOMDXTC path: the decomposition is a pure elementwise quantize
against a zero prediction at the XTC radius (ops/xtc_device.py; reference
behavior: our native biomd.hpp BioMDXtcCodec::compress, strict=false
tolerance quantizer.hpp:55), so the device route is one vectorized pass in
each direction; the XTC triplet coder runs in the native engine both ways.

Payload bytes must equal the host engine's (itself golden-verified against
the reference binary) bit-for-bit, both directions, plus the three biomdxtc
golden archives through the routed backend.
"""

import hashlib

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config
from sz3_tpu.algos import device_decode, device_encode

from conftest import GOLDEN, synth_input


def md_traj(frames=24, atoms=120, seed=0, fill_tail=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (atoms, 3)).astype(np.float32)
    traj = base[None] + np.cumsum(
        rng.normal(0, 0.01, (frames, atoms, 3)), axis=0)
    if fill_tail:
        traj[-fill_tail:] = -1.0
    return np.ascontiguousarray(traj, dtype=np.float32)


CASES = [
    dict(),
    dict(fill_tail=6, frames=32),
    dict(frames=7, atoms=611, seed=3),
]
EBS = [1e-2, 1e-3, 1e-5]


@pytest.mark.parametrize("eb", EBS)
@pytest.mark.parametrize("case", range(len(CASES)))
def test_payload_parity_both_directions(case, eb):
    traj = md_traj(**CASES[case])
    cap = 2 * traj.nbytes + 4096
    ch = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMDXTC, absErrorBound=eb)
    p_host = runtime.compress_payload(ch, traj.copy(), cap)
    cd = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMDXTC, absErrorBound=eb)
    p_dev = device_encode.encode_payload_device_biomdxtc(cd, traj.copy(), cap)
    assert p_host == p_dev
    out_h = runtime.decompress_payload(ch.copy(), p_host,
                                       dtype=runtime.np_dtype_id(traj))
    out_d = device_decode.decode_payload_device_biomdxtc(ch.copy(), p_host,
                                                         np.float32)
    assert out_h.reshape(traj.shape).tobytes() == out_d.tobytes()


def test_2d_and_1d_shapes():
    """N<=2 has no fill-frame trim (reference biomd.hpp:246-253)."""
    rng = np.random.default_rng(5)
    for shape in [(64, 9), (731,)]:
        arr = np.cumsum(rng.normal(0, 0.01, shape), axis=-1).astype(np.float32)
        cap = 2 * arr.nbytes + 4096
        ch = Config(dims=shape, cmprAlgo=ALGO.BIOMDXTC, absErrorBound=1e-3)
        p_host = runtime.compress_payload(ch, arr.copy(), cap)
        cd = Config(dims=shape, cmprAlgo=ALGO.BIOMDXTC, absErrorBound=1e-3)
        p_dev = device_encode.encode_payload_device_biomdxtc(cd, arr.copy(), cap)
        assert p_host == p_dev
        out_h = runtime.decompress_payload(ch.copy(), p_host,
                                           dtype=runtime.np_dtype_id(arr))
        out_d = device_decode.decode_payload_device_biomdxtc(
            ch.copy(), p_host, np.float32)
        assert out_h.reshape(shape).tobytes() == out_d.tobytes()


def test_routed_backend_matches_native(monkeypatch):
    """szt.compress/decompress(backend='jax') with the device route forced
    reproduces the native archive and reconstruction."""
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    traj = md_traj(frames=20, atoms=99, seed=7)
    conf = Config(dims=traj.shape, cmprAlgo=ALGO.BIOMDXTC, absErrorBound=1e-3)
    host = szt.compress(traj, conf.copy(), backend="native")
    dev = szt.compress(traj, conf.copy(), backend="jax")
    assert host == dev
    out_n, _ = szt.decompress(host)
    out_d, _ = szt.decompress(host, backend="jax")
    assert out_n.tobytes() == out_d.tobytes()


@pytest.mark.parametrize("name", ["f32_3d_biomdxtc", "f32_3d_biomdxtc_fill",
                                  "f32_2d_biomdxtc"])
def test_golden_via_device_route(name, golden_manifest, monkeypatch):
    """Reference-binary BIOMDXTC archives: encode sha parity through the
    routed jax backend and decode parity against the reference's output."""
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    case = next(c for c in golden_manifest if c["name"] == name)
    arr = synth_input(case)
    conf = Config(dims=arr.shape)
    if case["ini"]:
        conf.load_ini(case["ini"])
    conf.absErrorBound = float(case["args"][case["args"].index("-M") + 2])
    blob = szt.compress(arr, conf, backend="jax", set_datatype=False)
    assert hashlib.sha256(blob).hexdigest() == case["sz_sha"]
    ref = (GOLDEN / f"{name}.sz").read_bytes()
    assert blob == ref
    out, _ = szt.decompress(ref, backend="jax", dtype=np.float32)
    assert hashlib.sha256(out.tobytes()).hexdigest() == case["out_sha"]


def test_exact_and_native_variants_agree():
    """On the CPU test backend (true IEEE f64), the forced softfloat path and
    the native-f64 path must produce identical stored bins — the softfloat is
    exactly IEEE or it is wrong."""
    import jax.numpy as jnp
    from sz3_tpu.ops.xtc_device import (_xtc_quantize_exact,
                                        _xtc_quantize_native, xtc_recover)
    rng = np.random.default_rng(11)
    data = (rng.standard_normal(1 << 15) *
            np.exp2(rng.integers(-24, 12, 1 << 15))).astype(np.float32)
    data[:4] = [0.0, -0.0, np.inf, np.nan]
    for eb in [1e-3, 3.7e-5, 123.0]:
        a = np.asarray(_xtc_quantize_exact(jnp.asarray(data), eb))
        b = np.asarray(_xtc_quantize_native(jnp.asarray(data), eb))
        assert np.array_equal(a, b), (eb, np.nonzero(a != b)[0][:5])
