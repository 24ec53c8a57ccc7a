"""Device decode path: archive -> array with the bit-walk on-chip.

CPU tier: the post-entropy chain (literal placement, inverse layout, grid
recovery) is validated by feeding the host-opened symbol stream through the
device `finish` program — bit-exact against the host engine's decompress.
TPU tier (skipped off-TPU): the full chain including the speculative window
decode kernel."""

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config
from sz3_tpu.algos import device_decode, jax_backend


def _field(dims, seed=3):
    rng = np.random.default_rng(seed)
    return np.ascontiguousarray(
        np.cumsum(rng.standard_normal(dims), axis=0).astype(np.float32) * 0.1)


def _conf(dims, eb=1e-3, algo=1, stride=32):
    c = Config(dims=dims, cmprAlgo=ALGO.INTERP, absErrorBound=eb)
    c.interpAnchorStride = stride
    c.interpAlgo = algo
    return c


def test_place_literals_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    dense = rng.integers(0, 5, 4096).astype(np.int32)
    unpred = rng.standard_normal((dense == 0).sum()).astype(np.float32)
    got = np.asarray(device_decode._place_literals(
        jnp.asarray(dense), jnp.asarray(unpred), jnp.float32))
    want = np.zeros(dense.size, np.float32)
    want[dense == 0] = unpred
    assert np.array_equal(got, want)


CASES = [
    ((40, 33, 27), 1e-3, 1, 32),
    ((64, 64, 64), 1e-3, 1, 32),
    ((40, 33, 27), 1e-3, 0, 32),     # linear
    ((129, 129), 1e-3, 1, 128),      # 2D
    ((33, 34, 35, 20), 1e-3, 1, 16),  # 4D
]


@pytest.mark.parametrize("dims,eb,algo,stride", CASES)
def test_finish_chain_matches_host(dims, eb, algo, stride):
    """Host-opened stream -> device finish == host engine decompress."""
    import jax.numpy as jnp
    data = _field(dims)
    conf = _conf(dims, eb, algo, stride)
    cap = 2 * data.nbytes + 4096
    payload = jax_backend._interp_encode_payload(conf, data.copy(), cap)

    c_host = _conf(dims, eb, algo, stride)
    want = runtime.decompress_payload(c_host, payload,
                                      dtype=runtime.np_dtype_id(data))

    c_dev = _conf(dims, eb, algo, stride)
    stream, unpred = runtime.interp_open(c_dev, payload, np.float32)
    need, finish = device_decode._static_dec(
        tuple(c_dev.dims), int(c_dev.interpAlgo), c_dev.interpDirection,
        c_dev.interpAnchorStride, c_dev.interpAlpha, c_dev.interpBeta,
        c_dev.absErrorBound, c_dev.quantbinCnt, "float32")
    assert need == stream.size
    rows = -(-need // 128) + 1
    dense2d = np.zeros((rows, 128), np.int32)
    dense2d.ravel()[:need] = stream
    got, nzero = finish(jnp.asarray(dense2d),
                        jnp.asarray(device_decode._pad_unpred(unpred, np.float32)))
    assert int(nzero) == unpred.size
    assert np.array_equal(np.asarray(got).ravel(), np.asarray(want).ravel())


# ---- TPU tier -------------------------------------------------------------------

def _has_tpu():
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


tpu_only = pytest.mark.skipif(not _has_tpu(), reason="needs a TPU")


@pytest.fixture
def _unpin_device(monkeypatch):
    monkeypatch.delenv("SZT_JAX_DEVICE", raising=False)
    import jax

    prev = jax.config.jax_default_device
    jax.config.update("jax_default_device", None)
    yield
    jax.config.update("jax_default_device", prev)


@tpu_only
def test_tpu_interp_decode_end_to_end(_unpin_device, monkeypatch):
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    dims = (96, 80, 72)
    data = _field(dims, seed=9)
    conf = Config(dims=dims, cmprAlgo=ALGO.INTERP, absErrorBound=1e-3)
    blob = szt.compress(data, conf, set_datatype=False)
    out_host, _ = szt.decompress(blob)
    out_dev, _ = szt.decompress(blob, backend="jax")
    assert np.array_equal(np.asarray(out_dev), np.asarray(out_host))


@tpu_only
def test_tpu_nopred_decode_end_to_end(_unpin_device, monkeypatch):
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    dims = (64, 64, 64)
    data = _field(dims, seed=4)
    conf = Config(dims=dims, cmprAlgo=ALGO.NOPRED, absErrorBound=1e-3)
    blob = szt.compress(data, conf, set_datatype=False)
    out_host, _ = szt.decompress(blob)
    out_dev, _ = szt.decompress(blob, backend="jax")
    assert np.array_equal(np.asarray(out_dev), np.asarray(out_host))


def test_payload_wins_over_stale_tail():
    """The archive's Config tail records the TUNER's interp choice; the
    payload header is authoritative (the interp compressor re-tunes). A
    tail/payload interpAlgo disagreement keeps the stream count identical,
    so a device route that plans from the tail reconstructs with the wrong
    interpolator SILENTLY (caught on real TPU hardware, round 4:
    tuner tail said CUBIC, payload said LINEAR, decode was off by 13.2).
    decode_payload_device must take every interp param from the payload."""
    import struct

    dims = (48, 40, 36)
    data = _field(dims, seed=7)
    conf = _conf(dims, algo=0, stride=16)  # payload: LINEAR
    blob = szt.compress(data, conf, set_datatype=False)
    want, _ = szt.decompress(blob, dtype=np.float32)

    _, _, size = struct.unpack_from("<IIQ", blob, 0)
    stale, _ = Config.load(blob, 16 + size)
    stale.interpAlgo = 1                 # tail claims: CUBIC
    if stale.interpAnchorStride < 0:
        stale.interpAnchorStride = 16
    try:
        got = device_decode.decode_payload_device(
            stale, blob[16:16 + size], np.float32)
    except device_decode.Fallback:
        pytest.skip("device entropy decode unavailable on this backend")
    assert np.array_equal(np.asarray(got).ravel(), want.ravel())
