"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os

# The CPU-parity tier must be hermetic against the TPU plugin's health: the
# driver exports JAX_PLATFORMS=axon, and with the axon plugin registered (via
# sitecustomize) ANY backend initialization then dials the tunnel — hanging
# ~25 min in PJRT client creation when it is down (VERDICT r3 weak #2).
# FORCE cpu here (override, not setdefault); the TPU tier is an explicit
# opt-in via SZT_TEST_TPU=1 (run `SZT_TEST_TPU=1 pytest tests/test_tpu_parity.py`).
if os.environ.get("SZT_TEST_TPU") == "1":
    os.environ.setdefault("JAX_PLATFORMS", "")
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
# Some TPU runtime plugins (e.g. axon) ignore JAX_PLATFORMS; the codec honors
# this variable and pins kernel execution to the host XLA backend, which has
# true IEEE f64 (needed for bit-exact parity tests).
os.environ.setdefault("SZT_JAX_DEVICE", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU contracts mul+add into FMA on AVX2+ hosts, changing f32 stencil
# rounding vs the scalar reference; capping the ISA below FMA restores
# bit-exact arithmetic for the parity tests.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=SSE4_2").strip()
os.environ["XLA_FLAGS"] = flags

import json
import hashlib
from pathlib import Path

import numpy as np
import pytest

# Some TPU runtime plugins (axon) ignore JAX_PLATFORMS entirely: register()
# calls jax.config.update("jax_platforms", "axon,cpu") at interpreter startup
# (sitecustomize), which OVERRIDES the env var — so any backend init (even
# jax.devices("cpu")) dials the tunnel and hangs when it is down. Re-override
# via the config (config beats config; the env var alone is a no-op), then
# pin the process-wide default device to the host CPU. test_tpu_parity, which
# wants the real chip, opts in with SZT_TEST_TPU=1.
import jax

if os.environ.get("SZT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("SZT_JAX_DEVICE") == "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

GOLDEN = Path(__file__).resolve().parent / "golden"


@pytest.fixture(scope="session")
def golden_manifest():
    return json.loads((GOLDEN / "manifest.json").read_text())


def synth_input(case: dict) -> np.ndarray:
    """Re-synthesize the deterministic input for a golden case and verify it
    matches the bytes the reference binary compressed."""
    import sys
    sys.path.insert(0, str(GOLDEN))
    from generate import kind_for, synth

    shape = tuple(case["shape"])
    dtype = np.dtype(case["dtype"])
    kind = kind_for(case["name"])
    if dtype in (np.int32, np.int64):
        arr = (synth(shape, np.float64, kind) * 1000).astype(dtype)
    else:
        arr = synth(shape, dtype.type, kind)
    assert hashlib.sha256(arr.tobytes()).hexdigest() == case["dat_sha"], \
        f"synthesized input drifted for {case['name']}"
    return arr
