"""Archives produced ON THE TPU must be sha-identical to the reference
binary's golden archives (VERDICT round-1 item 3: TPU bit parity).

The quantizer's f64 arithmetic runs as integer softfloat (ops/exactf64.py) —
the backend's float-float f64 emulation misrounds ulp ties — and the entropy
stage runs on-device (ops/entropy_device.py), so this exercises the full
TPU-native encode against the reference wire bytes. Skipped without a TPU.
"""

import hashlib
import sys
from pathlib import Path

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.config import EB, Config

GOLDEN = Path(__file__).resolve().parent / "golden"


def _has_tpu():
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _has_tpu(), reason="needs a TPU")


@pytest.fixture(autouse=True)
def _unpin(monkeypatch):
    monkeypatch.delenv("SZT_JAX_DEVICE", raising=False)
    monkeypatch.delenv("SZT_EXACT_F64", raising=False)
    monkeypatch.delenv("SZT_DEVICE_ENTROPY", raising=False)
    # conftest pins the process default device to host CPU (axon ignores
    # JAX_PLATFORMS); this test wants the real chip back
    import jax

    prev = jax.config.jax_default_device
    jax.config.update("jax_default_device", None)
    yield
    jax.config.update("jax_default_device", prev)


def _conf_from_args(shape, args):
    conf = Config(dims=shape)
    conf_map = {"ABS": EB.ABS, "REL": EB.REL, "PSNR": EB.PSNR,
                "NORM": EB.L2NORM, "ABS_AND_REL": EB.ABS_AND_REL,
                "ABS_OR_REL": EB.ABS_OR_REL}
    i = 0
    while i < len(args):
        a = args[i]
        if a == "-M":
            mode = args[i + 1]
            conf.errorBoundMode = conf_map[mode]
            i += 2
            if i < len(args) and not args[i].startswith("-"):
                v = float(args[i])
                i += 1
                if mode == "ABS":
                    conf.absErrorBound = v
                elif mode == "REL":
                    conf.relErrorBound = v
                elif mode == "PSNR":
                    conf.psnrErrorBound = v
                elif mode == "NORM":
                    conf.l2normErrorBound = v
        elif a == "-A":
            conf.absErrorBound = float(args[i + 1])
            i += 2
        elif a == "-R":
            conf.relErrorBound = float(args[i + 1])
            i += 2
        else:
            i += 1
    return conf


def _cases(golden_manifest):
    for case in golden_manifest:
        if case.get("dtype") != "float32" or case.get("ini"):
            continue
        if any(a in ("-z2", "-p") for a in case.get("args", [])):
            continue
        yield case


def test_tpu_archives_match_reference(golden_manifest):
    from conftest import synth_input
    checked = matched = 0
    failures = []
    for case in _cases(golden_manifest):
        name = case["name"]
        if "omp" in name or "biomd" in name or "lorenzo" in name \
                or "nopred" in name or "lossless" in name:
            continue  # non-INTERP algorithms have no device path yet
        arr = synth_input(case)
        conf = _conf_from_args(tuple(case["shape"]), case.get("args", []))
        blob = szt.compress(arr, conf, set_datatype=False, backend="jax")
        want_sha = case["sz_sha"]
        got_sha = hashlib.sha256(blob).hexdigest()
        checked += 1
        if got_sha == want_sha:
            matched += 1
        else:
            failures.append(name)
    assert checked >= 8, f"only {checked} golden cases exercised"
    assert not failures, (
        f"{matched}/{checked} sha-identical; TPU-divergent: {failures}")
