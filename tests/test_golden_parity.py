"""Byte-level parity with the reference SZ3 binary.

For every golden case (archives produced by the real szcompressor/SZ3 build,
tests/golden/generate.py):
  1. compressing the same input with sz3_tpu yields sha256-identical archives
     (covering tuner decisions, Huffman trees, zstd framing, config tails);
  2. decompressing the reference archive reproduces the reference binary's
     decompressed bytes exactly.
This is the determinism/compatibility gate the reference CI enforces across
OSes (reference .github/workflows/cmake.yml "compare" job).
"""

import hashlib
from pathlib import Path

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.config import ALGO, EB

from conftest import GOLDEN, synth_input

CASES = None


def _cases():
    import json
    return json.loads((GOLDEN / "manifest.json").read_text())


def _conf_for_case(case, arr):
    conf = szt.Config(dims=arr.shape)
    if case["ini"]:
        conf.load_ini(case["ini"])
    args = case["args"]
    i = 0
    while i < len(args):
        if args[i] == "-M":
            mode = args[i + 1]
            conf.errorBoundMode = {"ABS": EB.ABS, "REL": EB.REL, "PSNR": EB.PSNR,
                                   "NORM": EB.L2NORM, "ABS_AND_REL": EB.ABS_AND_REL,
                                   "ABS_OR_REL": EB.ABS_OR_REL}[mode]
            i += 2
            if i <= len(args) - 1 and not args[i].startswith("-"):
                val = float(args[i])
                if mode == "ABS":
                    conf.absErrorBound = val
                elif mode == "REL":
                    conf.relErrorBound = val
                elif mode == "PSNR":
                    conf.psnrErrorBound = val
                elif mode == "NORM":
                    conf.l2normErrorBound = val
                i += 1
        elif args[i] == "-A":
            conf.absErrorBound = float(args[i + 1]); i += 2
        elif args[i] == "-R":
            conf.relErrorBound = float(args[i + 1]); i += 2
        elif args[i] == "-S":
            conf.psnrErrorBound = float(args[i + 1]); i += 2
        elif args[i] == "-N":
            conf.l2normErrorBound = float(args[i + 1]); i += 2
        else:
            i += 1
    return conf


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c["name"])
def test_compress_bytes_match_reference(case):
    arr = synth_input(case)
    conf = _conf_for_case(case, arr)
    nthreads = int(case["env"].get("OMP_NUM_THREADS", 0))
    blob = szt.compress(arr, conf, nthreads=nthreads, set_datatype=False)
    ref = (GOLDEN / f"{case['name']}.sz").read_bytes()
    assert hashlib.sha256(blob).hexdigest() == case["sz_sha"], "manifest drift"
    assert len(blob) == len(ref), f"size {len(blob)} != reference {len(ref)}"
    assert blob == ref


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c["name"])
def test_decompress_matches_reference_output(case):
    ref = (GOLDEN / f"{case['name']}.sz").read_bytes()
    out, conf = szt.decompress(ref, dtype=np.dtype(case["dtype"]))
    assert hashlib.sha256(out.tobytes()).hexdigest() == case["out_sha"]
    assert tuple(conf.dims) == tuple(d for d in case["shape"] if d > 1)


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c["name"])
def test_error_bound_respected(case):
    arr = synth_input(case)
    ref = (GOLDEN / f"{case['name']}.sz").read_bytes()
    out, conf = szt.decompress(ref, dtype=arr.dtype)
    if conf.cmprAlgo == ALGO.LOSSLESS:
        assert np.array_equal(out.reshape(arr.shape), arr)
    elif conf.errorBoundMode == EB.ABS and np.issubdtype(arr.dtype, np.floating):
        err = np.abs(out.reshape(arr.shape).astype(np.float64) - arr.astype(np.float64)).max()
        assert err <= conf.absErrorBound * 1.0000001
