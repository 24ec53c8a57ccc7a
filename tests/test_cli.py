"""CLI tests: sz3-compatible flag handling and archive interop."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.cli import main as cli_main


def run_cli(args, tmp_path):
    r = subprocess.run([sys.executable, "-m", "sz3_tpu.cli", *args],
                       capture_output=True, text=True, cwd=tmp_path)
    return r


def test_compress_decompress_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = np.cumsum(rng.standard_normal((8, 8, 128)).astype(np.float32), axis=2) * 0.1
    x.tofile(tmp_path / "in.dat")
    rc = cli_main(["-f", "-i", str(tmp_path / "in.dat"), "-z", str(tmp_path / "out.sz"),
                   "-o", str(tmp_path / "out.dat"), "-3", "128", "8", "8", "-M", "ABS", "1e-3"])
    assert rc == 0
    out = np.fromfile(tmp_path / "out.dat", dtype=np.float32).reshape(x.shape)
    assert np.abs(out - x).max() <= 1e-3 * 1.0000001


def test_cli_matches_library(tmp_path):
    rng = np.random.default_rng(1)
    x = np.cumsum(rng.standard_normal((16, 16, 64)).astype(np.float32), axis=2) * 0.1
    x.tofile(tmp_path / "in.dat")
    cli_main(["-f", "-i", str(tmp_path / "in.dat"), "-z", str(tmp_path / "a.sz"),
              "-3", "64", "16", "16", "-M", "REL", "1e-3"])
    conf = szt.Config(dims=x.shape, errorBoundMode=szt.EB.REL, relErrorBound=1e-3)
    blob = szt.compress(x, conf, set_datatype=False)
    assert (tmp_path / "a.sz").read_bytes() == blob


def test_sz2_style_decompress(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096).astype(np.float32)
    x.tofile(tmp_path / "in.dat")
    cli_main(["-f", "-i", str(tmp_path / "in.dat"), "-z", str(tmp_path / "a.sz"),
              "-1", "4096", "-M", "ABS", "1e-2"])
    rc = cli_main(["-f", "-s", str(tmp_path / "a.sz"), "-x", str(tmp_path / "b.out"),
                   "-1", "4096"])
    assert rc == 0
    out = np.fromfile(tmp_path / "b.out", dtype=np.float32)
    assert np.abs(out - x).max() <= 1e-2 * 1.0000001


def test_config_file(tmp_path):
    (tmp_path / "sz.config").write_text(
        "[GlobalSettings]\nCmprAlgo = ALGO_NOPRED\nErrorBoundMode = ABS\nAbsErrorBound = 0.01\n")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((64, 64)).astype(np.float32)
    x.tofile(tmp_path / "in.dat")
    rc = cli_main(["-f", "-i", str(tmp_path / "in.dat"), "-z", str(tmp_path / "a.sz"),
                   "-2", "64", "64", "-c", str(tmp_path / "sz.config")])
    assert rc == 0
    out, conf = szt.decompress((tmp_path / "a.sz").read_bytes())
    assert conf.cmprAlgo == szt.ALGO.NOPRED
    assert np.abs(out - x).max() <= 1e-2 * 1.0000001
