"""Randomized byte-parity fuzzing against the reference sz3 binary.

Complements the fixed golden corpus: random shapes x dtypes x error modes x
algorithms, comparing full-archive bytes and cross-decoding both directions.
Runs only when a reference build is present (tests/golden/generate.py's
default path); CI-style runs rely on the committed golden corpus instead.
"""

import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

import sz3_tpu as szt
from sz3_tpu.config import Config, EB_MAP

REF = Path(os.environ.get("SZT_REF_SZ3", "/tmp/ref-build/tools/sz3/sz3"))

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference sz3 binary not built")

DTYPE_FLAG = {"float32": ["-f"], "float64": ["-d"], "int32": ["-I", "32"], "int64": ["-I", "64"]}


def random_case(rng):
    ndim = rng.integers(1, 5)
    if ndim == 1:
        shape = (int(rng.integers(2000, 20000)),)
    else:
        # keep >= ~1700 floats (reference CLI buffer bound) and modest runtime
        shape = tuple(int(rng.integers(8, [0, 0, 120, 44, 20][ndim]))
                      for _ in range(ndim))
        while np.prod(shape) < 4000:
            shape = tuple(s + 8 for s in shape)
    dtype = rng.choice(["float32", "float64", "int32", "int64"])
    kind = rng.choice(["smooth", "rough", "const", "spiky"])
    mode, args = {
        0: ("ABS", ["-M", "ABS", "1e-2"]),
        1: ("ABS", ["-M", "ABS", "1e-4"]),
        2: ("REL", ["-M", "REL", "1e-3"]),
        3: ("PSNR", ["-M", "PSNR", "70"]),
        4: ("ABS_AND_REL", ["-M", "ABS_AND_REL", "-A", "1e-2", "-R", "1e-3"]),
        5: ("NORM", ["-M", "NORM", "10"]),
    }[int(rng.integers(0, 6))]
    algo_ini = rng.choice([None, "ALGO_INTERP", "ALGO_LORENZO_REG", "ALGO_NOPRED"])
    return shape, dtype, kind, mode, args, algo_ini


def synth(shape, dtype, kind, rng):
    g = np.meshgrid(*[np.linspace(0, 1, s) for s in shape], indexing="ij")
    f = sum(np.sin(2 * np.pi * (k + 1.3) * x) for k, x in enumerate(g))
    if kind == "rough":
        f = f + rng.standard_normal(shape)
    elif kind == "const":
        f = np.full(shape, 3.25)
    elif kind == "spiky":
        f = f + np.where(rng.random(shape) < 0.01, rng.standard_normal(shape) * 100, 0)
    if dtype in ("int32", "int64"):
        return np.ascontiguousarray((f * 500).astype(dtype))
    return np.ascontiguousarray(f, dtype=dtype)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_archive_parity(tmp_path, seed):
    rng = np.random.default_rng(1000 + seed)
    shape, dtype, kind, mode, args, algo_ini = random_case(rng)
    arr = synth(shape, dtype, kind, rng)

    datf = tmp_path / "in.dat"
    szf = tmp_path / "ref.sz"
    outf = tmp_path / "ref.out"
    arr.tofile(datf)
    cmd = [str(REF), *DTYPE_FLAG[dtype], "-i", str(datf), "-z", str(szf), "-o", str(outf),
           f"-{len(shape)}", *[str(s) for s in reversed(shape)], *args]
    if algo_ini:
        ini = tmp_path / "a.ini"
        ini.write_text(f"[GlobalSettings]\nCmprAlgo = {algo_ini}\n")
        cmd += ["-c", str(ini)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    assert r.returncode == 0, f"reference failed on {shape} {dtype} {args}: {r.stderr}"
    ref_blob = szf.read_bytes()
    ref_out = np.fromfile(outf, dtype=dtype)

    conf = Config(dims=shape)
    if algo_ini:
        conf.load_ini(f"[GlobalSettings]\nCmprAlgo = {algo_ini}\n")
    # apply -M style args
    i = 0
    while i < len(args):
        if args[i] == "-M":
            conf.errorBoundMode = EB_MAP[args[i + 1]]
            i += 2
            if i < len(args) and not args[i].startswith("-"):
                v = float(args[i])
                conf.absErrorBound = v if args[i - 1] == "ABS" else conf.absErrorBound
                conf.relErrorBound = v if args[i - 1] == "REL" else conf.relErrorBound
                conf.psnrErrorBound = v if args[i - 1] == "PSNR" else conf.psnrErrorBound
                conf.l2normErrorBound = v if args[i - 1] == "NORM" else conf.l2normErrorBound
                i += 1
        elif args[i] == "-A":
            conf.absErrorBound = float(args[i + 1]); i += 2
        elif args[i] == "-R":
            conf.relErrorBound = float(args[i + 1]); i += 2
        else:
            i += 1

    ours = szt.compress(arr, conf, set_datatype=False)
    label = f"{shape} {dtype} {kind} {mode} {algo_ini}"
    assert hashlib.sha256(ours).hexdigest() == hashlib.sha256(ref_blob).hexdigest(), \
        f"archive bytes differ for {label} (ours {len(ours)}, ref {len(ref_blob)})"

    # both directions decode bit-exactly
    out, _ = szt.decompress(ref_blob, dtype=np.dtype(dtype))
    assert np.array_equal(out.ravel(), ref_out), f"cross-decode differs for {label}"


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_biomd_parity(tmp_path, seed):
    """Random MD-trajectory cases through ALGO_BIOMD / ALGO_BIOMDXTC."""
    rng = np.random.default_rng(2000 + seed)
    frames = int(rng.integers(4, 48))
    atoms = int(rng.integers(30, 700))
    site = int(rng.choice([3, 4, 5, 0]))  # water-model period (0 = unstructured)
    fill_tail = int(rng.integers(0, max(1, frames // 3))) if rng.random() < 0.4 else 0
    algo = str(rng.choice(["ALGO_BIOMD", "ALGO_BIOMDXTC"]))
    eb = float(rng.choice([1e-2, 1e-3, 1e-4]))

    if site:
        base = rng.uniform(-8, 8, (atoms // site + 1, 1, 3)).repeat(site, axis=1)
        base = (base + rng.normal(0, 0.05, base.shape)).reshape(-1, 3)[:atoms]
    else:
        base = rng.uniform(-8, 8, (atoms, 3))
    traj = base[None] + np.cumsum(rng.normal(0, 0.01, (frames, atoms, 3)), axis=0)
    if fill_tail:
        traj[-fill_tail:] = -2.5
    arr = np.ascontiguousarray(traj, dtype=np.float32)

    datf = tmp_path / "t.dat"
    szf = tmp_path / "t.sz"
    outf = tmp_path / "t.out"
    arr.tofile(datf)
    ini = tmp_path / "b.ini"
    ini.write_text(f"[GlobalSettings]\nCmprAlgo = {algo}\n")
    r = subprocess.run([str(REF), "-f", "-i", str(datf), "-z", str(szf), "-o", str(outf),
                        "-3", "3", str(atoms), str(frames), "-M", "ABS", str(eb),
                        "-c", str(ini)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    from sz3_tpu.config import ALGO
    conf = Config(dims=arr.shape, cmprAlgo=ALGO[algo.replace("ALGO_", "")], absErrorBound=eb)
    ours = szt.compress(arr, conf, set_datatype=False)
    label = f"F{frames} A{atoms} site{site} fill{fill_tail} {algo} eb{eb}"
    assert hashlib.sha256(ours).hexdigest() == hashlib.sha256(szf.read_bytes()).hexdigest(), \
        f"archive bytes differ for {label}"
    out, _ = szt.decompress(szf.read_bytes(), dtype=np.float32)
    assert np.array_equal(out.ravel(), np.fromfile(outf, dtype=np.float32)), \
        f"cross-decode differs for {label}"


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(12))
def test_fuzz_device_routes(tmp_path, seed, monkeypatch):
    """The fuzz matrix with every device route FORCED (SZT_DEVICE_ENTROPY=1):
    archives and reconstructions must still be byte-identical to the
    reference binary. Covers the round-3 device paths (entropy encode+decode,
    wavefront LORENZO_REG decode, NOPRED/BIOMD/XTC sweeps) against random
    shapes, modes, and dtypes (non-f32 cases exercise the counted
    fallbacks)."""
    monkeypatch.setenv("SZT_DEVICE_ENTROPY", "1")
    rng = np.random.default_rng(7000 + seed)
    shape, dtype, kind, mode, args, algo_ini = random_case(rng)
    arr = synth(shape, dtype, kind, rng)

    datf = tmp_path / "in.dat"
    szf = tmp_path / "ref.sz"
    outf = tmp_path / "ref.out"
    arr.tofile(datf)
    cmd = [str(REF), *DTYPE_FLAG[dtype], "-i", str(datf), "-z", str(szf),
           "-o", str(outf), f"-{len(shape)}",
           *[str(s) for s in reversed(shape)], *args]
    if algo_ini:
        ini = tmp_path / "a.ini"
        ini.write_text(f"[GlobalSettings]\nCmprAlgo = {algo_ini}\n")
        cmd += ["-c", str(ini)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref_blob = szf.read_bytes()
    ref_out = np.fromfile(outf, dtype=dtype)

    conf = Config(dims=shape)
    if algo_ini:
        conf.load_ini(f"[GlobalSettings]\nCmprAlgo = {algo_ini}\n")
    i = 0
    while i < len(args):
        if args[i] == "-M":
            conf.errorBoundMode = EB_MAP[args[i + 1]]
            i += 2
            if i < len(args) and not args[i].startswith("-"):
                v = float(args[i])
                conf.absErrorBound = v if args[i - 1] == "ABS" else conf.absErrorBound
                conf.relErrorBound = v if args[i - 1] == "REL" else conf.relErrorBound
                conf.psnrErrorBound = v if args[i - 1] == "PSNR" else conf.psnrErrorBound
                conf.l2normErrorBound = v if args[i - 1] == "NORM" else conf.l2normErrorBound
                i += 1
        elif args[i] == "-A":
            conf.absErrorBound = float(args[i + 1]); i += 2
        elif args[i] == "-R":
            conf.relErrorBound = float(args[i + 1]); i += 2
        else:
            i += 1

    label = f"{shape} {dtype} {kind} {mode} {algo_ini}"
    ours = szt.compress(arr, conf, set_datatype=False, backend="jax")
    assert hashlib.sha256(ours).hexdigest() == \
        hashlib.sha256(ref_blob).hexdigest(), \
        f"device-route archive differs for {label}"
    out, _ = szt.decompress(ref_blob, dtype=np.dtype(dtype), backend="jax")
    assert np.array_equal(out.ravel(), ref_out), \
        f"device-route decode differs for {label}"
