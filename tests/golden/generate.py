"""Generate golden archives with the *reference* SZ3 binary for parity tests.

Run manually when the corpus needs regenerating:
    python tests/golden/generate.py --sz3 /tmp/ref-build/tools/sz3/sz3

The committed outputs are canonical: tests compare sz3_tpu archives against
these bytes and cross-decompress both directions. Input arrays are synthesized
deterministically here (never shipped from the reference repo).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent


def synth(shape, dtype=np.float32, kind="smooth", seed=7):
    """Deterministic synthetic field: smooth multiscale waves + mild noise."""
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(0, 1, s, dtype=np.float64) for s in shape], indexing="ij")
    f = np.zeros(shape, dtype=np.float64)
    for k, g in enumerate(grids):
        f += np.sin(2 * np.pi * (k + 1.5) * g) + 0.4 * np.cos(2 * np.pi * (3 * k + 5) * g)
    if kind == "smooth":
        f += 0.02 * rng.standard_normal(shape)
    elif kind == "noisy":
        f += 0.5 * rng.standard_normal(shape)
    elif kind.startswith("traj"):
        # MD-trajectory-like data for the BioMD algorithms: water-model
        # triplets (O-H-H sites) random-walking over time. Shape is
        # (frames, atoms, 3) or (atoms, 3). kind "traj_fill" pads the last
        # quarter of the frames with a constant fill value (the XTC/BioMD
        # fill-frame elision path).
        assert shape[-1] == 3
        atoms = shape[-2]
        base = rng.uniform(-5, 5, (atoms // 3 + 1, 1, 3)).repeat(3, axis=1)
        base = (base + rng.normal(0, 0.05, (atoms // 3 + 1, 3, 3))).reshape(-1, 3)[:atoms]
        if len(shape) == 2:
            f = base
        else:
            steps = rng.normal(0, 0.01, (shape[0], atoms, 3))
            f = base[None] + np.cumsum(steps, axis=0)
            if kind == "traj_fill":
                f[-(shape[0] // 4):] = -1.0
        return np.ascontiguousarray(f, dtype=dtype)
    return np.ascontiguousarray(f, dtype=dtype)


# name -> (shape, dtype, extra CLI args, ini text or None, env)
CASES = {
    "f32_3d_default_abs":   ((33, 37, 41), np.float32, ["-M", "ABS", "1e-2"], None, {}),
    "f32_3d_default_rel":   ((64, 64, 64), np.float32, ["-M", "REL", "1e-3"], None, {}),
    "f32_3d_psnr":          ((48, 48, 48), np.float32, ["-M", "PSNR", "60"], None, {}),
    "f32_3d_abs_and_rel":   ((48, 48, 48), np.float32, ["-M", "ABS_AND_REL", "-A", "1e-2", "-R", "1e-3"], None, {}),
    "f32_3d_abs_or_rel":    ((48, 48, 48), np.float32, ["-M", "ABS_OR_REL", "-A", "1e-2", "-R", "1e-3"], None, {}),
    "f32_2d_default":       ((96, 113), np.float32, ["-M", "ABS", "1e-3"], None, {}),
    "f32_1d_default":       ((10000,), np.float32, ["-M", "ABS", "1e-3"], None, {}),
    "f32_4d_default":       ((9, 10, 11, 12), np.float32, ["-M", "ABS", "1e-3"], None, {}),
    "f64_3d_default":       ((33, 33, 33), np.float64, ["-M", "ABS", "1e-4"], None, {}),
    "f32_3d_lorenzo_reg":   ((48, 48, 48), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_LORENZO_REG\n", {}),
    "f32_3d_lorenzo_only":  ((48, 48, 48), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_LORENZO_REG\n"
                             "[AlgoSettings]\nRegression = false\n", {}),
    "f32_3d_lorenzo2":      ((40, 40, 40), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_LORENZO_REG\n"
                             "[AlgoSettings]\nLorenzo = false\nLorenzo2ndOrder = true\n", {}),
    "f32_3d_nopred":        ((40, 40, 40), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_NOPRED\n", {}),
    "f32_3d_interp_linear": ((48, 48, 48), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_INTERP\n"
                             "[AlgoSettings]\nInterpolationAlgo = INTERP_ALGO_LINEAR\n", {}),
    "f32_3d_lossless":      ((32, 32, 32), np.float32, ["-M", "ABS", "0"], None, {}),
    "f32_3d_noisy":         ((40, 40, 40), np.float32, ["-M", "ABS", "1e-6"], None, {}),
    "i32_3d_default":       ((40, 40, 40), np.int32, ["-M", "ABS", "4"], None, {}),
    "i64_3d_default":       ((40, 40, 40), np.int64, ["-M", "ABS", "4"], None, {}),
    # smallest sizes the reference CLI's own 2*num*sizeof(T) buffer accepts
    "f32_2d_small":         ((48, 48), np.float32, ["-M", "ABS", "1e-3"], None, {}),
    "f32_1d_small":         ((4000,), np.float32, ["-M", "ABS", "1e-3"], None, {}),
    "f32_3d_omp4":          ((64, 48, 48), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nOpenMP = true\n", {"OMP_NUM_THREADS": "4"}),
    "f32_3d_omp_rel":       ((64, 40, 40), np.float32, ["-M", "REL", "1e-3"],
                             "[GlobalSettings]\nOpenMP = true\n", {"OMP_NUM_THREADS": "4"}),
    "f32_3d_biomd":         ((24, 333, 3), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_BIOMD\n", {}),
    "f32_3d_biomd_fill":    ((32, 120, 3), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_BIOMD\n", {}),
    "f32_2d_biomd":         ((2000, 3), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_BIOMD\n", {}),
    "f64_3d_biomd":         ((24, 120, 3), np.float64, ["-M", "ABS", "1e-4"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_BIOMD\n", {}),
    "f32_3d_biomdxtc":      ((24, 333, 3), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_BIOMDXTC\n", {}),
    "f32_3d_biomdxtc_fill": ((32, 120, 3), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_BIOMDXTC\n", {}),
    "f32_2d_biomdxtc":      ((2000, 3), np.float32, ["-M", "ABS", "1e-3"],
                             "[GlobalSettings]\nCmprAlgo = ALGO_BIOMDXTC\n", {}),
}

DTYPE_FLAG = {np.float32: ["-f"], np.float64: ["-d"], np.int32: ["-I", "32"], np.int64: ["-I", "64"]}


def kind_for(name: str) -> str:
    if "biomd" in name:
        return "traj_fill" if "fill" in name else "traj"
    return "noisy" if "noisy" in name else "smooth"


def gen_case(sz3: str, name: str, force: bool = False) -> dict:
    shape, dtype, args, ini, env = CASES[name]
    datf = HERE / f"{name}.dat"
    szf = HERE / f"{name}.sz"
    outf = HERE / f"{name}.out"
    if szf.exists() and not force:
        return {"name": name, "skipped": True}
    kind = kind_for(name)
    arr = synth(shape, dtype, kind)
    if dtype in (np.int32, np.int64):
        arr = (synth(shape, np.float64, kind) * 1000).astype(dtype)
    arr.tofile(datf)
    dim_args = [f"-{len(shape)}"] + [str(s) for s in reversed(shape)]  # CLI is fastest-first
    cmd = [sz3, *DTYPE_FLAG[dtype], "-i", str(datf), "-z", str(szf), "-o", str(outf), *dim_args, *args]
    ini_path = None
    if ini:
        ini_path = HERE / f"{name}.config"
        ini_path.write_text(ini)
        cmd += ["-c", str(ini_path)]
    e = dict(os.environ, **env)
    r = subprocess.run(cmd, capture_output=True, text=True, env=e)
    if r.returncode != 0:
        raise RuntimeError(f"{name}: {r.stderr}\n{r.stdout}")
    import hashlib
    sha = lambda p: hashlib.sha256(Path(p).read_bytes()).hexdigest()
    info = {"name": name, "shape": list(shape), "dtype": np.dtype(dtype).name,
            "args": args, "ini": ini, "env": env,
            "dat_sha": sha(datf), "sz_sha": sha(szf), "out_sha": sha(outf)}
    # only the .sz archives are committed; inputs re-synthesize bit-identically
    datf.unlink()
    outf.unlink()
    return info


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sz3", default="/tmp/ref-build/tools/sz3/sz3")
    p.add_argument("--force", action="store_true")
    a = p.parse_args()
    # keep prior metadata for cases whose archives already exist
    old = {}
    mf = HERE / "manifest.json"
    if mf.exists():
        old = {c["name"]: c for c in json.loads(mf.read_text()) if not c.get("skipped")}
    manifest = []
    for name in CASES:
        info = gen_case(a.sz3, name, a.force)
        if info.get("skipped"):
            if name not in old:
                raise RuntimeError(f"{name}: archive exists but manifest entry missing; use --force")
            info = old[name]
        manifest.append(info)
        print("ok", name)
    mf.write_text(json.dumps(manifest, indent=1))


if __name__ == "__main__":
    main()
