"""Build the szt native engine (libszt.so) on demand.

Rebuilds when any source header changes (content hash is embedded in the
output name so stale .so files are never picked up).

Flag notes: -ffp-contract=off keeps scalar float expressions IEEE-exact per
operation (no FMA fusion), which the bit-parity contract with the reference
codec depends on; -march=native is then safe and buys vector width for the
quantizer loops.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent
_SOURCES = [
    _NATIVE_DIR / "szt_core.cpp",
]
_HEADERS = sorted((_NATIVE_DIR / "szt").glob("*.hpp"))

CXX = os.environ.get("CXX", "g++")
CXXFLAGS = [
    "-O3",
    "-std=c++17",
    "-fPIC",
    "-shared",
    "-pthread",
    "-march=native",
    "-funroll-loops",
    "-ffp-contract=off",
    "-Wall",
]


def _tree_hash() -> str:
    h = hashlib.sha256()
    for f in _SOURCES + _HEADERS + [Path(__file__)]:
        h.update(f.name.encode())
        h.update(f.read_bytes())
    return h.hexdigest()[:16]


def lib_path() -> Path:
    return _NATIVE_DIR / f"libszt-{_tree_hash()}.so"


def build(verbose: bool = False) -> Path:
    out = lib_path()
    if out.exists():
        return out
    cmd = [CXX, *CXXFLAGS, "-I", str(_NATIVE_DIR), *(str(s) for s in _SOURCES),
           "-o", str(out), "-lzstd"]
    if verbose:
        print("szt native build:", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"native build failed:\n{proc.stderr}")
    # drop stale builds
    for old in _NATIVE_DIR.glob("libszt-*.so"):
        if old != out:
            try:
                old.unlink()
            except OSError:
                pass
    return out


_H5Z_SOURCE = _NATIVE_DIR / "h5z_szt.cpp"


def _h5z_hash() -> str:
    h = hashlib.sha256()
    for f in [_H5Z_SOURCE] + _HEADERS + [Path(__file__)]:
        h.update(f.name.encode())
        h.update(f.read_bytes())
    return h.hexdigest()[:16]


def h5z_lib_path() -> Path:
    return _NATIVE_DIR / f"libh5zszt-{_h5z_hash()}.so"


def build_h5z(verbose: bool = False) -> Path:
    """Build the HDF5 filter plugin (filter id 32024)."""
    out = h5z_lib_path()
    if out.exists():
        return out
    cmd = [CXX, *CXXFLAGS, "-I", str(_NATIVE_DIR), str(_H5Z_SOURCE),
           "-o", str(out), "-lzstd", "-ldl"]
    if verbose:
        print("h5z-szt build:", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"h5z plugin build failed:\n{proc.stderr}")
    for old in _NATIVE_DIR.glob("libh5zszt-*.so"):
        if old != out:
            try:
                old.unlink()
            except OSError:
                pass
    return out


if __name__ == "__main__":
    print(build(verbose=True))
    print(build_h5z(verbose=True))
