"""ParaView reader plugin smoke test (no ParaView on this host: exercises the
import surface and the archive-parsing path `_read`, which is all our code —
the vtk pipeline methods are thin wrappers validated only under ParaView).

Reference counterpart: tools/paraview/SZ3Reader/Reader/vtkSZ3Reader.cxx.
"""

import sys
from pathlib import Path

import numpy as np

import sz3_tpu as szt

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def _archive(tmp_path, shape=(12, 10, 8), eb=1e-3):
    rng = np.random.default_rng(0)
    arr = np.cumsum(rng.standard_normal(shape), axis=0).astype(np.float32) * 0.1
    blob = szt.compress(arr, szt.Config(dims=arr.shape, absErrorBound=eb))
    p = tmp_path / "field.sz"
    p.write_bytes(blob)
    return arr, p


def test_reader_importable_without_paraview():
    import paraview_sz3_reader as pv
    assert not pv._HAVE_PARAVIEW  # this host has no ParaView
    assert pv.SZ3TpuReader is not None


def test_read_self_described_dims(tmp_path):
    import paraview_sz3_reader as pv
    arr, p = _archive(tmp_path)
    r = pv.SZ3TpuReader()
    r.SetFileName(str(p))
    got = r._read()
    assert got.shape == arr.shape
    assert np.abs(got - arr).max() <= 1e-3


def test_read_dims_override(tmp_path):
    """Explicit DomainDimensions are x,y,z fastest-first (vtkSZ3Reader's
    convention) — the numpy shape is their reverse."""
    import paraview_sz3_reader as pv
    arr, p = _archive(tmp_path, shape=(12, 10, 8))
    r = pv.SZ3TpuReader()
    r.SetFileName(str(p))
    r.SetDomainDimensions(8, 10, 12)
    got = r._read()
    assert got.shape == (12, 10, 8)
    assert np.abs(got - arr).max() <= 1e-3
