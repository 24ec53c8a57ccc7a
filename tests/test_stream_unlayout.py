"""Inverse stream layout: dense archive-order slots -> per-pass arrays must
exactly invert the forward layout (ops/stream_layout.py) for every shape the
device path accepts. Pure data movement — validated on CPU numpy."""

import numpy as np
import pytest

from sz3_tpu.ops.interp_fast import build_fast_plan
from sz3_tpu.ops.stream_layout import (SENTINEL, apply_stream_layout,
                                       build_stream_layout)
from sz3_tpu.ops.stream_unlayout import (build_inverse_plan, dense_count,
                                         invert_stream_layout)

CASES = [
    ((64, 64, 64), 1, 0, 32),
    ((40, 33, 27), 1, 0, 32),
    ((65, 64, 63), 1, 0, 32),
    ((100, 120, 36), 1, 0, 32),
    ((40, 33, 27), 0, 0, 32),       # linear
    ((64, 48, 50), 1, 5, 32),       # reversed direction
    ((39, 41, 43), 1, 3, 32),
    ((97, 101), 1, 0, 128),         # 2D line-major API
    ((129, 200), 1, 0, 128),
    ((200, 129), 0, 0, 128),
    ((300, 70), 1, 1, 128),
    ((5000,), 1, 0, 4096),          # 1D
    ((4097,), 0, 0, 4096),
    ((33, 34, 35, 36), 1, 0, 16),   # 4D
    ((20, 21, 22, 23), 1, 10, 16),
]


@pytest.mark.parametrize("dims,algo,direction,astride", CASES)
def test_inverse_roundtrip(dims, algo, direction, astride):
    plan = build_fast_plan(dims, interp_algo=algo, direction=direction,
                           anchor_stride=astride, alpha=1.25, beta=2.0,
                           eb=1e-3, quantbin_cnt=65536)
    if plan.anchor_stride == 0:
        pytest.skip("no anchor grid for this shape")
    lp = build_stream_layout(plan, algo)
    lplans = build_inverse_plan(lp)

    # distinct values per pass element so any misplacement is caught
    rng = np.random.default_rng(7)
    passes = []
    for spec in plan.passes:
        counts = list(spec.shape_in)
        counts[spec.dd] = spec.p
        passes.append(rng.integers(1, 1 << 30,
                                   tuple(counts)).astype(np.int64))
    anchor_dims = tuple((d - 1) // plan.anchor_stride + 1 for d in dims)
    anchors = rng.integers(1, 1 << 30, anchor_dims).astype(np.int64)

    padded = apply_stream_layout(np, lp, passes, anchors,
                                 np.int64(SENTINEL))
    dense = padded[padded != SENTINEL]
    assert dense.size == dense_count(lp, lplans)

    anc, inv = invert_stream_layout(np, lp, lplans, dense)
    assert np.array_equal(anc, anchors.reshape(-1))
    assert len(inv) == len(passes)
    for k, (got, want) in enumerate(zip(inv, passes)):
        assert got.shape == want.shape, (k, got.shape, want.shape)
        assert np.array_equal(got, want), f"pass {k} mismatch"
