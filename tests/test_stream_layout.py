"""The padded device stream layout must enumerate real slots in exactly the
native walker's archive order (reference InterpolationDecomposition traversal)
for every shape/algo/direction combination the device path accepts."""

import numpy as np
import pytest

from sz3_tpu import runtime
from sz3_tpu.config import ALGO, Config
from sz3_tpu.ops.interp_fast import build_fast_plan
from sz3_tpu.ops.stream_layout import (SENTINEL, build_stream_layout,
                                       layout_grid_indices)

CASES = [
    # dims, interp_algo, direction, anchor_stride
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
def test_layout_matches_walker(dims, algo, direction, astride):
    plan = build_fast_plan(dims, interp_algo=algo, direction=direction,
                           anchor_stride=astride, alpha=1.25, beta=2.0,
                           eb=1e-3, quantbin_cnt=65536)
    if plan.anchor_stride == 0:
        pytest.skip("no anchor grid for this shape")
    lp = build_stream_layout(plan, algo)
    slots = layout_grid_indices(plan, lp)
    real = slots[slots != SENTINEL]

    conf = Config(dims=dims, cmprAlgo=ALGO.INTERP)
    conf.interpAlgo = algo
    conf.interpDirection = direction
    conf.interpAnchorStride = astride
    order = runtime.interp_order(conf)

    assert real.size == order.size, (real.size, order.size)
    mism = np.nonzero(real != order)[0]
    assert mism.size == 0, (
        f"first mismatch at stream slot {mism[0] if mism.size else -1}: "
        f"got {real[mism[:5]]}, want {order[mism[:5]]}")
    assert lp.padded_len == slots.size
