"""Preprocessors, mirroring the reference's (vestigial) preprocessor layer
(include/SZ3/preprocessor/: Transpose.hpp, PreFilter.hpp, Wavelet.hpp).

None of these is wired into the archive pipeline in the reference either
(SURVEY.md Lp layer); they are user-side data conditioning helpers. The
wavelet here is a self-contained Daubechies-4 pyramidal transform (the
reference delegates to GSL and is compiled out unless SZ3_ENABLE_GSL).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def transpose(data: np.ndarray, axes: Sequence[int]) -> np.ndarray:
    """Axis permutation into a fresh contiguous buffer
    (reference Transpose.hpp: up to 4D)."""
    if data.ndim > 4:
        raise ValueError("Data in 5D and above is not supported yet.")
    return np.ascontiguousarray(np.transpose(data, axes))


def prefilter(data: np.ndarray, value_range: Tuple[float, float],
              default_value: float) -> np.ndarray:
    """Replace out-of-range values with a default (reference PreFilter.hpp)."""
    lo, hi = value_range
    out = data.copy()
    out[(out < lo) | (out > hi)] = default_value
    return out


# Daubechies-4 analysis coefficients
_D4_H = np.array([(1 + np.sqrt(3)), (3 + np.sqrt(3)), (3 - np.sqrt(3)), (1 - np.sqrt(3))],
                 dtype=np.float64) / (4 * np.sqrt(2))
_D4_G = np.array([_D4_H[3], -_D4_H[2], _D4_H[1], -_D4_H[0]], dtype=np.float64)


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def wavelet_forward(data: np.ndarray) -> np.ndarray:
    """Pyramidal D4 DWT over the flattened array, zero-padded to a power of
    two (reference Wavelet.hpp preprocess). Returns the coefficient array of
    the padded length; invert with wavelet_inverse(coeffs, n)[:n]."""
    x = np.asarray(data, dtype=np.float64).ravel()
    n = x.size
    m = _next_pow2(n)
    buf = np.zeros(m, dtype=np.float64)
    buf[:n] = x
    length = m
    while length >= 4:
        half = length // 2
        seg = buf[:length]
        idx = (np.arange(half)[:, None] * 2 + np.arange(4)[None, :]) % length
        windows = seg[idx]
        smooth = windows @ _D4_H
        detail = windows @ _D4_G
        buf[:half] = smooth
        buf[half:length] = detail
        length = half
    return buf


def wavelet_inverse(coeffs: np.ndarray, n: int) -> np.ndarray:
    """Inverse of wavelet_forward; returns the first n samples."""
    buf = np.asarray(coeffs, dtype=np.float64).copy()
    m = buf.size
    length = 4
    while length <= m:
        half = length // 2
        smooth = buf[:half]
        detail = buf[half:length]
        # transpose of the analysis operator (orthonormal bank), scattered
        # with the same index matrix the forward transform gathers through
        idx = (np.arange(half)[:, None] * 2 + np.arange(4)[None, :]) % length
        contrib = smooth[:, None] * _D4_H[None, :] + detail[:, None] * _D4_G[None, :]
        out = np.zeros(length, dtype=np.float64)
        np.add.at(out, idx, contrib)
        buf[:length] = out
        length *= 2
    return buf[:n]
