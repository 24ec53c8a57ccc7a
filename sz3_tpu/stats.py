"""Distortion metrics and error-bound conversions.

Mirrors reference utils/Statistic.hpp: `verify` (:80-140) and
`calAbsErrorBound` (:31-56).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .config import Config, EB


def data_range(data: np.ndarray) -> float:
    return float(data.max() - data.min())


def device_fallbacks() -> dict:
    """Counters of device->host fallbacks by reason (observability for the
    `backend="jax"` encode paths; reset with .clear())."""
    from .algos.device_encode import fallback_counts

    return fallback_counts


def cal_abs_error_bound(conf: Config, data: np.ndarray, value_range: float = 0.0) -> None:
    """Convert any error-bound mode to ABS in place (Statistic.hpp:31-56)."""
    if conf.errorBoundMode == EB.ABS:
        return
    rng = value_range if value_range > 0 else data_range(data)
    if conf.errorBoundMode == EB.REL:
        conf.absErrorBound = conf.relErrorBound * rng
    elif conf.errorBoundMode == EB.PSNR:
        v1 = conf.psnrErrorBound + 10 * math.log10(1 - 2.0 / 3.0 * 0.99)
        conf.absErrorBound = rng * 10 ** (v1 / -20)
    elif conf.errorBoundMode == EB.L2NORM:
        conf.absErrorBound = math.sqrt(3.0 / conf.num) * conf.l2normErrorBound
    elif conf.errorBoundMode == EB.ABS_AND_REL:
        conf.absErrorBound = min(conf.absErrorBound, conf.relErrorBound * rng)
    elif conf.errorBoundMode == EB.ABS_OR_REL:
        conf.absErrorBound = max(conf.absErrorBound, conf.relErrorBound * rng)
    else:
        raise ValueError("error bound mode not supported")
    conf.errorBoundMode = EB.ABS


@dataclass
class Distortion:
    min: float
    max: float
    value_range: float
    max_abs_err: float
    max_rel_err: float
    max_pw_rel_err: float
    psnr: float
    nrmse: float
    norm_err: float
    norm_err_norm: float
    ac_eff: float

    def report(self) -> str:
        return (
            f"Min={self.min:.20G}, Max={self.max:.20G}, range={self.value_range:.20G}\n"
            f"Max absolute error = {self.max_abs_err:.2G}\n"
            f"Max relative error = {self.max_rel_err:.2G}\n"
            f"Max pw relative error = {self.max_pw_rel_err:.2G}\n"
            f"PSNR = {self.psnr:f}, NRMSE= {self.nrmse:.10G}\n"
            f"normError = {self.norm_err:f}, normErr_norm = {self.norm_err_norm:f}\n"
            f"acEff={self.ac_eff:f}"
        )


def verify(original: np.ndarray, decoded: np.ndarray) -> Distortion:
    """Full distortion report (reference Statistic.hpp:80-140)."""
    ori = np.asarray(original, dtype=np.float64).ravel()
    dec = np.asarray(decoded, dtype=np.float64).ravel()
    n = ori.size
    mn, mx = float(ori.min()), float(ori.max())
    rng = mx - mn
    err = dec - ori
    abs_err = np.abs(err)
    max_abs = float(abs_err.max())
    nz = ori != 0
    max_pw = float((abs_err[nz] / np.abs(ori[nz])).max()) if nz.any() else 0.0
    mse = float((err * err).mean())
    psnr = 20 * math.log10(rng) - 10 * math.log10(mse) if mse > 0 and rng > 0 else math.inf
    nrmse = math.sqrt(mse) / rng if rng > 0 else 0.0
    m1, m2 = float(ori.mean()), float(dec.mean())
    prod = float(((ori - m1) * (dec - m2)).mean())
    s1 = math.sqrt(float(((ori - m1) ** 2).mean()))
    s2 = math.sqrt(float(((dec - m2) ** 2).mean()))
    ac = prod / s1 / s2 if s1 > 0 and s2 > 0 else 0.0
    norm_err = math.sqrt(float((err * err).sum()))
    l2 = math.sqrt(float((dec * dec).sum()))
    return Distortion(
        min=mn, max=mx, value_range=rng,
        max_abs_err=max_abs,
        max_rel_err=max_abs / rng if rng > 0 else 0.0,
        max_pw_rel_err=max_pw,
        psnr=psnr, nrmse=nrmse,
        norm_err=norm_err,
        norm_err_norm=norm_err / l2 if l2 > 0 else 0.0,
        ac_eff=ac,
    )
