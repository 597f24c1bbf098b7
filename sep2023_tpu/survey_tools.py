"""Survey/construction helpers carried over from the reference's legacy
Julia utilities (`Ops/FWI/fwi_util.jl` — capability reference; not on the
reference's Python path but part of its feature surface):

  - vs_bounds_from_cloud : Vs L-BFGS-B bounds derived from a Vp-Vs well-log
    point cloud (cs_bounds_cloud, fwi_util.jl:122-134)
  - compute_rxz          : local sxx/szz source moment ratio from smoothed
    Vp/Vs around each source (computeRsxxzz, fwi_util.jl:174-194)
"""
from __future__ import annotations

import numpy as np


def vs_bounds_from_cloud(vp_img: np.ndarray, cloud: np.ndarray):
    """Vs bounds per pixel from a (3, N) bounds cloud:
    row 0 = vp reference line, row 1 = vs upper line, row 2 = vs lower line
    (linear interpolation).  The upper bound is additionally capped at
    vp/sqrt(2) - 1 (the physical lambda > 0 limit), as the reference does.

    Returns (vs_low, vs_high) arrays shaped like vp_img.
    """
    cloud = np.asarray(cloud, dtype=np.float64)
    order = np.argsort(cloud[0])
    vp_line, vs_hi_line, vs_lo_line = (cloud[0, order], cloud[1, order],
                                       cloud[2, order])
    hi = np.interp(vp_img, vp_line, vs_hi_line)
    lo = np.interp(vp_img, vp_line, vs_lo_line)
    hi = np.minimum(hi, vp_img / np.sqrt(2.0) - 1.0)
    return lo, hi


def energy_trace_weights(obs: np.ndarray, floor: float = 1e-3) -> np.ndarray:
    """Per-trace weights that equalize trace amplitudes, 1/max|trace|
    normalized to unit mean — the capability of the legacy
    `weightObsTraces` (fwi_util.jl:196+).  obs: (..., n_rec, nt); returns
    weights shaped (..., n_rec)."""
    amax = np.abs(obs).max(axis=-1)
    amax = np.maximum(amax, floor * amax.max() + 1e-30)
    w = 1.0 / amax
    return w / w.mean()


def compute_rxz(vp: np.ndarray, vs: np.ndarray, src_z: np.ndarray,
                src_x: np.ndarray) -> np.ndarray:
    """sxx/szz moment ratio per source from the 9x9 neighborhood average of
    Vp/Vs around the source (center excluded):
    rxz = vp_ave^2 / (vp_ave^2 - 2 vs_ave^2)."""
    vp_pad = np.pad(vp, 4, mode="edge")
    vs_pad = np.pad(vs, 4, mode="edge")
    mask = np.ones((9, 9))
    mask[4, 4] = 0.0
    rxz = np.zeros(len(src_z), dtype=np.float64)
    for i, (z, x) in enumerate(zip(np.asarray(src_z) + 4,
                                   np.asarray(src_x) + 4)):
        vp_ave = np.mean(vp_pad[z - 4:z + 5, x - 4:x + 5] * mask)
        vs_ave = np.mean(vs_pad[z - 4:z + 5, x - 4:x + 5] * mask)
        rxz[i] = vp_ave ** 2 / (vp_ave ** 2 - 2.0 * vs_ave ** 2)
    return rxz
