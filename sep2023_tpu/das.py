"""DAS (distributed acoustic sensing) operators: fiber geometry, directional
sensitivity weights, and the gauge-length quadrature response.

Python/JAX re-design of:
  - fiber geometry + Frenet-tangent sensitivity generation
    (`DAS_Waveform_Modeling/matlab/DAS_Geometry_Homogeneous.m`,
     `frenet.m`, `interparc.m` — MATLAB, offline) — here `arc_fiber`,
    `spline_fiber`, `resample_arclength`, `tangents`, `sensitivity_weights`
  - the analytical gauge-length response by quadrature along the cable
    (`DAS_Waveform_Modeling/src/dasResponse.py`) — here `das_response`
  - the differentiable gauge-averaging map for the inversion path — here
    `gauge_matrix` (compose with the propagator's per-point strain channels).

A cable is represented as an array (npts, 9): columns (x, y, z, w1..w6) with
the 6 tangential-projection weights
    [TxTx, 2 TxTy, 2 TxTz, TyTy, 2 TyTz, TzTz]
(order of `DAS_Geometry_Homogeneous.m:78-85` and the Cable*_quad_*.dat files),
so that the fiber-axis strain is  e_tt = sum_i w_i * E_i  with
E = (Exx, Exy, Exz, Eyy, Eyz, Ezz).
"""
from __future__ import annotations

import numpy as np

from sep2023_tpu import analytic as an

N_CABLE_PTS = 21  # canonical cable discretization (dasResponse.py:20)

# quadrature point subsets on the 21-point cable (dasResponse.py:26-39)
QUAD_POINTS = {
    1: (np.array([10]), 21),
    3: (np.array([3, 10, 17]), 7),
    7: (np.array([1, 4, 7, 10, 13, 16, 19]), 3),
    21: (np.arange(21), 1),
}


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def resample_arclength(points: np.ndarray, n: int) -> np.ndarray:
    """Resample a polyline (m, d) to n points equally spaced in arc length
    (the role of the vendored `interparc.m`; cubic-refined linear variant)."""
    seg = np.linalg.norm(np.diff(points, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    s_new = np.linspace(0.0, s[-1], n)
    return np.stack([np.interp(s_new, s, points[:, d])
                     for d in range(points.shape[1])], axis=1)


def tangents(points: np.ndarray) -> np.ndarray:
    """Unit tangents along a polyline (m, d) by centered differences — the
    T output of `frenet.m`."""
    g = np.gradient(points, axis=0)
    return g / np.linalg.norm(g, axis=1, keepdims=True)


def sensitivity_weights(T: np.ndarray) -> np.ndarray:
    """(m, 3) unit tangents -> (m, 6) strain-projection weights
    [TxTx, 2TxTy, 2TxTz, TyTy, 2TyTz, TzTz]."""
    tx, ty, tz = T[:, 0], T[:, 1], T[:, 2]
    return np.stack([tx * tx, 2 * tx * ty, 2 * tx * tz,
                     ty * ty, 2 * ty * tz, tz * tz], axis=1)


def _finish_cable(pts3: np.ndarray) -> np.ndarray:
    w = sensitivity_weights(tangents(pts3))
    return np.concatenate([pts3, w], axis=1)


def arc_fiber(gauge_length: float, radius_over_gl: float,
              center=(0.0, 0.0, 0.0), npts: int = N_CABLE_PTS,
              plane: str = "xy") -> np.ndarray:
    """Cable shaped as a circular arc of unit arc-length (scaled by the gauge
    length) with curvature radius `radius_over_gl * GL`
    (DAS_Geometry_Homogeneous.m:19-40 uses r in {1/pi, 2/pi, 1e10/pi}).

    Returns (npts, 9) cable array.  `plane` places the arc in 'xy' or 'xz'.
    """
    r = radius_over_gl
    theta = 1.0 / r
    t = np.linspace(np.pi / 2 - theta / 2, np.pi / 2 + theta / 2, 101)
    x = r * np.cos(t) * gauge_length
    y = r * np.sin(t) * gauge_length
    y = y - y[0]
    curve = np.stack([x, y], axis=1)
    curve = resample_arclength(curve, npts)
    zero = np.zeros((npts, 1))
    if plane == "xy":
        pts3 = np.concatenate([curve, zero], axis=1)
    elif plane == "xz":
        pts3 = np.stack([curve[:, 0], zero[:, 0], curve[:, 1]], axis=1)
    else:
        raise ValueError(plane)
    pts3 = pts3 + np.asarray(center)[None, :]
    return _finish_cable(pts3)


def straight_fiber(gauge_length: float, direction=(1.0, 0.0, 0.0),
                   center=(0.0, 0.0, 0.0), npts: int = N_CABLE_PTS) -> np.ndarray:
    d = np.asarray(direction, dtype=np.float64)
    d = d / np.linalg.norm(d)
    s = np.linspace(-gauge_length / 2, gauge_length / 2, npts)
    pts3 = np.asarray(center)[None, :] + s[:, None] * d[None, :]
    return _finish_cable(pts3)


def spline_fiber(control_points: np.ndarray, npts: int = N_CABLE_PTS) -> np.ndarray:
    """Cable through arbitrary 3D control points, resampled to equal arc
    length (the Overthrust generator, DAS_Geometry_Overthrust.m:28-50)."""
    from scipy.interpolate import CubicSpline
    cp = np.asarray(control_points, dtype=np.float64)
    u = np.linspace(0, 1, cp.shape[0])
    dense = CubicSpline(u, cp, axis=0)(np.linspace(0, 1, 50 * cp.shape[0]))
    pts3 = resample_arclength(dense, npts)
    return _finish_cable(pts3)


# ---------------------------------------------------------------------------
# Analytical gauge-length response (validation oracle)
# ---------------------------------------------------------------------------

def das_response(vp, vs, rho, gauge_length, cable, nquad, src_xyz,
                 tmin, tmax, dt, f0, M0, M):
    """Gauge-length DAS response by N-point quadrature of the analytical
    strain along the cable (dasResponse.py:15-74): per quadrature point the
    6-component strain is projected onto the fiber with the sensitivity
    weights of the surrounding cable points, then trapezoid-averaged over the
    gauge length."""
    if cable.shape[0] != N_CABLE_PTS:
        raise ValueError(f"cable must have {N_CABLE_PTS} points")
    if nquad not in QUAD_POINTS:
        raise ValueError("nquad must be one of 1, 3, 7, 21")
    points, nq = QUAD_POINTS[nquad]

    t = np.arange(tmin, tmax + dt, dt)
    das_point = np.zeros((N_CABLE_PTS, t.shape[0]))
    sx, sy, sz = src_xyz
    for p in points:
        x, y, z = cable[p, 0] - sx, cable[p, 1] - sy, cable[p, 2] - sz
        U = an.solution(vp, vs, rho, x, y, z, tmin, tmax, dt, f0, M0, M,
                        dim="3D", comp="strain")
        E = np.stack([U["Exx"], U["Exy"], U["Exz"],
                      U["Eyy"], U["Eyz"], U["Ezz"]])
        lo, hi = p - nq // 2, p + nq // 2 + 1
        for j in range(lo, hi):
            das_point[j] = cable[j, 3:9] @ E
    s = np.linspace(-gauge_length / 2, gauge_length / 2, N_CABLE_PTS)
    return np.trapezoid(das_point, s, axis=0) / gauge_length


# ---------------------------------------------------------------------------
# Cable -> solver acquisition (the 2D inversion path)
# ---------------------------------------------------------------------------

def cable_to_receivers(cable: np.ndarray, dx: float, dz: float,
                       origin=(0.0, 0.0)):
    """Map a cable array (from arc_fiber/spline_fiber/straight_fiber, built
    in the MATLAB x-y plane) onto the 2D solver's (z, x) grid:

      cable x -> solver x,  cable y -> solver z (depth), cable z ignored
      (the same plane identification the reference uses when feeding
      Cable*_quad_*.dat weights to elasticSolver.py:269-276)

    Returns (rec_z, rec_x, das_w): integer grid indices (PHYSICAL grid,
    nearest node) and (npts, 3) weights for the solver's (exx, exz, ezz)
    strain channels — columns (TxTx, 2TxTy, TyTy) of the 6-weight set.
    """
    ox, oz = origin
    rec_x = np.rint((cable[:, 0] - ox) / dx).astype(np.int32)
    rec_z = np.rint((cable[:, 1] - oz) / dz).astype(np.int32)
    das_w = cable[:, [3, 4, 6]].astype(np.float64)
    return rec_z, rec_x, das_w


def apply_gauge(ett_points, A):
    """Gauge-average per-point fiber strains: ett_points (..., npts_total,
    nt) x A (nchan, npts_total) -> (..., nchan, nt).  Constant linear map —
    composes differentiably with any misfit."""
    import jax.numpy as jnp
    return jnp.einsum("cp,...pt->...ct", jnp.asarray(A, ett_points.dtype),
                      ett_points)


# ---------------------------------------------------------------------------
# Differentiable gauge averaging for the inversion path
# ---------------------------------------------------------------------------

def gauge_matrix(n_channels: int, pts_per_channel: int = N_CABLE_PTS,
                 gauge_length: float = 1.0) -> np.ndarray:
    """Linear map A: per-point fiber strains -> gauge-averaged channels.

    The propagator records one 'ett' trace per cable point (with the point's
    sensitivity weights, das_channel='weighted'); the gauge average is then
    data_gauge = A @ data_points, A of shape
    (n_channels, n_channels*pts_per_channel) carrying the trapezoid weights
    of `np.trapz(..)/GL` (dasResponse.py:72-73).  Being a constant linear
    operator it is trivially differentiable and fuses into the misfit.
    """
    m = pts_per_channel
    w = np.full(m, gauge_length / (m - 1))
    w[0] *= 0.5
    w[-1] *= 0.5
    w = w / gauge_length
    A = np.zeros((n_channels, n_channels * m))
    for c in range(n_channels):
        A[c, c * m:(c + 1) * m] = w
    return A
