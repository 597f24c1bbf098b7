"""Unit tests for the Aki & Richards analytical module (the numerics oracle).

Mirrors the validation role of the reference's analyticalSolution.py; the
closed-form near-field integral is checked against brute-force quadrature.
"""
import numpy as np

from sep2023_tpu import analytic as an


def test_near_field_closed_form_vs_quadrature():
    f0, M0 = 10.0, 1e16
    t = np.linspace(0.0, 1.0, 101)
    a, b = 0.13, 0.26
    dt_f = 2e-6
    tau = np.arange(a, b, dt_f)
    ref = np.array([np.sum(an.stf_ricker(ti - tau, f0) * tau) * dt_f
                    for ti in t]) * M0
    mine = an.near_field_integral(t, a, b, f0, M0)
    assert np.abs(ref - mine).max() / np.abs(ref).max() < 1e-4


def test_ricker_derivative_consistency():
    f0 = 8.0
    t = np.linspace(0, 1, 20001)
    dt = t[1] - t[0]
    s = an.stf_ricker(t, f0)
    d1_num = np.gradient(s, dt)
    d1 = an.stf_ricker_d1(t, f0)
    assert np.abs(d1 - d1_num).max() / np.abs(d1).max() < 1e-4
    d2_num = np.gradient(d1, dt)
    d2 = an.stf_ricker_d2(t, f0)
    assert np.abs(d2 - d2_num).max() / np.abs(d2).max() < 1e-4


def test_moment_tensor_symmetric_dc():
    M = an.moment_tensor(37.0, 62.0, 45.0)
    assert np.allclose(M, M.T)
    # double couple: trace zero, det zero
    assert abs(np.trace(M)) < 1e-12
    assert abs(np.linalg.det(M)) < 1e-12


def test_explosion_has_no_near_or_shear_field():
    """For M = I the near-field radiation pattern AN vanishes identically and
    the S-wave far field is zero — a strong internal consistency check."""
    t = np.linspace(0, 0.8, 400)
    vp, vs, rho, f0, M0 = 3000.0, 1500.0, 2500.0, 10.0, 1e15
    xyz = np.array([[300.0, 200.0, 100.0]])
    U = an.displacement_3d(vp, vs, rho, xyz, t, f0, M0, np.eye(3))[0]
    # pure P arrival: no energy at the S arrival time away from P coda
    r0 = np.linalg.norm(xyz)
    ts = r0 / vs + 1.2 / f0
    i_s = np.argmin(np.abs(t - ts))
    # radial motion only: U parallel to r
    r = xyz[0] / r0
    Uperp = U - np.einsum("i,it->t", r, U)[None, :] * r[:, None]
    assert np.abs(Uperp).max() < 1e-10 * np.abs(U).max() + 1e-30
    # ... and no S-ARRIVAL either: displacement around t = r/vs (well past
    # the P coda) stays far below the P amplitude — a sign/term bug in the
    # far-field S radiation pattern for M=I would deposit energy there
    u_s = np.abs(U[:, max(0, i_s - 2):i_s + 3]).max()
    assert u_s < 1e-3 * np.abs(U).max(), (u_s, np.abs(U).max())


def test_2d_line_integral_converges():
    """Doubling the y-quadrature density changes the 2D solution by < 1%."""
    vp, vs, rho, f0, M0 = 3000.0, 1732.0, 2500.0, 12.0, 1e15
    t = np.arange(0.0, 0.4, 0.002)
    M = np.diag([1.0, 1.0, 1.0])
    U1 = an.displacement_2d(vp, vs, rho, 300.0, 200.0, t, f0, M0, M)
    U2 = an.displacement_2d(vp, vs, rho, 300.0, 200.0, t, f0, M0, M,
                            oversample=2.0)
    scale = np.abs(U2[0]).max()
    assert np.abs(U1[0] - U2[0]).max() / scale < 0.01
    assert np.abs(U1[2] - U2[2]).max() / scale < 0.01


def test_solution_dispatch_strain_2d():
    sol = an.solution(3000.0, 1500.0, 2500.0, 250.0, 0.0, 200.0,
                      0.0, 0.3, 0.002, 12.0, 1e15, np.eye(3),
                      dim="2D", comp="strain")
    for k in ("Exx", "Ezz", "Exz"):
        assert k in sol and np.isfinite(sol[k]).all()
