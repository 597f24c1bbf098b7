"""Fused Pallas TPU engine: the whole elastic time loop in one kernel.

The XLA engine (propagator.py) issues a handful of fused VPU loops per time
step, reading/writing ~18 full (nz, nx) arrays in HBM each step — it is HBM
bandwidth bound.  This engine instead keeps ALL state (5 fields + 8 CPML
memory arrays) in VMEM scratch for the entire nt-step loop:

  pallas_call(grid=(n_shots,))          one program per shot (sequential)
    scalar prefetch: per-shot source indices + wavelets (SMEM)
    inputs (VMEM):   material fields, CPML profiles
    scratch (VMEM):  vz, vx, szz, sxx, sxz + 8 psi arrays
    fori_loop over nt-1:
      stress update -> source inject -> velocity update -> record row
    outputs: recordings DMA'd to HBM in REC_CHUNK-step chunks

HBM traffic per step drops from ~8 MB to ~3 KB for the forward pass, so the
kernel runs at VPU arithmetic speed instead of HBM speed (measured ~4x the
XLA engine on a v5e chip).

The GRADIENT engine adds the boundary-saving adjoint
(`Boundary.cu` / `libCUFD.cu:545-653` strategy) fully inside Pallas:
  * the forward kernel packs 5-deep boundary strips of all five fields into
    two lane/sublane-friendly staging buffers per step — left+right columns
    as (nz, 128) [10 lanes per field], top+bottom rows as (56, nx) — and
    DMAs them to HBM (the naive (nz, 5) layout would be lane-padded 25x);
  * the backward kernel walks time in reverse: re-injects the strips,
    runs the time-reversed interior updates to reconstruct the forward
    field, and obtains the EXACT one-step adjoint + material gradients from
    `jax.vjp` of the half-step PHASE functions evaluated on the
    reconstruction's own stencil differences, with the stencil hops between
    phases wired via closed-form transposes (the monolithic step-vjp
    remains as the SEP2023_TPU_BWD=vjp oracle).  The vjps are evaluated at
    trace time INSIDE the kernel, so the machine-derived transposes lower
    through Mosaic like any other kernel code — keeping the
    no-hand-written-adjoint property of the XLA engine (propagator.py) on
    the fast path.

A 3-field acoustic variant (`propagate_pallas_acoustic`) provides the same
forward + phase-split backward for the secondary physics mode.

Fast-path constraints (plan_fast_path; the XLA engine is the general
fallback): receivers on one grid row with contiguous x, OR a K<=4-layer
fiber survey (curved/dipping/multi-row spreads, optionally with directional
'ezz'/'weighted' strain channels), OR either layout on the transposed grid
(boreholes / vertical fibers); state + adjoint must fit the measured VMEM
gates (grad_vmem_fits, through ~528x704 padded grids).

Stencils use pltpu.roll (cyclic rotates); wrap-around values only ever land
in the 2-cell halo that the update mask excludes.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sep2023_tpu import cpml as cpml_mod
from sep2023_tpu.config import C1, C2, SimConfig
from sep2023_tpu.medium import material_fields

LANE = 128
SUBLANE = 8
DEBUG_SKIP_STRIP_PACK = False
DEBUG_SKIP_STRIP_DMA = False
REC_CHUNK = 128
STRIP_L = 5          # boundary strip depth (Boundary.cu:19)
N_FIELDS = 5
TB_ROWS = 56         # 5 fields * 10 strip rows, padded to a sublane multiple


def _pad128(n):
    return ((n + LANE - 1) // LANE) * LANE


def _pad8(n):
    return ((n + SUBLANE - 1) // SUBLANE) * SUBLANE


def _grid_bytes(cfg) -> int:
    return _pad8(cfg.nz) * _pad128(cfg.nx) * 4


def _strip_chunk(cfg) -> int:
    """Steps of boundary strips per DMA (amortizes stalls).  Shrunk on large
    grids where the staging buffers compete with the field state for VMEM.
    Must agree between the forward (writer) and backward (reader) kernels —
    both derive it from cfg."""
    return 2 if _grid_bytes(cfg) > 300_000 else 4


def _drec_chunk(cfg) -> int:
    """Time-steps of data cotangents resident in the backward kernel."""
    return 32 if _grid_bytes(cfg) > 300_000 else 64


def _vmem_limit(cfg) -> int:
    """Scoped-VMEM cap passed to Mosaic.  The compiler DEFAULT is 16 MiB —
    a pipelining-headroom heuristic, not the physical size (v5e cores carry
    128 MiB of VMEM) — so large grids raise it; small grids keep the default
    (more room for XLA to overlap surrounding ops)."""
    return (100 * 2 ** 20 if _grid_bytes(cfg) > 300_000 else 16 * 2 ** 20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _roll(a, shift, axis):
    # jnp.roll semantics (out[i] = a[i - shift]); pltpu.roll requires a
    # non-negative shift, so express negative shifts as n - |shift|.
    # custom_vjp because pltpu.roll has no AD rule: the transpose of a
    # cyclic roll is the roll by -shift (needed by the in-kernel step vjp).
    n = a.shape[axis]
    return pltpu.roll(a, shift % n, axis)


def _roll_fwd(a, shift, axis):
    return _roll(a, shift, axis), None


def _roll_bwd(shift, axis, _, g):
    return (_roll(g, -shift, axis),)


_roll.defvjp(_roll_fwd, _roll_bwd)


def _dz_minus(f):
    return C1 * (f - _roll(f, 1, 0)) - C2 * (_roll(f, -1, 0) - _roll(f, 2, 0))


def _dz_plus(f):
    return C1 * (_roll(f, -1, 0) - f) - C2 * (_roll(f, -2, 0) - _roll(f, 1, 0))


def _dx_minus(f):
    return C1 * (f - _roll(f, 1, 1)) - C2 * (_roll(f, -1, 1) - _roll(f, 2, 1))


def _dx_plus(f):
    return C1 * (_roll(f, -1, 1) - f) - C2 * (_roll(f, -2, 1) - _roll(f, 1, 1))


# Explicit transposes of the four stencils (cyclic rolls transpose to rolls
# by the negated shift): <g, D f> == <D^T g, f> exactly.  Used by the
# phase-split backward kernel; dot-product-tested against jax.vjp of the
# forward stencils in test_pallas_engine.
def _dz_minus_t(g):
    return C1 * (g - _roll(g, -1, 0)) - C2 * (_roll(g, 1, 0) - _roll(g, -2, 0))


def _dz_plus_t(g):
    return C1 * (_roll(g, 1, 0) - g) - C2 * (_roll(g, 2, 0) - _roll(g, -1, 0))


def _dx_minus_t(g):
    return C1 * (g - _roll(g, -1, 1)) - C2 * (_roll(g, 1, 1) - _roll(g, -2, 1))


def _dx_plus_t(g):
    return C1 * (_roll(g, 1, 1) - g) - C2 * (_roll(g, 2, 1) - _roll(g, -1, 1))


def _shift_up_v(a):
    """a[z+1, x] with edge replicate (medium._shift_up), roll-based so it
    lowers in Mosaic and transposes through the in-kernel step vjp."""
    zi = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    return jnp.where(zi == a.shape[0] - 1, a, _roll(a, -1, 0))


def _shift_left_v(a):
    xi = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(xi == a.shape[1] - 1, a, _roll(a, -1, 1))


def _material_fields_values(lam, mu, rho):
    """In-kernel `medium.material_fields` on VALUES (same formulas: harmonic
    4-point mu average, arithmetic staggered buoyancies — Model.cu:85-87,
    utilities.cu:109-152).  Used by the compact backward variant, where the
    vjp through it reproduces the reference's gradient sprays in-kernel."""
    mu_b = _shift_up_v(mu)
    mu_c = _shift_left_v(mu)
    mu_d = _shift_left_v(mu_b)
    nonzero = (mu != 0) & (mu_b != 0) & (mu_c != 0) & (mu_d != 0)
    safe = jnp.where(nonzero, mu, 1.0)
    safe_b = jnp.where(nonzero, mu_b, 1.0)
    safe_c = jnp.where(nonzero, mu_c, 1.0)
    safe_d = jnp.where(nonzero, mu_d, 1.0)
    hm = 4.0 / (1.0 / safe + 1.0 / safe_b + 1.0 / safe_c + 1.0 / safe_d)
    ave_mu = jnp.where(nonzero, hm, 0.0)
    byc_a = 2.0 / (_shift_up_v(rho) + rho)
    byc_b = 2.0 / (_shift_left_v(rho) + rho)
    return (lam, lam + 2.0 * mu, ave_mu, byc_a, byc_b)


class RowSurvey(NamedTuple):
    """Static fast-path acquisition: receivers on one row, contiguous x
    (the reference's surveyGen layout, fwi_utils.py:87-124)."""

    rec_row: int
    rec_x0: int
    n_rec: int


class FiberSurvey(NamedTuple):
    """Static generalized fast-path acquisition: receivers at arbitrary
    (z, x) grid points, partitioned into K *layers* such that every layer
    has at most one receiver per x-lane.  Each layer carries a per-lane row
    map; the kernel records full-width rows by masked sublane reduction
    against the row map (the Mosaic-lowerable generalization of the
    single-row reduction), and the per-receiver samples are gathered from
    the (channel, layer) row planes OUTSIDE the kernel.

    Covers the DAS acquisitions of the paper: curved / dipping fibers
    (z = f(x) per layer, elasticSolver.py:269-276) with the directional
    sensitivity weights, and — through `transpose_plan` — vertical-fiber /
    borehole column layouts (utilities.cu:620-641).

    All fields are hashable (tuples), so a FiberSurvey is a static
    `pallas_call` parameter and its row maps / weights become trace-time
    kernel constants.

    rowmaps:   (K, nx) per-lane receiver rows (row 0 padding on idle lanes)
    rec_layer: (R,) layer index per receiver
    rec_x:     (R,) lane per receiver
    weights:   (R, 3) per-receiver (exx, exz, ezz) sensitivity weights,
               required iff the config's das_channel == 'weighted'
    """

    rowmaps: tuple
    rec_layer: tuple
    rec_x: tuple
    weights: tuple | None = None

    @property
    def n_layers(self) -> int:
        return len(self.rowmaps)

    @property
    def n_rec(self) -> int:
        return len(self.rec_x)


def _n_layers(rs) -> int:
    return rs.n_layers if isinstance(rs, FiberSurvey) else 1


def _bwd_vmem_bytes(cfg: SimConfig, n_layers: int = 1,
                    compact: bool = False) -> int:
    """Rough steady-state VMEM estimate for the BACKWARD kernel (the tighter
    of the two): full (nz, nx) residents — material inputs + 5 primal + 5
    adjoint + 8 adjoint-psi scratch + gradient planes — plus the staging
    buffers.  The compact variant passes raw (lam, mu, rho) and accumulates
    3 gradient planes, trading 4 resident arrays for per-step recomputation
    of the staggered averages."""
    grid = _grid_bytes(cfg)
    n_arrays = (3 + 18 + 3) if compact else (5 + 18 + 5)
    return (n_arrays * grid
            + _strip_chunk(cfg) * _pad8(cfg.nz) * LANE * 4       # lr strips
            + _strip_chunk(cfg) * TB_ROWS * _pad128(cfg.nx) * 4  # tb strips
            + 4 * n_layers * _drec_chunk(cfg) * _pad128(cfg.nx) * 4)  # d_rec


# v5e cores carry 128 MiB of VMEM; the kernels raise the scoped limit to
# 100 MiB on large grids (_vmem_limit).  Mosaic's stack for the vjp
# temporaries runs ~1.5-2.5x past the resident estimate, so the budgets
# below are set from MEASURED pass/fail points on a v5e chip under the
# 100 MiB limit: compact backward COMPILES AND RUNS at a 38.3 MiB estimate
# (528x704 padded, 3.6 GCell/s) and fails Mosaic compilation at 40.6 MiB
# (560x720); the full variant runs at a ~35 MiB estimate (465x640,
# 5.1 GCell/s).  Reference workloads sit far inside: Main-004 rock physics
# (265x385) estimates 11 MiB full.
FULL_BWD_BUDGET = 36 * 2 ** 20
COMPACT_BWD_BUDGET = 39 * 2 ** 20


def _use_compact(cfg: SimConfig, n_layers: int = 1) -> bool:
    return _bwd_vmem_bytes(cfg, n_layers, compact=False) >= FULL_BWD_BUDGET


FWD_BUDGET = 48 * 2 ** 20


def fwd_vmem_fits(cfg: SimConfig, n_layers: int = 1) -> bool:
    """True if the forward kernel's VMEM residents (13 state planes + the
    recording ring) fit comfortably — the gate for choosing the fused
    forward over the streamed one for data generation.  The forward was
    never the binding constraint inside the fused range (the backward gates
    first), so this only matters for forward-only runs on very large
    grids."""
    est = (13 * _grid_bytes(cfg)
           + 4 * n_layers * REC_CHUNK * _pad128(cfg.nx) * 4)
    return est < FWD_BUDGET


def grad_vmem_fits(cfg: SimConfig, budget_bytes: int = None,
                   n_layers: int = 1) -> bool:
    """True if SOME backward variant (full-speed or compact) fits VMEM —
    the gate for choosing the fused engine over the XLA fallback."""
    if budget_bytes is not None:  # explicit budget: judge the full variant
        return _bwd_vmem_bytes(cfg, n_layers, compact=False) < budget_bytes
    return (_bwd_vmem_bytes(cfg, n_layers, compact=False) < FULL_BWD_BUDGET
            or _bwd_vmem_bytes(cfg, n_layers, compact=True)
            < COMPACT_BWD_BUDGET)


def check_row_survey(rec_z: np.ndarray, rec_x: np.ndarray) -> RowSurvey | None:
    rec_z = np.asarray(rec_z)
    rec_x = np.asarray(rec_x)
    if (rec_z == rec_z[0]).all() and (np.diff(rec_x) == 1).all():
        return RowSurvey(int(rec_z[0]), int(rec_x[0]), len(rec_x))
    return None


def make_fiber_survey(rec_z, rec_x, nx: int, das_w=None,
                      max_layers: int = 4) -> FiberSurvey | None:
    """Greedy layer assignment of receivers at padded-grid (rec_z, rec_x):
    a receiver goes to the first layer whose lane rec_x is still free.
    Returns None if more than `max_layers` layers would be needed (recording
    cost scales with K; e.g. a borehole column needs K = R — transpose it
    instead, `transpose_plan`)."""
    rec_z = np.asarray(rec_z, np.int64)
    rec_x = np.asarray(rec_x, np.int64)
    if rec_z.min() < 1 or rec_x.min() < 0 or rec_x.max() >= nx:
        return None
    layers = []        # list of dict lane -> row
    rec_layer = np.zeros(len(rec_x), np.int64)
    for r, (z, x) in enumerate(zip(rec_z, rec_x)):
        for k, lanes in enumerate(layers):
            if x not in lanes:
                lanes[x] = z
                rec_layer[r] = k
                break
        else:
            if len(layers) >= max_layers:
                return None
            layers.append({x: z})
            rec_layer[r] = len(layers) - 1
    rowmaps = np.zeros((len(layers), nx), np.int64)
    for k, lanes in enumerate(layers):
        for x, z in lanes.items():
            rowmaps[k, x] = z
    w = (tuple(map(tuple, np.asarray(das_w, np.float64)))
         if das_w is not None else None)
    return FiberSurvey(rowmaps=tuple(map(tuple, rowmaps)),
                       rec_layer=tuple(map(int, rec_layer)),
                       rec_x=tuple(map(int, rec_x)), weights=w)


# ---------------------------------------------------------------------------
# In-kernel recording (masked sublane reductions against per-lane row maps)
# ---------------------------------------------------------------------------

def _rowmaps_np(cfg, rs) -> np.ndarray:
    if isinstance(rs, FiberSurvey):
        return np.asarray(rs.rowmaps, np.int32)
    return np.full((1, cfg.nx), rs.rec_row, np.int32)


def _weight_rows_np(cfg, fs: FiberSurvey) -> np.ndarray:
    """(K, 3, nx) per-lane (exx, exz, ezz) sensitivity weights."""
    w = np.zeros((fs.n_layers, 3, cfg.nx), np.float32)
    for r, (k, x) in enumerate(zip(fs.rec_layer, fs.rec_x)):
        w[k, :, x] = fs.weights[r]
    return w


def _uniform_layers(cfg, rs):
    """Static per-layer flag: constant receiver row (cheap lane-roll path)."""
    rm = _rowmaps_np(cfg, rs)
    return tuple(bool(r.min() == r.max()) for r in rm)


def _record_rows(cfg: SimConfig, rs, recw, vz, vx, szz, sxx, zi=None,
                 window=None):
    """Record 4 channels x K layers as FULL-WIDTH (1, nx) rows: a masked
    sublane reduction against the layer's per-lane row map (its transpose is
    a sublane broadcast, Mosaic-lowerable; a row gather or 1-D slice would
    transpose to scatter / 1-D pad, which Mosaic rejects).  Per-receiver
    samples are gathered from the row planes OUTSIDE the kernel; cotangents
    arrive pre-placed on the (channel, layer) planes.

    recw = (rowmaps, wrow): the (K, nx) int32 row maps and, for the
    'weighted' channel, the (3K, nx) per-lane sensitivity weights — kernel
    INPUTS read into values at kernel start (Pallas forbids captured array
    constants).

    Channels per layer, keyed by cfg.das_channel for the 'ett' plane:
      'exx'     : vx[r, x] - vx[r, x-1]       (recording_exx, not /dx,
                                               utilities.cu:593-615)
      'ezz'     : vz[r, x] - vz[r-1, x]       (recording_ezz, utilities.cu:620-641)
      'weighted': w0*exx/dx + w1*exz + w2*ezz/dz  (directional fiber
                   sampling, elasticSolver.py:269-276)
    Output order: index c * K + k  (channel-major).

    zi / window generalize to the z-tiled streamed kernels
    (ops/pallas_stream.py): `zi` is the GLOBAL-row-index plane of the field
    arrays (defaults to the full-grid iota) and `window = (lo, hi)` keeps
    only receivers whose OWN row map falls in [lo, hi) — the tile's interior
    rows — so partial sums over overlapping tile halos never double-count a
    receiver (ownership is tested on the receiver row, not the sampled row:
    an owned receiver's rm±1 samples may legitimately reach into the halo).
    """
    rowmaps, wrow = recw
    if zi is None:
        zi = jax.lax.broadcasted_iota(jnp.int32, (cfg.nz, cfg.nx), 0)
    K = _n_layers(rs)
    ch = cfg.das_channel
    uniform_l = _uniform_layers(cfg, rs)

    pr_l, vx_l, vz_l, ett_l = [], [], [], []
    prsum = szz + sxx
    for k in range(K):
        rm = rowmaps[k:k + 1, :]  # (1, nx) int32
        if window is None:
            wnd = lambda h: h
        else:
            own = ((rm >= window[0]) & (rm < window[1])).astype(jnp.float32)
            wnd = lambda h, o=own: h * o
        uniform = uniform_l[k]
        hot = wnd((zi == rm).astype(jnp.float32))
        samp = lambda f, h=hot: jnp.sum(f * h, axis=0, keepdims=True)
        vxr = samp(vx)
        vzr = samp(vz)
        pr_l.append(samp(prsum))
        vx_l.append(vxr)
        vz_l.append(vzr)

        # x-shifted samples: on a uniform row, shift the sampled row (cheap
        # lane roll); on a curved fiber, shift the field first so the sample
        # stays on the receiver's OWN row (f[rm(x), x-1], not f[rm(x-1), x-1])
        def samp_xm1(f, fr):
            return (_roll(fr, 1, 1) if uniform
                    else samp(_roll(f, 1, 1)))

        if ch == "exx":
            ett_l.append(vxr - samp_xm1(vx, vxr))
        elif ch == "ezz":
            hot_m1 = wnd((zi == rm - 1).astype(jnp.float32))
            ett_l.append(vzr - samp(vz, hot_m1))
        elif ch == "weighted":
            hot_m1 = wnd((zi == rm - 1).astype(jnp.float32))
            hot_p1 = wnd((zi == rm + 1).astype(jnp.float32))
            exx = (vxr - samp_xm1(vx, vxr)) / cfg.dx
            ezz = (vzr - samp(vz, hot_m1)) / cfg.dz
            vz_xp1 = (_roll(vzr, -1, 1) if uniform
                      else samp(_roll(vz, -1, 1)))
            exz = 0.5 * ((samp(vx, hot_p1) - vxr) / cfg.dz
                         + (vz_xp1 - vzr) / cfg.dx)
            w = wrow[3 * k:3 * k + 3, :]  # (3, nx)
            ett_l.append(w[0:1] * exx + w[1:2] * exz + w[2:3] * ezz)
        else:  # pragma: no cover
            raise ValueError(f"das_channel {ch!r}")
    return tuple(pr_l + vx_l + vz_l + ett_l)


# ---------------------------------------------------------------------------
# Pure one-step physics on VALUES (shared by forward and vjp-adjoint kernels)
# ---------------------------------------------------------------------------

def _stress_diffs(vz, vx):
    """The four stencil differences the stress phase consumes (of the
    time-t velocities)."""
    return (_dz_minus(vz), _dx_minus(vx), _dz_plus(vx), _dx_plus(vz))


def _velocity_diffs(szz, sxx, sxz):
    """The four stencil differences the velocity phase consumes (of the
    POST-stress-update stresses)."""
    return (_dz_plus(szz), _dx_minus(sxz), _dz_minus(sxz), _dx_plus(sxx))


def _stress_phase_values(cfg, prof, mask, src_hot, rxz, stresses, spsi,
                         sdiffs, mats, amp):
    """Stress half-step (el_stress.cu:50-87 + source) on precomputed stencil
    differences — diffs-as-inputs so the backward kernel can reuse the
    reconstruction's stencils and chain their transposes explicitly."""
    (szz, sxx, sxz) = stresses
    (p_vzdz, p_vxdx, p_vxdz, p_vzdx) = spsi
    (lam, lp2m, avemu, _, _) = mats
    (ikz, az, bz, ikzh, azh, bzh, ikx, ax, bx, ikxh, axh, bxh) = prof
    (d_vzdzm, d_vxdxm, d_vxdzp, d_vzdxp) = sdiffs
    dt = cfg.dt

    p_vzdz = bz * p_vzdz + az * d_vzdzm
    dvz = d_vzdzm * ikz + p_vzdz
    p_vxdx = bx * p_vxdx + ax * d_vxdxm
    dvx = d_vxdxm * ikx + p_vxdx

    s_amp = cfg.src_scale * dt * amp
    szz = szz + mask * ((lp2m * dvz + lam * dvx) * dt) + src_hot * s_amp
    sxx = sxx + mask * ((lam * dvz + lp2m * dvx) * dt) + src_hot * (rxz * s_amp)

    p_vxdz = bzh * p_vxdz + azh * d_vxdzp
    dvxz = d_vxdzp * ikzh + p_vxdz
    p_vzdx = bxh * p_vzdx + axh * d_vzdxp
    dvzx = d_vzdxp * ikxh + p_vzdx
    sxz = sxz + mask * (avemu * (dvxz + dvzx) * dt)
    return (szz, sxx, sxz), (p_vzdz, p_vxdx, p_vxdz, p_vzdx)


def _velocity_phase_values(cfg, rs, prof, mask, vels, stresses_new, vpsi,
                           vdiffs, mats, recw, zi=None, rec_window=None):
    """Velocity half-step (el_velocity.cu:45-82) + recording, on precomputed
    stencil differences of the new stresses."""
    (vz, vx) = vels
    (szz, sxx) = stresses_new
    (p_szzdz, p_sxzdx, p_sxzdz, p_sxxdx) = vpsi
    (_, _, _, byca, bycb) = mats
    (ikz, az, bz, ikzh, azh, bzh, ikx, ax, bx, ikxh, axh, bxh) = prof
    (d_szzdzp, d_sxzdxm, d_sxzdzm, d_sxxdxp) = vdiffs
    dt = cfg.dt

    p_szzdz = bzh * p_szzdz + azh * d_szzdzp
    dszz = d_szzdzp * ikzh + p_szzdz
    p_sxzdx = bx * p_sxzdx + ax * d_sxzdxm
    dsxzx = d_sxzdxm * ikx + p_sxzdx
    vz = vz + mask * ((dszz + dsxzx) * byca * dt)

    p_sxzdz = bz * p_sxzdz + az * d_sxzdzm
    dsxzz = d_sxzdzm * ikz + p_sxzdz
    p_sxxdx = bxh * p_sxxdx + axh * d_sxxdxp
    dsxx = d_sxxdxp * ikxh + p_sxxdx
    vx = vx + mask * ((dsxzz + dsxx) * bycb * dt)

    recs = _record_rows(cfg, rs, recw, vz, vx, szz, sxx, zi=zi,
                        window=rec_window)
    return (vz, vx), (p_szzdz, p_sxzdx, p_sxzdz, p_sxxdx), recs


def _step_values(cfg: SimConfig, rs, prof, mask, src_hot, rxz,
                 fields, psi, mats, amp, recw, zi=None, rec_window=None):
    """One leapfrog step (el_stress.cu:50-87 + el_velocity.cu:45-82 + source
    + recording), as a pure function so `jax.vjp` of it yields the exact
    one-step adjoint (the backward oracle path).

    Kept MONOLITHIC and interleaved (one stencil diff live at a time): the
    phase-split composition above, with all four diffs batched up front,
    measured ~10% slower through Mosaic on the forward kernel.  The physics
    must stay identical to _stress_phase_values/_velocity_phase_values —
    guarded by test_phased_backward_matches_monolithic_vjp."""
    (vz, vx, szz, sxx, sxz) = fields
    (p_vzdz, p_vxdx, p_vxdz, p_vzdx, p_szzdz, p_sxzdx, p_sxzdz, p_sxxdx) = psi
    (lam, lp2m, avemu, byca, bycb) = mats
    # division-free scaled profiles (cpml.CpmlScaled): ik = 1/(K dh), a'=a/dh
    (ikz, az, bz, ikzh, azh, bzh, ikx, ax, bx, ikxh, axh, bxh) = prof
    dt = cfg.dt

    d = _dz_minus(vz)
    p_vzdz = bz * p_vzdz + az * d
    dvz = d * ikz + p_vzdz
    d = _dx_minus(vx)
    p_vxdx = bx * p_vxdx + ax * d
    dvx = d * ikx + p_vxdx

    s_amp = cfg.src_scale * dt * amp
    szz = szz + mask * ((lp2m * dvz + lam * dvx) * dt) + src_hot * s_amp
    sxx = sxx + mask * ((lam * dvz + lp2m * dvx) * dt) + src_hot * (rxz * s_amp)

    d = _dz_plus(vx)
    p_vxdz = bzh * p_vxdz + azh * d
    dvxz = d * ikzh + p_vxdz
    d = _dx_plus(vz)
    p_vzdx = bxh * p_vzdx + axh * d
    dvzx = d * ikxh + p_vzdx
    sxz = sxz + mask * (avemu * (dvxz + dvzx) * dt)

    d = _dz_plus(szz)
    p_szzdz = bzh * p_szzdz + azh * d
    dszz = d * ikzh + p_szzdz
    d = _dx_minus(sxz)
    p_sxzdx = bx * p_sxzdx + ax * d
    dsxzx = d * ikx + p_sxzdx
    vz = vz + mask * ((dszz + dsxzx) * byca * dt)

    d = _dz_minus(sxz)
    p_sxzdz = bz * p_sxzdz + az * d
    dsxzz = d * ikz + p_sxzdz
    d = _dx_plus(sxx)
    p_sxxdx = bxh * p_sxxdx + axh * d
    dsxx = d * ikxh + p_sxxdx
    vx = vx + mask * ((dsxzz + dsxx) * bycb * dt)

    recs = _record_rows(cfg, rs, recw, vz, vx, szz, sxx, zi=zi,
                        window=rec_window)
    new_fields = (vz, vx, szz, sxx, sxz)
    new_psi = (p_vzdz, p_vxdx, p_vxdz, p_vzdx, p_szzdz, p_sxzdx, p_sxzdz,
               p_sxxdx)
    return new_fields, new_psi, recs


def _masks(cfg, src_z, src_x):
    zi = jax.lax.broadcasted_iota(jnp.int32, (cfg.nz, cfg.nx), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (cfg.nz, cfg.nx), 1)
    mask = ((zi >= 2) & (zi <= cfg.nz - 3) & (xi >= 2) & (xi <= cfg.nx - 3)
            ).astype(jnp.float32)
    src_hot = ((zi == src_z) & (xi == src_x)).astype(jnp.float32)
    interior = ((zi >= cfg.npml) & (zi <= cfg.nz - 1 - cfg.npml)
                & (xi >= cfg.npml) & (xi <= cfg.nx - 1 - cfg.npml)
                ).astype(jnp.float32)
    return mask, src_hot, interior


def _strip_bounds(cfg):
    z0 = cfg.npml - 2
    z1 = cfg.nz - cfg.npml - 3
    x0 = cfg.npml - 2
    x1 = cfg.nx - cfg.npml - 3
    return z0, z1, x0, x1


def _read_consts(refs):
    return tuple(r[:] for r in refs)


def _read_recw(recw_refs):
    """(rowmaps, wrow-or-None) values from the recording-input refs."""
    rowmaps = recw_refs[0][:]
    wrow = recw_refs[1][:] if len(recw_refs) > 1 else None
    return rowmaps, wrow


def _recw_inputs(cfg: SimConfig, rs):
    """Recording inputs for both kernels: the (K, nx) int32 row maps and,
    for the weighted channel, the (3K, nx) per-lane sensitivity weights."""
    ins = [jnp.asarray(_rowmaps_np(cfg, rs))]
    if cfg.das_channel == "weighted":
        if not (isinstance(rs, FiberSurvey) and rs.weights is not None):
            raise ValueError("das_channel='weighted' needs a FiberSurvey "
                             "with sensitivity weights")
        w = _weight_rows_np(cfg, rs)
        ins.append(jnp.asarray(w.reshape(-1, cfg.nx)))
    return ins


# ---------------------------------------------------------------------------
# Forward kernel (shared body; optionally saves boundary strips)
# ---------------------------------------------------------------------------

def _fwd_body(cfg, rs, save_strips,
              srcz_ref, srcx_ref, rxz_ref, stf_ref,
              mat_refs, prof_refs, recw_refs,
              data_out_ref, lr_out_ref, tb_out_ref, ffin_out_ref,
              field_s, psi_s, rec_buf, rec_sem, lr_buf, tb_buf, strip_sem):
    i = pl.program_id(0)
    src_z = srcz_ref[i]
    src_x = srcx_ref[i]
    rxz = rxz_ref[i]
    mask, src_hot, _ = _masks(cfg, src_z, src_x)
    mats = _read_consts(mat_refs)
    prof = _read_consts(prof_refs)
    recw = _read_recw(recw_refs)
    z0, z1, x0, x1 = _strip_bounds(cfg)
    L = STRIP_L
    NC = 4 * _n_layers(rs)
    SC = _strip_chunk(cfg)

    for s in (*field_s, *psi_s, rec_buf):
        s[:] = jnp.zeros_like(s)

    def body(it, _):
        fields = tuple(s[:] for s in field_s)

        if save_strips and not DEBUG_SKIP_STRIP_PACK:
            # pack strips of the PRE-update state (libCUFD.cu:272) into the
            # current slot of an SC-step staging buffer:
            # left/right columns -> 10 lanes per field of lr_buf slot;
            # top/bottom rows -> 10 sublanes per field of tb_buf slot
            sp = it % SC
            sk = it // SC
            for f_idx, fld in enumerate(fields):
                c = f_idx * 2 * L
                lr_buf[sp, :cfg.nz, c:c + L] = fld[:, x0:x0 + L]
                lr_buf[sp, :cfg.nz, c + L:c + 2 * L] = fld[:, x1:x1 + L]
                tb_buf[sp, c:c + L, :cfg.nx] = fld[z0:z0 + L, :]
                tb_buf[sp, c + L:c + 2 * L, :cfg.nx] = fld[z1:z1 + L, :]
            if not DEBUG_SKIP_STRIP_DMA:
                @pl.when((sp == SC - 1) | (it == cfg.nt - 2))
                def _flush_strips():
                    cp1 = pltpu.make_async_copy(
                        lr_buf,
                        lr_out_ref.at[i, pl.ds(sk * SC, SC)],
                        strip_sem.at[0])
                    cp2 = pltpu.make_async_copy(
                        tb_buf,
                        tb_out_ref.at[i, pl.ds(sk * SC, SC)],
                        strip_sem.at[1])
                    cp1.start()
                    cp2.start()
                    cp1.wait()
                    cp2.wait()

        psi = tuple(s[:] for s in psi_s)
        amp = stf_ref[i, it]
        new_fields, new_psi, recs = _step_values(
            cfg, rs, prof, mask, src_hot, rxz, fields, psi, mats, amp, recw)
        for s, v in zip(field_s, new_fields):
            s[:] = v
        for s, v in zip(psi_s, new_psi):
            s[:] = v

        # recordings land in a VMEM ring; full chunks are DMA'd to HBM
        r = it + 1
        k = r // REC_CHUNK
        pos = r % REC_CHUNK
        for c in range(NC):
            rec_buf[c, pos, :cfg.nx] = recs[c][0]

        @pl.when((pos == REC_CHUNK - 1) | (r == cfg.nt - 1))
        def _flush():
            cp = pltpu.make_async_copy(
                rec_buf,
                data_out_ref.at[i, :, pl.ds(k * REC_CHUNK, REC_CHUNK), :],
                rec_sem)
            cp.start()
            cp.wait()
            rec_buf[:] = jnp.zeros_like(rec_buf)

        return 0

    jax.lax.fori_loop(0, cfg.nt - 1, body, 0)

    if save_strips:
        # final fields -> HBM (the backward sweep's starting state), staged
        # per field through a small scoped buffer: a (N_FIELDS, nz, nx) VMEM
        # output block would cost 5 full grids of VMEM at large-grid scale
        def _store_ffin(stage, sem):
            for f_idx, s in enumerate(field_s):
                stage[:] = jnp.zeros_like(stage)
                stage[:cfg.nz, :cfg.nx] = s[:]
                cp = pltpu.make_async_copy(stage, ffin_out_ref.at[i, f_idx],
                                           sem)
                cp.start()
                cp.wait()

        pl.run_scoped(
            _store_ffin,
            pltpu.VMEM((_pad8(cfg.nz), _pad128(cfg.nx)), jnp.float32),
            pltpu.SemaphoreType.DMA(()))


def _interpret():
    return jax.default_backend() != "tpu"


def _profiles(cfg):
    """Division-free scaled CPML profiles (cpml.CpmlScaled): ik = 1/(K dh),
    a' = a/dh — the hot loop multiplies raw stencil differences instead of
    dividing by dh and K (16 VPU divides per elastic cell-step removed)."""
    cp = cpml_mod.cpml_scaled(cfg.nz, cfg.nx, cfg.npml, cfg.dz, cfg.dx,
                              cfg.dt, cfg.f0, dtype=np.float32)
    return tuple(jnp.asarray(p) for p in (cp.ikz, cp.az, cp.bz, cp.ikz_h,
                                          cp.az_h, cp.bz_h, cp.ikx, cp.ax,
                                          cp.bx, cp.ikx_h, cp.ax_h, cp.bx_h))


def _nt_pad(cfg):
    return ((cfg.nt + REC_CHUNK - 1) // REC_CHUNK) * REC_CHUNK


def _extract_data(cfg: SimConfig, rs, out):
    """(S, 4K, nt_pad, nx_pad) recorded row planes -> (S, 4, R, nt)."""
    if not isinstance(rs, FiberSurvey):
        return jnp.swapaxes(
            out[:, :, :cfg.nt, rs.rec_x0:rs.rec_x0 + rs.n_rec], 2, 3)
    K = rs.n_layers
    lx = np.asarray(rs.rec_x)
    cols = out[:, :, :cfg.nt, :][..., lx]          # (S, 4K, nt, R)
    idx = (np.arange(4)[None, :] * K
           + np.asarray(rs.rec_layer)[:, None])    # (R, 4)
    cols = jnp.moveaxis(cols, 1, -1)               # (S, nt, R, 4K)
    picked = jnp.take_along_axis(cols, jnp.asarray(idx)[None, None],
                                 axis=-1)          # (S, nt, R, 4)
    return jnp.transpose(picked, (0, 3, 2, 1))


def _place_cotangent(cfg: SimConfig, rs, d_data, nt_pad, R_pad):
    """Adjoint of `_extract_data`: (S, 4, R, nt) seismogram cotangents onto
    the (S, 4K, nt_pad, nx_pad) row planes the backward kernel consumes."""
    S = d_data.shape[0]
    f32 = jnp.float32
    if not isinstance(rs, FiberSurvey):
        dd = jnp.zeros((S, 4, nt_pad, R_pad), f32)
        return dd.at[:, :, :cfg.nt, rs.rec_x0:rs.rec_x0 + rs.n_rec].set(
            jnp.swapaxes(d_data.astype(f32), 2, 3))
    out0 = jnp.zeros((S, 4 * rs.n_layers, nt_pad, R_pad), f32)
    _, vjp = jax.vjp(lambda o: _extract_data(cfg, rs, o), out0)
    return vjp(d_data.astype(f32))[0]


def _run_forward(cfg: SimConfig, rs, lam, mu, rho, stf,
                 src_z, src_x, rxz, save_strips: bool):
    S = stf.shape[0]
    f32 = jnp.float32
    mat = material_fields(lam.astype(f32), mu.astype(f32), rho.astype(f32))
    prof = _profiles(cfg)
    nt_pad = _nt_pad(cfg)
    R_pad = _pad128(cfg.nx)
    NC = 4 * _n_layers(rs)

    out_shape = [jax.ShapeDtypeStruct((S, NC, nt_pad, R_pad), f32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if save_strips:
        # strip buffers padded to whole strip-chunk blocks: the final flush
        # writes a full chunk starting at ((nt-2)//CHUNK)*CHUNK
        sc = _strip_chunk(cfg)
        nt_sc = -(-(cfg.nt - 1) // sc) * sc
        out_shape += [
            jax.ShapeDtypeStruct((S, nt_sc, _pad8(cfg.nz), LANE),
                                 f32),                                 # lr
            jax.ShapeDtypeStruct((S, nt_sc, TB_ROWS, _pad128(cfg.nx)),
                                 f32),                                 # tb
            jax.ShapeDtypeStruct((S, N_FIELDS, _pad8(cfg.nz),
                                  _pad128(cfg.nx)), f32),              # final
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]

    scratch = ([pltpu.VMEM((cfg.nz, cfg.nx), f32)] * 13
               + [pltpu.VMEM((NC, REC_CHUNK, R_pad), f32),
                  pltpu.SemaphoreType.DMA(())])
    if save_strips:
        scratch += [pltpu.VMEM((_strip_chunk(cfg), _pad8(cfg.nz), LANE), f32),
                    pltpu.VMEM((_strip_chunk(cfg), TB_ROWS, _pad128(cfg.nx)), f32),
                    pltpu.SemaphoreType.DMA((2,))]

    recw_in = _recw_inputs(cfg, rs)
    n_recw = len(recw_in)

    def kernel(*args):
        srcz, srcx, rxz_r, stf_r = args[:4]
        mat_refs = args[4:9]
        prof_refs = args[9:21]
        recw_refs = args[21:21 + n_recw]
        pos = 21 + n_recw
        data_out = args[pos]
        pos += 1
        if save_strips:
            lr_out, tb_out, ffin = args[pos:pos + 3]
            pos += 3
        else:
            lr_out = tb_out = ffin = None
        field_s = args[pos:pos + 5]
        psi_s = args[pos + 5:pos + 13]
        rec_buf, rec_sem = args[pos + 13:pos + 15]
        if save_strips:
            lr_buf, tb_buf, strip_sem = args[pos + 15:pos + 18]
        else:
            lr_buf = tb_buf = strip_sem = None
        _fwd_body(cfg, rs, save_strips, srcz, srcx, rxz_r, stf_r,
                  mat_refs, prof_refs, recw_refs, data_out, lr_out, tb_out,
                  ffin, field_s, psi_s, rec_buf, rec_sem, lr_buf, tb_buf,
                  strip_sem)

    # distinct kernel names per variant (avoids any name-keyed compile-cache
    # collision in remote-compile setups)
    kernel.__name__ = (f"elastic_fwd_kernel_save{int(save_strips)}"
                       f"_k{_n_layers(rs)}_{cfg.das_channel}")
    kernel.__qualname__ = kernel.__name__

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (17 + n_recw),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    interp = _interpret()
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(cfg)),
    )(jnp.asarray(src_z, jnp.int32), jnp.asarray(src_x, jnp.int32),
      jnp.asarray(rxz, f32), stf.astype(f32),
      mat.lam, mat.lp2m, mat.ave_mu, mat.byc_a, mat.byc_b, *prof, *recw_in)

    data = _extract_data(cfg, rs, outs[0])
    if save_strips:
        return data, outs[1], outs[2], outs[3]
    return data


@functools.partial(jax.jit, static_argnums=(0, 1))
def forward_pallas(cfg: SimConfig, rs: RowSurvey, lam, mu, rho, stf,
                   src_z, src_x, rxz):
    """All-shots fused forward.  stf: (S, nt); src_z/src_x/rxz: (S,).
    Returns data (S, 4, n_rec, nt) float32."""
    return _run_forward(cfg, rs, lam, mu, rho, stf, src_z, src_x, rxz,
                        save_strips=False)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _inject_strips_refs(field_refs, lr_buf, tb_buf, sp, cfg, which):
    """Overwrite the 5-deep edge strips of the selected field REFS from the
    staging buffers (field_to_bnd, Boundary.cu:78-101).  Ref stores with
    static slices lower cleanly in Mosaic (value-level dynamic_update_slice
    / .at[].set do not)."""
    z0, z1, x0, x1 = _strip_bounds(cfg)
    L = STRIP_L
    nx = cfg.nx
    nz = cfg.nz
    for f_idx in which:
        ref = field_refs[f_idx]
        c = f_idx * 2 * L
        ref[:, x0:x0 + L] = lr_buf[sp, :nz, c:c + L]
        ref[:, x1:x1 + L] = lr_buf[sp, :nz, c + L:c + 2 * L]
        ref[z0:z0 + L, :] = tb_buf[sp, c:c + L, :nx]
        ref[z1:z1 + L, :] = tb_buf[sp, c + L:c + 2 * L, :nx]


def _bwd_kernel(cfg: SimConfig, rs, n_recw: int, compact: bool, phased: bool,
                srcz_ref, srcx_ref, rxz_ref, stf_ref,
                *args):
    n_mats = 3 if compact else 5
    mat_refs = args[0:n_mats]
    prof_refs = args[n_mats:n_mats + 12]
    recw_refs = args[n_mats + 12:n_mats + 12 + n_recw]
    p = n_mats + 12 + n_recw
    ffin_ref = args[p]
    lr_in = args[p + 1]
    tb_in = args[p + 2]
    ddata_in = args[p + 3]
    gmat_out = args[p + 4]
    dstf_out = args[p + 5]
    field_s = args[p + 6:p + 11]
    adj_f_s = args[p + 11:p + 16]
    adj_p_s = args[p + 16:p + 24]
    lr_buf, tb_buf, drec_buf = args[p + 24:p + 27]
    sems = args[p + 27]

    i = pl.program_id(0)
    src_z = srcz_ref[i]
    src_x = srcx_ref[i]
    rxz = rxz_ref[i]
    mask, src_hot, interior = _masks(cfg, src_z, src_x)
    raw = _read_consts(mat_refs)
    prof = _read_consts(prof_refs)
    recw = _read_recw(recw_refs)
    dt = cfg.dt
    # NB: rdz/rdx, not idz/idx — the fori_loop body's index is named idx
    rdz, rdx = 1.0 / cfg.dz, 1.0 / cfg.dx
    NC = 4 * _n_layers(rs)
    SC = _strip_chunk(cfg)
    DC = _drec_chunk(cfg)

    @pl.when(i == 0)
    def _init_gmat():
        gmat_out[:] = jnp.zeros_like(gmat_out)

    # start from the saved final fields, staged per field through a small
    # scoped buffer (a (N_FIELDS, nz, nx) staging block would spike VMEM by
    # 5 grids at large-grid scale)
    def _load_ffin(stage, sem):
        for f_idx, s in enumerate(field_s):
            cp = pltpu.make_async_copy(ffin_ref.at[i, f_idx], stage, sem)
            cp.start()
            cp.wait()
            s[:] = stage[:cfg.nz, :cfg.nx]

    pl.run_scoped(
        _load_ffin,
        pltpu.VMEM((_pad8(cfg.nz), _pad128(cfg.nx)), jnp.float32),
        pltpu.SemaphoreType.DMA(()))
    for s in (*adj_f_s, *adj_p_s):
        s[:] = jnp.zeros_like(s)

    zero_psi = tuple(jnp.zeros((cfg.nz, cfg.nx), jnp.float32)
                     for _ in range(8))

    def step_fn(fields, psi, mats_, amp):
        # compact mode: mats_ is raw (lam, mu, rho) and the staggered
        # averaging happens INSIDE the differentiated step, so the vjp
        # chains the harmonic-mu / buoyancy "sprays" (el_stress.cu:112-123,
        # el_velocity.cu:100-110) in-kernel and the gradient accumulator
        # shrinks from 5 planes to 3 — the VMEM diet that lets the fused
        # backward run at rock-physics grid sizes (Main-004).
        m = _material_fields_values(*mats_) if compact else mats_
        return _step_values(cfg, rs, prof, mask, src_hot, rxz, fields, psi,
                            m, amp, recw)

    def body(idx, _):
        it = cfg.nt - 2 - idx
        r = it + 1
        k = r // DC
        pos = r % DC
        if compact:
            # recompute the derived material fields for this step's
            # reconstruction (kept out of scratch to stay under VMEM)
            (lam, lp2m, avemu, byca, bycb) = _material_fields_values(*raw)
        else:
            (lam, lp2m, avemu, byca, bycb) = raw

        # refill the data-cotangent chunk when crossing a chunk boundary
        @pl.when((pos == DC - 1) | (idx == 0))
        def _load_chunk():
            cp = pltpu.make_async_copy(
                ddata_in.at[i, :, pl.ds(k * DC, DC), :],
                drec_buf, sems.at[2])
            cp.start()
            cp.wait()

        # strips of state_t: load an SC-step block when entering it
        sp = it % SC
        sk = it // SC
        @pl.when((sp == SC - 1) | (idx == 0))
        def _load_strips():
            cp1 = pltpu.make_async_copy(
                lr_in.at[i, pl.ds(sk * SC, SC)],
                lr_buf, sems.at[0])
            cp2 = pltpu.make_async_copy(
                tb_in.at[i, pl.ds(sk * SC, SC)],
                tb_buf, sems.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()

        # ---- reconstruct state_t (libCUFD.cu:553-582 ordering) -------------
        # reciprocal-spacing multiplies bitwise-match the forward's scaled
        # interior profiles (cpml.CpmlScaled), keeping reconstruction exact
        (vz, vx, szz, sxx, sxz) = tuple(s[:] for s in field_s)
        szz_tp1, sxx_tp1 = szz, sxx
        # velocity-phase diffs of the carried t+1 stresses — the exact
        # values the forward's velocity update consumed (reused by the
        # phase-split adjoint below)
        vd = _velocity_diffs(szz, sxx, sxz)
        # velocity reverse (interior, no CPML; el_velocity.cu:84-98)
        dvz = (vd[0] * rdz + vd[1] * rdx)
        dvx = (vd[2] * rdz + vd[3] * rdx)
        field_s[0][:] = vz - interior * (dvz * byca * dt)
        field_s[1][:] = vx - interior * (dvx * bycb * dt)
        _inject_strips_refs(field_s, lr_buf, tb_buf, sp, cfg, which=(0, 1))
        vz, vx = field_s[0][:], field_s[1][:]
        # subtract source
        amp = stf_ref[i, it]
        s_amp = cfg.src_scale * dt * amp
        szz = szz - src_hot * s_amp
        sxx = sxx - src_hot * (rxz * s_amp)
        # stress-phase diffs of the reconstructed t velocities
        sd = _stress_diffs(vz, vx)
        # stress reverse (el_stress.cu:89-104)
        dvz_dz = sd[0] * rdz
        dvx_dx = sd[1] * rdx
        field_s[2][:] = szz - interior * ((lp2m * dvz_dz + lam * dvx_dx) * dt)
        field_s[3][:] = sxx - interior * ((lam * dvz_dz + lp2m * dvx_dx) * dt)
        dvx_dz = sd[2] * rdz
        dvz_dx = sd[3] * rdx
        field_s[4][:] = sxz - interior * (avemu * (dvx_dz + dvz_dx) * dt)
        _inject_strips_refs(field_s, lr_buf, tb_buf, sp, cfg,
                            which=(2, 3, 4))
        fields_t = tuple(s[:] for s in field_s)

        adj_f = tuple(s[:] for s in adj_f_s)
        adj_p = tuple(s[:] for s in adj_p_s)
        d_rec = tuple(drec_buf[c, pl.ds(pos, 1), :cfg.nx]
                      for c in range(NC))

        if not phased:
            # ---- exact one-step adjoint via vjp of the monolithic step ----
            _, vjp_fn = jax.vjp(step_fn, fields_t, zero_psi, raw, amp)
            d_fields, d_psi, d_mats, d_amp = vjp_fn((adj_f, adj_p, d_rec))
        else:
            # ---- phase-split adjoint reusing the reconstruction stencils --
            # Each half-step is still machine-transposed (jax.vjp); only the
            # stencil hops between phases are wired explicitly via the
            # closed-form transposes, which removes the duplicate primal
            # derivative computation (24 rolls/step) the monolithic vjp pays.
            m = _material_fields_values(*raw) if compact else raw
            zero4 = zero_psi[:4]
            vfun = lambda vels, stv, vpsi, vdiffs, mats_: (
                _velocity_phase_values(cfg, rs, prof, mask, vels, stv,
                                       vpsi, vdiffs, mats_, recw))
            _, vvjp = jax.vjp(vfun, (fields_t[0], fields_t[1]),
                              (szz_tp1, sxx_tp1), zero4, vd, m)
            (d_vels, d_stv, d_vpsi_in, d_vdiffs, d_mats_v) = vvjp(
                ((adj_f[0], adj_f[1]), adj_p[4:], d_rec))

            # total cotangents of the post-stress-phase stresses: carried
            # adjoint + recording + the velocity phase's stencil transposes
            cot_szz = adj_f[2] + d_stv[0] + _dz_plus_t(d_vdiffs[0])
            cot_sxx = adj_f[3] + d_stv[1] + _dx_plus_t(d_vdiffs[3])
            cot_sxz = (adj_f[4] + _dx_minus_t(d_vdiffs[1])
                       + _dz_minus_t(d_vdiffs[2]))

            sfun = lambda stresses, spsi, sdiffs, mats_, a: (
                _stress_phase_values(cfg, prof, mask, src_hot, rxz,
                                     stresses, spsi, sdiffs, mats_, a))
            _, svjp = jax.vjp(sfun, (fields_t[2], fields_t[3], fields_t[4]),
                              zero4, sd, m, amp)
            (d_st, d_spsi_in, d_sdiffs, d_mats_m, d_amp) = svjp(
                ((cot_szz, cot_sxx, cot_sxz), adj_p[:4]))

            cot_vz = d_vels[0] + _dz_minus_t(d_sdiffs[0]) + _dx_plus_t(
                d_sdiffs[3])
            cot_vx = d_vels[1] + _dx_minus_t(d_sdiffs[1]) + _dz_plus_t(
                d_sdiffs[2])
            d_fields = (cot_vz, cot_vx, d_st[0], d_st[1], d_st[2])
            d_psi = (*d_spsi_in, *d_vpsi_in)
            d_mats = tuple(a + b for a, b in zip(d_mats_m, d_mats_v))
            if compact:
                _, m_vjp = jax.vjp(_material_fields_values, *raw)
                d_mats = m_vjp(d_mats)

        for s, v in zip(adj_f_s, d_fields):
            s[:] = v
        for s, v in zip(adj_p_s, d_psi):
            s[:] = v
        for f_idx, v in enumerate(d_mats):
            gmat_out[f_idx] = gmat_out[f_idx] + v
        dstf_out[i, it] = d_amp
        return 0

    dstf_out[i, cfg.nt - 1] = 0.0
    jax.lax.fori_loop(0, cfg.nt - 1, body, 0)


def _run_backward(cfg: SimConfig, rs, lam, mu, rho, stf,
                  src_z, src_x, rxz, ffin, lr, tb, d_data):
    S = stf.shape[0]
    f32 = jnp.float32
    compact = _use_compact(cfg, _n_layers(rs))
    if compact:
        mat_in = (lam.astype(f32), mu.astype(f32), rho.astype(f32))
    else:
        mat = material_fields(lam.astype(f32), mu.astype(f32),
                              rho.astype(f32))
        mat_in = (mat.lam, mat.lp2m, mat.ave_mu, mat.byc_a, mat.byc_b)
    n_mats = len(mat_in)
    n_gout = 3 if compact else 5
    prof = _profiles(cfg)
    nt_pad = _nt_pad(cfg)
    R_pad = _pad128(cfg.nx)
    NC = 4 * _n_layers(rs)

    # cotangent (S, 4, R, nt) -> (S, 4K, nt_pad, nx_pad) row planes
    dd = _place_cotangent(cfg, rs, d_data, nt_pad, R_pad)

    recw_in = _recw_inputs(cfg, rs)
    n_recw = len(recw_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(S,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_mats + 12 + n_recw)
            + [pl.BlockSpec(memory_space=pltpu.HBM),
               pl.BlockSpec(memory_space=pltpu.HBM),
               pl.BlockSpec(memory_space=pltpu.HBM),
               pl.BlockSpec(memory_space=pltpu.HBM)]),
        out_specs=[
            pl.BlockSpec((n_gout, cfg.nz, cfg.nx),
                         lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            # d_stf: scalar per step -> whole array in SMEM (scalar
            # stores are only supported to SMEM)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=(
            [pltpu.VMEM((cfg.nz, cfg.nx), f32)] * 5      # primal fields
            + [pltpu.VMEM((cfg.nz, cfg.nx), f32)] * 13   # adjoint fields+psi
            + [pltpu.VMEM((_strip_chunk(cfg), _pad8(cfg.nz), LANE), f32),
               pltpu.VMEM((_strip_chunk(cfg), TB_ROWS, _pad128(cfg.nx)), f32),
               pltpu.VMEM((NC, _drec_chunk(cfg), R_pad), f32),
               pltpu.SemaphoreType.DMA((3,))]),
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_gout, cfg.nz, cfg.nx), f32),    # gradients
        jax.ShapeDtypeStruct((S, nt_pad), f32),                 # d_stf
    ]
    # SEP2023_TPU_BWD=vjp re-enables the monolithic step-vjp adjoint (the
    # oracle the phase-split path is equality-tested against)
    phased = os.environ.get("SEP2023_TPU_BWD", "phased") != "vjp"
    kernel = functools.partial(_bwd_kernel, cfg, rs, n_recw, compact, phased)
    interp = _interpret()
    gmat, d_stf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(cfg)),
    )(jnp.asarray(src_z, jnp.int32), jnp.asarray(src_x, jnp.int32),
      jnp.asarray(rxz, f32), stf.astype(f32),
      *mat_in, *prof, *recw_in,
      ffin, lr, tb, dd)

    # restrict to the interior (the reconstruction is only exact there) and
    # (full variant) chain back through the staggered material averaging
    mzi = (jnp.arange(cfg.nz) >= cfg.npml) & (jnp.arange(cfg.nz)
                                              <= cfg.nz - 1 - cfg.npml)
    mxi = (jnp.arange(cfg.nx) >= cfg.npml) & (jnp.arange(cfg.nx)
                                              <= cfg.nx - 1 - cfg.npml)
    m = (mzi[:, None] & mxi[None, :]).astype(f32)
    if compact:
        # gradients are already in (lam, mu, rho) space (chained in-kernel)
        return (gmat[0] * m, gmat[1] * m, gmat[2] * m, d_stf[:, :cfg.nt])
    from sep2023_tpu.medium import MatFields
    gmat_t = MatFields(lam=gmat[0] * m, lp2m=gmat[1] * m, ave_mu=gmat[2] * m,
                       byc_a=gmat[3] * m, byc_b=gmat[4] * m)
    _, mat_vjp = jax.vjp(material_fields, lam.astype(f32), mu.astype(f32),
                         rho.astype(f32))
    d_lam, d_mu, d_rho = mat_vjp(gmat_t)
    return d_lam, d_mu, d_rho, d_stf[:, :cfg.nt]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def propagate_pallas(cfg: SimConfig, rs: RowSurvey, lam, mu, rho, stf,
                     src_z, src_x, rxz):
    """Differentiable fused-Pallas propagator: data (S, 4, n_rec, nt).
    Gradients w.r.t. lam, mu, rho, stf via the in-kernel boundary-saving
    adjoint."""
    return _run_forward(cfg, rs, lam, mu, rho, stf, src_z, src_x, rxz,
                        save_strips=False)


def _pp_fwd(cfg, rs, lam, mu, rho, stf, src_z, src_x, rxz):
    data, lr, tb, ffin = _run_forward(cfg, rs, lam, mu, rho, stf,
                                      src_z, src_x, rxz, save_strips=True)
    return data, (lam, mu, rho, stf, src_z, src_x, rxz, ffin, lr, tb)


def _pp_bwd(cfg, rs, res, d_data):
    lam, mu, rho, stf, src_z, src_x, rxz, ffin, lr, tb = res
    d_lam, d_mu, d_rho, d_stf = _run_backward(
        cfg, rs, lam, mu, rho, stf, src_z, src_x, rxz, ffin, lr, tb, d_data)
    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (d_lam.astype(lam.dtype), d_mu.astype(mu.dtype),
            d_rho.astype(rho.dtype), d_stf.astype(stf.dtype),
            f0(src_z), f0(src_x), jnp.zeros_like(jnp.asarray(rxz)))


propagate_pallas.defvjp(_pp_fwd, _pp_bwd)


# ---------------------------------------------------------------------------
# Fused acoustic forward (the secondary physics mode: ac_pressure.cu /
# ac_velocity.cu, exercised by the standalone CLI path main.cu:180-197)
# ---------------------------------------------------------------------------

def _ac_step_values(cfg: SimConfig, rs, prof, mask, src_hot, fields, psi,
                    mats, amp, recw, zi=None, rec_window=None):
    """One acoustic leapfrog step (pressure -> source -> velocities),
    matching acoustic.ac_step's staggering exactly."""
    (p, vz, vx) = fields
    (p_vzdz, p_vxdx, p_pdz, p_pdx) = psi
    (lam, byca, bycb) = mats
    # division-free scaled profiles (cpml.CpmlScaled)
    (ikz, az, bz, ikzh, azh, bzh, ikx, ax, bx, ikxh, axh, bxh) = prof
    dt = cfg.dt

    d = _dz_plus(vz)
    p_vzdz = bzh * p_vzdz + azh * d
    dvz = d * ikzh + p_vzdz
    d = _dx_minus(vx)
    p_vxdx = bx * p_vxdx + ax * d
    dvx = d * ikx + p_vxdx
    p = p + mask * (lam * (dvz + dvx) * dt) + src_hot * (
        cfg.src_scale * dt * amp)

    d = _dz_minus(p)
    p_pdz = bz * p_pdz + az * d
    dpz = d * ikz + p_pdz
    vz = vz + mask * (dpz * byca * dt)

    d = _dx_plus(p)
    p_pdx = bxh * p_pdx + axh * d
    dpx = d * ikxh + p_pdx
    vx = vx + mask * (dpx * bycb * dt)

    # reuse the elastic row recorder with (szz=p, sxx=0): channel planes
    # come out as (pr=p, vx, vz, ett) — the caller keeps the first three
    recs = _record_rows(cfg, rs, recw, vz, vx, p, jnp.zeros_like(p),
                        zi=zi, window=rec_window)
    return (p, vz, vx), (p_vzdz, p_vxdx, p_pdz, p_pdx), recs


def _ac_pressure_phase_values(cfg, prof, mask, src_hot, p, ppsi, vdiffs,
                              lam, amp):
    """Acoustic pressure half-step + source on precomputed velocity stencil
    differences (the acoustic analogue of _stress_phase_values — the
    physics must stay identical to _ac_step_values, guarded by the
    acoustic Pallas-vs-XLA gradient test)."""
    (p_vzdz, p_vxdx) = ppsi
    (ikz, az, bz, ikzh, azh, bzh, ikx, ax, bx, ikxh, axh, bxh) = prof
    (d_vz, d_vx) = vdiffs
    dt = cfg.dt
    p_vzdz = bzh * p_vzdz + azh * d_vz
    dvz = d_vz * ikzh + p_vzdz
    p_vxdx = bx * p_vxdx + ax * d_vx
    dvx = d_vx * ikx + p_vxdx
    p = p + mask * (lam * (dvz + dvx) * dt) + src_hot * (
        cfg.src_scale * dt * amp)
    return p, (p_vzdz, p_vxdx)


def _ac_velocity_phase_values(cfg, rs, prof, mask, vels, p_new, vpsi,
                              pdiffs, bycs, recw, zi=None, rec_window=None):
    """Acoustic velocity half-step + recording on precomputed pressure
    stencil differences (of the post-source p)."""
    (vz, vx) = vels
    (p_pdz, p_pdx) = vpsi
    (byca, bycb) = bycs
    (ikz, az, bz, ikzh, azh, bzh, ikx, ax, bx, ikxh, axh, bxh) = prof
    (d_pz, d_px) = pdiffs
    dt = cfg.dt
    p_pdz = bz * p_pdz + az * d_pz
    dpz = d_pz * ikz + p_pdz
    vz = vz + mask * (dpz * byca * dt)
    p_pdx = bxh * p_pdx + axh * d_px
    dpx = d_px * ikxh + p_pdx
    vx = vx + mask * (dpx * bycb * dt)
    recs = _record_rows(cfg, rs, recw, vz, vx, p_new, jnp.zeros_like(p_new),
                        zi=zi, window=rec_window)
    return (vz, vx), (p_pdz, p_pdx), recs


AC_N_FIELDS = 3      # p, vz, vx
AC_TB_ROWS = 32      # 3 fields * 10 strip rows, padded to a sublane multiple


def _ac_fwd_body(cfg, rs, save_strips, srcz_ref, srcx_ref, stf_ref,
                 mat_refs, prof_refs, recw_refs, data_out_ref,
                 lr_out_ref, tb_out_ref, ffin_out_ref,
                 field_s, psi_s, rec_buf, rec_sem, lr_buf, tb_buf, strip_sem):
    i = pl.program_id(0)
    src_z = srcz_ref[i]
    src_x = srcx_ref[i]
    mask, src_hot, _ = _masks(cfg, src_z, src_x)
    mats = _read_consts(mat_refs)
    prof = _read_consts(prof_refs)
    recw = _read_recw(recw_refs)
    NC = 4 * _n_layers(rs)
    z0, z1, x0, x1 = _strip_bounds(cfg)
    L = STRIP_L
    SC = _strip_chunk(cfg)

    for s in (*field_s, *psi_s, rec_buf):
        s[:] = jnp.zeros_like(s)

    def body(it, _):
        fields = tuple(s[:] for s in field_s)

        if save_strips:
            # pre-update boundary strips of the 3 acoustic fields, same
            # staging layout as the elastic kernel (10 lanes / 10 rows per
            # field slot)
            sp = it % SC
            sk = it // SC
            for f_idx, fld in enumerate(fields):
                c = f_idx * 2 * L
                lr_buf[sp, :cfg.nz, c:c + L] = fld[:, x0:x0 + L]
                lr_buf[sp, :cfg.nz, c + L:c + 2 * L] = fld[:, x1:x1 + L]
                tb_buf[sp, c:c + L, :cfg.nx] = fld[z0:z0 + L, :]
                tb_buf[sp, c + L:c + 2 * L, :cfg.nx] = fld[z1:z1 + L, :]

            @pl.when((sp == SC - 1) | (it == cfg.nt - 2))
            def _flush_strips():
                cp1 = pltpu.make_async_copy(
                    lr_buf, lr_out_ref.at[i, pl.ds(sk * SC, SC)],
                    strip_sem.at[0])
                cp2 = pltpu.make_async_copy(
                    tb_buf, tb_out_ref.at[i, pl.ds(sk * SC, SC)],
                    strip_sem.at[1])
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()

        psi = tuple(s[:] for s in psi_s)
        amp = stf_ref[i, it]
        new_fields, new_psi, recs = _ac_step_values(
            cfg, rs, prof, mask, src_hot, fields, psi, mats, amp, recw)
        for s, v in zip(field_s, new_fields):
            s[:] = v
        for s, v in zip(psi_s, new_psi):
            s[:] = v
        r = it + 1
        k = r // REC_CHUNK
        pos = r % REC_CHUNK
        for c in range(NC):
            rec_buf[c, pos, :cfg.nx] = recs[c][0]

        @pl.when((pos == REC_CHUNK - 1) | (r == cfg.nt - 1))
        def _flush():
            cp = pltpu.make_async_copy(
                rec_buf,
                data_out_ref.at[i, :, pl.ds(k * REC_CHUNK, REC_CHUNK), :],
                rec_sem)
            cp.start()
            cp.wait()
            rec_buf[:] = jnp.zeros_like(rec_buf)

        return 0

    jax.lax.fori_loop(0, cfg.nt - 1, body, 0)

    if save_strips:
        def _store_ffin(stage, sem):
            for f_idx, s in enumerate(field_s):
                stage[:] = jnp.zeros_like(stage)
                stage[:cfg.nz, :cfg.nx] = s[:]
                cp = pltpu.make_async_copy(stage, ffin_out_ref.at[i, f_idx],
                                           sem)
                cp.start()
                cp.wait()

        pl.run_scoped(
            _store_ffin,
            pltpu.VMEM((_pad8(cfg.nz), _pad128(cfg.nx)), jnp.float32),
            pltpu.SemaphoreType.DMA(()))


def _ac_mats(lam, rho):
    from sep2023_tpu.medium import _shift_left, _shift_up

    f32 = jnp.float32
    lam = lam.astype(f32)
    rho = rho.astype(f32)
    return (lam, 2.0 / (_shift_up(rho) + rho),
            2.0 / (_shift_left(rho) + rho))


def _ac_run_forward(cfg: SimConfig, rs, lam, rho, stf, src_z, src_x,
                    save_strips: bool):
    S = stf.shape[0]
    f32 = jnp.float32
    mats = _ac_mats(lam, rho)
    prof = _profiles(cfg)
    recw_in = _recw_inputs(cfg, rs)
    n_recw = len(recw_in)
    nt_pad = _nt_pad(cfg)
    R_pad = _pad128(cfg.nx)
    NC = 4 * _n_layers(rs)

    out_shape = [jax.ShapeDtypeStruct((S, NC, nt_pad, R_pad), f32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if save_strips:
        sc = _strip_chunk(cfg)
        nt_sc = -(-(cfg.nt - 1) // sc) * sc
        out_shape += [
            jax.ShapeDtypeStruct((S, nt_sc, _pad8(cfg.nz), LANE), f32),
            jax.ShapeDtypeStruct((S, nt_sc, AC_TB_ROWS, _pad128(cfg.nx)),
                                 f32),
            jax.ShapeDtypeStruct((S, AC_N_FIELDS, _pad8(cfg.nz),
                                  _pad128(cfg.nx)), f32),
        ]
        out_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 3

    scratch = ([pltpu.VMEM((cfg.nz, cfg.nx), f32)] * 7
               + [pltpu.VMEM((NC, REC_CHUNK, R_pad), f32),
                  pltpu.SemaphoreType.DMA(())])
    if save_strips:
        scratch += [
            pltpu.VMEM((_strip_chunk(cfg), _pad8(cfg.nz), LANE), f32),
            pltpu.VMEM((_strip_chunk(cfg), AC_TB_ROWS, _pad128(cfg.nx)),
                       f32),
            pltpu.SemaphoreType.DMA((2,))]

    def kernel(*args):
        srcz, srcx, stf_r = args[:3]
        mat_refs = args[3:6]
        prof_refs = args[6:18]
        recw_refs = args[18:18 + n_recw]
        pos = 18 + n_recw
        data_out = args[pos]
        pos += 1
        if save_strips:
            lr_out, tb_out, ffin = args[pos:pos + 3]
            pos += 3
        else:
            lr_out = tb_out = ffin = None
        field_s = args[pos:pos + 3]
        psi_s = args[pos + 3:pos + 7]
        rec_buf, rec_sem = args[pos + 7:pos + 9]
        if save_strips:
            lr_buf, tb_buf, strip_sem = args[pos + 9:pos + 12]
        else:
            lr_buf = tb_buf = strip_sem = None
        _ac_fwd_body(cfg, rs, save_strips, srcz, srcx, stf_r, mat_refs,
                     prof_refs, recw_refs, data_out, lr_out, tb_out, ffin,
                     field_s, psi_s, rec_buf, rec_sem, lr_buf, tb_buf,
                     strip_sem)

    kernel.__name__ = (f"acoustic_fwd_kernel_save{int(save_strips)}"
                       f"_k{_n_layers(rs)}")
    kernel.__qualname__ = kernel.__name__

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (15 + n_recw),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    interp = _interpret()
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(cfg)),
    )(jnp.asarray(src_z, jnp.int32), jnp.asarray(src_x, jnp.int32),
      stf.astype(f32), *mats, *prof, *recw_in)

    data = _extract_data(cfg, rs, out[0])[:, :3]
    if save_strips:
        return data, out[1], out[2], out[3]
    return data


@functools.partial(jax.jit, static_argnums=(0, 1))
def forward_pallas_acoustic(cfg: SimConfig, rs, lam, rho, stf,
                            src_z, src_x):
    """Fused acoustic forward: data (S, 3, n_rec, nt) float32, channels
    (pr, vx, vz) — acoustic.AC_CHANNELS.  lam = rho * vp^2.  Same
    row/fiber acquisition plans as the elastic kernel."""
    return _ac_run_forward(cfg, rs, lam, rho, stf, src_z, src_x,
                           save_strips=False)


def _ac_bwd_kernel(cfg: SimConfig, rs, n_recw: int, phased: bool,
                   srcz_ref, srcx_ref, stf_ref, *args):
    mat_refs = args[0:3]
    prof_refs = args[3:15]
    recw_refs = args[15:15 + n_recw]
    p = 15 + n_recw
    ffin_ref = args[p]
    lr_in = args[p + 1]
    tb_in = args[p + 2]
    ddata_in = args[p + 3]
    gmat_out = args[p + 4]
    dstf_out = args[p + 5]
    field_s = args[p + 6:p + 9]
    adj_f_s = args[p + 9:p + 12]
    adj_p_s = args[p + 12:p + 16]
    lr_buf, tb_buf, drec_buf = args[p + 16:p + 19]
    sems = args[p + 19]

    i = pl.program_id(0)
    src_z = srcz_ref[i]
    src_x = srcx_ref[i]
    mask, src_hot, _ = _masks(cfg, src_z, src_x)
    # the acoustic reconstruction region is TIGHTER than the elastic one
    # ([npml+2, n-3-npml], acoustic._consts mask_i): the pressure-first
    # staggering needs two extra halo layers inside the strips
    zi = jax.lax.broadcasted_iota(jnp.int32, (cfg.nz, cfg.nx), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (cfg.nz, cfg.nx), 1)
    interior = ((zi >= cfg.npml + 2) & (zi <= cfg.nz - 3 - cfg.npml)
                & (xi >= cfg.npml + 2)
                & (xi <= cfg.nx - 3 - cfg.npml)).astype(jnp.float32)
    mats = _read_consts(mat_refs)
    (lam, byca, bycb) = mats
    prof = _read_consts(prof_refs)
    recw = _read_recw(recw_refs)
    dt = cfg.dt
    rdz, rdx = 1.0 / cfg.dz, 1.0 / cfg.dx
    NC = 4 * _n_layers(rs)
    SC = _strip_chunk(cfg)
    DC = _drec_chunk(cfg)

    @pl.when(i == 0)
    def _init_gmat():
        gmat_out[:] = jnp.zeros_like(gmat_out)

    def _load_ffin(stage, sem):
        for f_idx, s in enumerate(field_s):
            cp = pltpu.make_async_copy(ffin_ref.at[i, f_idx], stage, sem)
            cp.start()
            cp.wait()
            s[:] = stage[:cfg.nz, :cfg.nx]

    pl.run_scoped(
        _load_ffin,
        pltpu.VMEM((_pad8(cfg.nz), _pad128(cfg.nx)), jnp.float32),
        pltpu.SemaphoreType.DMA(()))
    for s in (*adj_f_s, *adj_p_s):
        s[:] = jnp.zeros_like(s)

    zero_psi = tuple(jnp.zeros((cfg.nz, cfg.nx), jnp.float32)
                     for _ in range(4))

    def step_fn(fields, psi, mats_, amp):
        return _ac_step_values(cfg, rs, prof, mask, src_hot, fields, psi,
                               mats_, amp, recw)

    def body(idx, _):
        it = cfg.nt - 2 - idx
        r = it + 1
        k = r // DC
        pos = r % DC

        @pl.when((pos == DC - 1) | (idx == 0))
        def _load_chunk():
            cp = pltpu.make_async_copy(
                ddata_in.at[i, :, pl.ds(k * DC, DC), :],
                drec_buf, sems.at[2])
            cp.start()
            cp.wait()

        sp = it % SC
        sk = it // SC

        @pl.when((sp == SC - 1) | (idx == 0))
        def _load_strips():
            cp1 = pltpu.make_async_copy(
                lr_in.at[i, pl.ds(sk * SC, SC)], lr_buf, sems.at[0])
            cp2 = pltpu.make_async_copy(
                tb_in.at[i, pl.ds(sk * SC, SC)], tb_buf, sems.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()

        # ---- reconstruct state_t (acoustic.rtm_image_time ordering) -------
        (pf, vz, vx) = tuple(s[:] for s in field_s)
        p_tp1 = pf
        # pressure diffs of the carried (post-source) p_{t+1} — the exact
        # values the forward's velocity phase consumed
        pdiffs = (_dz_minus(pf), _dx_plus(pf))
        # velocity reverse (undo updates that used the post-source p_{t+1})
        field_s[1][:] = vz - interior * (pdiffs[0] * rdz * byca * dt)
        field_s[2][:] = vx - interior * (pdiffs[1] * rdx * bycb * dt)
        _inject_strips_refs(field_s, lr_buf, tb_buf, sp, cfg, which=(1, 2))
        vz, vx = field_s[1][:], field_s[2][:]
        # subtract source, pressure reverse from the reconstructed t
        # velocities
        amp = stf_ref[i, it]
        pf = pf - src_hot * (cfg.src_scale * dt * amp)
        vdiffs = (_dz_plus(vz), _dx_minus(vx))
        field_s[0][:] = pf - interior * (
            lam * (vdiffs[0] * rdz + vdiffs[1] * rdx) * dt)
        _inject_strips_refs(field_s, lr_buf, tb_buf, sp, cfg, which=(0,))
        fields_t = tuple(s[:] for s in field_s)

        adj_f = tuple(s[:] for s in adj_f_s)
        adj_p = tuple(s[:] for s in adj_p_s)
        d_rec = tuple(drec_buf[c, pl.ds(pos, 1), :cfg.nx]
                      for c in range(NC))
        if not phased:
            # ---- exact one-step adjoint via vjp of the acoustic step ------
            _, vjp_fn = jax.vjp(step_fn, fields_t, zero_psi, mats, amp)
            d_fields, d_psi, d_mats, d_amp = vjp_fn((adj_f, adj_p, d_rec))
        else:
            # ---- phase-split adjoint reusing the reconstruction stencils --
            # (same construction as the elastic backward: per-phase vjps on
            # diffs-as-inputs + closed-form stencil transposes)
            vfun = lambda vels, pn, vpsi, pd, bycs: (
                _ac_velocity_phase_values(cfg, rs, prof, mask, vels, pn,
                                          vpsi, pd, bycs, recw))
            _, vvjp = jax.vjp(vfun, (fields_t[1], fields_t[2]), p_tp1,
                              zero_psi[:2], pdiffs, (byca, bycb))
            (d_vels, d_p_rec, d_vpsi_in, d_pdiffs, d_bycs) = vvjp(
                ((adj_f[1], adj_f[2]), adj_p[2:], d_rec))
            cot_p = (adj_f[0] + d_p_rec + _dz_minus_t(d_pdiffs[0])
                     + _dx_plus_t(d_pdiffs[1]))
            pfun = lambda p_, ppsi, vd, lam_, a: (
                _ac_pressure_phase_values(cfg, prof, mask, src_hot, p_,
                                          ppsi, vd, lam_, a))
            _, pvjp = jax.vjp(pfun, fields_t[0], zero_psi[:2], vdiffs,
                              lam, amp)
            (d_p_t, d_ppsi_in, d_vdiffs, d_lam, d_amp) = pvjp(
                (cot_p, adj_p[:2]))
            cot_vz = d_vels[0] + _dz_plus_t(d_vdiffs[0])
            cot_vx = d_vels[1] + _dx_minus_t(d_vdiffs[1])
            d_fields = (d_p_t, cot_vz, cot_vx)
            d_psi = (*d_ppsi_in, *d_vpsi_in)
            d_mats = (d_lam, d_bycs[0], d_bycs[1])
        for s, v in zip(adj_f_s, d_fields):
            s[:] = v
        for s, v in zip(adj_p_s, d_psi):
            s[:] = v
        for f_idx, v in enumerate(d_mats):
            gmat_out[f_idx] = gmat_out[f_idx] + v
        dstf_out[i, it] = d_amp
        return 0

    dstf_out[i, cfg.nt - 1] = 0.0
    jax.lax.fori_loop(0, cfg.nt - 1, body, 0)


def _ac_run_backward(cfg: SimConfig, rs, lam, rho, stf, src_z, src_x,
                     ffin, lr, tb, d_data):
    from sep2023_tpu.medium import _shift_left, _shift_up

    S = stf.shape[0]
    f32 = jnp.float32
    mats = _ac_mats(lam, rho)
    prof = _profiles(cfg)
    nt_pad = _nt_pad(cfg)
    R_pad = _pad128(cfg.nx)
    NC = 4 * _n_layers(rs)

    # (S, 3, R, nt) channel cotangents -> padded 4-channel row planes (the
    # 4th/ett plane carries zero cotangent; the acoustic caller never sees
    # that channel)
    d4 = jnp.concatenate(
        [d_data.astype(f32),
         jnp.zeros((S, 1) + d_data.shape[2:], f32)], axis=1)
    dd = _place_cotangent(cfg, rs, d4, nt_pad, R_pad)

    recw_in = _recw_inputs(cfg, rs)
    n_recw = len(recw_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * (15 + n_recw)
                  + [pl.BlockSpec(memory_space=pltpu.HBM)] * 4),
        out_specs=[
            pl.BlockSpec((3, cfg.nz, cfg.nx), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=(
            [pltpu.VMEM((cfg.nz, cfg.nx), f32)] * 10
            + [pltpu.VMEM((_strip_chunk(cfg), _pad8(cfg.nz), LANE), f32),
               pltpu.VMEM((_strip_chunk(cfg), AC_TB_ROWS, _pad128(cfg.nx)),
                          f32),
               pltpu.VMEM((NC, _drec_chunk(cfg), R_pad), f32),
               pltpu.SemaphoreType.DMA((3,))]),
    )
    out_shape = [
        jax.ShapeDtypeStruct((3, cfg.nz, cfg.nx), f32),
        jax.ShapeDtypeStruct((S, nt_pad), f32),
    ]
    phased = os.environ.get("SEP2023_TPU_BWD", "phased") != "vjp"
    kernel = functools.partial(_ac_bwd_kernel, cfg, rs, n_recw, phased)
    interp = _interpret()
    gmat, d_stf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(cfg)),
    )(jnp.asarray(src_z, jnp.int32), jnp.asarray(src_x, jnp.int32),
      stf.astype(f32), *mats, *prof, *recw_in, ffin, lr, tb, dd)

    # the tight acoustic interior ([npml+2, n-3-npml], acoustic._consts
    # mask_i) — matches the XLA oracle's gradient masking
    mzi = (jnp.arange(cfg.nz) >= cfg.npml + 2) & (jnp.arange(cfg.nz)
                                                  <= cfg.nz - 3 - cfg.npml)
    mxi = (jnp.arange(cfg.nx) >= cfg.npml + 2) & (jnp.arange(cfg.nx)
                                                  <= cfg.nx - 3 - cfg.npml)
    m = (mzi[:, None] & mxi[None, :]).astype(f32)
    # chain the buoyancy gradients back to rho (the arithmetic staggered
    # averages of _buoyancies)
    rho32 = rho.astype(f32)
    _, byc_vjp = jax.vjp(
        lambda r: (2.0 / (_shift_up(r) + r), 2.0 / (_shift_left(r) + r)),
        rho32)
    (d_rho,) = byc_vjp((gmat[1] * m, gmat[2] * m))
    return gmat[0] * m, d_rho, d_stf[:, :cfg.nt]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def propagate_pallas_acoustic(cfg: SimConfig, rs, lam, rho, stf,
                              src_z, src_x):
    """Differentiable fused acoustic propagator: data (S, 3, n_rec, nt),
    channels (pr, vx, vz).  Gradients w.r.t. lam, rho, stf via the in-kernel
    boundary-saving adjoint — the fused counterpart of the reference's
    ac_*_adj.cu kernels (acoustic.propagate_acoustic is the XLA oracle)."""
    return _ac_run_forward(cfg, rs, lam, rho, stf, src_z, src_x,
                           save_strips=False)


def _pa_fwd(cfg, rs, lam, rho, stf, src_z, src_x):
    data, lr, tb, ffin = _ac_run_forward(cfg, rs, lam, rho, stf,
                                         src_z, src_x, save_strips=True)
    return data, (lam, rho, stf, src_z, src_x, ffin, lr, tb)


def _pa_bwd(cfg, rs, res, d_data):
    lam, rho, stf, src_z, src_x, ffin, lr, tb = res
    d_lam, d_rho, d_stf = _ac_run_backward(
        cfg, rs, lam, rho, stf, src_z, src_x, ffin, lr, tb, d_data)
    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (d_lam.astype(lam.dtype), d_rho.astype(rho.dtype),
            d_stf.astype(stf.dtype), f0(src_z), f0(src_x))


propagate_pallas_acoustic.defvjp(_pa_fwd, _pa_bwd)


# ---------------------------------------------------------------------------
# Acquisition planning: row / fiber / transposed dispatch
# ---------------------------------------------------------------------------

class FastPlan(NamedTuple):
    """How to run an acquisition on the fused engine.

    cfg: the config the kernel executes with (grid swapped if transposed);
    rs:  RowSurvey | FiberSurvey on that grid;
    transposed: run on the (x, z)-swapped grid — the borehole / vertical-
    fiber case (utilities.cu:620-641 recording_ezz with column receivers):
    the elastic system is invariant under (z<->x, vz<->vx, szz<->sxx), so a
    column survey is a row survey of the transposed problem.
    """

    cfg: SimConfig
    rs: object
    transposed: bool


def _ac_bwd_vmem_bytes(cfg: SimConfig, n_layers: int = 1) -> int:
    """Steady-state VMEM estimate for the fused ACOUSTIC backward:
    3 material inputs + 3 primal + 3 adjoint + 4 adjoint-psi scratch +
    3 gradient planes, plus the staging buffers (cf. _bwd_vmem_bytes)."""
    grid = _grid_bytes(cfg)
    return (16 * grid
            + _strip_chunk(cfg) * _pad8(cfg.nz) * LANE * 4
            + _strip_chunk(cfg) * AC_TB_ROWS * _pad128(cfg.nx) * 4
            + 4 * n_layers * _drec_chunk(cfg) * _pad128(cfg.nx) * 4)


def ac_grad_vmem_fits(cfg: SimConfig, n_layers: int = 1) -> bool:
    """Gate for the fused acoustic backward (16 resident planes vs the
    elastic full variant's 28 — judged against the same measured budget)."""
    return _ac_bwd_vmem_bytes(cfg, n_layers) < FULL_BWD_BUDGET


def propagate_pallas_acoustic_auto(cfg: SimConfig, rs, lam, rho, stf,
                                   src_z, src_x):
    """Differentiable acoustic propagation with the fused/streamed dispatch
    of the elastic `_grad_prop` (SEP2023_TPU_ENGINE forces either): the
    acoustic gradient is grid-size-independent too."""
    mode = os.environ.get("SEP2023_TPU_ENGINE", "auto")
    if mode != "stream" and (mode == "fused"
                             or ac_grad_vmem_fits(cfg, _n_layers(rs))):
        return propagate_pallas_acoustic(cfg, rs, lam, rho, stf, src_z,
                                         src_x)
    from sep2023_tpu.ops import pallas_stream as ps
    return ps.propagate_pallas_acoustic_streamed(cfg, rs, lam, rho, stf,
                                                 src_z, src_x)


def _transpose_cfg(cfg: SimConfig) -> SimConfig:
    import dataclasses
    ch = {"exx": "ezz", "ezz": "exx", "weighted": "weighted"}[cfg.das_channel]
    return dataclasses.replace(cfg, nz=cfg.nx, nx=cfg.nz, dz=cfg.dx,
                               dx=cfg.dz, das_channel=ch)


def plan_fast_path(cfg: SimConfig, rec_z, rec_x, das_w=None,
                   max_layers: int | None = None,
                   allow_transpose: bool = True) -> FastPlan | None:
    """Plan the fused-engine execution of an acquisition (PADDED-grid
    indices), or None if it needs the general XLA engine.

    Tries, in order: single-row window (the benchmark layout), K-layer fiber
    (curved/dipping fibers, multi-row spreads, duplicate-lane cables), then
    both again on the transposed grid (boreholes / vertical fibers).
    das_w: (R, 3) per-receiver (exx, exz, ezz) sensitivity weights for
    das_channel='weighted' (they become static kernel constants).
    allow_transpose=False when any src_rxz is zero (the transposed source
    rescaling divides by rxz).

    max_layers caps the fiber-plan depth (recording cost per step scales
    with K); the default 4 covers every reference layout.  Pass a larger
    value — or set SEP2023_TPU_MAX_LAYERS, which every loss builder
    inherits — to keep DENSE multi-row spreads (e.g. areal receiver
    grids) on the fast engine instead of the XLA fallback."""
    if max_layers is None:
        max_layers = int(os.environ.get("SEP2023_TPU_MAX_LAYERS", 4))
    rec_z = np.asarray(rec_z)
    rec_x = np.asarray(rec_x)
    for transposed in ((False, True) if allow_transpose else (False,)):
        c = _transpose_cfg(cfg) if transposed else cfg
        rz, rx = (rec_x, rec_z) if transposed else (rec_z, rec_x)
        w = None
        if das_w is not None:
            w = np.asarray(das_w)[:, ::-1] if transposed else das_w
        if rz.min() < 1 or rz.max() > c.nz - 2:
            continue
        if w is None:
            rs = check_row_survey(rz, rx)
            if rs is not None:
                return FastPlan(c, rs, transposed)
        fs = make_fiber_survey(rz, rx, c.nx, das_w=w, max_layers=max_layers)
        if fs is not None:
            return FastPlan(c, fs, transposed)
    return None


def _grad_prop(cfg: SimConfig, rs):
    """Pick the differentiable Pallas propagator for this workload: the
    VMEM-resident fused kernel when its backward fits the measured VMEM
    gates, else the grid-size-independent streamed engine
    (ops/pallas_stream.py — HBM-resident state, z-tiled megasteps).
    SEP2023_TPU_ENGINE=fused|stream forces either (tests/bench)."""
    mode = os.environ.get("SEP2023_TPU_ENGINE", "auto")
    if mode != "stream" and (mode == "fused"
                             or grad_vmem_fits(cfg, n_layers=_n_layers(rs))):
        return propagate_pallas
    from sep2023_tpu.ops import pallas_stream as ps
    return ps.propagate_pallas_streamed


def plan_engine_name(plan: "FastPlan") -> str:
    from sep2023_tpu.ops import pallas_stream as ps
    return ("fused Pallas"
            if _grad_prop(plan.cfg, plan.rs) is propagate_pallas
            else "streamed Pallas")


def forward_pallas_plan(plan: FastPlan, lam, mu, rho, stf,
                        src_z, src_x, rxz):
    """Forward-ONLY propagation under a FastPlan (observed-data generation):
    picks the fused forward while its 13-plane state fits VMEM
    (`fwd_vmem_fits` — far beyond the gradient wall), else the streamed
    forward.  Same transposition wrapper as `propagate_pallas_plan`."""
    mode = os.environ.get("SEP2023_TPU_ENGINE", "auto")
    if mode != "stream" and (mode == "fused"
                             or fwd_vmem_fits(plan.cfg, _n_layers(plan.rs))):
        fwd = forward_pallas
    else:
        from sep2023_tpu.ops import pallas_stream as ps
        fwd = ps.forward_pallas_streamed
    if not plan.transposed:
        return fwd(plan.cfg, plan.rs, lam, mu, rho, stf, src_z, src_x, rxz)
    T = lambda a: jnp.swapaxes(a, 0, 1)
    rxz = jnp.asarray(rxz, stf.dtype)
    data = fwd(plan.cfg, plan.rs, T(lam), T(mu), T(rho),
               stf * rxz[:, None], src_x, src_z, 1.0 / rxz)
    return data[:, jnp.asarray([0, 2, 1, 3])]


def propagate_pallas_plan(plan: FastPlan, lam, mu, rho, stf,
                          src_z, src_x, rxz):
    """Differentiable Pallas propagation under a FastPlan.  Arguments are on
    the ORIGINAL grid; transposition (model swapaxes, src index swap, source
    rescaling stf*rxz with moment ratio 1/rxz, vx/vz channel swap) is plain
    JAX around the custom-vjp kernel, so AD routes the cotangents through it
    automatically.  Dispatches to the VMEM-resident fused kernel or — past
    its measured VMEM range — the streamed engine, so the fast gradient is
    grid-size-independent (the CUDA reference's `Boundary.cu` property)."""
    prop = _grad_prop(plan.cfg, plan.rs)
    if not plan.transposed:
        return prop(plan.cfg, plan.rs, lam, mu, rho, stf,
                    src_z, src_x, rxz)
    T = lambda a: jnp.swapaxes(a, 0, 1)
    rxz = jnp.asarray(rxz, stf.dtype)
    data = prop(plan.cfg, plan.rs, T(lam), T(mu), T(rho),
                stf * rxz[:, None], src_x, src_z, 1.0 / rxz)
    # transposed channels (pr, vx', vz', ett') = (pr, vz, vx, ett)
    return data[:, jnp.asarray([0, 2, 1, 3])]
