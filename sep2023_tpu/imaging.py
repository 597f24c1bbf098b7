"""Imaging utilities: gradient chain rules between parameterizations and
RTM-style velocity images.

Replaces:
  - the (lam, mu, rho) -> (vp, vs, rho) gradient chain rule the reference
    hand-codes in `Ops/FWI/propagator.py:210-216`
  - the zero-lag cross-correlation Vp imaging kernel
    (`image_vel.cu:26-27`: gCp += -2 Cp rho (dvz+dvx) sigma_adj dt), which is
    exactly the Vp-parameterized FWI gradient — obtained here by the chain
    rule through lam = rho(vp^2 - 2 vs^2), mu = rho vs^2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sep2023_tpu.config import SimConfig
from sep2023_tpu.ops import misfit as mf
from sep2023_tpu.propagator import propagate


def lame_grads_to_velocity(g_lam, g_mu, g_rho, vp, vs, rho):
    """Chain rule (dJ/dlam, dJ/dmu, dJ/drho) -> (dJ/dvp, dJ/dvs, dJ/drho)
    for lam = rho(vp^2-2vs^2), mu = rho vs^2 (propagator.py:210-216)."""
    g_vp = 2.0 * rho * vp * g_lam
    g_vs = -4.0 * rho * vs * g_lam + 2.0 * rho * vs * g_mu
    g_rho2 = (vp ** 2 - 2.0 * vs ** 2) * g_lam + vs ** 2 * g_mu + g_rho
    return g_vp, g_vs, g_rho2


def rtm_image(cfg: SimConfig, vp, vs, rho, stf, geom, residual_data,
              channels=("ett",)):
    """Reverse-time-migration image: the Vp sensitivity kernel of an L2
    misfit against `residual_data` treated as the observed field — the
    differentiable equivalent of the reference's image_vel path
    (`main.cu:322+`, `image_vel.cu`)."""
    def loss(vp_):
        lam = (vp_ ** 2 - 2.0 * vs ** 2) * rho
        mu = vs ** 2 * rho
        syn = propagate(cfg, lam, mu, rho, stf, geom)
        return mf.l2_misfit(residual_data, syn, channels=channels)

    return jax.grad(loss)(vp)


def rtm_image_time(cfg: SimConfig, vp, rho, stf, geom, residual_data,
                   return_illum: bool = False):
    """Time-derivative RTM imaging condition on the acoustic pressure field
    (`image_vel_time.cu:25-37`): I = sum_t -2/vp (p_{t+1}-p_t) p_adj.  See
    acoustic.rtm_image_time (geom is an acoustic.AcGeom);
    return_illum=True also returns the per-cell source energy sum_t p_t^2."""
    from sep2023_tpu.acoustic import rtm_image_time as _rt
    return _rt(cfg, vp, rho, stf, geom, residual_data,
               return_illum=return_illum)


def source_illumination(cfg: SimConfig, lam, mu, rho, stf, geom):
    """Per-cell source-wavefield energy sum_t (szz+sxx)^2 of one elastic
    shot: the illumination denominator for the zero-lag Vp image
    (conditioning image_vel.cu:26-27's kernel).  One extra forward scan per
    shot — the imaging driver amortizes it over its per-shot image loop."""
    from sep2023_tpu.medium import material_fields
    from sep2023_tpu.propagator import (_consts, elastic_step, zero_state)

    dtype = lam.dtype
    mat = material_fields(lam, mu, rho)
    cp, mask_f, mask_i = _consts(cfg, dtype)
    cp = jax.tree.map(jnp.asarray, cp)

    def body(carry, amp):
        s, ill = carry
        s2, _ = elastic_step(s, mat, amp, geom, cp, mask_f, cfg)
        pr = s2.f.szz + s2.f.sxx
        return (s2, ill + pr * pr), None

    state0 = zero_state(cfg.nz, cfg.nx, dtype)
    (_, ill), _ = jax.lax.scan(body, (state0, jnp.zeros_like(lam)),
                               stf[:cfg.nt - 1])
    mzi, mxi = mask_i
    return ill * (mzi * mxi)


def illumination_compensate(image, illum, eps: float = 1e-3):
    """TRUE source-illumination compensation: divide the stacked image
    per cell by the accumulated source-wavefield energy with a stabilized
    denominator, balancing deep (weakly illuminated) reflectors against
    shallow ones.  `illum` comes from `source_illumination` (elastic) or
    `rtm_image_time(..., return_illum=True)` (acoustic), summed over shots
    like the image itself."""
    return image / (illum + eps * jnp.max(illum) + 1e-30)


def normalize_image(image, eps: float = 1e-3):
    """Scalar RMS rescale of an image (display normalization only — NOT
    illumination compensation; use `illumination_compensate` for that)."""
    scale = jnp.sqrt(jnp.mean(image ** 2))
    return image / (jnp.abs(image).max() * eps + scale + 1e-30)
