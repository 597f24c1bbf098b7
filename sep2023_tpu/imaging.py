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


def rtm_image_time(cfg: SimConfig, vp, rho, stf, geom, residual_data):
    """Time-derivative RTM imaging condition on the acoustic pressure field
    (`image_vel_time.cu:25-37`): I = sum_t -2/vp (p_{t+1}-p_t) p_adj.  See
    acoustic.rtm_image_time (geom is an acoustic.AcGeom)."""
    from sep2023_tpu.acoustic import rtm_image_time as _rt
    return _rt(cfg, vp, rho, stf, geom, residual_data)


def illumination_compensate(image, eps: float = 1e-3):
    """Simple source-illumination normalization for RTM images."""
    scale = jnp.sqrt(jnp.mean(image ** 2))
    return image / (jnp.abs(image).max() * eps + scale + 1e-30)
