"""Shot-level data parallelism over a TPU chip mesh.

The reference's only scaling axis is shots across GPUs: an OpenMP thread per
GPU over contiguous shot chunks with a host-side gradient sum
(`Torch_Fwi.cpp:71-101`).  The TPU-native expression is:

  * within a chip:  `vmap` over shots (propagator.propagate_shots)
  * across chips:   `shard_map` over the 'shot' axis of a `jax.sharding.Mesh`
                    with a `psum` reducing the misfit (and therefore — via AD
                    — the model gradient) over ICI.

The model (lam, mu, rho) is replicated; stf / geometry / observed data are
sharded along the shot axis.  `jax.grad` through the shard-mapped loss
automatically inserts the gradient all-reduce that `Torch_Fwi.cpp:96-101`
performs on the host.

If the shot count does not divide the mesh, pad with dummy shots carrying
shot_weight = 0 (`pad_shots`).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sep2023_tpu.config import SimConfig, Survey
from sep2023_tpu.ops import misfit as mf
from sep2023_tpu.propagator import ShotGeom, propagate

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shot_mesh(n_devices: Optional[int] = None, axis: str = "shot") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def survey_to_geoms(survey: Survey, npml: int, dtype=jnp.float32) -> ShotGeom:
    """Batched ShotGeom (leading shot axis) with the npml offset applied
    (Src_Rec.cu:87-116 does the same when parsing the survey JSON)."""
    S = survey.n_shots
    return ShotGeom(
        src_z=jnp.asarray(survey.src_z + npml, jnp.int32),
        src_x=jnp.asarray(survey.src_x + npml, jnp.int32),
        rxz=jnp.asarray(survey.src_rxz, dtype),
        rec_z=jnp.broadcast_to(jnp.asarray(survey.rec_z + npml, jnp.int32),
                               (S, survey.n_rec)),
        rec_x=jnp.broadcast_to(jnp.asarray(survey.rec_x + npml, jnp.int32),
                               (S, survey.n_rec)),
    )


def pad_shots(stf, geoms: ShotGeom, obs, weights, n_devices: int):
    """Pad the shot axis to a multiple of n_devices with zero-weight shots."""
    S = stf.shape[0]
    rem = (-S) % n_devices
    if rem == 0:
        return stf, geoms, obs, weights
    pad = lambda a: jnp.concatenate(
        [a, jnp.repeat(a[-1:], rem, axis=0)], axis=0)
    w = jnp.concatenate([weights, jnp.zeros((rem,), weights.dtype)])
    return pad(stf), jax.tree.map(pad, geoms), pad(obs), w


def make_sharded_misfit(cfg: SimConfig, mesh: Mesh,
                        channels: Sequence[str] = ("ett",), axis: str = "shot"):
    """Build  loss(lam, mu, rho, stf, geoms, obs, weights) -> scalar  with the
    shot axis sharded over `mesh` and the misfit psum-reduced over ICI.

    Differentiable: jax.grad(loss) yields replicated (all-reduced) model
    gradients — the TPU-native `Torch_Fwi.cpp:96-101`.
    """
    geom_spec = ShotGeom(src_z=P(axis), src_x=P(axis), rxz=P(axis),
                         rec_z=P(axis), rec_x=P(axis))

    # check_vma=False: the propagator's scan starts from a constant zero
    # state that only becomes shot-varying after the first source injection,
    # which the varying-manual-axes checker would reject.
    @functools.partial(
        _shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), geom_spec, P(axis), P(axis)),
        out_specs=P(), check_vma=False)
    def loss(lam, mu, rho, stf, geoms, obs, weights):
        syn = jax.vmap(lambda s, g: propagate(cfg, lam, mu, rho, s, g))(
            stf, geoms)
        per_shot = jax.vmap(
            lambda o, s: mf.l2_misfit(o, s, channels=channels))(obs, syn)
        return jax.lax.psum(jnp.sum(weights * per_shot), axis)

    return loss


def make_local_misfit(cfg: SimConfig, channels: Sequence[str] = ("ett",)):
    """Single-device (vmap only) variant with the same signature."""

    def loss(lam, mu, rho, stf, geoms, obs, weights):
        syn = jax.vmap(lambda s, g: propagate(cfg, lam, mu, rho, s, g))(
            stf, geoms)
        per_shot = jax.vmap(
            lambda o, s: mf.l2_misfit(o, s, channels=channels))(obs, syn)
        return jnp.sum(weights * per_shot)

    return loss
