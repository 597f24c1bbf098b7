"""Model parameterization heads: differentiable maps from inversion
parameters (on the physical grid) to padded (lam, mu, rho) in SI units.

Functional re-design of the reference's seven nn.Module heads
(`FWI_ops.py:66-619`).  Each head is a pure function

    params (dict of (nz_phys, nx_phys) arrays)  ->  (lam, mu, rho) padded

composed of: bilinear resize + replicate pad (-> padded grid), mask blending
against frozen padded reference fields
(`X = mask * X_pad + (1-mask) * X_ref`, FWI_ops.py:120-122), and the head's
physics map.  JAX AD supplies every head's chain rule — there is no analogue
of the reference's cached-gradient FWIFunction (`FWI_ops.py:46-63`).

Unit convention: SI (Pa, kg/m^3) throughout.  The reference divides lam/mu by
1e6 and multiplies back by MEGA inside CUDA (`FWI_ops.py:124-125`,
`libCUFD.cu:73-74`); that float32 work-around is unnecessary here and the
composite map param -> physics is identical.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sep2023_tpu import rock_physics as rp
from sep2023_tpu.config import Grid
from sep2023_tpu.medium import resize_and_pad


@dataclasses.dataclass
class Head:
    """A parameterization head.

    grid        : padded Grid
    param_names : inversion parameter names, in flattening order
    phys_shape  : (nz_phys, nx_phys) shape of each parameter array
    refs        : frozen PADDED reference fields, one per param (mask blend)
    mask        : (nz, nx) blend mask (1 = invert here); default all ones
    to_lame     : padded blended params -> (lam, mu, rho)
    bounds      : optional {name: (lo, hi)} scalar or per-pixel L-BFGS-B bounds
    """

    grid: Grid
    param_names: Tuple[str, ...]
    phys_shape: Tuple[int, int]
    refs: Dict[str, jnp.ndarray]
    mask: jnp.ndarray
    to_lame: Callable[..., Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]
    bounds: Optional[Dict[str, Tuple]] = None

    def blend(self, params: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {}
        for name in self.param_names:
            pad = resize_and_pad(params[name], self.grid.nz_phys,
                                 self.grid.nx_phys, self.grid.npml)
            out[name] = self.mask * pad + (1.0 - self.mask) * self.refs[name]
        return out

    def apply(self, params: Dict[str, jnp.ndarray]):
        b = self.blend(params)
        return self.to_lame(*(b[n] for n in self.param_names))


def _make(grid: Grid, names, init: Dict[str, np.ndarray], to_lame,
          mask=None, bounds=None) -> Head:
    mask = jnp.ones(grid.shape) if mask is None else jnp.asarray(mask)
    phys_shape = np.asarray(init[names[0]]).shape
    refs = {n: resize_and_pad(jnp.asarray(init[n]), grid.nz_phys,
                              grid.nx_phys, grid.npml) for n in names}
    return Head(grid=grid, param_names=tuple(names), phys_shape=phys_shape,
                refs=refs, mask=mask, to_lame=to_lame, bounds=bounds)


# -- the seven heads --------------------------------------------------------

def vp_vs_rho(grid, init, mask=None, bounds=None) -> Head:
    """(Vp, Vs, rho) head (`FWI` module, FWI_ops.py:66-127)."""
    def to_lame(vp, vs, rho):
        return (vp ** 2 - 2.0 * vs ** 2) * rho, vs ** 2 * rho, rho
    return _make(grid, ("vp", "vs", "rho"), init, to_lame, mask, bounds)


def lame_rho(grid, init, mask=None, bounds=None) -> Head:
    """(lambda, mu, rho) head (`FWI_Lame_Den`, FWI_ops.py:146-204)."""
    def to_lame(lam, mu, rho):
        return lam, mu, rho
    return _make(grid, ("lam", "mu", "rho"), init, to_lame, mask, bounds)


def ip_is_rho(grid, init, mask=None, bounds=None) -> Head:
    """(P-impedance, S-impedance, rho) head (`FWI_IP_IS_Den`,
    FWI_ops.py:208-267): lam = (IP^2 - 2 IS^2)/rho, mu = IS^2/rho."""
    def to_lame(ip, is_, rho):
        return (ip ** 2 - 2.0 * is_ ** 2) / rho, is_ ** 2 / rho, rho
    return _make(grid, ("ip", "is", "rho"), init, to_lame, mask, bounds)


def vp_vs_ip(grid, init, mask=None, bounds=None) -> Head:
    """(Vp, Vs, IP) head (`FWI_Vp_Vs_IP`, FWI_ops.py:270-330): rho = IP/Vp."""
    def to_lame(vp, vs, ip):
        rho = ip / vp
        return ip * vp - 2.0 * rho * vs ** 2, rho * vs ** 2, rho
    return _make(grid, ("vp", "vs", "ip"), init, to_lame, mask, bounds)


def vp_vs_is(grid, init, mask=None, bounds=None) -> Head:
    """(Vp, Vs, IS) head (`FWI_Vp_Vs_IS`, FWI_ops.py:333-395): rho = IS/Vs."""
    def to_lame(vp, vs, is_):
        rho = is_ / vs
        return rho * vp ** 2 - 2.0 * is_ * vs, is_ * vs, rho
    return _make(grid, ("vp", "vs", "is"), init, to_lame, mask, bounds)


def rock_vrh(grid, init, mask=None, bounds=None) -> Head:
    """(porosity, clay, saturation) head, VRH bound
    (`FWI_Rock_Physics_VRH`, FWI_ops.py:401-508)."""
    return _make(grid, ("phi", "cc", "sw"), init, rp.pcs_to_lame_vrh,
                 mask, bounds)


def rock_gassmann(grid, init, mask=None, bounds=None) -> Head:
    """(porosity, clay, saturation) head, Gassmann fluid substitution
    (`FWI_Rock_Physics_gassmann`, FWI_ops.py:516-619)."""
    return _make(grid, ("phi", "cc", "sw"), init, rp.pcs_to_lame_gassmann,
                 mask, bounds)


HEADS = {
    "vp_vs_rho": vp_vs_rho,
    "lame_rho": lame_rho,
    "ip_is_rho": ip_is_rho,
    "vp_vs_ip": vp_vs_ip,
    "vp_vs_is": vp_vs_is,
    "rock_vrh": rock_vrh,
    "rock_gassmann": rock_gassmann,
}


def default_mask(grid: Grid, freeze_top_rows: int = 4) -> jnp.ndarray:
    """The reference's standard mask: invert the physical region, freeze the
    PML collar and the first rows below the surface (Main-001:40-42)."""
    m = np.zeros(grid.shape, dtype=np.float64)
    zi, xi = grid.interior_slices()
    m[zi, xi] = 1.0
    m[grid.npml:grid.npml + freeze_top_rows, :] = 0.0
    return jnp.asarray(m)
