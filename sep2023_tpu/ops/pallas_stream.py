"""Streamed Pallas TPU engine: grid-size-independent fused gradient.

The fused engine (ops/pallas_engine.py) keeps ALL wavefield state VMEM-
resident for the whole time loop — the fastest possible plan, but bounded
by VMEM: past ~528x704-padded grids its backward no longer compiles and the
gradient used to collapse to the XLA fallback (~0.5 GCell/s, below the
1 GCell/s baseline).  The CUDA reference has no such wall: its kernels
stream every field through HBM each step (`el_stress.cu:89-104`,
`Boundary.cu:17-41` work at any grid size).  This module gives the fused
gradient the same property, TPU-style:

  * the time loop is a `lax.scan` OUTSIDE Pallas; each step launches one
    "megastep" kernel whose IN-KERNEL fori_loop walks z-tiles (DMAs do not
    pipeline across Pallas grid iterations, so the loop lives inside;
    SEP2023_TPU_STREAM_UNROLL optionally unrolls it statically — measured
    perf-neutral, the fold-everything experiment);
  * carried state — 5 primal fields (+8 psi forward) / 5 primal + 5 adjoint
    fields + 8 adjoint psi (backward) — lives in HBM as one stacked
    (NF, nz_ext, nxp) array, updated IN PLACE via `input_output_aliases`
    (without aliasing XLA copies the carries every scan step — measured
    40% of device time); tiles stream through a 2-slot double-buffered
    input pipeline and write from a separate out-stage, with the single
    aliasing hazard (tile i's interior rows vs tile i+1's halo read)
    fenced by waiting the prefetch DMA before starting the output DMA;
  * each tile reads `T + 2*PAD` rows (PAD = 16 halo rows) and writes its
    T interior rows, so stencil chains up to 8 rows deep (the measured
    reach of reconstruct + phase-split adjoint) and `pltpu.roll`
    wrap-around contamination (<= 8 rows from the scratch edge) never
    touch written rows; T balances to ceil(nz / n_tiles) under a VMEM
    budget (tile_rows);
  * TEMPORAL BLOCKING (`_stream_K` / `_stream_K_bwd`): each tile sweep may
    run K leapfrog sub-steps before storing back, amortizing the HBM
    state+materials(+gradient) streaming K-fold — sub-step halo values are
    recomputed in-tile (same arithmetic as the neighbor's interior, ULP
    equality tested).  Valid rows shrink per sub-step by the chain reach
    (4 forward / 8 reconstruct+adjoint), so PAD=16 admits K<=3 forward
    (recording samples one halo row) and K<=2 backward; nt-1 pads to a
    multiple of lcm(K, K_bwd) with zero-amplitude ghost steps that the
    backward reverses exactly (their recordings carry zero cotangent);
  * RING SWEEPS (`_stream_J`): J megasteps may run inside ONE kernel
    invocation, the 2-slot pipeline WRAPPING from the last tile to the
    next sweep's tile 0, so the per-invocation fill/drain (the blocking
    tile-0 prime + last-tile drain — ~9% of the backward at 814x2064,
    which no cross-invocation prefetch can hide: DMAs die at kernel
    return) amortizes J-fold.  Unlike deeper K, sweeps re-load halos
    from HBM, so the VMEM budget and valid-row window are untouched;
    the cost is J-fold kernel code.  Sweeps > 0 source the carries
    through the OUTPUT refs (the same donated HBM buffer on hardware;
    the distinction makes interpret-mode chaining — and the CPU
    equality tests — exact), and compact psi adds a top-halo
    copy-down (_psi_ring_fix) because the previous tile's extraction
    overwrites the band rows the next tile's halo needs;
  * boundary strips (`Boundary.cu` layout: left/right columns packed into
    a (nz_ext, 128) plane, top/bottom rows into a (56, nxp) plane) and the
    per-step recording rows ride the scan as ys (forward) / xs (backward) —
    no in-kernel chunked strip DMA needed;
  * programs embedding these scans take
    `xla_tpu_scoped_vmem_limit_kib=131072` per-jit compiler options
    (`tpu_jit`): XLA otherwise promotes mid-size while carries into scoped
    VMEM past its own limit and errors.

Measured (v5e, round 4: split-band compact psi + K=3/Kb=2 temporal
blocking + double-buffered gradient staging): forward 11.5 GCell/s and
gradient 3.54 GCell/s at 814x2064 — formerly a 0.5-0.6 GCell/s XLA
fallback, and at parity with the fused engine's forward plateau; forward
bitwise-equal to the fused engine at K=1, gradients to 2e-7, tile-count
invariance bitwise.

The physics and the phase-split in-kernel adjoint are the SAME code as the
fused engine (`_step_values`, `_stress/_velocity_phase_values`,
`_record_rows` with the tile's global-row iota and an ownership window) —
equality with the XLA engine is inherited and tested per tile count.

z-tiling bookkeeping (all static except the tile-loop index):
  buffer row b <-> global row gz = b - PAD;  tile i reads buffer rows
  [i*T, i*T + T + 2*PAD), writes [PAD + i*T, PAD + (i+1)*T); tile 0 / the
  last tile additionally zero the PAD edge rows.  Top/bottom strip bands
  (5 rows at static global rows z0/z1) are injected with a guarded dynamic
  store when the band lies fully inside the tile's extended window; a band
  straddling the window edge is safely skipped (its overlap is < 5 rows
  from the scratch edge, which is outside every written row's 8-row reach).

Reference parity: this engine is the TPU counterpart of the reference's
HBM-resident kernel scheme (`libCUFD.cu:268-332` forward loop,
`libCUFD.cu:545-653` reconstruct+adjoint loop, `el_stress_adj.cu` /
`el_velocity_adj.cu` via machine vjps).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sep2023_tpu import cpml as cpml_mod
from sep2023_tpu.config import SimConfig
from sep2023_tpu.medium import MatFields, material_fields
from sep2023_tpu.ops import pallas_engine as eng

LANE = eng.LANE


def _pad_rows() -> int:
    """Halo rows per tile side: >= stencil-chain reach (8) + strip depth
    (5), 8-row aligned for the DMA offsets.  Deeper temporal blocking
    needs a deeper halo (4K+1 <= PAD forward, 8K <= PAD backward), so
    SEP2023_TPU_STREAM_PAD=24|32 admits K up to 5|7 forward and 3|4
    backward at the cost of 2*(PAD-16) extra recomputed rows per tile.
    Read ONCE at import (the layout is global); tests/sweeps override the
    module global (or set the env before the first import)."""
    v = int(os.environ.get("SEP2023_TPU_STREAM_PAD", "16"))
    return max(16, ((v + 7) // 8) * 8)


PAD = _pad_rows()   # halo rows per tile side
STRIP_L = eng.STRIP_L
TB_ROWS = eng.TB_ROWS
NF_FWD = 13         # vz vx szz sxx sxz + 8 psi
NF_BWD = 18         # 5 primal + 5 adjoint fields + 8 adjoint psi


def _pad8(n):
    return eng._pad8(n)


def _pad128(n):
    return eng._pad128(n)


SCOPED_VMEM_KIB = int(os.environ.get("SEP2023_TPU_SCOPED_VMEM_KIB",
                                     131072))


def compile_options():
    """Per-jit compiler options for programs embedding the streamed
    megasteps.  XLA's TPU buffer assignment promotes mid-sized while-loop
    carries / kernel outputs into scoped VMEM and can exceed its default
    scoped limit instead of falling back to HBM ("It should not be possible
    to run out of scoped vmem — please file a bug"); raising the limit to
    128 MiB (the physical v5e VMEM) both fixes the failure and lets the
    carry live in VMEM when it fits.  Apply via
    `jax.jit(fn, compiler_options=compile_options())` (TPU backends only —
    see `tpu_jit`)."""
    return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}


def tpu_jit(fn, **jit_kwargs):
    """jax.jit that carries the streamed engine's TPU compiler options on
    TPU backends (a plain jit elsewhere)."""
    if jax.default_backend() == "tpu":
        return jax.jit(fn, compiler_options=compile_options(), **jit_kwargs)
    return jax.jit(fn, **jit_kwargs)


# Mosaic scoped limit (v5e carries 128 MiB/core).  117 MiB: the
# weighted-fiber (FiberSurvey) backward at 814x2064 with the J=3 ring
# default allocates 111.1 MiB of kernel stack — 1% past the previous
# 110 MiB limit (the fiber's extra recw operands/vjp temps ride on top
# of _budget_rows' plain-survey calibration) — while the XLA-side
# scoped limit (compile_options) is already 128 MiB.
VMEM_LIMIT = 117 * 2 ** 20


def _unroll_tiles() -> int:
    """Statically unroll the in-kernel tile loop up to this many tiles
    (0 = off): every guard/offset/slot folds at trace time — larger
    compile, tighter Mosaic schedule."""
    return int(os.environ.get("SEP2023_TPU_STREAM_UNROLL", "0"))


def _gm_vmem() -> bool:
    """Keep the 5-plane material-gradient accumulator VMEM-resident
    (SEP2023_TPU_STREAM_GM=vmem): the backward megastep then accumulates
    into the aliased gradient output IN PLACE instead of streaming gmat
    HBM->VMEM->HBM per tile sweep — 10 of the ~35 streamed planes per
    elastic megastep (6 of ~21 for the acoustic twin's 3-plane gmat;
    _budget_rows conservatively charges 5 planes for both).  Costs
    5*nz_ext*nxp*4 bytes of VMEM, charged
    against the tile budget by _budget_rows (smaller T -> more halo
    recompute).  MEASURED A LOSS on v5e (round 4, tools/stream_ksweep.py
    --gm vmem): gradient 2.64 vs 2.81 GCell/s at 560x720 (compact
    layout), and at 814x2064 the gm-resident backward exceeds Mosaic's
    scoped stack (compile failure — _budget_rows' calibration does not
    extend to gm at full-plane widths).  Kept as an opt-in knob for
    narrower shapes; off by default."""
    return os.environ.get("SEP2023_TPU_STREAM_GM", "") == "vmem"


def _mats_compute(cfg) -> bool:
    """Stream RAW (lam, mu, rho) material planes ((lam, rho) acoustic) and
    derive the staggered fields (lp2m, ave_mu, byc_a, byc_b) in-kernel
    (SEP2023_TPU_STREAM_MATS: =compute forces on, =stage forces the
    5-plane staged stream; unset AUTO-selects): 3 planes streamed per
    megastep instead of 5 (2 instead of 3 acoustic).  Whether that wins
    depends on how stream-bound the megasteps are, so the default follows
    the selected layout (v5e measurements, tools/stream_ksweep.py):
    FULL-PLANE layouts are deeply stream-bound and the saved bytes
    convert (814x2064: forward 6.70 -> 7.06 GCell/s at K=1, gradient
    2.715 -> 2.736 at K=2), while band-compact (PsiPlan) layouts at
    moderate widths are near compute-bound and the in-kernel derivation
    (divides each sub-step) costs more than 2 planes (560x720 compact:
    gradient 2.881 -> 2.65 at K=2) — so AUTO enables the raw stream only
    when the layout carries full psi planes.  The raw planes
    ride an (E+8)-row slot (one 8-row block deeper than the state tiles) so
    the z+1 shifts are EXACT static slices — no tile-edge wrap — against an
    HBM buffer that is EDGE-REPLICATED (_ext_plane_edge: matches
    medium._shift_up/_shift_left boundary semantics; zero rho pads would
    divide by zero).  Derived values in ghost rows/lanes are nonzero but
    inert: every update is masked and the CPML profiles are zero there.
    Requires nxp > nx (the lane roll for the x+1 shift wraps at the last
    lane): grids whose nx already fills the lane tile fall back to the
    default 5-plane stream."""
    env = os.environ.get("SEP2023_TPU_STREAM_MATS", "")
    if env == "compute":
        return _pad128(cfg.nx) > cfg.nx
    if env:   # "stage" (or anything else): force the staged stream
        return False
    return _pad128(cfg.nx) > cfg.nx and _select_layout(cfg)[4] is None


def _dbg() -> frozenset:
    """Timing-dissection switches (comma list, DEBUG ONLY — results are
    garbage): 'noin' skips the input DMAs, 'noout' the output DMAs,
    'nostep' the physics (stage copied from the input slot).  Lets a
    benchmark split a megastep's wall time into compute vs in-stream vs
    out-stream without a profiler that can see inside Mosaic."""
    return frozenset(
        t for t in os.environ.get("SEP2023_TPU_STREAM_DEBUG", "").split(",")
        if t)


def _budget_rows(cfg: SimConfig, compact: bool) -> int:
    """Max tile height T the pipelined BACKWARD's VMEM fits (the binding
    direction; the forward shares the layout): double-buffered state +
    materials slots of (T+2*PAD, nxp) rows, the (T, nxp) out stage +
    gradient buffers, and Mosaic vjp-temporary plane-tiles, against
    ~100 MiB of the 110 MiB scoped limit.  Full-plane carries: 2x18 state
    + 2x5 mats + ~30 temps extended planes, 18+5 T-row planes.  Compact
    (PsiPlan): 2x10 + 2x5 + 8 psi-materialization planes, 10+5 T-row
    planes, and a LARGER temp allowance (the psi extract/materialize vjps
    add plane-tiles) — calibrated on-chip at nxp=2176/Kb=1, where T=104
    compiles and T=120 overflows Mosaic's scoped stack.  TEMPORAL
    BLOCKING multiplies the vjp temporaries: each of the Kb
    reconstruct+adjoint sub-steps holds its own saved-primal plane-tiles,
    so the temp allowance scales by Kb (consistent with every measured
    pass/fail point: Kb=2 at nxp=2176 predicts T<=88 — T=104 fails,
    T=64/80 full-plane compile; Kb=2 at nxp=768 predicts T<=288 — the
    T=280 compact layout compiles)."""
    nxp = _pad128(cfg.nx)
    rows = (100 * 2 ** 20) // (nxp * 4)
    if _gm_vmem():   # the VMEM-resident gradient accumulator's 5 planes
        rows -= 5 * (_pad8(cfg.nz) + 2 * PAD + 16)
    # Widest nxp the ext/tpl constants are VALIDATED at is 2176 (Marmousi
    # 814x2064 padded; the pass/fail points above).  NOTE the constants
    # deliberately UNDER-charge ~3.8 MB: the doubled gradient-staging
    # buffer gm_t (2, 5, T, nxp) rides the calibration margin — charging
    # it (ext 76 -> 81) shrank T 88 -> 80 at nxp=2176 and LOST (grad 3.54
    # -> 3.25).  An uncalibrated wider shape that hits a Mosaic
    # scoped-stack compile failure (relay-scrubbed HTTP 500) should first
    # try SEP2023_TPU_STREAM_T to force a smaller T.
    ext, tpl = (76, 15) if compact else (76, 23)
    T = (rows - ext * 2 * PAD) // (ext + tpl * _stream_K_bwd(cfg))
    # T >= PAD keeps the 2-slot pipeline's hazard window adjacent-only:
    # tile i's out tail [iT+T, iT+T+PAD) must not reach tile i+2's in-DMA
    # window [(i+2)T, ...), i.e. T >= PAD (multi-tile layouts only)
    return max(PAD, 32, min(288, (T // 8) * 8))


def _balance(nz: int, T: int):
    """(T', n_tiles) with T' = ceil8(nz / n_tiles): the last tile carries
    no more ghost rows than the rest (T=256 on nz=560 would otherwise
    process 768 rows for 560 real ones — 37% waste)."""
    n_tiles = -(-nz // T)
    return -(-(-(-nz // n_tiles)) // 8) * 8, n_tiles


def tile_rows(cfg: SimConfig) -> int:
    """Tile height T (rows written per grid step) of the SELECTED layout
    (see _select_layout).  SEP2023_TPU_STREAM_T overrides (tests force
    small T to exercise multi-tile paths on tiny grids)."""
    return _select_layout(cfg)[0]


class PsiPlan:
    """Static layout for band-compact CPML psi storage.

    The psi memory variables are identically zero outside the PML bands
    (cpml.py: a = 0 there, and zero stays zero), so carrying them as full
    (nz_ext, nxp) planes streams 8 of the 13 forward / 18 backward fields
    for nothing — the dissection benchmark (tools/stream_dissect.py)
    showed the K=1 megasteps fully stream-bound (bytes converted ~1:1);
    after K=3 temporal blocking they are DMA/compute-BALANCED on the
    forward and still DMA-dominated on the backward (docs/PERF.md), so
    the compact bands remain the backward's main byte lever.
    Compactly: z-derivative psi live in two (zb, nxp) row bands, x-derivative
    psi in an (nz_ext, xl + xrw) lane block pair.  The kernels materialize
    full planes in VMEM scratch (exact: out-of-band values are zero), run
    the SAME physics, and store back only the bands.

    For the adjoint psi of the backward kernel the out-of-band values are
    NOT zero but provably inert: with a = 0 the adjoint recursion
    lam_psi <- b (lam_psi + lam_d) feeds nothing (lam_d, lam_fields and
    lam_mats never read lam_psi where a = 0, and the t=0 value is
    discarded), so dropping them each step leaves every gradient bitwise
    unchanged (test_stream_compact).

    The z bands may straddle ANY tile boundaries: each tile loads /
    stores its static overlap with each band (`_z_band_copies`).  This is
    hazard-free because the band slots are VMEM pallas operands, so the
    kernel sees DISTINCT input and output copies even under
    input_output_aliases (the alias is an XLA buffer donation, not an
    in-kernel identity): tile i's extraction can never leak megastep-end
    values into tile i+1's halo materialization.  Round 4 removed the old
    single-owner-tile placement gates on this basis — they had
    structurally excluded Marmousi-scale grids under the Kb=2 tile-height
    budget (814 mod T < zb + PAD + 8 for every admissible T).

    Band heights/offsets are 8-row padded/aligned: the bottom band's
    natural global start `PAD + nz - zb` is not sublane-aligned for
    general nz, so it is rounded DOWN to a multiple of 8 and the band
    height widened to ZB = zb + 8 (Mosaic requires provably 8-aligned
    multi-row stores; tile origins i*T and PAD are multiples of 8, so
    every per-tile overlap offset stays provably aligned).  The top band
    uses the same ZB so both live in one (4, 2, ZB, nxp) array.
    """

    def __init__(self, cfg, T, n_tiles, nz_ext, nxp):
        self.zb = zb = _pad8(max(cfg.npml, 8))
        self.ZB = zb + 8
        # bottom-band start, GLOBAL buffer rows, 8-aligned (rounded down)
        self.B0 = ((PAD + cfg.nz - zb) // 8) * 8
        self.xl = min(128, nxp)
        xr0 = min(((cfg.nx - cfg.npml) // 128) * 128, nxp - 128)
        self.xr0 = max(0, xr0)
        self.xrw = nxp - self.xr0 if cfg.nx > self.xr0 + 128 else 128
        self.XW = self.xl + self.xrw

    @staticmethod
    def build(cfg, T, n_tiles, nz_ext, nxp):
        if os.environ.get("SEP2023_TPU_STREAM_NOCOMPACT"):
            return None
        zb = _pad8(max(cfg.npml, 8))
        if nxp < 128 or cfg.npml > 128 or cfg.nz < zb:
            return None
        return PsiPlan(cfg, T, n_tiles, nz_ext, nxp)


def _select_layout(cfg: SimConfig):
    """(T, n_tiles, nz_ext, nxp, plan), preferring a compact-psi (PsiPlan)
    layout: the compact carries stream ~2.6x fewer plane-bytes per step,
    measured 3.79 -> 6.5 GCell/s forward and 1.23 -> 1.74 GCell/s gradient
    at 814x2064 on a v5e chip (round 3, K=1).  Since the round-4 split-band
    generalization (_z_band_copies) the plan builds for EVERY tiling, so
    the compact branch succeeds at its balanced tile count unless the
    grid/tile shape itself is degenerate (T < 32, or T < PAD multi-tile
    under a deep SEP2023_TPU_STREAM_PAD) — the full-plane-budget fallback
    below then still attaches a plan at its more conservative T."""
    nxp = _pad128(cfg.nx)
    nz = cfg.nz

    def mk(T, n_tiles):
        nz_ext = PAD + n_tiles * T + PAD
        return T, n_tiles, nz_ext, nxp, PsiPlan.build(cfg, T, n_tiles,
                                                      nz_ext, nxp)

    env = os.environ.get("SEP2023_TPU_STREAM_T")
    if env:
        T = min(int(env), _pad8(nz))
        if -(-nz // T) > 1:   # multi-tile: pipeline safety needs T >= PAD
            T = min(max(T, PAD), _pad8(nz))
        return mk(T, -(-nz // T))

    T_c = min(_budget_rows(cfg, compact=True), _pad8(nz))
    n0 = -(-nz // T_c)
    # RING-AWARE re-balance (compiled backends): a 2-3-tile layout is
    # pipeline-FILL-dominated — the blocking tile-0 prime covers 1/n of
    # the sweep — and below 4 tiles the ring sweeps (_stream_J) that
    # amortize it are gated off.  Measured at 560x720/nt=1001 (grad,
    # v5e): the balanced 2x280 layout runs 2.95 GCell/s while 6x96 with
    # J=3 runs 3.43 (+16%; 8x72: 3.25; 4x140: Mosaic scoped-stack
    # compile failure — the stack grows with J at large T).  So when the
    # balanced compact layout would have < 4 tiles, prefer ~96-row tiles
    # in the VALIDATED compile window T in [72, 96] (T=96 at nxp=768 and
    # T=88 at nxp=2176 compile at J=3; wider shapes have small budgets
    # and many tiles anyway, so this branch never triggers there).
    if n0 < 4 and not eng._interpret():
        n_r = -(-nz // 96)
        T_r = -(-(-(-nz // n_r)) // 8) * 8
        if n_r >= 4 and 72 <= T_r <= 96 and T_r <= T_c:
            lay = mk(T_r, n_r)
            if lay[4] is not None:
                return lay
    for n in range(n0, n0 + 3):
        T = -(-(-(-nz // n)) // 8) * 8
        if T < 32 or T > T_c or (n > 1 and T < PAD):
            continue
        lay = mk(T, n)
        if lay[4] is not None:
            return lay

    T, n_tiles = _balance(nz, min(_budget_rows(cfg, compact=False),
                                  _pad8(nz)))
    # Full-plane fallback: nearby tile counts can process fewer rows —
    # ghost rows are pure waste, and the halo total n*(T+2*PAD) ties when
    # n*T differs (measured at 814x2064: 13x64 = 832 interior rows runs
    # the gradient 6% faster than the balanced 12x72 = 864).
    best = (T, n_tiles)
    if n_tiles > 1:
        cost = None
        for n in range(n_tiles, n_tiles + 3):
            Tn = -(-(-(-nz // n)) // 8) * 8
            if Tn < PAD or Tn > T:
                continue
            c = (n * (Tn + 2 * PAD), n * Tn)
            if cost is None or c < cost:
                cost, best = c, (Tn, n)
    T, n_tiles = best
    if n_tiles > 1 and T < PAD:   # deep-PAD on a short grid: re-balance
        T = min(PAD, _pad8(nz))
        n_tiles = -(-nz // T)
    return mk(T, n_tiles)


def _layout(cfg: SimConfig):
    return _select_layout(cfg)[:4]


def _layout_plan(cfg: SimConfig):
    return _select_layout(cfg)


def _ext_plane(a, nz_ext, nxp):
    """Embed an (nz, nx) plane at [PAD:PAD+nz, :nx] of a zero (nz_ext, nxp)
    buffer (ghost/pad rows and lanes stay zero so masked physics, zeroed
    profiles and zeroed materials keep them inert)."""
    nz, nx = a.shape
    out = jnp.zeros((nz_ext, nxp), jnp.float32)
    return out.at[PAD:PAD + nz, :nx].set(a.astype(jnp.float32))


def _ext_plane_edge(a, nz_ext_m, nxp):
    """Embed an (nz, nx) plane at [PAD:PAD+nz, :nx] of an (nz_ext_m, nxp)
    buffer with EDGE-REPLICATED padding (raw material planes for
    _mats_compute: the in-kernel staggered averages must see the boundary
    values medium.material_fields' edge-replicating shifts do)."""
    nz, nx = a.shape
    return jnp.pad(a.astype(jnp.float32),
                   ((PAD, nz_ext_m - PAD - nz), (0, nxp - nx)),
                   mode="edge")


def _mats_rows(cfg, E):
    """Rows of the mats pipeline slot: E + 8 under _mats_compute (the z+1
    shift window), else E."""
    return E + 8 if _mats_compute(cfg) else E


def _mats_tile(cfg, mat_t, E):
    """The 5 staggered material fields on the tile window: read from the
    slot (default), or derived from the raw (lam, mu, rho) (E+8)-row window
    with the same arithmetic as medium.material_fields (harmonic mu
    average el_stress.cu:112-123, buoyancy average el_velocity.cu:100-110)
    so physical cells match the default stream bitwise."""
    if not _mats_compute(cfg):
        return tuple(mat_t[k] for k in range(5))
    lam = mat_t[0, 0:E, :]
    mu = mat_t[1, 0:E, :]
    rho = mat_t[2, 0:E, :]
    mu_b = mat_t[1, 1:E + 1, :]
    mu_c = eng._roll(mu, -1, 1)
    mu_d = eng._roll(mu_b, -1, 1)
    nonzero = (mu != 0) & (mu_b != 0) & (mu_c != 0) & (mu_d != 0)
    safe = jnp.where(nonzero, mu, 1.0)
    safe_b = jnp.where(nonzero, mu_b, 1.0)
    safe_c = jnp.where(nonzero, mu_c, 1.0)
    safe_d = jnp.where(nonzero, mu_d, 1.0)
    hm = 4.0 / (1.0 / safe + 1.0 / safe_b + 1.0 / safe_c + 1.0 / safe_d)
    ave_mu = jnp.where(nonzero, hm, 0.0)
    byc_a = 2.0 / (mat_t[2, 1:E + 1, :] + rho)
    byc_b = 2.0 / (eng._roll(rho, -1, 1) + rho)
    return (lam, lam + 2.0 * mu, ave_mu, byc_a, byc_b)


def _ac_mats_tile(cfg, mat_t, E):
    """Acoustic twin of _mats_tile: (lam, byc_a, byc_b) read from the slot,
    or derived from raw (lam, rho) (pallas_engine._ac_mats arithmetic)."""
    if not _mats_compute(cfg):
        return tuple(mat_t[k] for k in range(3))
    lam = mat_t[0, 0:E, :]
    rho = mat_t[1, 0:E, :]
    byc_a = 2.0 / (mat_t[1, 1:E + 1, :] + rho)
    byc_b = 2.0 / (eng._roll(rho, -1, 1) + rho)
    return (lam, byc_a, byc_b)


def _profiles_ext(cfg: SimConfig, nz_ext, nxp):
    """Division-free scaled CPML profiles, zero-padded into the extended
    layout: pad/ghost rows get ik = a = b = 0, which makes every derived
    quantity (psi, d_eff) vanish there by construction."""
    cp = cpml_mod.cpml_scaled(cfg.nz, cfg.nx, cfg.npml, cfg.dz, cfg.dx,
                              cfg.dt, cfg.f0, dtype=np.float32)
    zcol = lambda p: jnp.zeros((nz_ext, 1), jnp.float32).at[
        PAD:PAD + cfg.nz].set(jnp.asarray(p))
    xrow = lambda p: jnp.zeros((1, nxp), jnp.float32).at[
        :, :cfg.nx].set(jnp.asarray(p))
    return (zcol(cp.ikz), zcol(cp.az), zcol(cp.bz),
            zcol(cp.ikz_h), zcol(cp.az_h), zcol(cp.bz_h),
            xrow(cp.ikx), xrow(cp.ax), xrow(cp.bx),
            xrow(cp.ikx_h), xrow(cp.ax_h), xrow(cp.bx_h))


def _recw_inputs_padded(cfg: SimConfig, rs, nxp):
    """Engine recording inputs lane-padded to nxp.  Row maps pad
    edge-replicated (keeps per-layer uniformity for the cheap lane-roll
    sampling; padded lanes only ever multiply zero field columns), weight
    rows pad with zeros."""
    ins = eng._recw_inputs(cfg, rs)
    out = [jnp.pad(ins[0], ((0, 0), (0, nxp - cfg.nx)), mode="edge")]
    if len(ins) > 1:
        out.append(jnp.pad(ins[1], ((0, 0), (0, nxp - cfg.nx))))
    return out


def _tile_masks(cfg: SimConfig, T, r0, E, nxp, src_z, src_x):
    """Update mask / source plane / interior mask on the tile's extended
    window, from the GLOBAL row index gz = buffer_row - PAD."""
    zi_loc = jax.lax.broadcasted_iota(jnp.int32, (E, nxp), 0)
    gz = zi_loc + (r0 - PAD)
    xi = jax.lax.broadcasted_iota(jnp.int32, (E, nxp), 1)
    mask = ((gz >= 2) & (gz <= cfg.nz - 3) & (xi >= 2)
            & (xi <= cfg.nx - 3)).astype(jnp.float32)
    src_hot = ((gz == src_z) & (xi == src_x)).astype(jnp.float32)
    interior = ((gz >= cfg.npml) & (gz <= cfg.nz - 1 - cfg.npml)
                & (xi >= cfg.npml)
                & (xi <= cfg.nx - 1 - cfg.npml)).astype(jnp.float32)
    return gz, mask, src_hot, interior


def _slice_prof(prof_refs, r0, E):
    """Tile-sliced profile values: z-profiles (E, 1), x-profiles (1, nxp)."""
    out = []
    for j, ref in enumerate(prof_refs):
        if j < 6:  # z profiles: (nz_ext, 1)
            out.append(ref[pl.ds(_m8(r0), E), :])
        else:      # x profiles: (1, nxp)
            out.append(ref[:])
    return tuple(out)


def _inject_strips_tile(cfg, sst, lr_ref, tb_ref, r0, E, which):
    """Tile version of field_to_bnd (Boundary.cu:78-101): overwrite the
    5-deep edge strips of the selected field planes of the tile scratch.
    Left/right columns come from the tile's rows of the (nz_ext, 128) lr
    plane (static lane slices); top/bottom bands are guarded dynamic-row
    stores, skipped when the band straddles the window edge (safe: the
    straddling part is within 4 rows of the scratch edge — inside the
    wrap-contamination zone that no written row's stencil chain reads,
    for the plain backward and for the K=2 temporally blocked one
    alike)."""
    _, z0, z1, x0, x1 = _strip_bounds5(cfg)
    L = STRIP_L
    lr_rows = lr_ref[pl.ds(_m8(r0), E), :]
    for f_idx in which:
        c = f_idx * 2 * L
        sst[f_idx, :, x0:x0 + L] = lr_rows[:, c:c + L]
        sst[f_idx, :, x1:x1 + L] = lr_rows[:, c + L:c + 2 * L]
        for b_glob, row_off in ((z0 + PAD, c), (z1 + PAD, c + L)):
            lo = b_glob - r0
            ok = (lo >= 0) & (lo <= E - L)
            lo_c = _clip_int(lo, 0, E - L)

            # single-row dynamic stores: Mosaic cannot prove an arbitrary
            # band offset is sublane-aligned for a 5-row vector store
            @_when(ok)
            def _(f_idx=f_idx, lo_c=lo_c, row_off=row_off):
                for j in range(L):
                    sst[f_idx, pl.ds(lo_c + j, 1), :] = (
                        tb_ref[row_off + j:row_off + j + 1, :])


def _strip_bounds5(cfg):
    z0, z1, x0, x1 = eng._strip_bounds(cfg)
    return STRIP_L, z0, z1, x0, x1


def _save_strips_tile(cfg, sst, lr_out, tb_out, r0, E, T, i, n_tiles,
                      margin=0):
    """Pack the PRE-update tile state into the per-step strip planes
    (field_from_bnd, utilities.cu:362-425): left/right columns of the
    tile's interior rows into lr_out (10 lanes per field), top/bottom bands
    into tb_out when fully inside the window (shrunk by `margin` rows per
    side for temporally blocked sub-steps, whose edge rows are stale — the
    overlapping neighbor tile saves the identical values instead)."""
    _save_strips_tile_n(cfg, sst, lr_out, tb_out, r0, E, T, i, n_tiles,
                        eng.N_FIELDS, margin)


# ---------------------------------------------------------------------------
# Pipelined DMA machinery (shared by the elastic megastep kernels)
# ---------------------------------------------------------------------------

def _when(cond):
    """pl.when that folds STATIC (python bool) predicates away — the
    statically-unrolled tile loop turns every i-dependent guard into a
    compile-time branch."""
    if isinstance(cond, (bool, np.bool_)):
        if cond:
            return lambda f: f()
        return lambda f: None
    return pl.when(cond)


def _m8(x):
    return x if isinstance(x, int) else pl.multiple_of(x, 8)


def _clip_int(x, lo, hi):
    if isinstance(x, int):
        return max(lo, min(x, hi))
    return jnp.clip(x, lo, hi)


def _slot_of(i):
    return i % 2 if isinstance(i, int) else jax.lax.rem(
        i, jnp.asarray(2, i.dtype))


class _Slot:
    """Slot view of a (2, ...) double-buffered scratch ref so the tile
    helpers written for plain scratch (`sst[f, rows, lanes]`) work
    unchanged: indexing prepends the (traced) slot index."""

    def __init__(self, ref, slot):
        self._ref = ref
        self._slot = slot

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return self._ref[(self._slot, *idx)]

    def __setitem__(self, idx, v):
        if not isinstance(idx, tuple):
            idx = (idx,)
        self._ref[(self._slot, *idx)] = v

    @property
    def at(self):
        return _SlotAt(self._ref, self._slot)


class _SlotAt:
    def __init__(self, ref, slot):
        self._ref = ref
        self._slot = slot

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return self._ref.at[(self._slot, *idx)]


def _in_dma(src_hbm, dst2, slot, tile, T, E, sem2):
    """Prefetchable tile-rows load: src[:, tile*T : tile*T+E, :] -> slot.
    The descriptor is reconstructed identically at wait time."""
    return pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(_m8(tile * T), E), :],
        dst2.at[slot], sem2.at[slot])


def _stage_out_dmas(stage, dst_hbm, tile, T, sem2):
    """(body, tail) output copies.  The body rows never overlap tile+1's
    halo reads (those start at HBM row (tile+1)*T), so the body may start
    BEFORE tile+1's prefetched input is secured — overlapping the out
    stream with the in stream's tail; only the last PAD rows (read by
    tile+1's in-DMA through the aliased state buffer) must wait for it."""
    body = pltpu.make_async_copy(
        stage.at[:, 0:T - PAD, :],
        dst_hbm.at[:, pl.ds(_m8(tile * T + PAD), T - PAD), :], sem2.at[0])
    tail = pltpu.make_async_copy(
        stage.at[:, T - PAD:T, :],
        dst_hbm.at[:, pl.ds(_m8(tile * T + T), PAD), :], sem2.at[1])
    return body, tail


def _ring_src(j, state_in, state_out):
    """The state source ref for sweep j of a ring kernel: sweep 0 reads
    the carry INPUT; later sweeps read the OUTPUT ref, where the previous
    sweep's extraction lives.  On hardware the two are the same aliased
    HBM buffer (input_output_aliases donates the carry), so this is
    free; under interpret mode (which does NOT emulate the aliasing —
    in and out are distinct arrays) it is what makes multi-sweep
    chaining, and therefore the CPU equality tests, semantically exact."""
    return state_in if j == 0 else state_out


def _ring_slot(i, n_tiles, j):
    """Global 2-slot parity j*n_tiles + i (mod 2): keeps the slot
    alternation unbroken across ring sweep boundaries for ODD tile
    counts (even counts reduce to the per-sweep i%2)."""
    return _slot_of(i + (j * n_tiles) % 2)


def _pipeline_prologue(i, n_tiles, state_in, mats_in, sst2, mat2, T, E,
                       s_sems, m_sems, EM=None, j=0, J=1, state_out=None):
    """2-slot input pipeline over an IN-PLACE (aliased) state buffer.

    Tile i's loads were waited at the END of iteration i-1 (i=0 primes
    inline); this prologue only STARTS tile i+1's prefetch, which then
    runs under tile i's compute.  The wait for that prefetch happens in
    `_pipeline_epilogue` BEFORE tile i's output DMA starts — that ordering
    is what makes input/output aliasing safe: the 16 halo rows tile i+1
    reads overlap the rows tile i writes, so the read must be secured
    first (all later tiles read disjoint rows).

    Ring mode (J > 1, static j, state_out given): only sweep 0 primes;
    later sweeps find tile 0 already prefetched by sweep j-1's last tile,
    whose prologue WRAPS to tile 0 reading the OUT ref (_ring_src).  The
    wrap prefetch reads tile 0's window — rows [0, E) — whose last
    writers are tiles 0 and 1 of sweep j-1: with n_tiles >= 4 those
    output DMAs were drained by _wait_prev_out at tiles 1 and 2, strictly
    before this prologue runs, and the zero top pad was written inline by
    _write_state_pads, so the wrap reads exactly the sweep's final
    values."""
    EM = E if EM is None else EM
    p = _ring_slot(i, n_tiles, j)
    if "noin" in _dbg():
        return p
    q = 1 - p
    src = _ring_src(j, state_in, state_out)

    @_when((i == 0) if j == 0 else False)
    def _prime():
        cp_s = _in_dma(src, sst2, 0, 0, T, E, s_sems)
        cp_m = _in_dma(mats_in, mat2, 0, 0, T, EM, m_sems)
        cp_s.start()
        cp_m.start()
        cp_s.wait()
        cp_m.wait()

    @_when(i + 1 < n_tiles)
    def _prefetch():
        _in_dma(src, sst2, q, i + 1, T, E, s_sems).start()
        _in_dma(mats_in, mat2, q, i + 1, T, EM, m_sems).start()

    if j < J - 1:
        @_when(i == n_tiles - 1)
        def _prefetch_wrap():
            _in_dma(state_out, sst2, q, 0, T, E, s_sems).start()
            _in_dma(mats_in, mat2, q, 0, T, EM, m_sems).start()

    return p


def _pipeline_epilogue(i, n_tiles, state_in, mats_in, sst2, mat2, stage,
                       state_out, T, E, s_sems, m_sems, out_sem, EM=None,
                       j=0, J=1):
    """Start this tile's output BODY (rows that no later in-DMA reads),
    secure tile i+1's prefetched input (the aliasing hazard gate), then
    start the output TAIL; the final tile OF THE LAST SWEEP drains its
    own out (ring sweeps in between hand their tail straight to the next
    sweep's _wait_prev_out)."""
    EM = E if EM is None else EM
    q = 1 - _ring_slot(i, n_tiles, j)
    body, tail = _stage_out_dmas(stage, state_out, i, T, out_sem)
    if "noout" not in _dbg():
        body.start()

    if "noin" not in _dbg():
        src = _ring_src(j, state_in, state_out)

        @_when(i + 1 < n_tiles)
        def _secure_next():
            _in_dma(src, sst2, q, i + 1, T, E, s_sems).wait()
            _in_dma(mats_in, mat2, q, i + 1, T, EM, m_sems).wait()

        if j < J - 1:
            @_when(i == n_tiles - 1)
            def _secure_wrap():
                _in_dma(state_out, sst2, q, 0, T, E, s_sems).wait()
                _in_dma(mats_in, mat2, q, 0, T, EM, m_sems).wait()

    if "noout" in _dbg():
        return

    tail.start()

    @_when((i == n_tiles - 1) if j == J - 1 else False)
    def _drain():
        body.wait()
        tail.wait()


def _wait_prev_out(i, stage, state_out, T, out_sem, n_tiles=None, j=0):
    """Drain the previous tile's output DMAs before reusing the stage.
    Ring sweeps j > 0 wrap: tile 0 drains the prior sweep's LAST tile."""
    if "noout" in _dbg():
        return
    if j > 0:
        prev = jnp.where(i >= 1, i - 1, n_tiles - 1)
        cond = True
    else:
        prev, cond = i - 1, i >= 1

    @_when(cond)
    def _():
        body, tail = _stage_out_dmas(stage, state_out, prev, T, out_sem)
        body.wait()
        tail.wait()


def _write_state_pads(nf, sst_p, state_out, i, n_tiles, T, E, nxp, aux_sem):
    """Keep the carried state's PAD edge rows zero: tile 0 / the last tile
    zero their outer halo rows in the (now dead) input slot and DMA them
    out (the slot is not reused until two iterations later)."""
    if "noout" in _dbg():
        return
    r0 = i * T

    @_when(i == 0)
    def _zero_top():
        for f in range(nf):
            sst_p[f, 0:PAD, :] = jnp.zeros((PAD, nxp), jnp.float32)
        cp = pltpu.make_async_copy(sst_p.at[:, 0:PAD, :],
                                   state_out.at[:, 0:PAD, :], aux_sem)
        cp.start()
        cp.wait()

    @_when(i == n_tiles - 1)
    def _zero_bot():
        for f in range(nf):
            sst_p[f, E - PAD:E, :] = jnp.zeros((PAD, nxp), jnp.float32)
        cp = pltpu.make_async_copy(
            sst_p.at[:, E - PAD:E, :],
            state_out.at[:, pl.ds(_m8(r0 + T + PAD), PAD), :],
            aux_sem)
        cp.start()
        cp.wait()


# ---------------------------------------------------------------------------
# Band-compact psi materialization / extraction (see PsiPlan)
# ---------------------------------------------------------------------------

Z_IDX = (0, 2, 4, 6)   # psi tuple slots driven by z-profiles (dz stencils)
X_IDX = (1, 3, 5, 7)   # psi tuple slots driven by x-profiles


def _psi_zero_all(psis, n_psi, E, nxp):
    for j in range(n_psi):
        psis[j] = jnp.zeros((E, nxp), jnp.float32)


def _z_band_copies(plan, n_tiles, T, E, ring=False):
    """Static per-tile copy plans for the two z-psi band slots (top s=0 at
    global buffer rows [PAD, PAD+ZB), bottom s=1 at [B0, B0+ZB)).  Bands
    may overlap ANY tiles' windows/interiors; every tile handles its
    static overlap, so compact psi works for every layout (no placement
    gates).  All offsets are multiples of 8 by construction (tile origins
    i*T, PAD, and B0 are 8-aligned), keeping Mosaic's multi-row stores
    provably aligned.

    Returns (mats, exts, clears), all indexed by tile:
      mats[ti]   = [(slot, win_lo, slot_lo, rows)]: window-overlap loads —
                   scratch rows [win_lo, win_lo+rows) <- slot rows
                   [slot_lo, ...).  Full-window overlap: halo rows need
                   megastep-start psi for the temporally blocked sub-step
                   recompute, exactly like the full-plane state DMA.
      exts[ti]   = same tuples for the interior-overlap stores (slot rows
                   <- scratch rows).  Tile interiors tile the buffer
                   disjointly; the LAST tile extends through its bottom
                   halo so slot rows past the written interior — bottom
                   ghost rows whose psi is exactly zero (a = b = 0 there,
                   so one masked update zeroes whatever was materialized)
                   — are refreshed too.
      clears[ti] = [(lo, rows)]: scratch rows tile ti-1 materialized that
                   tile ti must zero BEFORE its own loads (the psi scratch
                   is reused across tiles; stale band rows would read as
                   out-of-band values at tile ti's global rows, which the
                   physics assumes are zero).
    """
    bands = ((0, PAD, PAD + plan.ZB), (1, plan.B0, plan.B0 + plan.ZB))
    mats, exts = [], []
    for ti in range(n_tiles):
        w0, w1 = ti * T, ti * T + E
        i0 = w0 + PAD
        i1 = w1 if ti == n_tiles - 1 else i0 + T
        m, e = [], []
        for s, b0, b1 in bands:
            lo, hi = max(w0, b0), min(w1, b1)
            if hi > lo:
                m.append((s, lo - w0, lo - b0, hi - lo))
            lo, hi = max(i0, b0), min(i1, b1)
            if hi > lo:
                e.append((s, lo - w0, lo - b0, hi - lo))
        mats.append(m)
        exts.append(e)
    # ring sweeps (J > 1): tile 0 follows the LAST tile, whose band rows
    # it must clear like any other predecessor's (harmless at sweep 0:
    # the rows are still zero from _psi_zero_all)
    clears = [[(win_lo, rows) for (_, win_lo, _, rows) in mats[-1]]
              if ring and n_tiles > 1 else []]
    clears += [[(win_lo, rows) for (_, win_lo, _, rows) in mats[ti - 1]]
               for ti in range(1, n_tiles)]
    return mats, exts, clears


def _clamp_rows(lo, rows, floor):
    """(lo, rows) clipped to rows >= floor (empty -> rows 0).  floor and
    lo are 8-aligned by construction, so the clip stays aligned."""
    shift = max(0, floor - lo)
    return lo + shift, rows - shift


def _psi_ring_fix(plan, n_tiles, T, E, nxp, psis, i, z_idx, x_idx):
    """Start-of-sweep psi for the window's TOP HALO rows [0, PAD) in ring
    mode.  Ring sweeps materialize from the psi OUTPUT refs (sweep j-1's
    extraction), where the previous tile's just-extracted interior has
    already overwritten the rows this tile's top halo needs at their
    start-of-sweep values.  Those values still sit in the psi scratch
    itself: tile i-1 materialized its window [T lower], and nothing
    overwrites the scratch between tiles — so copy rows [T, T+PAD) down
    to [0, PAD) where they are IN BAND, and zero the rest (out-of-band
    psi must read as zero; the previous tile's scratch rows there hold
    values for different global rows).  Runs BEFORE any loads (the x/z
    loads overwrite the copy's source rows).  At tile 0 the top halo is
    the global ghost pad: all zero.  Static per-tile geometry, 8-aligned
    (tile origins, PAD and band edges are all multiples of 8)."""
    for j in z_idx:
        psis[j, 0:PAD, :] = jnp.zeros((PAD, nxp), jnp.float32)
    xl, xr0, xrw = plan.xl, plan.xr0, plan.xrw
    for j in x_idx:
        psis[j, 0:PAD, 0:xl] = jnp.zeros((PAD, xl), jnp.float32)
        psis[j, 0:PAD, xr0:xr0 + xrw] = jnp.zeros((PAD, xrw), jnp.float32)
    bands = ((PAD, PAD + plan.ZB), (plan.B0, plan.B0 + plan.ZB))
    for ti in range(1, n_tiles):
        r0t = ti * T
        zcp = []
        for b0, b1 in bands:
            lo, hi = max(r0t, b0), min(r0t + PAD, b1)
            if hi > lo:
                zcp.append((lo - r0t, hi - lo))
        if not zcp:
            continue

        @_when(i == ti)
        def _copy_down(zcp=zcp):
            for w0, rows in zcp:
                for j in z_idx:
                    psis[j, w0:w0 + rows, :] = psis[j, T + w0:T + w0 + rows,
                                                    :]

    @_when(i >= 1)
    def _copy_down_x():
        for j in x_idx:
            psis[j, 0:PAD, 0:xl] = psis[j, T:T + PAD, 0:xl]
            psis[j, 0:PAD, xr0:xr0 + xrw] = psis[j, T:T + PAD,
                                                 xr0:xr0 + xrw]


def _psi_materialize(plan, n_tiles, T, E, nxp, psis, zpsi_in, xpsi_in,
                     i, r0, z_idx, x_idx, ring=False):
    """Fill the (n_psi, E, nxp) psi scratch planes from band-compact storage
    for tile i.  Exact: psi is identically zero out of band (cpml.py a=0
    there and zero stays zero).  All offsets are static under the per-tile
    guards (see _z_band_copies).  x planes were zeroed once per invocation;
    only their band lanes are (re)written per tile.  z planes clear the
    previous tile's stale band rows, then load this tile's overlaps.

    Reading zpsi_in/xpsi_in here is hazard-free even though they alias the
    outputs at the XLA level: VMEM pallas operands give the kernel
    distinct input and output copies, so extraction by earlier tiles never
    shows through (verified bitwise vs full-plane streaming at K>1).

    RING mode (J > 1 megastep sweeps per invocation): sweeps after the
    first pass the psi OUTPUT refs as the source — the only place the
    previous sweep's extraction lives.  There the previous tile's interior
    extraction HAS overwritten the rows this window's top halo [0, PAD)
    needs at start-of-sweep values, so those rows come from
    _psi_ring_fix's scratch copy-down instead, and every load (and clear)
    is clamped to window rows >= PAD."""
    ZB, xl, xr0, xrw = plan.ZB, plan.xl, plan.xr0, plan.xrw
    if ring:
        _psi_ring_fix(plan, n_tiles, T, E, nxp, psis, i, z_idx, x_idx)
    floor = PAD if ring else 0
    for k, j in enumerate(x_idx):
        rows = pl.ds(_m8(r0 + floor), E - floor)
        psis[j, floor:E, 0:xl] = xpsi_in[k, rows, 0:xl]
        psis[j, floor:E, xr0:xr0 + xrw] = xpsi_in[k, rows, xl:xl + xrw]
    mats, _, clears = _z_band_copies(plan, n_tiles, T, E, ring=ring)
    for ti in range(n_tiles):
        if not (clears[ti] or mats[ti]):
            continue

        @_when(i == ti)
        def _z_tile(ti=ti):
            for lo, rows in clears[ti]:
                lo, rows = _clamp_rows(lo, rows, floor)
                if rows <= 0:
                    continue
                for j in z_idx:
                    psis[j, lo:lo + rows, :] = jnp.zeros((rows, nxp),
                                                         jnp.float32)
            # overlapping band rows (single-tile layouts) are exact: both
            # slots were extracted from the same plane last step, so the
            # second write repeats identical values
            for s, win_lo, slot_lo, rows in mats[ti]:
                lo_c, rows_c = _clamp_rows(win_lo, rows, floor)
                if rows_c <= 0:
                    continue
                sl_c = slot_lo + (lo_c - win_lo)
                for k, j in enumerate(z_idx):
                    psis[j, lo_c:lo_c + rows_c, :] = (
                        zpsi_in[k, s, sl_c:sl_c + rows_c, :])


def _psi_extract(plan, n_tiles, T, E, nxp, nz_ext, new_psi, zpsi_out,
                 xpsi_out, i, r0, z_idx, x_idx):
    """Store the updated psi bands back to the compact outputs (the
    out-of-band values of new_psi are exactly zero — forward — or provably
    inert — backward adjoint — so nothing is lost).  Each tile stores its
    interior's static overlap with each z band (see _z_band_copies)."""
    ZB, xl, xr0, xrw = plan.ZB, plan.xl, plan.xr0, plan.xrw
    rows = pl.ds(_m8(r0 + PAD), T)
    for k, j in enumerate(x_idx):
        v = new_psi[j]
        xpsi_out[k, rows, 0:xl] = v[PAD:PAD + T, 0:xl]
        xpsi_out[k, rows, xl:xl + xrw] = v[PAD:PAD + T, xr0:xr0 + xrw]

    @_when(i == 0)
    def _xpads_top():
        for k in range(len(x_idx)):
            xpsi_out[k, 0:PAD, :] = jnp.zeros((PAD, plan.XW), jnp.float32)

    @_when(i == n_tiles - 1)
    def _xpads_bot():
        for k in range(len(x_idx)):
            xpsi_out[k, nz_ext - PAD:nz_ext, :] = jnp.zeros(
                (PAD, plan.XW), jnp.float32)

    _, exts, _ = _z_band_copies(plan, n_tiles, T, E)
    for ti in range(n_tiles):
        if not exts[ti]:
            continue

        @_when(i == ti)
        def _z_tile(ti=ti):
            for s, win_lo, slot_lo, rows_n in exts[ti]:
                for k, j in enumerate(z_idx):
                    zpsi_out[k, s, slot_lo:slot_lo + rows_n, :] = (
                        new_psi[j][win_lo:win_lo + rows_n, :])


# ---------------------------------------------------------------------------
# Forward megastep kernel (pipelined)
# ---------------------------------------------------------------------------

def _fwd_mega_kernel(cfg, rs, T, n_tiles, nxp, n_recw, save_strips, plan, K,
                     J, srcz_ref, srcx_ref, rxz_ref, amp_ref, *args):
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    nz_ext = PAD + n_tiles * T + PAD
    nf = 5 if plan else NF_FWD
    state_in = args[0]
    mats_in = args[1]
    p_ = 2
    if plan:
        zpsi_in, xpsi_in = args[2:4]
        p_ = 4
    prof_refs = args[p_:p_ + 12]
    recw_refs = args[p_ + 12:p_ + 12 + n_recw]
    p_ += 12 + n_recw
    state_out = args[p_]
    p_ += 1
    if plan:
        zpsi_out, xpsi_out = args[p_:p_ + 2]
        p_ += 2
    rec_out = args[p_]
    p_ += 1
    if save_strips:
        lr_out, tb_out = args[p_:p_ + 2]
        p_ += 2
    else:
        lr_out = tb_out = None
    if plan:
        sst2, mat2, psis, stage = args[p_:p_ + 4]
        p_ += 4
    else:
        sst2, mat2, stage = args[p_:p_ + 3]
        psis = None
        p_ += 3
    s_sems, m_sems, out_sem, aux_sem = args[p_:p_ + 4]

    NC = 4 * eng._n_layers(rs)
    recw = eng._read_recw(recw_refs)
    rec_out[:] = jnp.zeros_like(rec_out)
    if plan:
        _psi_zero_all(psis, 8, E, nxp)

    # the tile loop lives INSIDE the kernel so the 2-slot DMA pipeline
    # actually spans tiles (DMAs persist across fori_loop iterations; grid
    # iterations would drain them).  J > 1 runs J ring sweeps of K
    # sub-steps each in ONE invocation (static sweep index js): the
    # pipeline wraps between sweeps, so only sweep 0 pays the blocking
    # tile-0 prime (see _stream_J).
    def make_tile_body(js):
        base = js * K
        if plan:
            zsrc, xsrc = ((zpsi_in, xpsi_in) if js == 0
                          else (zpsi_out, xpsi_out))

        def tile_body(i, _):
            r0 = i * T
            p = _pipeline_prologue(i, n_tiles, state_in, mats_in, sst2,
                                   mat2, T, E, s_sems, m_sems, EM,
                                   j=js, J=J, state_out=state_out)
            sst = _Slot(sst2, p)
            mat_t = _Slot(mat2, p)

            gz, mask, src_hot, _ = _tile_masks(cfg, T, r0, E, nxp,
                                               srcz_ref[0], srcx_ref[0])
            prof = _slice_prof(prof_refs, r0, E)
            mats = _mats_tile(cfg, mat_t, E)

            fields = tuple(sst[f] for f in range(5))
            if plan:
                _psi_materialize(plan, n_tiles, T, E, nxp, psis, zsrc,
                                 xsrc, i, r0, Z_IDX, X_IDX, ring=js > 0)
                psi = tuple(psis[j] for j in range(8))
            else:
                psi = tuple(sst[5 + j] for j in range(8))

            # temporally blocked sub-steps: K leapfrog steps per tile
            # sweep (valid rows shrink 4/side per sub-step; PAD=16 admits
            # K<=4).  Sub-step k's pre-update strips are stashed through
            # the (dead) input slot so the band saver's guarded
            # dynamic-row stores keep their known-good ref addressing.
            for k in range(K):
                if save_strips:
                    if k > 0:
                        for f, v in enumerate(fields):
                            sst[f] = v
                    _save_strips_tile(cfg, sst, lr_out.at[base + k],
                                      tb_out.at[base + k], r0, E, T, i,
                                      n_tiles, margin=4 * k)
                if "nostep" in _dbg():
                    recs = None
                    break
                fields, psi, recs = eng._step_values(
                    cfg, rs, prof, mask, src_hot, rxz_ref[0], fields, psi,
                    mats, amp_ref[base + k], recw, zi=gz,
                    rec_window=(r0, r0 + T))
                if recs is not None:
                    for c in range(NC):
                        r_ = (base + k) * NC + c
                        rec_out[r_:r_ + 1, :] = (rec_out[r_:r_ + 1, :]
                                                 + recs[c])
            new_fields, new_psi = fields, psi

            # results go to the out STAGE (interior rows only); the input
            # slot is never DMA'd out, so its reuse (tile i+2's prefetch,
            # strictly after this body) needs no out drain even when
            # sub-steps stash into it
            _wait_prev_out(i, stage, state_out, T, out_sem, n_tiles, js)
            for f, v in enumerate(new_fields):
                stage[f] = v[PAD:PAD + T, :]
            if plan:
                _psi_extract(plan, n_tiles, T, E, nxp, nz_ext, new_psi,
                             zpsi_out, xpsi_out, i, r0, Z_IDX, X_IDX)
            else:
                for j, v in enumerate(new_psi):
                    stage[5 + j] = v[PAD:PAD + T, :]

            _write_state_pads(nf, sst, state_out, i, n_tiles, T, E, nxp,
                              aux_sem)
            _pipeline_epilogue(i, n_tiles, state_in, mats_in, sst2, mat2,
                               stage, state_out, T, E, s_sems, m_sems,
                               out_sem, EM, j=js, J=J)
            return 0

        return tile_body

    for js in range(J):
        body = make_tile_body(js)
        if n_tiles <= _unroll_tiles():
            for i_static in range(n_tiles):
                body(i_static, 0)
        else:
            jax.lax.fori_loop(0, n_tiles, body, 0)


def _make_fwd_megastep(cfg: SimConfig, rs, save_strips: bool, K: int = 1,
                       J: int = 1):
    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    f32 = jnp.float32
    nf = 5 if plan else NF_FWD
    NC = 4 * eng._n_layers(rs)
    recw_in = _recw_inputs_padded(cfg, rs, nxp)
    n_recw = len(recw_in)
    KJ = K * J

    out_shape = [jax.ShapeDtypeStruct((nf, nz_ext, nxp), f32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if plan:
        out_shape += [jax.ShapeDtypeStruct((4, 2, plan.ZB, nxp), f32),
                      jax.ShapeDtypeStruct((4, nz_ext, plan.XW), f32)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    out_shape += [jax.ShapeDtypeStruct((KJ * NC, nxp), f32)]
    out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if save_strips:
        out_shape += [jax.ShapeDtypeStruct((KJ, nz_ext, LANE), f32),
                      jax.ShapeDtypeStruct((KJ, TB_ROWS, nxp), f32)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2

    kernel = functools.partial(_fwd_mega_kernel, cfg, rs, T, n_tiles, nxp,
                               n_recw, save_strips, plan, K, J)
    n_mats = 3 if _mats_compute(cfg) else 5
    scratch = [pltpu.VMEM((2, nf, E, nxp), f32),
               pltpu.VMEM((2, n_mats, EM, nxp), f32)]
    if plan:
        scratch += [pltpu.VMEM((8, E, nxp), f32)]
    scratch += [pltpu.VMEM((nf, T, nxp), f32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(())]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.HBM)] * 2
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                  * ((2 if plan else 0) + 12 + n_recw)),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    interp = eng._interpret()
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        # every scan carry is updated IN PLACE (input 4 = the state array
        # after the 4 scalar-prefetch args; 6/7 = the compact psi when
        # planned): the carry then needs no XLA copy per step (measured 40%
        # of device time without aliasing)
        input_output_aliases={4: 0, 6: 1, 7: 2} if plan else {4: 0},
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
    )

    def step(state, psic, mats_ext, profs, sz1, sx1, rxz1, amp):
        return call(sz1, sx1, rxz1, jnp.reshape(amp, (KJ,)).astype(f32),
                    state, mats_ext, *psic, *profs, *recw_in)

    return step


def _stream_mats_ext(cfg, lam, mu, rho, nz_ext, nxp):
    f32 = jnp.float32
    if _mats_compute(cfg):
        return jnp.stack([_ext_plane_edge(p.astype(f32), nz_ext + 8, nxp)
                          for p in (lam, mu, rho)])
    mat = material_fields(lam.astype(f32), mu.astype(f32), rho.astype(f32))
    return jnp.stack([_ext_plane(p, nz_ext, nxp)
                      for p in (mat.lam, mat.lp2m, mat.ave_mu,
                                mat.byc_a, mat.byc_b)])


def _stream_K(cfg: SimConfig) -> int:
    """Temporal blocking depth of the streamed forward: K leapfrog steps
    per megastep invocation amortize the HBM state+materials streaming
    K-fold (the megasteps are stream-bound at wide shapes).  Valid rows
    shrink 4/side per sub-step and recording may sample ONE halo row past
    the tile interior, so 4K + 1 <= PAD: K <= 3 at the default PAD=16,
    K <= 7 at SEP2023_TPU_STREAM_PAD=32.  SEP2023_TPU_STREAM_K
    overrides.  Default 3 (the PAD=16 maximum): measured on v5e at
    814x2064 the K=3/Kb=2 gradient runs 3.07 GCell/s vs 2.27 at K=1 and
    the forward 10.2 vs 6.7 (tools/stream_ksweep.py; the megasteps are
    stream-bound, so amortizing the HBM round trip K-fold converts
    directly until compute-bound)."""
    env = os.environ.get("SEP2023_TPU_STREAM_K")
    if env:
        return max(1, min((PAD - 1) // 4, int(env)))
    return min((PAD - 1) // 4, 3)


def _stream_K_bwd(cfg: SimConfig) -> int:
    """Temporal blocking depth of the streamed backward: each
    reconstruct+adjoint sub-step has an 8-row stencil chain, so
    8K <= PAD — K <= 2 at the default PAD=16, K <= 4 at
    SEP2023_TPU_STREAM_PAD=32.  Defaults to min(forward K, PAD//8);
    SEP2023_TPU_STREAM_KB overrides."""
    env = os.environ.get("SEP2023_TPU_STREAM_KB")
    if env:
        return max(1, min(PAD // 8, int(env)))
    return min(_stream_K(cfg), PAD // 8)


def _stream_J(cfg: SimConfig, bwd: bool = False) -> int:
    """Megastep GROUPING depth: J megasteps (K or Kb sub-steps each) run
    as ring-pipelined sweeps inside ONE kernel invocation, amortizing the
    per-invocation pipeline fill/drain (the blocking tile-0 prime + the
    last tile's drain, which cross-invocation prefetch cannot hide —
    DMAs do not survive a kernel return) J-fold.  The backward dissection
    (docs/PERF.md §6) prices that overhead at ~9% of the gradient wall at
    814x2064 (full 0.328 s vs DMA-bound 0.299 s — one tile's in-stream
    out of 10).  Unlike deeper temporal blocking (K), sweeps re-load
    their halos from HBM, so J does NOT shrink the valid-row window or
    the VMEM tile budget — it only multiplies kernel code size.

    Ring safety needs n_tiles >= 4 (the wrap prefetch of tile 0's window
    must stay clear of in-flight output DMAs: with T >= PAD every hazard
    then reduces to the already-fenced adjacent-tile case) — smaller
    layouts silently run J=1.  SEP2023_TPU_STREAM_J / _JB override
    (J_fwd / J_bwd).

    DEFAULT 3/3 on compiled backends (interpret-mode tests keep J=1:
    they pay J-fold trace time for nothing).  Measured on v5e at
    814x2064 / nt=1001 (tools/stream_jsweep.py, round 5): gradient
    3.611 (1x1) -> 3.709 (2x2) -> 3.770 (2x3) -> 3.784 GCell/s (3x3,
    98.8% of the 3-pass DMA bound), forward 11.99 -> 12.34; J_bwd=4
    fails to compile at that shape (Mosaic scoped-stack, the 4x kernel
    body) — the relay scrubs the message to HTTP 500."""
    env = os.environ.get("SEP2023_TPU_STREAM_JB" if bwd
                         else "SEP2023_TPU_STREAM_J")
    if env:
        J = max(1, int(env))
    else:
        J = 1 if eng._interpret() else 3
    if J > 1 and _select_layout(cfg)[1] < 4:
        return 1
    return J


def _pad_unit(cfg: SimConfig, save_strips: bool) -> int:
    """Ghost-step padding unit: the forward pads nt-1 to a multiple of
    its per-invocation step count K*J; a gradient forward pads to
    lcm(K*J_fwd, Kb*J_bwd) so the backward's invocations tile the same
    padded count."""
    import math
    KJ = _stream_K(cfg) * _stream_J(cfg)
    if not save_strips:
        return KJ
    KJb = _stream_K_bwd(cfg) * _stream_J(cfg, bwd=True)
    return KJ * KJb // math.gcd(KJ, KJb)


def _stream_forward(cfg: SimConfig, rs, lam, mu, rho, stf1, sz1, sx1, rxz1,
                    save_strips: bool):
    """Single-shot streamed forward.  stf1: (nt,).  Returns data (4, R, nt)
    [+ (lr_all, tb_all, final_state) when save_strips].

    With temporal blocking (K = _stream_K > 1) the nt-1 steps pad up to a
    multiple of K with zero-amplitude ghost steps: recordings trim back to
    nt, and the gradient path reverses the same padded count (the strips
    mechanism reconstructs ghost steps exactly like real ones, and their
    recording rows carry zero cotangent)."""
    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    K = _stream_K(cfg)
    J = _stream_J(cfg)
    KJ = K * J
    f32 = jnp.float32
    mats_ext = _stream_mats_ext(cfg, lam, mu, rho, nz_ext, nxp)
    profs = _profiles_ext(cfg, nz_ext, nxp)
    step = _make_fwd_megastep(cfg, rs, save_strips, K, J)
    sz1 = jnp.reshape(sz1, (1,)).astype(jnp.int32)
    sx1 = jnp.reshape(sx1, (1,)).astype(jnp.int32)
    rxz1 = jnp.reshape(rxz1, (1,)).astype(f32)
    nf = 5 if plan else NF_FWD
    state0 = jnp.zeros((nf, nz_ext, nxp), f32)
    psic0 = ((jnp.zeros((4, 2, plan.ZB, nxp), f32),
              jnp.zeros((4, nz_ext, plan.XW), f32)) if plan else ())
    np_ = len(psic0)
    unit = _pad_unit(cfg, save_strips)
    nsteps = -(-(cfg.nt - 1) // unit) * unit
    n_mega = nsteps // KJ
    amps = jnp.zeros((n_mega * KJ,), f32).at[:cfg.nt - 1].set(
        stf1[:cfg.nt - 1].astype(f32)).reshape(n_mega, KJ)

    def body(carry, amp):
        state, psic = carry[0], carry[1:]
        outs = step(state, psic, mats_ext, profs, sz1, sx1, rxz1, amp)
        carry2 = tuple(outs[:1 + np_])
        rec = outs[1 + np_]
        if save_strips:
            lr_t, tb_t = outs[2 + np_:4 + np_]
            return carry2, (rec, lr_t, tb_t)
        return carry2, rec

    fin, ys = jax.lax.scan(body, (state0, *psic0), amps)
    final = fin[0]
    rec_seq = ys[0] if save_strips else ys          # (n_mega, K*J*NC, nxp)
    NC = rec_seq.shape[1] // KJ
    rec_seq = rec_seq.reshape(n_mega * KJ, NC, nxp)[:cfg.nt - 1]
    planes = jnp.concatenate(
        [jnp.zeros((NC, 1, nxp), f32), jnp.moveaxis(rec_seq, 0, 1)],
        axis=1)[None]                               # (1, NC, nt, nxp)
    data = eng._extract_data(cfg, rs, planes)[0]    # (4, R, nt)
    if save_strips:
        # strips stay at the PADDED step count (n_mega*K*J, ...): the
        # backward reverses ghost steps too
        lr_all = ys[1].reshape(n_mega * KJ, nz_ext, LANE)
        tb_all = ys[2].reshape(n_mega * KJ, TB_ROWS, nxp)
        return data, lr_all, tb_all, final
    return data


# ---------------------------------------------------------------------------
# Backward megastep kernel (reconstruct + phase-split adjoint, full variant)
# ---------------------------------------------------------------------------

def _gm_in_dma(gmat_in, gm2, slot, tile, T, sem2):
    """Load tile's gradient rows into the 2-slot staging buffer.  gm is
    double-buffered like the state slots: with a single buffer every tile
    body had to BLOCK at its top draining tile i-1's out-DMA (started only
    at body i-1's end — zero overlap), a serialization the backward
    dissection priced at ~15% of the gradient wall at Marmousi scale."""
    return pltpu.make_async_copy(
        gmat_in.at[:, pl.ds(_m8(tile * T + PAD), T), :],
        gm2.at[slot], sem2.at[slot])


def _gm_out_dma(gm2, slot, gmat_out, tile, T, sem2):
    return pltpu.make_async_copy(
        gm2.at[slot], gmat_out.at[:, pl.ds(_m8(tile * T + PAD), T), :],
        sem2.at[slot])


def _gm_pipeline_top(i, n_tiles, gmat_in, gmat_out, gm2, T, gi_sems,
                     go_sems, j=0, J=1):
    """Start tile i's gradient-rows load into its parity slot, first
    securing that the slot's previous occupant (tile i-2, ring-wrapped
    across sweeps) finished draining — a wait that is ~free in steady
    state (that out-DMA ran under tile i-1's compute).

    Ring read-after-write: sweep j's load of tile i's rows must see sweep
    j-1's drain of the SAME rows.  The chain of these secure-slot waits
    covers it transitively: every drain on a slot is waited by that
    slot's next occupant, and (j-1, i)'s drain precedes (j, i)'s load by
    n_tiles - 2 >= 2 occupancies of its slot."""
    q = _ring_slot(i, n_tiles, j)
    if not ({"noin", "noout"} & _dbg()):
        if j > 0:
            prev2 = jnp.where(i >= 2, i - 2, i - 2 + n_tiles)
            cond = True
        else:
            prev2, cond = i - 2, i >= 2

        @_when(cond)
        def _secure_slot():
            _gm_out_dma(gm2, q, gmat_out, prev2, T, go_sems).wait()
    if "noin" not in _dbg():
        _gm_in_dma(_ring_src(j, gmat_in, gmat_out), gm2, q, i, T,
                   gi_sems).start()
    return q


def _gm_pipeline_bottom(i, n_tiles, gm2, gmat_out, T, go_sems, j=0, J=1):
    """Start tile i's gradient drain; the LAST tile of the LAST sweep
    waits out both live slots."""
    q = _ring_slot(i, n_tiles, j)
    if "noout" in _dbg():
        return

    _gm_out_dma(gm2, q, gmat_out, i, T, go_sems).start()

    @_when((i == n_tiles - 1) if j == J - 1 else False)
    def _drain_all():
        if n_tiles >= 2:
            _gm_out_dma(gm2, 1 - q, gmat_out, i - 1, T, go_sems).wait()
        _gm_out_dma(gm2, q, gmat_out, i, T, go_sems).wait()


def _bwd_mega_kernel(cfg, rs, T, n_tiles, nxp, n_recw, plan, K, J, gm_vmem,
                     srcz_ref, srcx_ref, rxz_ref, amp_ref, *args):
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    nz_ext = PAD + n_tiles * T + PAD
    nf = 10 if plan else NF_BWD
    state_in = args[0]
    mats_in = args[1]
    gmat_in = args[2]
    p_ = 3
    if plan:
        zpsi_in, xpsi_in = args[3:5]
        p_ = 5
    prof_refs = args[p_:p_ + 12]
    recw_refs = args[p_ + 12:p_ + 12 + n_recw]
    p_ += 12 + n_recw
    lr_ref = args[p_]
    tb_ref = args[p_ + 1]
    drec_ref = args[p_ + 2]
    state_out = args[p_ + 3]
    p_ += 4
    if plan:
        zpsi_out, xpsi_out = args[p_:p_ + 2]
        p_ += 2
    gmat_out = args[p_]
    dstf_out = args[p_ + 1]
    p_ += 2
    if plan:
        sst2, mat2, psis, stage = args[p_:p_ + 4]
        p_ += 4
    else:
        sst2, mat2, stage = args[p_:p_ + 3]
        psis = None
        p_ += 3
    if gm_vmem:   # direct in-place accumulation: no staging, no gm DMAs
        gm_t = gi_sem = go_sem = None
        s_sems, m_sems, out_sem, aux_sem = args[p_:p_ + 4]
    else:
        gm_t = args[p_]
        p_ += 1
        s_sems, m_sems, out_sem, aux_sem, gi_sem, go_sem = args[p_:p_ + 6]

    NC = 4 * eng._n_layers(rs)
    dt = cfg.dt
    rdz, rdx = 1.0 / cfg.dz, 1.0 / cfg.dx
    recw = eng._read_recw(recw_refs)
    src_z = srcz_ref[0]
    src_x = srcx_ref[0]
    rxz = rxz_ref[0]
    if plan:
        _psi_zero_all(psis, 8, E, nxp)

    # tile loop inside the kernel: the DMA pipeline spans tiles.  J > 1
    # runs J ring sweeps per invocation (static js); the backward's
    # sweeps walk time DESCENDING, so sweep js reverses sub-step block
    # J-1-js (the forward laid amp/strips/drec out time-ascending).
    def make_tile_body(js):
        base = (J - 1 - js) * K
        if plan:
            zsrc, xsrc = ((zpsi_in, xpsi_in) if js == 0
                          else (zpsi_out, xpsi_out))

        def tile_body(i, _):
            r0 = i * T
            p = _pipeline_prologue(i, n_tiles, state_in, mats_in, sst2,
                                   mat2, T, E, s_sems, m_sems, EM,
                                   j=js, J=J, state_out=state_out)
            sst = _Slot(sst2, p)
            mat_t = _Slot(mat2, p)

            # gm_t is double-buffered: START the reload into the parity
            # slot (its previous occupant's drain is ~free by now) and
            # defer its wait to just before the accumulation — the
            # 5-plane load runs under the whole reconstruction + adjoint,
            # and the out-DMA of tile i-1 drains under tile i's compute
            # instead of blocking its top.  (VMEM-resident gmat needs
            # none of this: direct accumulate below.)
            if not gm_vmem:
                gq = _gm_pipeline_top(i, n_tiles, gmat_in, gmat_out, gm_t,
                                      T, gi_sem, go_sem, j=js, J=J)

            if "nostep" in _dbg():
                for k in range(K):
                    dstf_out[base + k] = jnp.float32(0.0)
                _wait_prev_out(i, stage, state_out, T, out_sem, n_tiles,
                               js)
                for f in range(nf):
                    stage[f] = sst[f, PAD:PAD + T, :]
                _write_state_pads(nf, sst, state_out, i, n_tiles, T, E,
                                  nxp, aux_sem)
                _pipeline_epilogue(i, n_tiles, state_in, mats_in, sst2,
                                   mat2, stage, state_out, T, E, s_sems,
                                   m_sems, out_sem, EM, j=js, J=J)
                if not gm_vmem:
                    if not ({"noin", "noout"} & _dbg()):
                        _gm_in_dma(_ring_src(js, gmat_in, gmat_out), gm_t,
                                   gq, i, T, gi_sem).wait()
                    _gm_pipeline_bottom(i, n_tiles, gm_t, gmat_out, T,
                                        go_sem, j=js, J=J)
                return 0

            gz, mask, src_hot, interior = _tile_masks(cfg, T, r0, E, nxp,
                                                      src_z, src_x)
            prof = _slice_prof(prof_refs, r0, E)
            m = _mats_tile(cfg, mat_t, E)
            (lam, lp2m, avemu, byca, bycb) = m
            if plan:
                _psi_materialize(plan, n_tiles, T, E, nxp, psis, zsrc,
                                 xsrc, i, r0, Z_IDX, X_IDX, ring=js > 0)
            zero4 = tuple(jnp.zeros((E, nxp), jnp.float32)
                          for _ in range(4))
            own_src = ((src_z + PAD) >= (r0 + PAD)) & ((src_z + PAD)
                                                       < (r0 + PAD + T))

            # temporally blocked sub-steps, reversed (latest time first): valid
            # rows shrink 8/side per reconstruct+adjoint chain, so PAD=16
            # admits K <= 2.  The adjoint state rides as VALUES between
            # sub-steps; the reconstruction always lives in the input slot.
            adj_f = adj_p = None
            acc_mats = None
            for k in range(K - 1, -1, -1):
                amp = amp_ref[base + k]
                lr_k = lr_ref.at[base + k]
                tb_k = tb_ref.at[base + k]

                # ---- reconstruct state_t (libCUFD.cu:553-582 ordering) ------
                (vz, vx, szz, sxx, sxz) = tuple(sst[f] for f in range(5))
                szz_tp1, sxx_tp1 = szz, sxx
                vd = eng._velocity_diffs(szz, sxx, sxz)
                dvz = vd[0] * rdz + vd[1] * rdx
                dvx = vd[2] * rdz + vd[3] * rdx
                sst[0] = vz - interior * (dvz * byca * dt)
                sst[1] = vx - interior * (dvx * bycb * dt)
                _inject_strips_tile(cfg, sst, lr_k, tb_k, r0, E, which=(0, 1))
                vz, vx = sst[0], sst[1]
                s_amp = cfg.src_scale * dt * amp
                szz = szz - src_hot * s_amp
                sxx = sxx - src_hot * (rxz * s_amp)
                sd = eng._stress_diffs(vz, vx)
                dvz_dz = sd[0] * rdz
                dvx_dx = sd[1] * rdx
                sst[2] = szz - interior * ((lp2m * dvz_dz + lam * dvx_dx) * dt)
                sst[3] = sxx - interior * ((lam * dvz_dz + lp2m * dvx_dx) * dt)
                dvx_dz = sd[2] * rdz
                dvz_dx = sd[3] * rdx
                sst[4] = sxz - interior * (avemu * (dvx_dz + dvz_dx) * dt)
                _inject_strips_tile(cfg, sst, lr_k, tb_k, r0, E,
                                    which=(2, 3, 4))
                fields_t = tuple(sst[f] for f in range(5))

                if adj_f is None:
                    adj_f = tuple(sst[5 + f] for f in range(5))
                    if plan:
                        adj_p = tuple(psis[j] for j in range(8))
                    else:
                        adj_p = tuple(sst[10 + j] for j in range(8))
                kb = base + k
                d_rec = tuple(drec_ref[kb * NC + c:kb * NC + c + 1, :]
                              for c in range(NC))

                # ---- phase-split adjoint reusing the reconstruction stencils
                # (identical construction to pallas_engine._bwd_kernel's phased
                # branch; per-phase jax.vjp on diffs-as-inputs + closed-form
                # stencil transposes)
                vfun = lambda vels, stv, vpsi, vdiffs, mats_: (
                    eng._velocity_phase_values(cfg, rs, prof, mask, vels, stv,
                                               vpsi, vdiffs, mats_, recw,
                                               zi=gz))
                _, vvjp = jax.vjp(vfun, (fields_t[0], fields_t[1]),
                                  (szz_tp1, sxx_tp1), zero4, vd, m)
                (d_vels, d_stv, d_vpsi_in, d_vdiffs, d_mats_v) = vvjp(
                    ((adj_f[0], adj_f[1]), adj_p[4:], d_rec))

                cot_szz = adj_f[2] + d_stv[0] + eng._dz_plus_t(d_vdiffs[0])
                cot_sxx = adj_f[3] + d_stv[1] + eng._dx_plus_t(d_vdiffs[3])
                cot_sxz = (adj_f[4] + eng._dx_minus_t(d_vdiffs[1])
                           + eng._dz_minus_t(d_vdiffs[2]))

                sfun = lambda stresses, spsi, sdiffs, mats_, a: (
                    eng._stress_phase_values(cfg, prof, mask, src_hot, rxz,
                                             stresses, spsi, sdiffs, mats_, a))
                _, svjp = jax.vjp(sfun, (fields_t[2], fields_t[3], fields_t[4]),
                                  zero4, sd, m, amp)
                (d_st, d_spsi_in, d_sdiffs, d_mats_m, d_amp) = svjp(
                    ((cot_szz, cot_sxx, cot_sxz), adj_p[:4]))

                cot_vz = (d_vels[0] + eng._dz_minus_t(d_sdiffs[0])
                          + eng._dx_plus_t(d_sdiffs[3]))
                cot_vx = (d_vels[1] + eng._dx_minus_t(d_sdiffs[1])
                          + eng._dz_plus_t(d_sdiffs[2]))
                adj_f = (cot_vz, cot_vx, d_st[0], d_st[1], d_st[2])
                adj_p = (*d_spsi_in, *d_vpsi_in)
                # accumulate INTERIOR rows only: the halo rows of the per-step
                # material cotangents are never read (the gm add below used to
                # slice [PAD:PAD+T] after summing full (E, nxp) planes), so
                # slicing before the adds drops 2*PAD/E (~27% at T=88/PAD=16)
                # of this VPU work and shrinks the live temporaries
                d_mats = tuple(a[PAD:PAD + T, :] + b[PAD:PAD + T, :]
                               for a, b in zip(d_mats_m, d_mats_v))
                acc_mats = d_mats if acc_mats is None else tuple(
                    a + b for a, b in zip(acc_mats, d_mats))

                # d_stf: exactly one tile owns the source row — it alone writes
                @_when(own_src)
                def _write_dstf(k=k, d_amp=d_amp):
                    dstf_out[base + k] = d_amp

            d_fields, d_psi = adj_f, adj_p

            # results -> the out STAGE: reconstructed primal interiors + the new
            # adjoint state (the input slot's state planes hold the fully
            # reconstructed t = mK step; the adjoint planes stay stale but are
            # only ever read at the first sub-step)
            _wait_prev_out(i, stage, state_out, T, out_sem, n_tiles,
                           js)
            for f in range(5):
                stage[f] = sst[f, PAD:PAD + T, :]
            for f, v in enumerate(d_fields):
                stage[5 + f] = v[PAD:PAD + T, :]
            if plan:
                _psi_extract(plan, n_tiles, T, E, nxp, nz_ext, d_psi,
                             zpsi_out, xpsi_out, i, r0, Z_IDX, X_IDX)
            else:
                for j, v in enumerate(d_psi):
                    stage[10 + j] = v[PAD:PAD + T, :]
            if gm_vmem:
                # VMEM-resident accumulator: read-modify-write the aliased
                # gradient output rows in place (tile interiors are disjoint)
                rows_g = pl.ds(_m8(r0 + PAD), T)
                gsrc = _ring_src(js, gmat_in, gmat_out)
                for f, v in enumerate(acc_mats):
                    gmat_out[f, rows_g, :] = gsrc[f, rows_g, :] + v
            else:
                if "noin" not in _dbg():
                    _gm_in_dma(_ring_src(js, gmat_in, gmat_out), gm_t,
                               gq, i, T, gi_sem).wait()
                for f, v in enumerate(acc_mats):
                    gm_t[gq, f] = gm_t[gq, f] + v

            _write_state_pads(nf, sst, state_out, i, n_tiles, T, E, nxp,
                              aux_sem)
            # start the gradient drain BEFORE the epilogue so it overlaps the
            # wait on tile i+1's prefetched input
            if not gm_vmem:
                _gm_pipeline_bottom(i, n_tiles, gm_t, gmat_out, T,
                                    go_sem, j=js, J=J)
            _pipeline_epilogue(i, n_tiles, state_in, mats_in, sst2, mat2,
                               stage, state_out, T, E, s_sems, m_sems,
                               out_sem, EM, j=js, J=J)
            return 0

        return tile_body

    for js in range(J):
        body = make_tile_body(js)
        if n_tiles <= _unroll_tiles():
            for i_static in range(n_tiles):
                body(i_static, 0)
        else:
            jax.lax.fori_loop(0, n_tiles, body, 0)


def _make_bwd_megastep(cfg: SimConfig, rs, K: int = 1, J: int = 1):
    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    f32 = jnp.float32
    nf = 10 if plan else NF_BWD
    NC = 4 * eng._n_layers(rs)
    recw_in = _recw_inputs_padded(cfg, rs, nxp)
    n_recw = len(recw_in)
    gm_vmem = _gm_vmem()
    gm_space = pltpu.VMEM if gm_vmem else pltpu.HBM

    kernel = functools.partial(_bwd_mega_kernel, cfg, rs, T, n_tiles, nxp,
                               n_recw, plan, K, J, gm_vmem)
    out_shape = [jax.ShapeDtypeStruct((nf, nz_ext, nxp), f32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if plan:
        out_shape += [jax.ShapeDtypeStruct((4, 2, plan.ZB, nxp), f32),
                      jax.ShapeDtypeStruct((4, nz_ext, plan.XW), f32)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    out_shape += [jax.ShapeDtypeStruct((5, nz_ext, nxp), f32),
                  jax.ShapeDtypeStruct((K * J,), f32)]
    out_specs += [pl.BlockSpec(memory_space=gm_space),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
    n_mats = 3 if _mats_compute(cfg) else 5
    scratch = [pltpu.VMEM((2, nf, E, nxp), f32),
               pltpu.VMEM((2, n_mats, EM, nxp), f32)]
    if plan:
        scratch += [pltpu.VMEM((8, E, nxp), f32)]
    scratch += [pltpu.VMEM((nf, T, nxp), f32)]
    if not gm_vmem:
        scratch += [pltpu.VMEM((2, 5, T, nxp), f32)]
    scratch += [pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(())]
    if not gm_vmem:
        scratch += [pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.HBM)] * 2
                  + [pl.BlockSpec(memory_space=gm_space)]
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                  * ((2 if plan else 0) + 12 + n_recw)
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    interp = eng._interpret()
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        # in-place carries: state (input 4) -> output 0, gmat (input 6) ->
        # the gradient output, compact psi (inputs 7/8) -> outputs 1/2 when
        # planned; kills the per-step XLA carry copies (see fwd builder)
        input_output_aliases=({4: 0, 7: 1, 8: 2, 6: 3} if plan
                              else {4: 0, 6: 1}),
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
    )

    def step(state, psic, gmat, mats_ext, profs, sz1, sx1, rxz1, amp, lr_t,
             tb_t, drec_t):
        return call(sz1, sx1, rxz1, jnp.reshape(amp, (K * J,)).astype(f32),
                    state, mats_ext, gmat, *psic, *profs, *recw_in,
                    lr_t, tb_t, drec_t)

    return step


def _stream_backward(cfg: SimConfig, rs, lam, mu, rho, stf1, sz1, sx1, rxz1,
                     final, lr_all, tb_all, d_data):
    """Single-shot streamed backward: reverse scan of the backward megastep.
    Returns (d_lam, d_mu, d_rho, d_stf(nt,))."""
    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    Kb = _stream_K_bwd(cfg)
    Jb = _stream_J(cfg, bwd=True)
    KJb = Kb * Jb
    f32 = jnp.float32
    mats_ext = _stream_mats_ext(cfg, lam, mu, rho, nz_ext, nxp)
    profs = _profiles_ext(cfg, nz_ext, nxp)
    step = _make_bwd_megastep(cfg, rs, Kb, Jb)
    sz1 = jnp.reshape(sz1, (1,)).astype(jnp.int32)
    sx1 = jnp.reshape(sx1, (1,)).astype(jnp.int32)
    rxz1 = jnp.reshape(rxz1, (1,)).astype(f32)
    nf = 10 if plan else NF_BWD

    # primal fields from the forward's final state; adjoint state zero
    state0 = jnp.concatenate(
        [final[:5], jnp.zeros((nf - 5, nz_ext, nxp), f32)])
    psic0 = ((jnp.zeros((4, 2, plan.ZB, nxp), f32),
              jnp.zeros((4, nz_ext, plan.XW), f32)) if plan else ())
    np_ = len(psic0)
    gmat0 = jnp.zeros((5, nz_ext, nxp), f32)

    # (4, R, nt) cotangent -> (NC, nt, nxp) row planes -> per-step rows,
    # zero-padded to the forward's (temporally blocked) ghost steps
    dd = eng._place_cotangent(cfg, rs, d_data[None], cfg.nt, nxp)[0]
    drec_seq = jnp.moveaxis(dd, 1, 0)               # (nt, NC, nxp)
    n_pad = lr_all.shape[0]                         # multiple of Kb*Jb
    n_megab = n_pad // KJb
    NCr = drec_seq.shape[1]
    drec_pad = jnp.zeros((n_pad, NCr, nxp), f32).at[:cfg.nt - 1].set(
        drec_seq[1:])
    amps_pad = jnp.zeros((n_pad,), f32).at[:cfg.nt - 1].set(
        stf1[:cfg.nt - 1].astype(f32))

    def rbody(carry, xs):
        state, psic, gmat = carry[0], carry[1:1 + np_], carry[1 + np_]
        lr_t, tb_t, drec_t, amp = xs
        outs = step(state, psic, gmat, mats_ext, profs, sz1, sx1,
                    rxz1, amp, lr_t, tb_t, drec_t)
        d_amp = outs[2 + np_]                       # (Kb*Jb,)
        return (*outs[:1 + np_], outs[1 + np_]), d_amp

    xs = (lr_all.reshape(n_megab, KJb, nz_ext, LANE),
          tb_all.reshape(n_megab, KJb, TB_ROWS, nxp),
          drec_pad.reshape(n_megab, KJb * NCr, nxp),
          amps_pad.reshape(n_megab, KJb))
    fin, d_stf_main = jax.lax.scan(rbody, (state0, *psic0, gmat0), xs,
                                   reverse=True)
    d_stf_main = d_stf_main.reshape(n_pad)[:cfg.nt - 1]
    gmat = fin[1 + np_]

    # crop the extended layout, restrict to the interior (reconstruction is
    # only exact there) and chain through the staggered material averaging
    g = gmat[:, PAD:PAD + cfg.nz, :cfg.nx]
    mzi = (jnp.arange(cfg.nz) >= cfg.npml) & (jnp.arange(cfg.nz)
                                              <= cfg.nz - 1 - cfg.npml)
    mxi = (jnp.arange(cfg.nx) >= cfg.npml) & (jnp.arange(cfg.nx)
                                              <= cfg.nx - 1 - cfg.npml)
    msk = (mzi[:, None] & mxi[None, :]).astype(f32)
    gmat_t = MatFields(lam=g[0] * msk, lp2m=g[1] * msk, ave_mu=g[2] * msk,
                       byc_a=g[3] * msk, byc_b=g[4] * msk)
    _, mat_vjp = jax.vjp(material_fields, lam.astype(f32), mu.astype(f32),
                         rho.astype(f32))
    d_lam, d_mu, d_rho = mat_vjp(gmat_t)
    d_stf = jnp.concatenate([d_stf_main, jnp.zeros((1,), f32)])
    return d_lam, d_mu, d_rho, d_stf


# ---------------------------------------------------------------------------
# custom_vjp wrapper + shot batching
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _stream_one(cfg: SimConfig, rs, lam, mu, rho, stf1, sz1, sx1, rxz1):
    return _stream_forward(cfg, rs, lam, mu, rho, stf1, sz1, sx1, rxz1,
                           save_strips=False)


def _so_fwd(cfg, rs, lam, mu, rho, stf1, sz1, sx1, rxz1):
    data, lr_all, tb_all, final = _stream_forward(
        cfg, rs, lam, mu, rho, stf1, sz1, sx1, rxz1, save_strips=True)
    return data, (lam, mu, rho, stf1, sz1, sx1, rxz1, final, lr_all, tb_all)


def _so_bwd(cfg, rs, res, d_data):
    lam, mu, rho, stf1, sz1, sx1, rxz1, final, lr_all, tb_all = res
    d_lam, d_mu, d_rho, d_stf = _stream_backward(
        cfg, rs, lam, mu, rho, stf1, sz1, sx1, rxz1, final, lr_all, tb_all,
        d_data)
    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (d_lam.astype(lam.dtype), d_mu.astype(mu.dtype),
            d_rho.astype(rho.dtype), d_stf.astype(stf1.dtype),
            f0(sz1), f0(sx1), jnp.zeros_like(jnp.asarray(rxz1)))


_stream_one.defvjp(_so_fwd, _so_bwd)


def propagate_pallas_streamed(cfg: SimConfig, rs, lam, mu, rho, stf,
                              src_z, src_x, rxz):
    """Differentiable streamed propagator, shot-batched: data (S, 4, R, nt)
    float32.  Same signature/semantics as `pallas_engine.propagate_pallas`,
    but grid-size-independent: shots run sequentially (`lax.map`) so peak
    HBM is one shot's strips, and each shot's state streams tile-by-tile
    through VMEM.  Gradients w.r.t. lam, mu, rho, stf."""
    rxz = jnp.broadcast_to(jnp.asarray(rxz, jnp.float32), stf.shape[:1])

    def one(xs):
        stf1, sz1, sx1, rxz1 = xs
        return _stream_one(cfg, rs, lam, mu, rho, stf1, sz1, sx1, rxz1)

    return jax.lax.map(one, (stf, jnp.asarray(src_z, jnp.int32),
                             jnp.asarray(src_x, jnp.int32), rxz))


def forward_pallas_streamed(cfg: SimConfig, rs, lam, mu, rho, stf,
                            src_z, src_x, rxz):
    """Streamed forward only (observed-data generation at any grid size)."""
    rxz = jnp.broadcast_to(jnp.asarray(rxz, jnp.float32), stf.shape[:1])

    def one(xs):
        stf1, sz1, sx1, rxz1 = xs
        return _stream_forward(cfg, rs, lam, mu, rho, stf1, sz1, sx1, rxz1,
                               save_strips=False)

    return jax.lax.map(one, (stf, jnp.asarray(src_z, jnp.int32),
                             jnp.asarray(src_x, jnp.int32), rxz))


# ---------------------------------------------------------------------------
# Acoustic streamed engine (secondary physics mode at any grid size; the
# streamed counterpart of pallas_engine.propagate_pallas_acoustic)
# ---------------------------------------------------------------------------

AC_NF_FWD = 7    # p vz vx + 4 psi
AC_NF_BWD = 10   # 3 primal + 3 adjoint + 4 adjoint psi
AC_TB_ROWS = eng.AC_TB_ROWS
AC_N_FIELDS = eng.AC_N_FIELDS
# acoustic psi tuple (p_vzdz, p_vxdx, p_pdz, p_pdx): same alternating
# z/x-profile drive as the elastic 8 (pallas_engine._ac_step_values)
AC_Z_IDX = (0, 2)
AC_X_IDX = (1, 3)


def _ac_interior_tile(cfg, gz, xi):
    """The TIGHTER acoustic reconstruction region ([npml+2, n-3-npml],
    acoustic._consts mask_i) on the tile's extended window."""
    return ((gz >= cfg.npml + 2) & (gz <= cfg.nz - 3 - cfg.npml)
            & (xi >= cfg.npml + 2)
            & (xi <= cfg.nx - 3 - cfg.npml)).astype(jnp.float32)


def _ac_fwd_mega_kernel(cfg, rs, T, n_tiles, nxp, n_recw, save_strips, plan,
                        K, J, srcz_ref, srcx_ref, amp_ref, *args):
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    nz_ext = PAD + n_tiles * T + PAD
    nf = 3 if plan else AC_NF_FWD
    state_in = args[0]
    mats_in = args[1]
    p_ = 2
    if plan:
        zpsi_in, xpsi_in = args[2:4]
        p_ = 4
    prof_refs = args[p_:p_ + 12]
    recw_refs = args[p_ + 12:p_ + 12 + n_recw]
    p_ += 12 + n_recw
    state_out = args[p_]
    p_ += 1
    if plan:
        zpsi_out, xpsi_out = args[p_:p_ + 2]
        p_ += 2
    rec_out = args[p_]
    p_ += 1
    if save_strips:
        lr_out, tb_out = args[p_:p_ + 2]
        p_ += 2
    else:
        lr_out = tb_out = None
    if plan:
        sst2, mat2, psis, stage = args[p_:p_ + 4]
        p_ += 4
    else:
        sst2, mat2, stage = args[p_:p_ + 3]
        psis = None
        p_ += 3
    s_sems, m_sems, out_sem, aux_sem = args[p_:p_ + 4]

    NC = 4 * eng._n_layers(rs)
    recw = eng._read_recw(recw_refs)
    rec_out[:] = jnp.zeros_like(rec_out)
    if plan:
        _psi_zero_all(psis, 4, E, nxp)

    # ring sweeps: js is a STATIC sweep index bound via functools.partial
    # (see the elastic twin's make_tile_body for the full rationale)
    def tile_body(i, _, js=0):
        base = js * K
        r0 = i * T
        p = _pipeline_prologue(i, n_tiles, state_in, mats_in, sst2, mat2,
                               T, E, s_sems, m_sems, EM, j=js, J=J,
                               state_out=state_out)
        sst = _Slot(sst2, p)
        mat_t = _Slot(mat2, p)

        gz, mask, src_hot, _ = _tile_masks(cfg, T, r0, E, nxp,
                                           srcz_ref[0], srcx_ref[0])
        prof = _slice_prof(prof_refs, r0, E)
        mats = _ac_mats_tile(cfg, mat_t, E)

        fields = tuple(sst[f] for f in range(3))
        if plan:
            zsrc, xsrc = ((zpsi_in, xpsi_in) if js == 0
                          else (zpsi_out, xpsi_out))
            _psi_materialize(plan, n_tiles, T, E, nxp, psis, zsrc,
                             xsrc, i, r0, AC_Z_IDX, AC_X_IDX, ring=js > 0)
            psi = tuple(psis[j] for j in range(4))
        else:
            psi = tuple(sst[3 + j] for j in range(4))

        # temporally blocked sub-steps (see the elastic twin)
        for k in range(K):
            if save_strips:
                if k > 0:
                    for f, v in enumerate(fields):
                        sst[f] = v
                _save_strips_tile_n(cfg, sst, lr_out.at[base + k],
                                    tb_out.at[base + k], r0, E, T, i,
                                    n_tiles, AC_N_FIELDS, margin=4 * k)
            fields, psi, recs = eng._ac_step_values(
                cfg, rs, prof, mask, src_hot, fields, psi, mats,
                amp_ref[base + k], recw, zi=gz, rec_window=(r0, r0 + T))
            for c in range(NC):
                r_ = (base + k) * NC + c
                rec_out[r_:r_ + 1, :] = rec_out[r_:r_ + 1, :] + recs[c]
        new_fields, new_psi = fields, psi

        _wait_prev_out(i, stage, state_out, T, out_sem, n_tiles, js)
        for f, v in enumerate(new_fields):
            stage[f] = v[PAD:PAD + T, :]
        if plan:
            _psi_extract(plan, n_tiles, T, E, nxp, nz_ext, new_psi,
                         zpsi_out, xpsi_out, i, r0, AC_Z_IDX, AC_X_IDX)
        else:
            for j, v in enumerate(new_psi):
                stage[3 + j] = v[PAD:PAD + T, :]

        _write_state_pads(nf, sst, state_out, i, n_tiles, T, E, nxp,
                          aux_sem)
        _pipeline_epilogue(i, n_tiles, state_in, mats_in, sst2, mat2,
                           stage, state_out, T, E, s_sems, m_sems, out_sem,
                           EM, j=js, J=J)
        return 0

    for js in range(J):
        body = functools.partial(tile_body, js=js)
        if n_tiles <= _unroll_tiles():
            for i_static in range(n_tiles):
                body(i_static, 0)
        else:
            jax.lax.fori_loop(0, n_tiles, body, 0)


def _save_strips_tile_n(cfg, sst, lr_out, tb_out, r0, E, T, i, n_tiles,
                        n_fields, margin=0):
    """_save_strips_tile generalized to n_fields planes (3 acoustic /
    5 elastic)."""
    _, z0, z1, x0, x1 = _strip_bounds5(cfg)
    L = STRIP_L

    @_when(i == 0)
    def _zero_edges():
        lr_out[0:PAD, :] = jnp.zeros((PAD, LANE), jnp.float32)
        tb_out[:] = jnp.zeros_like(tb_out)

    @_when(i == n_tiles - 1)
    def _zero_tail():
        nz_ext = PAD + n_tiles * T + PAD
        lr_out[nz_ext - PAD:nz_ext, :] = jnp.zeros((PAD, LANE), jnp.float32)

    row0 = _m8(r0 + PAD)
    for f_idx in range(n_fields):
        c = f_idx * 2 * L
        lr_out[pl.ds(row0, T), c:c + L] = sst[f_idx, PAD:PAD + T,
                                              x0:x0 + L]
        lr_out[pl.ds(row0, T), c + L:c + 2 * L] = sst[f_idx, PAD:PAD + T,
                                                      x1:x1 + L]
        for b_glob, row_off in ((z0 + PAD, c), (z1 + PAD, c + L)):
            lo = b_glob - r0
            ok = (lo >= margin) & (lo <= E - L - margin)
            lo_c = _clip_int(lo, 0, E - L)

            @_when(ok)
            def _(f_idx=f_idx, lo_c=lo_c, row_off=row_off):
                for j in range(L):
                    tb_out[row_off + j:row_off + j + 1, :] = (
                        sst[f_idx, pl.ds(lo_c + j, 1), :])


def _make_ac_fwd_megastep(cfg: SimConfig, rs, save_strips: bool,
                          K: int = 1, J: int = 1):
    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    f32 = jnp.float32
    nf = 3 if plan else AC_NF_FWD
    NC = 4 * eng._n_layers(rs)
    recw_in = _recw_inputs_padded(cfg, rs, nxp)
    n_recw = len(recw_in)
    KJ = K * J

    out_shape = [jax.ShapeDtypeStruct((nf, nz_ext, nxp), f32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if plan:
        out_shape += [jax.ShapeDtypeStruct((2, 2, plan.ZB, nxp), f32),
                      jax.ShapeDtypeStruct((2, nz_ext, plan.XW), f32)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    out_shape += [jax.ShapeDtypeStruct((KJ * NC, nxp), f32)]
    out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if save_strips:
        out_shape += [jax.ShapeDtypeStruct((KJ, nz_ext, LANE), f32),
                      jax.ShapeDtypeStruct((KJ, AC_TB_ROWS, nxp), f32)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2

    kernel = functools.partial(_ac_fwd_mega_kernel, cfg, rs, T, n_tiles,
                               nxp, n_recw, save_strips, plan, K, J)
    n_mats = 2 if _mats_compute(cfg) else 3
    scratch = [pltpu.VMEM((2, nf, E, nxp), f32),
               pltpu.VMEM((2, n_mats, EM, nxp), f32)]
    if plan:
        scratch += [pltpu.VMEM((4, E, nxp), f32)]
    scratch += [pltpu.VMEM((nf, T, nxp), f32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(())]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.HBM)] * 2
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                  * ((2 if plan else 0) + 12 + n_recw)),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    interp = eng._interpret()
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        # in-place carries (input 3 = state after the 3 scalars; 5/6 = the
        # compact psi when planned)
        input_output_aliases={3: 0, 5: 1, 6: 2} if plan else {3: 0},
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
    )

    def step(state, psic, mats_ext, profs, sz1, sx1, amp):
        return call(sz1, sx1, jnp.reshape(amp, (KJ,)).astype(f32),
                    state, mats_ext, *psic, *profs, *recw_in)

    return step


def _ac_stream_mats_ext(cfg, lam, rho, nz_ext, nxp):
    f32 = jnp.float32
    if _mats_compute(cfg):
        return jnp.stack([_ext_plane_edge(p.astype(f32), nz_ext + 8, nxp)
                          for p in (lam, rho)])
    mats = eng._ac_mats(lam, rho)
    return jnp.stack([_ext_plane(p, nz_ext, nxp) for p in mats])


def _ac_stream_forward(cfg: SimConfig, rs, lam, rho, stf1, sz1, sx1,
                       save_strips: bool):
    """Single-shot streamed acoustic forward: data (3, R, nt) channels
    (pr, vx, vz) [+ (lr_all, tb_all, final) when save_strips].  Temporal
    blocking (_stream_K) pads nt-1 with ghost steps like the elastic
    twin."""
    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    K = _stream_K(cfg)
    J = _stream_J(cfg)
    KJ = K * J
    f32 = jnp.float32
    mats_ext = _ac_stream_mats_ext(cfg, lam, rho, nz_ext, nxp)
    profs = _profiles_ext(cfg, nz_ext, nxp)
    step = _make_ac_fwd_megastep(cfg, rs, save_strips, K, J)
    sz1 = jnp.reshape(sz1, (1,)).astype(jnp.int32)
    sx1 = jnp.reshape(sx1, (1,)).astype(jnp.int32)
    nf = 3 if plan else AC_NF_FWD
    state0 = jnp.zeros((nf, nz_ext, nxp), f32)
    psic0 = ((jnp.zeros((2, 2, plan.ZB, nxp), f32),
              jnp.zeros((2, nz_ext, plan.XW), f32)) if plan else ())
    np_ = len(psic0)
    unit = _pad_unit(cfg, save_strips)
    nsteps = -(-(cfg.nt - 1) // unit) * unit
    n_mega = nsteps // KJ
    amps = jnp.zeros((n_mega * KJ,), f32).at[:cfg.nt - 1].set(
        stf1[:cfg.nt - 1].astype(f32)).reshape(n_mega, KJ)

    def body(carry, amp):
        state, psic = carry[0], carry[1:]
        outs = step(state, psic, mats_ext, profs, sz1, sx1, amp)
        carry2 = tuple(outs[:1 + np_])
        rec = outs[1 + np_]
        if save_strips:
            lr_t, tb_t = outs[2 + np_:4 + np_]
            return carry2, (rec, lr_t, tb_t)
        return carry2, rec

    fin, ys = jax.lax.scan(body, (state0, *psic0), amps)
    final = fin[0]
    rec_seq = ys[0] if save_strips else ys
    NC = rec_seq.shape[1] // KJ
    rec_seq = rec_seq.reshape(n_mega * KJ, NC, nxp)[:cfg.nt - 1]
    planes = jnp.concatenate(
        [jnp.zeros((NC, 1, nxp), f32), jnp.moveaxis(rec_seq, 0, 1)],
        axis=1)[None]
    data = eng._extract_data(cfg, rs, planes)[0][:3]   # (pr, vx, vz)
    if save_strips:
        lr_all = ys[1].reshape(n_mega * KJ, nz_ext, LANE)
        tb_all = ys[2].reshape(n_mega * KJ, AC_TB_ROWS, nxp)
        return data, lr_all, tb_all, final
    return data


def _ac_bwd_mega_kernel(cfg, rs, T, n_tiles, nxp, n_recw, plan, K, J,
                        gm_vmem, srcz_ref, srcx_ref, amp_ref, *args):
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    nz_ext = PAD + n_tiles * T + PAD
    nf = 6 if plan else AC_NF_BWD
    state_in = args[0]
    mats_in = args[1]
    gmat_in = args[2]
    p_ = 3
    if plan:
        zpsi_in, xpsi_in = args[3:5]
        p_ = 5
    prof_refs = args[p_:p_ + 12]
    recw_refs = args[p_ + 12:p_ + 12 + n_recw]
    p_ += 12 + n_recw
    lr_ref = args[p_]
    tb_ref = args[p_ + 1]
    drec_ref = args[p_ + 2]
    state_out = args[p_ + 3]
    p_ += 4
    if plan:
        zpsi_out, xpsi_out = args[p_:p_ + 2]
        p_ += 2
    gmat_out = args[p_]
    dstf_out = args[p_ + 1]
    p_ += 2
    if plan:
        sst2, mat2, psis, stage = args[p_:p_ + 4]
        p_ += 4
    else:
        sst2, mat2, stage = args[p_:p_ + 3]
        psis = None
        p_ += 3
    if gm_vmem:   # direct in-place accumulation: no staging, no gm DMAs
        gm_t = gi_sem = go_sem = None
        s_sems, m_sems, out_sem, aux_sem = args[p_:p_ + 4]
    else:
        gm_t = args[p_]
        p_ += 1
        s_sems, m_sems, out_sem, aux_sem, gi_sem, go_sem = args[p_:p_ + 6]

    NC = 4 * eng._n_layers(rs)
    dt = cfg.dt
    rdz, rdx = 1.0 / cfg.dz, 1.0 / cfg.dx
    recw = eng._read_recw(recw_refs)
    src_z = srcz_ref[0]
    src_x = srcx_ref[0]
    if plan:
        _psi_zero_all(psis, 4, E, nxp)

    # ring sweeps: js is a STATIC sweep index bound via functools.partial;
    # the backward's sweeps walk time DESCENDING, so sweep js reverses
    # sub-step block J-1-js (see the elastic twin)
    def tile_body(i, _, js=0):
        base = (J - 1 - js) * K
        r0 = i * T
        p = _pipeline_prologue(i, n_tiles, state_in, mats_in, sst2, mat2,
                               T, E, s_sems, m_sems, EM, j=js, J=J,
                               state_out=state_out)
        sst = _Slot(sst2, p)
        mat_t = _Slot(mat2, p)

        # START the reload into the double-buffered parity slot and defer
        # its wait to just before the accumulation (see elastic twin); the
        # VMEM-resident gmat variant needs no staging at all
        if not gm_vmem:
            gq = _gm_pipeline_top(i, n_tiles, gmat_in, gmat_out, gm_t, T,
                                  gi_sem, go_sem, j=js, J=J)

        gz, mask, src_hot, _ = _tile_masks(cfg, T, r0, E, nxp, src_z, src_x)
        xi = jax.lax.broadcasted_iota(jnp.int32, (E, nxp), 1)
        interior = _ac_interior_tile(cfg, gz, xi)
        prof = _slice_prof(prof_refs, r0, E)
        (lam, byca, bycb) = _ac_mats_tile(cfg, mat_t, E)
        if plan:
            zsrc, xsrc = ((zpsi_in, xpsi_in) if js == 0
                          else (zpsi_out, xpsi_out))
            _psi_materialize(plan, n_tiles, T, E, nxp, psis, zsrc,
                             xsrc, i, r0, AC_Z_IDX, AC_X_IDX, ring=js > 0)
        zero2 = tuple(jnp.zeros((E, nxp), jnp.float32) for _ in range(2))
        own_src = (src_z >= r0) & (src_z < r0 + T)

        # temporally blocked sub-steps, reversed (see the elastic twin)
        adj_f = adj_p = None
        acc_mats = None
        for k in range(K - 1, -1, -1):
            amp = amp_ref[base + k]
            lr_k = lr_ref.at[base + k]
            tb_k = tb_ref.at[base + k]

            # ---- reconstruct state_t (acoustic ordering, _ac_bwd_kernel) --
            (pf, vz, vx) = tuple(sst[f] for f in range(3))
            p_tp1 = pf
            pdiffs = (eng._dz_minus(pf), eng._dx_plus(pf))
            sst[1] = vz - interior * (pdiffs[0] * rdz * byca * dt)
            sst[2] = vx - interior * (pdiffs[1] * rdx * bycb * dt)
            _inject_strips_tile(cfg, sst, lr_k, tb_k, r0, E, which=(1, 2))
            vz, vx = sst[1], sst[2]
            pf = pf - src_hot * (cfg.src_scale * dt * amp)
            vdiffs = (eng._dz_plus(vz), eng._dx_minus(vx))
            sst[0] = pf - interior * (
                lam * (vdiffs[0] * rdz + vdiffs[1] * rdx) * dt)
            _inject_strips_tile(cfg, sst, lr_k, tb_k, r0, E, which=(0,))
            fields_t = tuple(sst[f] for f in range(3))

            if adj_f is None:
                adj_f = tuple(sst[3 + f] for f in range(3))
                if plan:
                    adj_p = tuple(psis[j] for j in range(4))
                else:
                    adj_p = tuple(sst[6 + j] for j in range(4))
            kb = base + k
            d_rec = tuple(drec_ref[kb * NC + c:kb * NC + c + 1, :]
                          for c in range(NC))

            # ---- phase-split adjoint (same construction as _ac_bwd_kernel)
            vfun = lambda vels, pn, vpsi, pd, bycs: (
                eng._ac_velocity_phase_values(cfg, rs, prof, mask, vels, pn,
                                              vpsi, pd, bycs, recw, zi=gz))
            _, vvjp = jax.vjp(vfun, (fields_t[1], fields_t[2]), p_tp1,
                              zero2, pdiffs, (byca, bycb))
            (d_vels, d_p_rec, d_vpsi_in, d_pdiffs, d_bycs) = vvjp(
                ((adj_f[1], adj_f[2]), adj_p[2:], d_rec))
            cot_p = (adj_f[0] + d_p_rec + eng._dz_minus_t(d_pdiffs[0])
                     + eng._dx_plus_t(d_pdiffs[1]))
            pfun = lambda pp, ppsi, vd, lam_, a: (
                eng._ac_pressure_phase_values(cfg, prof, mask, src_hot, pp,
                                              ppsi, vd, lam_, a))
            _, pvjp = jax.vjp(pfun, fields_t[0], zero2, vdiffs, lam, amp)
            (d_p_t, d_ppsi_in, d_vdiffs, d_lam, d_amp) = pvjp(
                (cot_p, adj_p[:2]))
            cot_vz = d_vels[0] + eng._dz_plus_t(d_vdiffs[0])
            cot_vx = d_vels[1] + eng._dx_minus_t(d_vdiffs[1])
            adj_f = (d_p_t, cot_vz, cot_vx)
            adj_p = (*d_ppsi_in, *d_vpsi_in)
            # interior-only accumulation (see the elastic twin's comment)
            d_mats = tuple(d[PAD:PAD + T, :]
                           for d in (d_lam, d_bycs[0], d_bycs[1]))
            acc_mats = d_mats if acc_mats is None else tuple(
                a + b for a, b in zip(acc_mats, d_mats))

            @_when(own_src)
            def _write_dstf(k=k, d_amp=d_amp):
                dstf_out[base + k] = d_amp

        d_fields, d_psi = adj_f, adj_p

        _wait_prev_out(i, stage, state_out, T, out_sem, n_tiles, js)
        for f in range(3):
            stage[f] = sst[f, PAD:PAD + T, :]
        for f, v in enumerate(d_fields):
            stage[3 + f] = v[PAD:PAD + T, :]
        if plan:
            _psi_extract(plan, n_tiles, T, E, nxp, nz_ext, d_psi,
                         zpsi_out, xpsi_out, i, r0, AC_Z_IDX, AC_X_IDX)
        else:
            for j, v in enumerate(d_psi):
                stage[6 + j] = v[PAD:PAD + T, :]
        if gm_vmem:
            # VMEM-resident accumulator: read-modify-write the aliased
            # gradient output rows in place (tile interiors are disjoint)
            rows_g = pl.ds(_m8(r0 + PAD), T)
            gsrc = _ring_src(js, gmat_in, gmat_out)
            for f, v in enumerate(acc_mats):
                gmat_out[f, rows_g, :] = gsrc[f, rows_g, :] + v
        else:
            _gm_in_dma(_ring_src(js, gmat_in, gmat_out), gm_t, gq, i, T,
                       gi_sem).wait()
            for f, v in enumerate(acc_mats):
                gm_t[gq, f] = gm_t[gq, f] + v

        _write_state_pads(nf, sst, state_out, i, n_tiles, T, E, nxp,
                          aux_sem)
        # start the gradient drain BEFORE the epilogue so it overlaps the
        # wait on tile i+1's prefetched input
        if not gm_vmem:
            _gm_pipeline_bottom(i, n_tiles, gm_t, gmat_out, T, go_sem,
                                j=js, J=J)
        _pipeline_epilogue(i, n_tiles, state_in, mats_in, sst2, mat2,
                           stage, state_out, T, E, s_sems, m_sems, out_sem,
                           EM, j=js, J=J)
        return 0

    for js in range(J):
        body = functools.partial(tile_body, js=js)
        if n_tiles <= _unroll_tiles():
            for i_static in range(n_tiles):
                body(i_static, 0)
        else:
            jax.lax.fori_loop(0, n_tiles, body, 0)


def _make_ac_bwd_megastep(cfg: SimConfig, rs, K: int = 1, J: int = 1):
    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    E = T + 2 * PAD
    EM = _mats_rows(cfg, E)
    f32 = jnp.float32
    nf = 6 if plan else AC_NF_BWD
    NC = 4 * eng._n_layers(rs)
    recw_in = _recw_inputs_padded(cfg, rs, nxp)
    n_recw = len(recw_in)
    gm_vmem = _gm_vmem()
    gm_space = pltpu.VMEM if gm_vmem else pltpu.HBM

    kernel = functools.partial(_ac_bwd_mega_kernel, cfg, rs, T, n_tiles,
                               nxp, n_recw, plan, K, J, gm_vmem)
    out_shape = [jax.ShapeDtypeStruct((nf, nz_ext, nxp), f32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if plan:
        out_shape += [jax.ShapeDtypeStruct((2, 2, plan.ZB, nxp), f32),
                      jax.ShapeDtypeStruct((2, nz_ext, plan.XW), f32)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    out_shape += [jax.ShapeDtypeStruct((3, nz_ext, nxp), f32),
                  jax.ShapeDtypeStruct((K * J,), f32)]
    out_specs += [pl.BlockSpec(memory_space=gm_space),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
    n_mats = 2 if _mats_compute(cfg) else 3
    scratch = [pltpu.VMEM((2, nf, E, nxp), f32),
               pltpu.VMEM((2, n_mats, EM, nxp), f32)]
    if plan:
        scratch += [pltpu.VMEM((4, E, nxp), f32)]
    scratch += [pltpu.VMEM((nf, T, nxp), f32)]
    if not gm_vmem:
        scratch += [pltpu.VMEM((2, 3, T, nxp), f32)]
    scratch += [pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(())]
    if not gm_vmem:
        scratch += [pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.HBM)] * 2
                  + [pl.BlockSpec(memory_space=gm_space)]
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                  * ((2 if plan else 0) + 12 + n_recw)
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    interp = eng._interpret()
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interp,
        # in-place carries: state (input 3) -> out 0, gmat (input 5) -> the
        # gradient output, compact psi (inputs 6/7) -> outputs 1/2 when
        # planned (see the elastic builder)
        input_output_aliases=({3: 0, 6: 1, 7: 2, 5: 3} if plan
                              else {3: 0, 5: 1}),
        compiler_params=None if interp else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
    )

    def step(state, psic, gmat, mats_ext, profs, sz1, sx1, amp, lr_t, tb_t,
             drec_t):
        return call(sz1, sx1, jnp.reshape(amp, (K * J,)).astype(f32),
                    state, mats_ext, gmat, *psic, *profs, *recw_in,
                    lr_t, tb_t, drec_t)

    return step


def _ac_stream_backward(cfg: SimConfig, rs, lam, rho, stf1, sz1, sx1,
                        final, lr_all, tb_all, d_data):
    from sep2023_tpu.medium import _shift_left, _shift_up

    T, n_tiles, nz_ext, nxp, plan = _layout_plan(cfg)
    Kb = _stream_K_bwd(cfg)
    Jb = _stream_J(cfg, bwd=True)
    KJb = Kb * Jb
    f32 = jnp.float32
    mats_ext = _ac_stream_mats_ext(cfg, lam, rho, nz_ext, nxp)
    profs = _profiles_ext(cfg, nz_ext, nxp)
    step = _make_ac_bwd_megastep(cfg, rs, Kb, Jb)
    sz1 = jnp.reshape(sz1, (1,)).astype(jnp.int32)
    sx1 = jnp.reshape(sx1, (1,)).astype(jnp.int32)
    nf = 6 if plan else AC_NF_BWD

    state0 = jnp.concatenate(
        [final[:3], jnp.zeros((nf - 3, nz_ext, nxp), f32)])
    psic0 = ((jnp.zeros((2, 2, plan.ZB, nxp), f32),
              jnp.zeros((2, nz_ext, plan.XW), f32)) if plan else ())
    np_ = len(psic0)
    gmat0 = jnp.zeros((3, nz_ext, nxp), f32)

    # (3, R, nt) cotangent + a zero ett plane -> per-step (NC, nxp) rows,
    # zero-padded to the forward's (temporally blocked) ghost steps
    d4 = jnp.concatenate(
        [d_data.astype(f32), jnp.zeros((1,) + d_data.shape[1:], f32)])
    dd = eng._place_cotangent(cfg, rs, d4[None], cfg.nt, nxp)[0]
    drec_seq = jnp.moveaxis(dd, 1, 0)
    n_pad = lr_all.shape[0]                         # multiple of Kb*Jb
    n_megab = n_pad // KJb
    NCr = drec_seq.shape[1]
    drec_pad = jnp.zeros((n_pad, NCr, nxp), f32).at[:cfg.nt - 1].set(
        drec_seq[1:])
    amps_pad = jnp.zeros((n_pad,), f32).at[:cfg.nt - 1].set(
        stf1[:cfg.nt - 1].astype(f32))

    def rbody(carry, xs):
        state, psic, gmat = carry[0], carry[1:1 + np_], carry[1 + np_]
        lr_t, tb_t, drec_t, amp = xs
        outs = step(state, psic, gmat, mats_ext, profs, sz1, sx1,
                    amp, lr_t, tb_t, drec_t)
        d_amp = outs[2 + np_]                       # (Kb*Jb,)
        return (*outs[:1 + np_], outs[1 + np_]), d_amp

    xs = (lr_all.reshape(n_megab, KJb, nz_ext, LANE),
          tb_all.reshape(n_megab, KJb, AC_TB_ROWS, nxp),
          drec_pad.reshape(n_megab, KJb * NCr, nxp),
          amps_pad.reshape(n_megab, KJb))
    fin, d_stf_main = jax.lax.scan(rbody, (state0, *psic0, gmat0), xs,
                                   reverse=True)
    d_stf_main = d_stf_main.reshape(n_pad)[:cfg.nt - 1]
    gmat = fin[1 + np_]

    g = gmat[:, PAD:PAD + cfg.nz, :cfg.nx]
    mzi = (jnp.arange(cfg.nz) >= cfg.npml + 2) & (jnp.arange(cfg.nz)
                                                  <= cfg.nz - 3 - cfg.npml)
    mxi = (jnp.arange(cfg.nx) >= cfg.npml + 2) & (jnp.arange(cfg.nx)
                                                  <= cfg.nx - 3 - cfg.npml)
    m = (mzi[:, None] & mxi[None, :]).astype(f32)
    rho32 = rho.astype(f32)
    _, byc_vjp = jax.vjp(
        lambda r: (2.0 / (_shift_up(r) + r), 2.0 / (_shift_left(r) + r)),
        rho32)
    (d_rho,) = byc_vjp((g[1] * m, g[2] * m))
    d_stf = jnp.concatenate([d_stf_main, jnp.zeros((1,), f32)])
    return g[0] * m, d_rho, d_stf


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ac_stream_one(cfg: SimConfig, rs, lam, rho, stf1, sz1, sx1):
    return _ac_stream_forward(cfg, rs, lam, rho, stf1, sz1, sx1,
                              save_strips=False)


def _aso_fwd(cfg, rs, lam, rho, stf1, sz1, sx1):
    data, lr_all, tb_all, final = _ac_stream_forward(
        cfg, rs, lam, rho, stf1, sz1, sx1, save_strips=True)
    return data, (lam, rho, stf1, sz1, sx1, final, lr_all, tb_all)


def _aso_bwd(cfg, rs, res, d_data):
    lam, rho, stf1, sz1, sx1, final, lr_all, tb_all = res
    d_lam, d_rho, d_stf = _ac_stream_backward(
        cfg, rs, lam, rho, stf1, sz1, sx1, final, lr_all, tb_all, d_data)
    f0 = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (d_lam.astype(lam.dtype), d_rho.astype(rho.dtype),
            d_stf.astype(stf1.dtype), f0(sz1), f0(sx1))


_ac_stream_one.defvjp(_aso_fwd, _aso_bwd)


def forward_pallas_acoustic_streamed(cfg: SimConfig, rs, lam, rho, stf,
                                     src_z, src_x):
    """Streamed acoustic forward only (observed-data generation at any
    grid size): data (S, 3, R, nt), channels (pr, vx, vz)."""
    def one(xs):
        stf1, sz1, sx1 = xs
        return _ac_stream_forward(cfg, rs, lam, rho, stf1, sz1, sx1,
                                  save_strips=False)

    return jax.lax.map(one, (stf, jnp.asarray(src_z, jnp.int32),
                             jnp.asarray(src_x, jnp.int32)))


def propagate_pallas_acoustic_streamed(cfg: SimConfig, rs, lam, rho, stf,
                                       src_z, src_x):
    """Differentiable streamed acoustic propagator, shot-batched: data
    (S, 3, R, nt) channels (pr, vx, vz).  Same semantics as
    `pallas_engine.propagate_pallas_acoustic`, grid-size-independent."""
    def one(xs):
        stf1, sz1, sx1 = xs
        return _ac_stream_one(cfg, rs, lam, rho, stf1, sz1, sx1)

    return jax.lax.map(one, (stf, jnp.asarray(src_z, jnp.int32),
                             jnp.asarray(src_x, jnp.int32)))
