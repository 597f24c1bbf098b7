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

All loss builders share the signature
    loss(lam, mu, rho, stf, [geoms,] obs, weights, *trace_aux)
where `trace_aux` are optional per-shot arrays (leading S axis) vmapped
alongside obs/syn and passed positionally to `misfit_fn` — the vehicle for
the reference's per-trace win_start/win_end/trace-weight conditioning
(`Src_Rec.cu:145-200`).  `weights` is the per-shot weight vector (the
survey's src_weight entries; ones by default).
"""
from __future__ import annotations

import functools
import os
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
    (Src_Rec.cu:87-116 does the same when parsing the survey JSON).  Ragged
    surveys carry their per-shot padded (S, R_max) spreads straight through
    (padding replicates real receivers; zero its weights via
    `survey.live_trace_weights()`)."""
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


def pad_shots(stf, geoms: ShotGeom, obs, weights, n_devices: int,
              trace_aux=()):
    """Pad the shot axis to a multiple of n_devices with zero-weight shots."""
    S = stf.shape[0]
    rem = (-S) % n_devices
    if rem == 0:
        return stf, geoms, obs, weights, trace_aux
    pad = lambda a: jnp.concatenate(
        [a, jnp.repeat(a[-1:], rem, axis=0)], axis=0)
    w = jnp.concatenate([weights, jnp.zeros((rem,), weights.dtype)])
    return (pad(stf), jax.tree.map(pad, geoms), pad(obs), w,
            jax.tree.map(pad, trace_aux))


def pad_survey(survey: Survey, n_devices: int) -> Survey:
    """Replicate the last shot's source entries so the survey's shot count
    matches `pad_shots`' padded arrays (needed by the Pallas loss builders,
    which derive per-shot source vectors from the survey).  Ragged surveys
    replicate the last shot's receiver rows / live mask too."""
    S = survey.n_shots
    rem = (-S) % n_devices
    if rem == 0:
        return survey
    rep = lambda a: np.concatenate([a, np.repeat(a[-1:], rem, axis=0)])
    ragged = survey.ragged
    return Survey(src_z=rep(survey.src_z), src_x=rep(survey.src_x),
                  rec_z=rep(survey.rec_z) if ragged else survey.rec_z,
                  rec_x=rep(survey.rec_x) if ragged else survey.rec_x,
                  src_rxz=rep(survey.src_rxz),
                  rec_live=(rep(survey.rec_live)
                            if survey.rec_live is not None else None))


def default_shot_misfit(channels: Sequence[str] = ("ett",)):
    return lambda o, s: mf.l2_misfit(o, s, channels=channels)


def strip_bytes_per_shot(cfg: SimConfig, acoustic: bool = False,
                         itemsize: int = 4) -> int:
    """Boundary-strip residual bytes one shot's gradient holds in HBM:
    (nt-1) steps of a lane-packed (nz_pad8, 128) left/right plane plus a
    (TB_ROWS, nx_pad128) top/bottom plane (the Pallas engines' staging
    layout; the XLA engine's flattened strips are the same order).  ~1.8
    GB/shot at a Marmousi-style 814x2064/nt=2001 — the term that made an
    unchunked many-shot gradient exceed HBM and hard-crash the TPU
    worker.  itemsize: 8 for x64 validation runs."""
    from sep2023_tpu.ops import pallas_engine as pe

    nz8 = -(-cfg.nz // 8) * 8
    nxp = -(-cfg.nx // 128) * 128
    rows = pe.AC_TB_ROWS if acoustic else pe.TB_ROWS
    return (cfg.nt - 1) * (nz8 * pe.LANE + rows * nxp) * itemsize


def hbm_budget_bytes(device=None, fallback: int = 6 << 30) -> int:
    """Boundary-strip HBM budget for `auto_shot_chunk`: 3/8 of the
    device's reported `bytes_limit` (6 GiB on a 16 GB v5e — the remaining
    5/8 covers model/gradient planes, recordings and XLA temporaries), or
    `fallback` when the backend reports no memory stats.  Both XLA:CPU
    and the axon TPU relay return None from `memory_stats()` (verified),
    so in this environment the fallback IS the production value; a local
    TPU runtime reports real limits and scales the budget with HBM size."""
    try:
        dev = device if device is not None else jax.devices()[0]
        limit = int((dev.memory_stats() or {}).get("bytes_limit", 0))
    except Exception:   # relay proxies may raise instead of returning None
        limit = 0
    if limit > 0:
        return max(1 << 30, (limit * 3) // 8)
    return fallback


def auto_shot_chunk(cfg: SimConfig, n_shots: int, *, acoustic: bool = False,
                    budget_bytes: int | None = None, itemsize: int = 4,
                    n_devices: int = 1) -> int:
    """Default shots-in-flight bound for gradient evaluations: the largest
    chunk whose strip residuals fit the HBM budget (`hbm_budget_bytes()`
    when budget_bytes is None), or 0 (unchunked) when every shot fits.
    `n_shots` is the GLOBAL shot count; under shot data-parallelism pass
    `n_devices` so the bound applies to each device's ceil(S/D) local
    shots (the CLI divides before calling; both routes agree).  Chunking
    is close to free since the gradient accumulator replaced the remat
    re-forward, so the budget errs toward safety: an unchunked Marmousi
    many-shot gradient previously exceeded HBM and hard-crashed the TPU
    worker (~1.8 GB strips/shot at 814x2064/nt=2001)."""
    if budget_bytes is None:
        budget_bytes = hbm_budget_bytes()
    local_shots = -(-max(1, n_shots) // max(1, n_devices))
    per_shot = strip_bytes_per_shot(cfg, acoustic, itemsize)
    if per_shot * local_shots <= budget_bytes:
        return 0
    return max(1, min(local_shots, int(budget_bytes // per_shot)))


def _split_shots(tree, *, S: int, used: int, n_full: int, chunk: int):
    """THE chunking split, shared by the accumulator, the remat oracle and
    the forward map (one definition so the equality tests compare the same
    semantics): a leading-S pytree -> (head reshaped to (n_full, chunk,
    ...), ragged tail or None)."""
    resh = lambda a: a[:used].reshape(n_full, chunk, *a.shape[1:])
    head = jax.tree.map(resh, tree)
    if used == S:
        return head, None
    return head, jax.tree.map(lambda a: a[used:], tree)


def _aval(a):
    """Static (shape, dtype) snapshot of a primal — captured while the
    tracer is LIVE so the custom-vjp bwd never touches escaped tracers."""
    return jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))


def _zero_ct(aval):
    """Zero cotangent for a ShapeDtypeStruct: float0 for integer leaves."""
    if jnp.issubdtype(aval.dtype, jnp.inexact):
        return jnp.zeros(aval.shape, aval.dtype)
    return np.zeros(aval.shape, jax.dtypes.float0)


def _chunked_sum(chunk_loss, model, stf, rest, weights, shot_chunk: int):
    """Sum chunk_loss(model, stf_chunk, rest_chunk, w_chunk) over contiguous
    shot chunks via `lax.map` (jaxpr size stays flat in S — the reference's
    OpenMP chunk loop, Torch_Fwi.cpp:59-95, without the unrolled-Python
    compile blowup).

    With more than one chunk the differentiated path is a custom-vjp
    GRADIENT ACCUMULATOR: each `lax.map` body evaluates one chunk's value
    AND its (model, stf) cotangents together (per-chunk jax.vjp), so only
    one chunk's boundary-strip residuals are ever live — the peak memory of
    the old jax.checkpoint rematerialization WITHOUT its extra forward pass
    per chunk (a chunked gradient is forward + reconstruction + adjoint =
    3 wavefield passes, not 4).

    Differentiation contract (chunked path): gradients flow to `model` and
    `stf` — exactly the set the reference's native op emits ({misfit,
    gLambda, gMu, gDen, gStf}, Torch_Fwi.cpp:102-103).  `rest` (geometry,
    observed data, per-trace conditioning) and `weights` are data: asking
    for their gradients returns ZEROS (test-pinned) — set
    SEP2023_TPU_CHUNK_REMAT=1 (or shot_chunk=0) when a workflow genuinely
    needs data-side cotangents.  The single-chunk path is a plain call
    (fully differentiable).

    A ragged tail runs as ONE smaller trailing evaluation (not zero-weight
    replica padding): a 31-shot / chunk-6 gradient does exactly 31
    propagations.

    SEP2023_TPU_CHUNK_REMAT=1 selects the previous jax.checkpoint
    rematerialization instead (the fully-differentiable oracle the
    accumulator is equality-tested against, and the baseline for the
    measured speedup).  The oracle is also the path to use for
    FORWARD-mode AD (jvp/jacfwd/Hessian-vector products): custom_vjp
    functions reject jvp, so the accumulator supports reverse mode
    only."""
    S = weights.shape[0]
    chunk = shot_chunk if shot_chunk and shot_chunk < S else S
    if chunk == S:
        return chunk_loss(model, stf, rest, weights)
    n_full = S // chunk
    used = n_full * chunk
    split = functools.partial(_split_shots, S=S, used=used, n_full=n_full,
                              chunk=chunk)

    if os.environ.get("SEP2023_TPU_CHUNK_REMAT"):
        remat_loss = jax.checkpoint(chunk_loss)
        head, tail = split((stf, rest, weights))
        total = jnp.sum(jax.lax.map(
            lambda xs: remat_loss(model, *xs), head))
        if tail is not None:
            total = total + remat_loss(model, *tail)
        return total

    # static shape/dtype snapshots for the bwd zero cotangents (the bwd
    # must not reference the enclosing trace's tracers — they are dead by
    # the time it runs when the CALLER differentiates w.r.t. rest/weights)
    rest_avals = jax.tree.map(_aval, rest)
    w_aval = _aval(weights)

    @jax.custom_vjp
    def total(model, stf, rest, weights):
        head, tail = split((stf, rest, weights))
        t = jnp.sum(jax.lax.map(lambda xs: chunk_loss(model, *xs), head))
        if tail is not None:
            t = t + chunk_loss(model, *tail)
        return t

    def total_fwd(model, stf, rest, weights):
        head, tail = split((stf, rest, weights))

        def eval_vg(stf_c, rest_c, w_c):
            val, pull = jax.vjp(
                lambda m, s: chunk_loss(m, s, rest_c, w_c), model, stf_c)
            gm, gs = pull(jnp.ones((), val.dtype))
            return val, gm, gs

        vals, gms, gstfs = jax.lax.map(lambda xs: eval_vg(*xs), head)
        t = jnp.sum(vals)
        gm = jax.tree.map(lambda a: jnp.sum(a, axis=0), gms)
        gstf = gstfs.reshape(used, *stf.shape[1:])
        if tail is not None:
            val_t, gm_t, gs_t = eval_vg(*tail)
            t = t + val_t
            gm = jax.tree.map(jnp.add, gm, gm_t)
            gstf = jnp.concatenate([gstf, gs_t], axis=0)
        return t, (gm, gstf)

    def total_bwd(res, ct):
        gm, gstf = res
        return (jax.tree.map(lambda a: ct * a, gm), ct * gstf,
                jax.tree.map(_zero_ct, rest_avals), _zero_ct(w_aval))

    total.defvjp(total_fwd, total_bwd)
    return total(model, stf, rest, weights)


def make_local_misfit(cfg: SimConfig, channels: Sequence[str] = ("ett",),
                      shot_chunk: int = 0, misfit_fn=None):
    """Single-device (vmap only) loss:
    loss(lam, mu, rho, stf, geoms, obs, weights, *trace_aux).

    misfit_fn(obs_shot, syn_shot, *trace_aux_shot) overrides the per-shot
    objective (e.g. ops.misfit.make_preprocessed_l2 for windowed / filtered /
    per-trace-conditioned data); the adjoint source flows back into the
    propagator as the data cotangent either way."""
    fn = misfit_fn or default_shot_misfit(channels)

    def loss(lam, mu, rho, stf, geoms, obs, weights, *trace_aux):
        def chunk_loss(model, stf_c, rest_c, w_c):
            lam_, mu_, rho_ = model
            geoms_c, obs_c, aux_c = rest_c
            syn = jax.vmap(lambda s, g: propagate(cfg, lam_, mu_, rho_,
                                                  s, g))(stf_c, geoms_c)
            per_shot = jax.vmap(fn)(obs_c, syn, *aux_c)
            return jnp.sum(w_c * per_shot)

        return _chunked_sum(chunk_loss, (lam, mu, rho), stf,
                            (geoms, obs, tuple(trace_aux)), weights,
                            shot_chunk)

    return loss


def _pallas_plan(cfg: SimConfig, survey: Survey, das_w=None):
    """FastPlan for the survey plus, for RAGGED surveys, the (S, R_max)
    per-shot gather indices into the UNION receiver spread: the kernel
    records every distinct receiver position once per shot and each shot
    picks out its own spread afterwards (zero-weight padding handles the
    count differences) — the Pallas counterpart of the reference's per-shot
    receiver cubes (`Src_Rec.cu:204-259`)."""
    from sep2023_tpu.ops import pallas_engine as pe

    allow_t = bool(np.all(survey.src_rxz != 0))
    if survey.ragged:
        if das_w is not None:
            raise ValueError("ragged surveys with directional fiber weights "
                             "need the XLA engine")
        rz = survey.rec_z + cfg.npml
        rx = survey.rec_x + cfg.npml
        pairs = np.stack([rz.ravel(), rx.ravel()], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        plan = pe.plan_fast_path(cfg, uniq[:, 0], uniq[:, 1],
                                 allow_transpose=allow_t)
        if plan is None:
            raise ValueError("ragged survey's union spread does not satisfy "
                             "any Pallas fast path")
        return plan, jnp.asarray(inv.reshape(rz.shape), jnp.int32)

    plan = pe.plan_fast_path(
        cfg, survey.rec_z + cfg.npml, survey.rec_x + cfg.npml, das_w=das_w,
        allow_transpose=allow_t)
    if plan is None:
        raise ValueError("survey does not satisfy any Pallas fast path "
                         "(row / fiber / transposed layouts)")
    return plan, None


def try_pallas_plan(cfg: SimConfig, survey: Survey, das_w=None):
    """(plan, union_idx) when the survey fits a Pallas fast path, else
    None — the driver's engine-selection probe."""
    try:
        return _pallas_plan(cfg, survey, das_w)
    except ValueError:
        return None


def _gather_union(syn, uidx_c):
    """(S, 4, R_union, nt) kernel output -> each shot's own (padded) spread
    via its (R_max,) union indices."""
    return jnp.take_along_axis(syn, uidx_c[:, None, :, None], axis=2)


def make_pallas_misfit(cfg: SimConfig, survey: Survey,
                       channels: Sequence[str] = ("ett",),
                       shot_chunk: int = 0, misfit_fn=None, das_w=None):
    """Fused-Pallas engine loss: loss(lam, mu, rho, stf, obs, weights,
    *trace_aux).

    The acquisition must fit a fast-path plan (single-row window, K-layer
    fiber, or either on the transposed grid — pallas_engine.plan_fast_path);
    das_w carries (R, 3) fiber sensitivity weights when
    cfg.das_channel == 'weighted'.  shot_chunk > 0 bounds the boundary-strip
    residual memory via the chunked gradient accumulator (`_chunked_sum` —
    per-chunk value+cotangents in one `lax.map` body; gradients flow to
    the model and stf)."""
    from sep2023_tpu.ops import pallas_engine as pe

    plan, uidx = _pallas_plan(cfg, survey, das_w)
    sz = jnp.asarray(survey.src_z + cfg.npml, jnp.int32)
    sx = jnp.asarray(survey.src_x + cfg.npml, jnp.int32)
    rz = jnp.asarray(survey.src_rxz, jnp.float32)
    fn = misfit_fn or default_shot_misfit(channels)

    def loss(lam, mu, rho, stf, obs, weights, *trace_aux):
        def chunk_loss(model, stf_c, rest_c, w_c):
            lam_, mu_, rho_ = model
            sz_c, sx_c, rz_c, uidx_c, obs_c, aux_c = rest_c
            syn = pe.propagate_pallas_plan(plan, lam_, mu_, rho_, stf_c,
                                           sz_c, sx_c, rz_c)
            if uidx is not None:
                syn = _gather_union(syn, uidx_c)
            per_shot = jax.vmap(fn)(obs_c, syn, *aux_c)
            return jnp.sum(w_c * per_shot)

        u = (uidx if uidx is not None
             else jnp.zeros((stf.shape[0], 1), jnp.int32))
        return _chunked_sum(chunk_loss, (lam, mu, rho), stf,
                            (sz, sx, rz, u, obs, tuple(trace_aux)),
                            weights, shot_chunk)

    return loss


def make_sharded_misfit(cfg: SimConfig, mesh: Mesh,
                        channels: Sequence[str] = ("ett",), axis: str = "shot",
                        misfit_fn=None, n_trace_aux: int = 0,
                        shot_chunk: int = 0):
    """Build  loss(lam, mu, rho, stf, geoms, obs, weights, *trace_aux) ->
    scalar  with the shot axis sharded over `mesh` and the misfit
    psum-reduced over ICI.

    Differentiable: jax.grad(loss) yields replicated (all-reduced) model
    gradients — the TPU-native `Torch_Fwi.cpp:96-101`.  The shot count must
    be a multiple of the mesh size (use `pad_shots`)."""
    geom_spec = ShotGeom(src_z=P(axis), src_x=P(axis), rxz=P(axis),
                         rec_z=P(axis), rec_x=P(axis))
    local = make_local_misfit(cfg, channels=channels, shot_chunk=shot_chunk,
                              misfit_fn=misfit_fn)

    # check_vma=False: the propagator's scan starts from a constant zero
    # state that only becomes shot-varying after the first source injection,
    # which the varying-manual-axes checker would reject.
    @functools.partial(
        _shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), geom_spec, P(axis), P(axis))
        + (P(axis),) * n_trace_aux,
        out_specs=P(), check_vma=False)
    def loss(lam, mu, rho, stf, geoms, obs, weights, *trace_aux):
        return jax.lax.psum(
            local(lam, mu, rho, stf, geoms, obs, weights, *trace_aux), axis)

    return loss


def make_pallas_sharded_misfit(cfg: SimConfig, survey: Survey, mesh: Mesh,
                               channels: Sequence[str] = ("ett",),
                               axis: str = "shot", misfit_fn=None,
                               n_trace_aux: int = 0, shot_chunk: int = 0,
                               das_w=None):
    """Sharded loss with the fused Pallas engine inside each shard — the
    reference's multi-GPU scheduler (`Torch_Fwi.cpp:71-101`) with the fast
    kernel per device: shots shard over the mesh, each device runs its chunk
    through `propagate_pallas`, misfit and (via AD) model gradients
    psum-reduce over ICI.

    Signature: loss(lam, mu, rho, stf, obs, weights, *trace_aux).
    The shot count must be a multiple of the mesh size (use `pad_shots`)."""
    from sep2023_tpu.ops import pallas_engine as pe

    plan, uidx = _pallas_plan(cfg, survey, das_w)
    sz = jnp.asarray(survey.src_z + cfg.npml, jnp.int32)
    sx = jnp.asarray(survey.src_x + cfg.npml, jnp.int32)
    rz = jnp.asarray(survey.src_rxz, jnp.float32)
    if uidx is None:
        uidx = jnp.zeros((sz.shape[0], 1), jnp.int32)
        gather = False
    else:
        gather = True
    fn = misfit_fn or default_shot_misfit(channels)

    @functools.partial(
        _shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis)) + (P(axis),) * n_trace_aux,
        out_specs=P(), check_vma=False)
    def sharded(lam, mu, rho, stf, sz_, sx_, rz_, uidx_, obs, weights,
                *trace_aux):
        def chunk_loss(model, stf_c, rest_c, w_c):
            lam_, mu_, rho_ = model
            sz_c, sx_c, rz_c, uidx_c, obs_c, aux_c = rest_c
            syn = pe.propagate_pallas_plan(plan, lam_, mu_, rho_, stf_c,
                                           sz_c, sx_c, rz_c)
            if gather:
                syn = _gather_union(syn, uidx_c)
            per_shot = jax.vmap(fn)(obs_c, syn, *aux_c)
            return jnp.sum(w_c * per_shot)

        total = _chunked_sum(chunk_loss, (lam, mu, rho), stf,
                             (sz_, sx_, rz_, uidx_, obs, tuple(trace_aux)),
                             weights, shot_chunk)
        return jax.lax.psum(total, axis)

    def loss(lam, mu, rho, stf, obs, weights, *trace_aux):
        return sharded(lam, mu, rho, stf, sz, sx, rz, uidx, obs, weights,
                       *trace_aux)

    return loss


def _chunked_map(fn, shot_args, S: int, shot_chunk: int):
    """Map fn over contiguous shot chunks and concatenate the (leading-S)
    outputs; ragged tails run as one smaller trailing call (peak memory
    bounded by shot_chunk, no replica waste)."""
    chunk = shot_chunk if shot_chunk and shot_chunk < S else S
    if chunk == S:
        return fn(shot_args)
    n_full = S // chunk
    used = n_full * chunk
    head, tail = _split_shots(shot_args, S=S, used=used, n_full=n_full,
                              chunk=chunk)
    out = jax.lax.map(fn, head)
    out = out.reshape(used, *out.shape[2:])
    if tail is not None:
        out = jnp.concatenate([out, fn(tail)], axis=0)
    return out


def make_forward(cfg: SimConfig, survey: Survey, *, use_pallas=False,
                 mesh: Optional[Mesh] = None, shot_chunk: int = 0,
                 axis: str = "shot", das_w=None, dtype=jnp.float32):
    """Observed-data generation forward through the SAME engine + mesh +
    chunking selection as the stage losses (build_stage_loss): twin-
    experiment obs and `--src-update` synthetics no longer bypass the
    production path with an unsharded all-shots vmap.

    Returns fwd(lam, mu, rho, stf) -> (S, 4, R, nt) float32-or-dtype.
    Ragged surveys come back on their padded (S, R_max) spreads."""
    from sep2023_tpu.ops import pallas_engine as pe

    geoms = survey_to_geoms(survey, cfg.npml, dtype=dtype)
    S = survey.n_shots
    if use_pallas:
        plan, uidx = _pallas_plan(cfg, survey, das_w)
        sz = jnp.asarray(survey.src_z + cfg.npml, jnp.int32)
        sx = jnp.asarray(survey.src_x + cfg.npml, jnp.int32)
        rz = jnp.asarray(survey.src_rxz, jnp.float32)
        u = (uidx if uidx is not None else jnp.zeros((S, 1), jnp.int32))

    n_dev = 1 if mesh is None else int(mesh.devices.size)

    def fwd(lam, mu, rho, stf):
        def chunk_fn(model, args):
            lam_, mu_, rho_ = model
            if use_pallas:
                stf_c, sz_c, sx_c, rz_c, u_c = args
                # forward-only dispatch: the fused forward covers grids far
                # past the GRADIENT VMEM wall (no boundary strips saved)
                syn = pe.forward_pallas_plan(plan, lam_, mu_, rho_, stf_c,
                                             sz_c, sx_c, rz_c)
                if uidx is not None:
                    syn = _gather_union(syn, u_c)
                return syn
            stf_c, g_c = args
            return jax.vmap(lambda s, g: propagate(cfg, lam_, mu_, rho_,
                                                   s, g))(stf_c, g_c)

        model = (lam, mu, rho)
        shot_args = ((stf, sz, sx, rz, u) if use_pallas else (stf, geoms))
        if mesh is None:
            return _chunked_map(functools.partial(chunk_fn, model),
                                shot_args, S, shot_chunk)

        pad = (-S) % n_dev
        if pad:
            shot_args = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0),
                shot_args)

        @functools.partial(_shard_map, mesh=mesh,
                           in_specs=((P(), P(), P()),
                                     jax.tree.map(lambda _: P(axis),
                                                  shot_args)),
                           out_specs=P(axis), check_vma=False)
        def sharded(model_, args):
            return _chunked_map(functools.partial(chunk_fn, model_), args,
                                (S + pad) // n_dev, shot_chunk)

        return sharded(model, shot_args)[:S]

    return fwd


def mesh_2d(n_shot: int, n_x: int, devices=None) -> Mesh:
    """2-D device mesh: data-parallel shots x spatial domain decomposition."""
    devs = jax.devices() if devices is None else devices
    assert len(devs) >= n_shot * n_x
    return Mesh(np.array(devs[:n_shot * n_x]).reshape(n_shot, n_x),
                ("shot", "x"))


def make_dd_misfit(cfg: SimConfig, mesh: Mesh,
                   channels: Sequence[str] = ("ett",)):
    """Shot-parallel + spatially-decomposed loss on a ('shot', 'x') mesh.

    The model's x-axis is sharded across the 'x' mesh axis; GSPMD inserts
    the 2-cell halo exchanges (collective-permutes over ICI) that the
    O(4) stencil slices require — the wave-equation analogue of tensor
    parallelism, expressed purely as sharding annotations (no manual halo
    code; cf. the jax scaling-book recipe: pick a mesh, annotate, let XLA
    insert collectives).

    Differentiable; grads come out replicated.  Use under jit.
    """
    from jax.sharding import NamedSharding

    model_s = NamedSharding(mesh, P(None, "x"))
    shot_s = NamedSharding(mesh, P("shot"))
    wsc = jax.lax.with_sharding_constraint

    def loss(lam, mu, rho, stf, geoms, obs, weights):
        lam = wsc(lam, model_s)
        mu = wsc(mu, model_s)
        rho = wsc(rho, model_s)
        stf = wsc(stf, shot_s)
        obs = wsc(obs, shot_s)
        syn = jax.vmap(lambda s, g: propagate(cfg, lam, mu, rho, s, g))(
            stf, geoms)
        per_shot = jax.vmap(
            lambda o, s: mf.l2_misfit(o, s, channels=channels))(obs, syn)
        return jnp.sum(weights * per_shot)

    return loss
