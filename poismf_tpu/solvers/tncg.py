"""Batched truncated-Newton (TNCG) solver with exact Hessian-vector products.

TPU-native redesign of the reference's per-row Nash TNBC truncated Newton
(``tnc`` / ``tnc_minimize``, /root/reference/src/tnc.c:251-993, driven by
``tncg_iteration`` poismf.c:324-404).  This is NOT a port: the reference's
per-row adaptive control flow (variable scaling, f-rescaling, SSBFGS
preconditioner state machine, Gill-Murray cubic line search) exists to cope
with finite-difference Hessian-vector products and scalar execution.  On TPU
we solve ALL rows at once and replace each piece with its batched,
fixed-shape equivalent:

  reference (tnc.c)                       this implementation
  -------------------------------------   ----------------------------------
  Hv by gradient finite differences       exact HVP: H_r v = 2*l2*v +
    (hessianTimesVector :1388-1435,         sum_i (x_i/pred_i^2) <B_i,v> B_i
    1 extra f/g eval per Hv)                (one fused pass, no log/exp)
  active-set pivots for low=0             per-coordinate mask
    (setConstraints :512-545 etc.)          fixed = (x<=0) & (g>0)
  inner preconditioned CG, maxCGit =      batched masked CG, same maxCGit
    clamp(k/2,1,50) (:1162-1341)            clamp, eta=0.25 forcing term,
                                            negative-curvature truncation,
                                            stops when every row converged
  2-step SSBFGS diagonal preconditioner   exact Hessian diagonal (Jacobi)
    (msolve :1444-1528)                     2*l2 + sum_i w2_i B_ik^2
  Gill-Murray cubic line search           batched Wolfe search on RAY
    (linearSearch :1664-1813,               trials x + a*d with a capped at
    stepMax cap tnc.c:795)                  the nearest bound (the
                                            reference's stepMax/newcon
                                            contract), safeguarded-cubic
                                            interpolation, LS_CAND
                                            candidates per round in ONE
                                            cached px/pd/vals stream
                                            (~1/9 of a data sweep)
  convergence |df|<=ftol, |dx|<=xtol,     same tests, batched per row
    |pg|<=pgtol (:699-712, 909-929)
  maxnfeval budget (= maxupd)             same accounting: +1 per f/g eval,
                                            +1 per HVP, +1 per LS trial

The line search's ``<B, d>`` plane (``pd``) is ACCUMULATED during the inner
CG on the ELL backend whenever the inner-CG cap is small (the cascade's
max_cg=3 bulk rounds):  ``pd = <B, sum_i alpha_i p_i> = sum_i alpha_i
<B, p_i>``, and every HVP already holds ``<B, p_i>`` in registers —
writing it out plus one fused axpy costs ~16 B/slot per HVP vs the
~(k*itemsize + 8) B/slot standalone bdot sweep it replaces (ROADMAP #0).
Rows whose final CG direction must be discarded (feasible-cone violation,
junk/ascent fallback) revert to their FIRST-iteration direction
``d1 = alpha_0 * p_0`` — provably cone-feasible and strict-descent — whose
``bd1`` plane is a snapshot of the same accumulation, so no correction
pass ever runs (``POISMF_TNCG_BD_ACCUM=0`` restores the hoisted bdot).

Two data-layout backends share the solver core:

  * flat sorted-COO (:mod:`..ops.objective`) — simple, used for small
    problems and the sharded per-device path;
  * planar ELL (:mod:`..ops.ell`) — gather/scatter-free hot loop with the
    fixed matrix's rows pre-gathered once per half-update; the fast path for
    real workloads.

Exact zeros (the headline >90% factor sparsity) come from the projection
``max(0, .)`` plus the fixed-set mask, mirroring the reference's clamp
(coercex tnc.c:465-479) and active-set projection (:1015-1023).

``reuse_prev`` / init-to-1e-3 and zero-ing of empty rows follow
poismf.c:367-381; the >=95%-rows-unchanged early-stop statistic follows
poismf.c:393-403.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import numpy as _np
import jax
import jax.numpy as jnp
from jax import lax

from ..sparse import CountsMatrix
from ..ops import objective as obj
from ..ops import ell as ell_ops

# Constants from the reference call sites (poismf.c:383-391, tnc.c:401-436)
TNC_FTOL = 1e-4  # explicit at poismf.c:388
TNC_ETA = 0.25  # CG forcing / line-search eta
LS_RMU = 1e-4  # sufficient-decrease mu (tnc.c linearSearch:1734 rmu)
LS_EXTRAP = 4.0  # bracket growth factor while no upper bound found
MAX_LS = 16  # per-row trial budget cap (evaluations, not rounds)
# line-search candidates per whole-batch round (POISMF_TNCG_LS_CAND):
# each round evaluates LS_CAND ray trials in ONE cached px/pd/vals
# stream (f_gtd_ray_multi kernels; marginal cost per extra candidate is
# in-register arithmetic only), so the max-over-rows round count — the
# LS tail's dominant cost — shrinks ~LS_CAND-fold in the bracketing
# phase.  1 = the sequential single-trial search (one
# cubic/extrapolation step per round).
LS_CAND_DEFAULT = 4

import os as _os


def _ls_cand_default() -> int:
    # read per call, not at import: harnesses set the env var after import
    return int(_os.environ.get("POISMF_TNCG_LS_CAND", str(LS_CAND_DEFAULT)))


def _bd_accum_default() -> bool:
    # POISMF_TNCG_BD_ACCUM=0 restores the hoisted bdot sweep everywhere
    # (A/B lever for the inner-CG <B,d> accumulation, ROADMAP #0)
    return _os.environ.get("POISMF_TNCG_BD_ACCUM", "1") != "0"
# NOTE on capping the per-row LS trial budget: tried and REJECTED.  Some
# rows grind the bracket for 10+ rounds because the replicated reference
# inconsistency (l2-less f, l2-full gradient — see objective.poisson_fgh)
# parks their strong-Wolfe band edge on their slope curve's asymptote,
# and capping them at their best-decrease point looked getptc-faithful —
# but every cap variant (8 total trials, 6 or 10 bracketed rounds, with
# or without a hold-a-decrease guard) degraded the l1-heavy golden-parity
# configs by >1% regularized objective: under l1 the late bracket rounds
# find materially better points.  The cubic step + dead-bracket
# termination below keep the reference's search depth at ~25% fewer
# whole-batch rounds instead.


def _maxcgit(k: int) -> int:
    # maxCGit = clamp(k/2, 1, 50)  (poismf.c:342)
    return int(min(50.0, max(1.0, k / 2.0)))


def _tncg_core(
    x0: jnp.ndarray,
    has_nnz: jnp.ndarray,
    n_rows: int,
    fgh: Callable,  # x -> (f [R], g [R,k], w2 (opaque), diag [R,k], px)
    f_gtd_ray_multi: Callable,  # (alphas [C,R], coef, px, bd) ->
    # (f [C,R], g(trial).d [C,R]) at C ray trials, one px/pd/vals stream
    hvp_with: Callable,  # (w2, fixed_mask) -> (V -> HV)
    bdot: Callable,  # d -> cached <B, d> prediction-direction factors
    ray_coef_fn: Callable,  # (x, d) -> per-row quadratic coef (ray_coef)
    *,
    maxupd: int,
    max_outer,  # scalar (may be traced): outer-iteration cap
    maxcg: int,
    x_prev_for_unchanged: Optional[jnp.ndarray],
    true_row_mask: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    ftol: float = TNC_FTOL,
    trial_frac: float = 1.0,  # sweep-fraction cost of one LS trial round
    fgh_weight: float = 1.0,  # sweep cost of one fgh eval (aux plane writes)
    bdot_weight: float = 1.0,  # sweep cost of the hoisted <B,d> pass
    ls_cand: int = LS_CAND_DEFAULT,  # ray trials per LS round
    nfeval0: Optional[jnp.ndarray] = None,  # [R] carried feval budget
    bd_fns: Optional[dict] = None,  # inner-CG <B,d> accumulation backend
    hvp_extra: float = 0.0,  # extra sweep fraction per HVP round (bd accum)
):
    """Backend-agnostic batched truncated-Newton driver (see module doc).

    ``max_outer`` may be a traced scalar so different outer-iteration caps
    (cascade round lengths, final unbounded rounds) share ONE compiled
    program; the unchanged-rows share is always computed (its cost is one
    [R, k] diff pass, invisible next to the solve).

    The line search is RAY-BASED with multi-candidate rounds: every step
    is capped at ``spe`` — the distance to the nearest bound along d —
    exactly as the reference caps getptc at stepMax (tnc.c:795, xbnd at
    tnc.c:1861-1864), so the trial point is exactly ``x + alpha*d`` and
    its predictions are the linear combination ``px + alpha*pd`` of
    planes cached by ``fgh``/``bdot``; each round evaluates ``ls_cand``
    candidates in ONE px/pd/vals stream (``f_gtd_ray_multi``, a small
    fraction of a full plane sweep).  A step accepted AT the cap is the
    reference's newcon case (tnc.c:833-835): the zeroed coordinate is
    pivoted onto the bound and picked up by the next iteration's
    active-set logic — ONE new zero per outer iteration, exactly the
    reference's constraint-activation rate.  A PROJECTED-trial variant
    (max(0, x + alpha*d), unbounded extrapolation, many coordinates
    zeroed per accepted step) was tried in round 3.5 and REVERTED: it
    measured ~2.5x faster end-to-end (25%-scale tncg 11.5 s vs 28.5 s)
    and slightly better final train LL, but its trajectory leaves the
    reference's face-by-face path entirely — at the 25%-scale quality
    harness B-sparsity collapsed 0.956 -> 0.41 and P@5 0.20 -> 0.08
    (QUALITY_r04 first cut) while the ray variant matches the reference
    (0.947 / 0.198).  The headline >90%-exact-zeros regime IS the
    product contract (/root/reference/README.md:28); the speed lever is
    packing candidates per round + the compaction cascade, not changing
    the search geometry.  Rounds are max-over-rows, so folding
    candidates into one stream is the lever on the LS tail: unbracketed
    rows probe the spe-clamped extrapolation ladder
    min(alpha*EXTRAP^{0..C-1}, spe), bracketed rows probe the
    safeguarded-cubic point plus even bracket subdivisions, and the
    per-row fold processes candidates in ascending order with exactly
    the sequential search's classification (Wolfe/newcon accept,
    too-far shrinks hi, too-short raises lo), so ls_cand=1 reproduces
    the sequential search."""
    R, k = x0.shape
    dtype = x0.dtype

    eps_f = float(_np.finfo(_np.dtype(str(dtype))).eps)
    rteps = float(_np.sqrt(eps_f))
    pgtol = 1e-2 * (rteps ** 0.5)  # tnc.c:431-433 with accuracy=rteps
    xtol = rteps

    f0, g0, w20, diag0, px0 = fgh(x0)
    # nfeval0 threads the per-row feval budget ACROSS cascade rounds: the
    # reference's maxnfeval is a per-HALF-UPDATE budget (tnc.c:436-440,
    # charged once per f/g eval incl. CG's HVPs and every LS trial), so a
    # round that starts fresh at 1 hands rows up to MAX_ROUNDS x the
    # reference's budget — cheap capped bulk rounds under-consume it and
    # the final unbounded rounds then grind ~2-3x the outer iterations the
    # reference would allow.  Each round charges its own init fgh (+1),
    # and a row whose carried budget is already spent never re-activates.
    nfe_init = (
        jnp.ones((R,), dtype=jnp.int32)
        if nfeval0 is None
        else nfeval0.astype(jnp.int32) + 1
    )
    active0 = has_nnz & jnp.isfinite(f0)
    if active_mask is not None:
        active0 = active0 & active_mask
    if nfeval0 is not None:
        active0 = active0 & (nfe_init < maxupd)
    state0 = dict(
        x=x0,
        f=f0,
        g=g0,
        w2=w20,
        diag=diag0,
        px=px0,
        nfeval=nfe_init,
        active=active0,
        it=jnp.zeros((), dtype=jnp.int32),
        # GLOBAL count of full plane/edge sweeps (every batched evaluation
        # reads the whole data structure regardless of per-row activity) —
        # the basis for the benchmark's achieved-bandwidth accounting.
        # Init fgh (incl. its aux plane writes).
        passes=jnp.full((), fgh_weight, dtype=jnp.float32),
        # whole-batch LS trial rounds / inner-CG HVP rounds (diagnostics:
        # the LS tail is max-over-rows, so its round count is the lever
        # the interpolation rule controls)
        ls_rounds=jnp.zeros((), dtype=jnp.int32),
        hvp_rounds=jnp.zeros((), dtype=jnp.int32),
        dbg_search=jnp.zeros((MAX_LS,), dtype=jnp.int32),
        dbg_brack=jnp.zeros((MAX_LS,), dtype=jnp.int32),
        # rows whose CG direction was altered AFTER the inner loop (cone
        # projection / steepest-descent fallback) — the rows for which an
        # inner-CG-accumulated <B,d> plane would be invalid (ROADMAP #0)
        clip_rows=jnp.zeros((), dtype=jnp.int32),
        fb_rows=jnp.zeros((), dtype=jnp.int32),
    )

    def cond(s):
        return (s["it"] < max_outer) & jnp.any(s["active"])

    def body(s):
        x, f, g, active = s["x"], s["f"], s["g"], s["active"]

        # --- active set & projected gradient ---
        fixed = (x <= 0.0) & (g > 0.0)
        pgrad = jnp.where(fixed, 0.0, g)
        pgnorm = jnp.sqrt(jnp.sum(pgrad * pgrad, axis=1))
        # |pg| test on the x-scaled gradient, absolute threshold: tnc.c
        # compares dnrm21(g_scaled) <= pgtol * fscale where g_scaled carries
        # xscale=(1+|x|) and the fscale factors cancel (tnc.c:700,383-399)
        pg_scaled = pgrad * (1.0 + jnp.abs(x))
        pgnorm_sc = jnp.sqrt(jnp.sum(pg_scaled * pg_scaled, axis=1))
        conv_pg = pgnorm_sc <= pgtol
        active = active & ~conv_pg

        inv_diag = 1.0 / jnp.maximum(s["diag"], 1e-12)
        track_bd = bd_fns is not None
        if track_bd:
            hvp_bv_raw = bd_fns["hvp_bv_with"](s["w2"])

            def hvp_bv(V):
                Vm = jnp.where(fixed, 0.0, V)
                HV, bv = hvp_bv_raw(Vm)
                return jnp.where(fixed, 0.0, HV), bv
        else:
            hvp_raw = hvp_with(s["w2"])

            def hvp(V):
                Vm = jnp.where(fixed, 0.0, V)
                return jnp.where(fixed, 0.0, hvp_raw(Vm))

        # --- inner preconditioned CG for  H d = -g  on free coordinates ---
        r = pgrad
        z = jnp.where(fixed, 0.0, inv_diag * r)
        p = -z
        rz = jnp.sum(r * z, axis=1)
        r0norm = jnp.sum(r * r, axis=1)
        d0 = jnp.zeros_like(x)

        cg0 = dict(
            d=d0, r=r, z=z, p=p, rz=rz,
            run=active & (r0norm > 0.0),
            hvps=jnp.zeros((R,), dtype=jnp.int32),
            i=jnp.zeros((), dtype=jnp.int32),
        )
        if track_bd:
            cg0["bd"] = bd_fns["zeros"]()

        def cg_cond(t):
            # stop as soon as every row's CG hit its forcing tolerance
            return (t["i"] < maxcg) & jnp.any(t["run"])

        def cg_body(t):
            i = t["i"]
            if track_bd:
                Hp, bv = hvp_bv(t["p"])
            else:
                Hp = hvp(t["p"])
            pHp = jnp.sum(t["p"] * Hp, axis=1)
            pp = jnp.sum(t["p"] * t["p"], axis=1)
            # negative / tiny / non-finite curvature -> truncate (use
            # current d; if the first iteration, fall back to the
            # preconditioned direction)
            curv_ok = (
                pHp > 1e-12 * jnp.maximum(pp, 1e-30)
            ) & jnp.isfinite(pHp)
            first = i == 0
            d_fb = jnp.where(
                (~curv_ok & t["run"] & first)[:, None], t["p"], t["d"]
            )
            alpha = jnp.where(
                curv_ok, t["rz"] / jnp.where(curv_ok, pHp, 1.0), 0.0
            )
            step_mask = (t["run"] & curv_ok)[:, None]
            d_new = jnp.where(step_mask, t["d"] + alpha[:, None] * t["p"], d_fb)
            r_new = jnp.where(step_mask, t["r"] + alpha[:, None] * Hp, t["r"])
            z_new = jnp.where(fixed, 0.0, inv_diag * r_new)
            rz_new = jnp.sum(r_new * z_new, axis=1)
            beta = rz_new / jnp.where(t["rz"] > 0, t["rz"], 1.0)
            p_new = jnp.where(
                step_mask, -z_new + beta[:, None] * t["p"], t["p"]
            )
            rnorm = jnp.sum(r_new * r_new, axis=1)
            still = t["run"] & curv_ok & (rnorm > (TNC_ETA ** 2) * r0norm)
            hvps = t["hvps"] + t["run"].astype(jnp.int32)
            out = dict(d=d_new, r=r_new, z=z_new, p=p_new, rz=rz_new,
                       run=still, hvps=hvps, i=i + 1)
            if track_bd:
                # pd accumulation: d_new - d_old = m * p with m = alpha on
                # a curvature step, 1 on the first-iteration truncation
                # fallback (d := p), 0 otherwise — so bd tracks <B, d>
                # EXACTLY (modulo summation order) at 16 B/slot per HVP
                # instead of a standalone full-plane bdot sweep
                m = jnp.where(
                    t["run"] & curv_ok, alpha,
                    jnp.where(t["run"] & ~curv_ok & first, 1.0, 0.0),
                )
                out["bd"] = bd_fns["axpy"](t["bd"], m, bv)
            return out

        if track_bd:
            # Unroll iteration 0 so the (d1, bd1) first-iteration snapshot
            # needs no per-iteration plane select inside the loop.  d1 =
            # alpha_0 * p_0 (or p_0 on the truncation fallback) NEVER
            # violates the feasible cone: on a bound coordinate either
            # g > 0 (in ``fixed``, so p_0 = 0) or g <= 0 (p_0 =
            # -inv_diag * g >= 0) — the safe replacement direction for
            # rows whose final CG direction must be discarded below.
            cg1 = cg_body(cg0)
            d1 = cg1["d"]
            bd1 = cg1["bd"]
            cg = lax.while_loop(cg_cond, cg_body, cg1)
        else:
            cg = lax.while_loop(cg_cond, cg_body, cg0)

        if track_bd:
            # The reference pivots bound-violating coordinates via
            # addConstraint (tnc.c:1072-1108); the batched equivalent used
            # to zero them post-CG ("cone projection"), which would
            # invalidate the accumulated <B, d> plane.  Instead, rows whose
            # full CG direction leaves the cone (or came out as junk /
            # ascent) REVERT to their first-iteration direction d1 — a
            # guaranteed-feasible strict-descent truncation whose bd1 plane
            # is already accumulated, so no correction pass of any kind.
            d_cg = jnp.where(fixed, 0.0, cg["d"])
            viol = jnp.any((x <= 0.0) & (d_cg < 0.0), axis=1)
            gtd_cg = jnp.sum(g * d_cg, axis=1)
            dn_cg = jnp.sum(d_cg * d_cg, axis=1)
            bad = (~jnp.isfinite(gtd_cg)) | (gtd_cg >= 0.0) | (dn_cg <= 0.0)
            use_d1 = (viol | bad) & active
            clipped = viol
            d = jnp.where(use_d1[:, None], d1, d_cg)
            bd = bd_fns["select"](use_d1, bd1, cg["bd"])
            gtd = jnp.sum(g * d, axis=1)
            dnorm = jnp.sum(d * d, axis=1)
            # rows whose d1 is ALSO degenerate (pgrad ~ 0 or non-finite
            # curvature data): no valid search direction — skip their line
            # search; they terminate as LSFAIL exactly like a zero
            # steepest-descent direction would
            dead_dir = (~jnp.isfinite(gtd)) | (gtd >= 0.0) | (dnorm <= 0.0)
            bad = bad | dead_dir
            d = jnp.where(dead_dir[:, None], 0.0, d)
            gtd = jnp.where(dead_dir, 0.0, gtd)
            dnorm = jnp.where(dead_dir, 0.0, dnorm)
            search_mask = active & ~dead_dir
        else:
            d = jnp.where(fixed, 0.0, cg["d"])
            # Project the direction into the feasible cone: a coordinate AT
            # the bound whose Newton component points outward cannot move
            # (the reference pivots it via addConstraint, tnc.c:1072-1108).
            # Without this, spe=0 collapses the step cap, trials clip that
            # coordinate, and the measured directional derivative g(trial)@d
            # (which uses the UNPROJECTED d) makes the strong-Wolfe test
            # unsatisfiable -> bogus LSFAIL with a large gradient (found via
            # the factors_single golden parity test: rows stopped at obj
            # 120.67 vs the true optimum 119.13).
            clipped = jnp.any((x <= 0.0) & (d < 0.0), axis=1)
            d = jnp.where((x <= 0.0) & (d < 0.0), 0.0, d)

            # fall back to steepest descent if CG returned junk or ascent
            gtd = jnp.sum(g * d, axis=1)
            dnorm = jnp.sum(d * d, axis=1)
            bad = (~jnp.isfinite(gtd)) | (gtd >= 0.0) | (dnorm <= 0.0)
            d = jnp.where(bad[:, None], -pgrad, d)
            gtd = jnp.where(bad, -pgnorm * pgnorm, gtd)
            search_mask = active

        nfeval = s["nfeval"] + cg["hvps"]

        # --- derivative-informed line search (tnc.c linearSearch/getptc) ---
        # Acceptance is getptc-style: sufficient decrease on f (rmu=1e-4,
        # tnc.c:1734) plus the one-sided curvature condition
        # g(trial).d >= eta * g(x).d (eta=0.25).  Every step is capped at
        # ``spe`` — the distance to the nearest bound along d — exactly as
        # the reference caps getptc at stepMax (tnc.c:795, xbnd at
        # tnc.c:1861-1864); a step accepted AT the cap is the reference's
        # newcon case (tnc.c:833-835, the new constraint is picked up by
        # the next iteration's active-set logic).  Under the cap the trial
        # is exactly x + alpha*d, so each round's candidates get f AND the
        # directional derivative from the cached prediction planes
        # (f_gtd_ray_multi) at a fraction of a data sweep; only bdot's
        # <B,d> pass reads the full planes.
        # The initial step mirrors initialStep (tnc.c:1371-1382) with the
        # fmin=0 the reference passes (poismf.c:387): alpha0 = 2f/|g.d| when
        # f > 0, capped at the distance to the nearest bound along d.
        dginit = gtd
        spe = jnp.min(
            jnp.where(d < 0.0, x / jnp.maximum(-d, 1e-30), jnp.inf), axis=1
        )
        a0 = jnp.where(
            f > 0.0, -2.0 * f / jnp.minimum(dginit, -1e-30),
            jnp.ones((R,), dtype=dtype),
        )
        a0 = jnp.minimum(a0, spe)
        a0 = jnp.where(jnp.isfinite(a0) & (a0 > 0.0), a0, 1.0)
        if not track_bd:
            bd = bdot(d)
        coef = ray_coef_fn(x, d)
        px = s["px"]

        # getptc's own collapse tolerances (linearSearch, tnc.c:1714-1722):
        # RELATIVE to the step scale — reltol = rteps*(||x||+1)/||p||,
        # abstol = eps*(1+|f|)/|g.d|, smallest allowed spacing
        # tnytol = eps*(||x||+1)/||p||.  In f32 rteps = 3.5e-4, so a
        # grinding bracket collapses after ~4-5 4x folds; the previous
        # 16*eps*(1+|f|)/slope rule was ~1e-6-relative and made EVERY
        # outer iteration pay ~9.5 whole-batch LS rounds (the max over
        # rows; measured at bench scale) — systematically ~2x deeper than
        # the reference's own search.
        xnorm = jnp.sqrt(jnp.sum(x * x, axis=1))
        pnorm = jnp.sqrt(dnorm) + eps_f
        reltol0 = rteps * (xnorm + 1.0) / pnorm
        abstol0 = eps_f * (1.0 + jnp.abs(f)) / (
            jnp.abs(dginit) + eps_f
        )
        tnytol = eps_f * (xnorm + 1.0) / pnorm

        C = int(ls_cand)
        # whole-batch LS round cap: MAX_LS rounds regardless of C — the
        # budget unit is the ROUND (nfe counts 1 per round, matching the
        # sequential search's per-trial accounting in rounds), and the
        # while_loop exits as soon as no row searches, so a generous cap
        # costs nothing for the common fast-accept case.  A tight cap
        # (ceil(MAX_LS/C)) was tried and REJECTED: rows that grind the
        # bracket (the l2-less-f/l2-full-g inconsistency parks their
        # Wolfe band on a slope asymptote) fell to scattered best-decrease
        # points, the two layouts drifted 4.7% apart in final LL on the
        # 150x60 parity fit, and the endpoint got ulp-sensitive; at the
        # full cap the layouts agree to 0.13% and C=4 still uses 1.8x
        # fewer rounds than C=1 (44 vs 80 on that fit) because most rows
        # accept within 1-2 folded rounds.
        max_ls_rounds = MAX_LS

        ls0 = dict(
            alpha=a0.astype(dtype),
            lo=jnp.zeros((R,), dtype=dtype),
            hi=jnp.full((R,), jnp.inf, dtype=dtype),
            # (f, g.d) at the bracket ends, for the cubic interpolation
            # step (getptc's scheme, tnc.c:1890-2154): lo starts at
            # alpha=0 where both are known exactly
            f_lo=f,
            g_lo=dginit,
            f_hi=jnp.full((R,), jnp.inf, dtype=dtype),
            g_hi=jnp.zeros((R,), dtype=dtype),
            found=jnp.zeros((R,), dtype=bool),
            # accepted / best-decrease STEPS, not points: every trial is
            # determined by its alpha, so the [R, k] points are
            # reconstructed once after the loop (getptc keeps the lowest
            # f seen as its fmin; if the bracket collapses without a
            # Wolfe point, that best point is returned as long as it
            # decreased f, tnc.c:1785-1789)
            a_new=jnp.zeros((R,), dtype=dtype),
            f_new=f,
            a_best=jnp.zeros((R,), dtype=dtype),
            f_best=f,
            reltol=reltol0.astype(dtype),
            abstol=abstol0.astype(dtype),
            searching=search_mask,
            nfeval=nfeval,
            t=jnp.zeros((), dtype=jnp.int32),
            # diagnostics: rows still searching / bracketed at each LS
            # round of the LAST outer iteration (tiny [MAX_LS] ints —
            # exposes where the max-over-rows LS tail comes from)
            dbg_search=jnp.zeros((MAX_LS,), dtype=jnp.int32),
            dbg_brack=jnp.zeros((MAX_LS,), dtype=jnp.int32),
        )

        def ls_cond(t):
            return (t["t"] < max_ls_rounds) & jnp.any(t["searching"])

        def ls_body(t):
            lo, hi = t["lo"], t["hi"]
            f_lo, g_lo = t["f_lo"], t["g_lo"]
            f_hi, g_hi = t["f_hi"], t["g_hi"]
            has_hi = jnp.isfinite(hi)
            span = hi - lo
            # --- candidate construction ---
            # Bracketed rows: a SAFEGUARDED CUBIC step — the Hermite
            # minimizer through (lo, f_lo, g_lo), (hi, f_hi, g_hi), the
            # same family as getptc's interpolation (tnc.c:1890-2154) —
            # clipped away from the bracket ends (0.1 safeguard: >= 10%
            # shrink even when the cubic stalls), bisection when the
            # cubic is undefined (poisoned f_hi from an inf trial,
            # negative radicand, degenerate denominator); plus C-1 even
            # bracket subdivisions, so the folded bracket shrinks >= C-fold
            # per round.  A bisection-only search was tried at the end of
            # round 3 and REVERTED: on the small-scale layout-parity fit
            # (150x60, niter=4, maxupd=100) it lands an 18% worse
            # objective (-5873/-6078 vs -4961 for both layouts with the
            # cubic) — linear bracket convergence burns the maxupd
            # budget on mediocre points.
            d1 = g_lo + g_hi + 3.0 * (f_lo - f_hi) / jnp.maximum(
                span, 1e-30
            )
            rad = d1 * d1 - g_lo * g_hi
            d2 = jnp.sqrt(jnp.maximum(rad, 0.0))
            denom = g_hi - g_lo + 2.0 * d2
            a_cubic = hi - span * (g_hi + d2 - d1) / denom
            cubic_ok = (
                has_hi
                & jnp.isfinite(f_hi)
                & (rad >= 0.0)
                & (jnp.abs(denom) > 1e-30)
                & jnp.isfinite(a_cubic)
            )
            a_brack = jnp.where(
                cubic_ok,
                jnp.clip(a_cubic, lo + 0.1 * span, hi - 0.1 * span),
                0.5 * (lo + hi),
            )
            if C == 1:
                cands_brack = a_brack[None]
                cands_ladder = jnp.minimum(t["alpha"], spe)[None]
            else:
                # processing order: the SEQUENTIAL search's own candidate
                # first (the safeguarded cubic), then even subdivisions in
                # ascending order — acceptance is first-ok in this order,
                # so a round where the cubic satisfies Wolfe accepts the
                # exact point the sequential search would have
                cands_brack = jnp.stack(
                    [a_brack]
                    + [lo + span * ((j + 1.0) / C) for j in range(C - 1)]
                )
                # POISONED bracket (f_hi = inf/nan: the "upper end" is an
                # infeasibility cap from an overshooting trial, not a real
                # getptc bracket): even subdivisions shrink such spans only
                # C-fold per round, and a trial whose alpha0 overshot by
                # 1e5x ground ~log4(1e5) = 8+ whole-batch rounds before any
                # candidate went finite (the measured ~9.6 LS rounds per
                # outer iteration at bench scale — the single largest wall
                # item of the tncg fit).  Probe a DESCENDING GEOMETRIC
                # ladder hi/4^(j+1) instead: an all-poisoned round then
                # folds the cap 4^C-fold, and the first finite too-short
                # candidate re-establishes a true bracket for the cubic to
                # resume on.  The c==0-only acceptance gate still applies
                # — c0 here plays the sequential search's own
                # (bisection-fallback) candidate, placed geometrically.
                # (guard: once lo >= hi/4 every geometric rung falls at or
                # below lo — unusable — and the round would stall; the even
                # subdivisions handle such tight poisoned spans fine)
                poisoned = (
                    has_hi & ~jnp.isfinite(f_hi) & (0.25 * hi > lo)
                )
                geo = jnp.stack(
                    [hi * (0.25 ** (j + 1.0)) for j in range(C)]
                )
                cands_brack = jnp.where(
                    poisoned[None, :], geo, cands_brack
                )
                # unbracketed rows probe the extrapolation ladder CLAMPED
                # at spe (the reference's stepMax): rungs past the clamp
                # collapse onto spe and the per-row fold skips the
                # duplicates (a_c < hi fails once the first cap trial set
                # hi = spe), so the cap trial is evaluated exactly once
                cands_ladder = jnp.stack(
                    [jnp.minimum(t["alpha"] * (LS_EXTRAP ** j), spe)
                     for j in range(C)]
                )
            cands = jnp.where(has_hi[None, :], cands_brack, cands_ladder)

            f_c, gu_c = f_gtd_ray_multi(cands, coef, px, bd)

            # --- per-row fold, candidates in processing order ---
            # Exactly the sequential search's classification per
            # candidate: Wolfe accept (sufficient decrease + two-sided
            # curvature), no-decrease/overshoot shrinks hi, short-step
            # raises lo.  A candidate only counts while it lies strictly
            # inside the bracket as folded SO FAR (once some candidate
            # sets an end, candidates outside it are stale) and while the
            # row's nfeval budget allows another evaluation.  Acceptance
            # is FIRST-ok in processing order — the sequential search's
            # own candidate leads, so whenever it satisfies Wolfe the
            # accepted point is the one the sequential search would have
            # taken (a lowest-f-among-ok rule was tried first and
            # REJECTED: under the reference's l2-less f / l2-full g
            # inconsistency, bigger steps keep lowering f, so min-f
            # systematically accepted the extrapolation ladder's top rung
            # and drifted ~40% off the reference trajectory on the
            # reuse_prev=False parity config).
            acc = jnp.zeros((R,), dtype=bool)
            a_acc = jnp.zeros((R,), dtype=dtype)
            f_acc = jnp.full((R,), jnp.inf, dtype=dtype)
            a_best, f_best = t["a_best"], t["f_best"]
            nfe = t["nfeval"]
            searching0 = t["searching"]
            has_hi0 = has_hi  # bracketed at round START (candidate basis)
            for c in range(C):
                a_c, f_tc, gu_tc = cands[c], f_c[c], gu_c[c]
                usable = (
                    searching0 & ~acc & (a_c > lo) & (a_c < hi)
                    & (nfe < maxupd)
                )
                nfe = nfe + usable.astype(jnp.int32)
                suff = jnp.isfinite(f_tc) & (
                    f_tc <= f + LS_RMU * a_c * dginit
                )
                # strong-Wolfe curvature: |g(trial).d| <= eta |g(x).d| —
                # the trial brackets getptc's 1-D stationary point rather
                # than accepting arbitrary overshoot
                curv_lo = gu_tc >= TNC_ETA * dginit  # not steeply descending
                curv_hi = gu_tc <= -TNC_ETA * dginit  # not past the minimum
                wolfe = usable & suff & curv_lo & curv_hi
                # bound step at the cap with sufficient decrease and the
                # 1-D minimum still ahead: take it — the reference's
                # newcon case (tnc.c:833-835); the next outer iteration's
                # active-set logic pivots the zeroed coordinate
                at_cap = a_c >= spe * (1.0 - 1e-6)
                newcon = usable & suff & at_cap & ~curv_lo
                # bracketed rows accept ONLY at the cubic candidate (c=0):
                # the subdivision candidates exist to FOLD the bracket
                # (>= C-fold shrink per round), not to be endpoints —
                # accepting at arbitrary subdivisions drifted 6-12% off
                # the reference trajectory on the reuse_prev=False parity
                # config, while cubic-only endpoints keep every accepted
                # point in the same Hermite-minimizer family as getptc's
                ok = wolfe & ((~has_hi0) | (c == 0)) if C > 1 else wolfe
                ok = ok | newcon
                # budget accounting is per EVALUATED TRIAL, the
                # reference's maxnfeval semantics (getptc charges every
                # function call against maxnfeval, tnc.c:1750-1772):
                # each usable candidate in the round counts one feval,
                # and candidates after an acceptance are not usable so
                # they don't count.  A per-ROUND accounting (1 feval per
                # C-candidate round) was tried and REVERTED: it hands
                # every row ~C x the reference's trial budget, and the
                # >90%-sparse item side — whose rows activate ONE bound
                # per outer iteration by design (the ray/newcon rate) —
                # then grinds ~2x the outer iterations the reference's
                # budget would allow before termination (25%-scale warm
                # fit 54.9 s vs the sequential ray's ~28 s; quality flat)
                take = ok & ~acc  # first-ok in processing order
                a_acc = jnp.where(take, a_c, a_acc)
                f_acc = jnp.where(take, f_tc, f_acc)
                acc = acc | ok
                better = usable & jnp.isfinite(f_tc) & (f_tc < f_best)
                a_best = jnp.where(better, a_c, a_best)
                f_best = jnp.where(better, f_tc, f_best)
                # bracket: no sufficient decrease or overshot the
                # stationary point -> too far (shrink); decrease but
                # derivative still steep -> too short (raise lo)
                to_hi = usable & ~ok & (~suff | ~curv_hi)
                to_lo = usable & ~ok & suff & ~curv_lo & curv_hi
                hi = jnp.where(to_hi, a_c, hi)
                f_hi = jnp.where(to_hi, f_tc, f_hi)
                g_hi = jnp.where(to_hi, gu_tc, g_hi)
                lo = jnp.where(to_lo, a_c, lo)
                f_lo = jnp.where(to_lo, f_tc, f_lo)
                g_lo = jnp.where(to_lo, gu_tc, g_lo)

            a_new = jnp.where(acc, a_acc, t["a_new"])
            f_new = jnp.where(acc, f_acc, t["f_new"])
            searching = searching0 & ~acc & (nfe < maxupd)
            has_hi = jnp.isfinite(hi)
            # getptc's convergence check (tnc.c:1968-1997), batched: the
            # bracket has collapsed to within twice the tolerance
            # tol = reltol*xmin + abstol.  A collapsed row that FOUND a
            # decrease terminates at its best point (GETPTC_OK with
            # xmin != 0 — our existing best-decrease fallback); a
            # collapsed row with NO decrease fails outright when the
            # evaluated trials are flat to within fpresn = ftol
            # (GETPTC_FAIL), else shrinks its tolerances 10x and keeps
            # searching, failing when tol would drop under tnytol —
            # exactly the reference's shrink-and-retry ladder.
            reltol_t, abstol_t = t["reltol"], t["abstol"]
            tol = reltol_t * lo + abstol_t
            collapse = has_hi & ((hi - lo) <= 2.0 * tol)
            improved = f_best < f
            fw_gap = jnp.where(
                jnp.isfinite(f_hi), jnp.abs(f - f_hi), jnp.inf
            )
            dead_ok = collapse & improved
            shrinkable = collapse & ~improved
            dead_fail = shrinkable & (fw_gap <= ftol)
            cont = shrinkable & ~dead_fail
            too_tiny = 0.1 * tol < tnytol
            dead_fail = dead_fail | (cont & too_tiny)
            cont = cont & ~too_tiny
            reltol_t = jnp.where(cont, 0.1 * reltol_t, reltol_t)
            abstol_t = jnp.where(cont, 0.1 * abstol_t, abstol_t)
            searching = searching & ~(dead_ok | dead_fail)
            # unbracketed rows continue the ladder past its last rung
            # (clamped at spe — the cap trial is never exceeded)
            alpha = jnp.where(
                searching & ~has_hi,
                jnp.minimum(t["alpha"] * (LS_EXTRAP ** C), spe),
                t["alpha"],
            )
            return dict(alpha=alpha, lo=lo, hi=hi,
                        f_lo=f_lo, g_lo=g_lo, f_hi=f_hi, g_hi=g_hi,
                        found=t["found"] | acc,
                        a_new=a_new, f_new=f_new, a_best=a_best,
                        f_best=f_best, searching=searching,
                        reltol=reltol_t, abstol=abstol_t,
                        # dtype-pinned sums: under a jax_enable_x64 scope a
                        # plain int32 sum promotes to int64 (NumPy
                        # semantics) and the scatter into the int32 debug
                        # arrays would warn (error in future jax)
                        dbg_search=t["dbg_search"].at[t["t"]].set(
                            jnp.sum(t["searching"], dtype=jnp.int32)),
                        dbg_brack=t["dbg_brack"].at[t["t"]].set(jnp.sum(
                            t["searching"] & jnp.isfinite(t["hi"]),
                            dtype=jnp.int32)),
                        nfeval=nfe, t=t["t"] + 1)

        ls = lax.while_loop(ls_cond, ls_body, ls0)

        # Wolfe/newcon point if found, else the best simple-decrease point;
        # LSFAIL only when no trial decreased f at all.  Points are
        # reconstructed from their steps; alpha <= spe so the max(0, .)
        # only cleans rounding residue.
        fallback = active & ~ls["found"] & (ls["f_best"] < f)
        moved = ls["found"] | fallback
        a_sel = jnp.where(ls["found"], ls["a_new"], ls["a_best"])
        x_sel = jnp.maximum(x + a_sel[:, None] * d, 0.0)
        x_next = jnp.where(moved[:, None], x_sel, x)
        # addConstraint analog (tnc.c:1076-1084): a coordinate that moved
        # toward the bound and landed within 10*eps*(1+|x|) of it is
        # pivoted EXACTLY onto the bound.  Without this, a bound step
        # accepted at spe leaves rounding residue (~eps*x) that keeps the
        # coordinate "free": the next direction pushes it negative again,
        # spe collapses to ~residue/|d|, and the microscopic step trips
        # conv_x — rows terminate far short of the optimum (caught by the
        # factors_single golden parity test).  Snapping flips the face,
        # which also skips the convergence tests this iteration (the
        # reference's newcon guard, tnc.c:906-907, via same_face below).
        snap_tol = 10.0 * eps_f * (1.0 + jnp.abs(x))
        x_next = jnp.where(
            moved[:, None] & (d < 0.0) & (x_next <= snap_tol), 0.0, x_next
        )
        f_next = jnp.where(
            ls["found"], ls["f_new"], jnp.where(fallback, ls["f_best"], f)
        )

        # --- convergence tests (tnc.c:909-929) ---
        # ftol is ABSOLUTE: tnc.c tests |difnew| <= ftol * fscale in
        # f-rescaled units, and the fscale factors cancel out.  Convergence
        # tests are skipped on iterations where the bound-activity pattern
        # changed (newcon/remcon guard, tnc.c:906-907) so a row that just
        # hit or left a constraint keeps iterating on its new face.
        # ftol=0 disables the f-test: the reference's f-rescaling machinery
        # (tnc.c:720-746, fscale ~ 1/|g|) makes its effective ftol TIGHTEN
        # toward zero as the gradient shrinks, so deep solves (cold-start
        # factors, maxupd~1000) converge further than an absolute 1e-4
        # would allow; serving paths pass 0 to match that depth
        difnew = f - f_next
        step_sq = jnp.sum((x_next - x) ** 2, axis=1)
        same_face = jnp.all((x_next <= 0.0) == (x <= 0.0), axis=1)
        conv_f = moved & same_face & (jnp.abs(difnew) <= ftol)
        conv_x = moved & same_face & (jnp.sqrt(step_sq) <= xtol)
        ls_fail = active & ~moved  # LSFAIL -> terminate row
        budget = ls["nfeval"] >= maxupd

        active_next = active & ~conv_f & ~conv_x & ~ls_fail & ~budget

        # f/g/Hessian data + prediction planes at the accepted point, all
        # in one fused pass (+1 eval for rows that moved)
        _, g_next, w2_next, diag_next, px_next = fgh(x_next)
        nfe = ls["nfeval"] + moved.astype(jnp.int32)

        # sweeps this outer iteration: one per inner-CG HVP, bdot_weight
        # for the hoisted <B,d> (0 when f_gtd fuses it), trial_frac per
        # line-search trial, and fgh_weight for the f/g/Hessian refresh at
        # the accepted point
        passes = (
            s["passes"] + cg["i"].astype(jnp.float32) * (1.0 + hvp_extra)
            + ls["t"].astype(jnp.float32) * trial_frac
            + bdot_weight + fgh_weight
        )

        return dict(
            x=x_next,
            f=f_next,
            g=g_next,
            w2=w2_next,
            diag=diag_next,
            px=px_next,
            nfeval=nfe,
            active=active_next,
            ls_rounds=s["ls_rounds"] + ls["t"],
            hvp_rounds=s["hvp_rounds"] + cg["i"],
            dbg_search=ls["dbg_search"],
            dbg_brack=ls["dbg_brack"],
            clip_rows=s["clip_rows"]
            + jnp.sum(active & clipped, dtype=jnp.int32),
            fb_rows=s["fb_rows"] + jnp.sum(active & bad, dtype=jnp.int32),
            it=s["it"] + 1,
            passes=passes,
        )

    out = lax.while_loop(cond, body, state0)
    x_final = out["x"]

    # >= 95% of TRUE rows moved by <= 1e-4 (squared L2), poismf.c:393-403.
    # The reference only counts processed rows (nnz > 0) as unchanged and
    # divides by dimA; mirror that (padding rows excluded entirely).
    true_row = (
        jnp.arange(R) < n_rows if true_row_mask is None else true_row_mask
    )
    delta = x_final - x_prev_for_unchanged
    small = (delta * delta).sum(axis=1) <= 1e-4
    unchanged = jnp.sum(small & has_nnz & true_row)
    # n_rows may be a traced scalar (compact cascade solves reuse one
    # program across rounds whose true-row count varies)
    share = unchanged.astype(jnp.float32) / jnp.maximum(
        jnp.asarray(n_rows, dtype=jnp.float32), 1.0
    )
    return x_final, share, out


# ---------------------------------------------------------------------------
# Flat sorted-COO entry point
# ---------------------------------------------------------------------------


def _effective_max_outer(max_outer: int, maxupd: int) -> int:
    return max_outer if max_outer > 0 else max(4, maxupd // 3)


def _stats_dict(out) -> dict:
    return dict(
        outer_iters=out["it"], nfeval=out["nfeval"],
        still_active=jnp.sum(out["active"]),
        active=out["active"],
        passes=out["passes"],
        ls_rounds=out["ls_rounds"],
        hvp_rounds=out["hvp_rounds"],
        dbg_search=out["dbg_search"],
        dbg_brack=out["dbg_brack"],
        clip_rows=out["clip_rows"],
        fb_rows=out["fb_rows"],
    )


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "w_mult", "nnz_chunk", "ftol", "l2_in_f",
                     "max_cg", "ls_cand"),
)
def _tncg_update_jit(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    reuse_prev: jnp.ndarray,  # traced bool scalar
    max_outer: jnp.ndarray,  # traced int32 scalar
    *,
    l2_reg: float,
    w_mult: float,
    maxupd: int,
    nnz_chunk: Optional[int],
    ftol: float = TNC_FTOL,
    l2_in_f: bool = False,
    max_cg: Optional[int] = None,
    ls_cand: int = LS_CAND_DEFAULT,
):
    """Jitted COO backend: ``reuse_prev`` and ``max_outer`` are traced
    scalars so every outer-cap / init combination shares ONE program (the
    compile-time attack; the reference has no analog — it recompiles
    nothing, but over the tunneled-TPU remote compiler each program variant
    costs tens of seconds).  ``max_cg`` overrides the reference inner-CG
    cap (see _tncg_update_ell_jit)."""
    R, k = A.shape
    maxcg = _maxcgit(k) if max_cg is None else max(1, int(max_cg))

    # l2_in_f=False (training default): the reference TNCG objective
    # calc_fun_and_grad omits the l2 penalty from f while keeping 2*l2*a in
    # g (poismf.c:242-273); the published tncg results depend on this weaker
    # effective regularization.  Deep SERVING solves pass l2_in_f=True: the
    # inconsistent pair makes the f-descent line search ill-posed (the
    # g-field's Newton direction can be an ascent direction for f), while
    # the consistent objective converges to the same optimum the reference
    # empirically reaches (verified against scipy in the serving-parity
    # tests).
    def fgh(Acur):
        return obj.poisson_fgh(Acur, B, X, Bsum, l2_reg, w_mult, nnz_chunk,
                               l2_in_f=l2_in_f)

    def f_gtd_ray_multi(alphas, coef, px, bd):
        return obj.poisson_f_gtd_ray_multi(alphas, coef, px, bd, X,
                                           l2_reg, w_mult, nnz_chunk,
                                           l2_in_f=l2_in_f)

    def bdot(d):
        return obj.poisson_bdot(d, B, X)

    def ray_coef_fn(xc, dc):
        return obj.ray_coef(xc, dc, Bsum)

    # sweep-cost fractions for the achieved-bandwidth accounting: a full
    # COO sweep streams rows+cols+vals (12 B/nnz) plus the k-vector B
    # gather; a ray trial round streams rows+vals+px+bd (16 B/nnz); bdot
    # is one full sweep plus the bd write
    full_b = 4.0 * k + 12.0
    trial_frac = 16.0 / full_b
    fgh_weight = 1.0 + 8.0 / full_b  # + w2 and px writes
    bdot_weight = 1.0 + 4.0 / full_b

    def hvp_with(w2):
        def hvp(V):
            return obj.poisson_hvp(V, B, X, w2, l2_reg, nnz_chunk)

        return hvp

    has_nnz = X.row_nnz > 0
    # init to 1e-3 unless warm-starting (poismf.c:379-381)
    x0 = jnp.where(
        has_nnz[:, None],
        jnp.where(reuse_prev, A, jnp.full_like(A, 1e-3)),
        0.0,
    )

    x_final, share, out = _tncg_core(
        x0, has_nnz, X.n_rows, fgh, f_gtd_ray_multi, hvp_with, bdot,
        ray_coef_fn,
        maxupd=maxupd, max_outer=max_outer, maxcg=maxcg,
        x_prev_for_unchanged=jnp.where(has_nnz[:, None], A, 0.0),
        ftol=ftol, trial_frac=trial_frac, fgh_weight=fgh_weight,
        bdot_weight=bdot_weight, ls_cand=ls_cand,
    )
    return x_final, share, _stats_dict(out)


def tncg_update(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    *,
    l2_reg: float,
    w_mult: float = 1.0,
    maxupd: int = 750,
    reuse_prev: bool = False,
    track_unchanged: bool = False,
    nnz_chunk: Optional[int] = None,
    max_outer: int = 0,
    return_stats: bool = False,
    ftol: float = TNC_FTOL,
    l2_in_f: bool = False,
    max_cg: Optional[int] = None,
    ls_cand: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One TNCG pass over every row of A (B fixed), flat-COO backend.

    Returns ``(A_new, share_unchanged)`` where ``share_unchanged`` is the
    fraction of true rows whose squared change is <= 1e-4 (for the
    early-stop rule).  ``track_unchanged`` is kept for API compatibility
    (the share is now always computed — it costs one [R, k] diff pass).
    ``ls_cand``: line-search candidates per whole-batch round (default
    ``POISMF_TNCG_LS_CAND`` or 4; 1 = sequential single-trial search).
    """
    del track_unchanged
    x_final, share, stats = _tncg_update_jit(
        A, B, X, Bsum,
        jnp.asarray(bool(reuse_prev)),
        jnp.asarray(_effective_max_outer(max_outer, maxupd), dtype=jnp.int32),
        l2_reg=l2_reg, w_mult=w_mult, maxupd=maxupd, nnz_chunk=nnz_chunk,
        ftol=ftol, l2_in_f=l2_in_f, max_cg=max_cg,
        ls_cand=max(1, int(ls_cand if ls_cand is not None
                           else _ls_cand_default())),
    )
    if return_stats:
        return x_final, share, stats
    return x_final, share


# ---------------------------------------------------------------------------
# Planar-ELL entry point (gather-free hot loop)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "w_mult", "ftol", "l2_in_f", "max_cg",
                     "ls_cand", "bd_accum"),
)
def _tncg_update_ell_jit(
    A_perm: jnp.ndarray,
    planes: Tuple[jnp.ndarray, ...],
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    reuse_prev: jnp.ndarray,  # traced bool scalar
    max_outer: jnp.ndarray,  # traced int32 scalar
    active_mask: jnp.ndarray,  # [n_rows_ell] bool (all-True = full solve)
    nfeval0: Optional[jnp.ndarray] = None,  # [n_rows_ell] carried budget
    *,
    l2_reg: float,
    w_mult: float,
    maxupd: int,
    ftol: float = TNC_FTOL,
    l2_in_f: bool = False,
    max_cg: Optional[int] = None,
    ls_cand: int = LS_CAND_DEFAULT,
    bd_accum: bool = True,
):
    """Jitted ELL backend — one compiled program per (ELL shape, maxupd,
    w_mult): init mode, outer cap and row subset are all traced, so the
    cascade's round-0 / continuation / final-unbounded calls and every
    early-stop epoch reuse the same executable (see _tncg_update_jit).

    ``max_cg`` overrides the reference's ``maxCGit = clamp(k/2, 1, 50)``
    inner-CG cap.  The batched CG loop continues while ANY row is above its
    forcing tolerance, so one straggler row makes every row pay a full
    plane sweep per extra iteration — measured on the bench workload the
    cap binds almost every outer iteration (~25 of the ~30 passes/outer).
    A tighter cap hands stragglers a more-truncated Newton direction (they
    stay active into later, 4-16x cheaper cascade rounds) and is closer in
    SPIRIT to the reference, where each row pays only its own CG cost
    (tnc_direction, tnc.c:1162-1341)."""
    R, k = A_perm.shape
    maxcg = _maxcgit(k) if max_cg is None else max(1, int(max_cg))

    # l2_in_f: calc_fun_and_grad parity for training, consistent objective
    # for deep serving solves (see _tncg_update_jit).  want_px=True: the
    # ray line search reads trial predictions px + alpha*pd straight off
    # the cached planes — each multi-candidate round streams only
    # px/pd/vals (~1/9 of a full plane sweep at k=50 bf16).
    def fgh(Acur):
        return ell_ops.fgh_ell(Acur, planes, ell, Bsum, l2_reg, w_mult,
                               l2_in_f=l2_in_f, want_px=True)

    def f_gtd_ray_multi(alphas, coef, pxs, bds):
        return ell_ops.f_gtd_ray_multi_ell(alphas, coef, pxs, bds, ell,
                                           l2_reg, w_mult, l2_in_f=l2_in_f)

    def bdot(d):
        return ell_ops.bdot_ell(d, planes, ell)

    def ray_coef_fn(xc, dc):
        return obj.ray_coef(xc, dc, Bsum)

    def hvp_with(w2s):
        def hvp(V):
            return ell_ops.hvp_ell(V, planes, ell, w2s, l2_reg)

        return hvp

    has_nnz = ell.row_nnz_perm > 0
    x0 = jnp.where(
        has_nnz[:, None],
        jnp.where(reuse_prev, A_perm, jnp.full_like(A_perm, 1e-3)),
        0.0,
    )

    # sweep-cost fractions for the achieved-bandwidth accounting: a full
    # plane sweep streams k*itemsize + 4 (vals) bytes per slot; a ray
    # trial round streams px/pd/vals (3 x f32); bdot reads the planes once
    # per line search and writes the pd plane; fgh adds w2 + px writes
    it = planes[0].dtype.itemsize if planes else A_perm.dtype.itemsize
    full_b = float(k * it + 4)
    trial_frac = 12.0 / full_b
    fgh_weight = 1.0 + 8.0 / full_b
    bdot_weight = 1.0 + 4.0 / full_b

    # Inner-CG <B,d> accumulation (ROADMAP #0): only pays off under a SMALL
    # inner-CG cap — each HVP round adds ~16 B/slot (bv write + pd axpy)
    # vs the ~(k*it + 8) B/slot standalone bdot sweep it replaces, so the
    # breakeven is ~6 HVP rounds per outer iteration.  The cascade's bulk
    # rounds (max_cg=3) win ~1 of ~6 sweeps per outer iteration; the final
    # full-depth rounds (maxCGit = k/2 = 25 at k=50) keep the hoisted bdot.
    bd_fns = None
    hvp_extra = 0.0
    if bd_accum and maxcg <= 6:
        def hvp_bv_with(w2s):
            def hvp_bv(V):
                return ell_ops.hvp_bv_ell(V, planes, ell, w2s, l2_reg)

            return hvp_bv

        bd_fns = dict(
            hvp_bv_with=hvp_bv_with,
            zeros=lambda: ell_ops.bd_zeros_ell(ell, A_perm.dtype),
            axpy=lambda bd, m, bv: ell_ops.bd_axpy_ell(bd, m, bv, ell),
            select=lambda u, b1, b2: ell_ops.bd_select_ell(u, b1, b2, ell),
        )
        hvp_extra = 16.0 / full_b
        bdot_weight = 12.0 / full_b  # the post-CG per-row plane select

    x_final, share, out = _tncg_core(
        x0, has_nnz, ell.n_rows, fgh, f_gtd_ray_multi, hvp_with, bdot,
        ray_coef_fn,
        maxupd=maxupd, max_outer=max_outer, maxcg=maxcg,
        x_prev_for_unchanged=jnp.where(has_nnz[:, None], A_perm, 0.0),
        true_row_mask=has_nnz,  # ELL slots with nnz are exactly the true rows
        active_mask=active_mask,
        ftol=ftol, trial_frac=trial_frac, fgh_weight=fgh_weight,
        bdot_weight=bdot_weight, ls_cand=ls_cand, nfeval0=nfeval0,
        bd_fns=bd_fns, hvp_extra=hvp_extra,
    )
    return x_final, share, _stats_dict(out)


def tncg_update_ell(
    A_perm: jnp.ndarray,
    planes: Tuple[jnp.ndarray, ...],
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    *,
    l2_reg: float,
    w_mult: float = 1.0,
    maxupd: int = 750,
    reuse_prev: bool = False,
    track_unchanged: bool = False,
    max_outer: int = 0,
    return_stats: bool = False,
    active_mask: Optional[jnp.ndarray] = None,
    ftol: float = TNC_FTOL,
    l2_in_f: bool = False,
    max_cg: Optional[int] = None,
    ls_cand: Optional[int] = None,
    nfeval0: Optional[jnp.ndarray] = None,
    bd_accum: Optional[bool] = None,
):
    """One TNCG pass over every (permuted) row, planar-ELL backend.

    ``A_perm`` and a 2D ``Bsum`` must be in the ELL's permuted row order;
    ``planes`` is :func:`poismf_tpu.ops.ell.gather_planes` of the fixed
    matrix (computed once per half-update).  ``active_mask`` restricts the
    solve to a subset of rows (used to continue a previous partial solve
    without re-activating rows that already terminated).
    ``track_unchanged`` is kept for API compatibility (the unchanged share
    is now always computed).  ``ls_cand`` as in :func:`tncg_update`.
    ``bd_accum`` (default ``POISMF_TNCG_BD_ACCUM`` or on): accumulate the
    line search's ``<B, d>`` plane during inner CG instead of a standalone
    bdot sweep — engaged only when ``max_cg`` is small (see
    :func:`_tncg_update_ell_jit`).
    """
    del track_unchanged
    if active_mask is None:
        active_mask = jnp.ones((A_perm.shape[0],), dtype=bool)
    x_final, share, stats = _tncg_update_ell_jit(
        A_perm, planes, ell, Bsum,
        jnp.asarray(bool(reuse_prev)),
        jnp.asarray(_effective_max_outer(max_outer, maxupd), dtype=jnp.int32),
        active_mask, nfeval0,
        l2_reg=l2_reg, w_mult=w_mult, maxupd=maxupd, ftol=ftol,
        l2_in_f=l2_in_f, max_cg=max_cg,
        ls_cand=max(1, int(ls_cand if ls_cand is not None
                           else _ls_cand_default())),
        bd_accum=bool(bd_accum if bd_accum is not None
                      else _bd_accum_default()),
    )
    if return_stats:
        return x_final, share, stats
    return x_final, share
