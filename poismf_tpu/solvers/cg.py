"""Batched non-negative conjugate gradient solver (Li 2013 modified PRP).

TPU-native equivalent of ``minimize_nonneg_cg``
(/root/reference/src/nonnegcg.c:177-346) as driven by ``cg_iteration``
(/root/reference/src/poismf.c:275-322).  The reference optimizes one row at a
time; here ALL rows run the CG iteration simultaneously, with per-row masks
replacing per-row early exits:

  * capped direction  d_i = (x_i <= 0 and g_i >= 0) ? 0 : -g_i
    (nonnegcg.c:236-239),
  * beta / theta Polak-Ribiere-style corrections masked on the active set
    (:243-261),
  * stop when |<g, d>| <= tol (:264-269),
  * step cap: with ``limit_step`` at most ~1 variable hits zero per step
    (:272-288), else 0.99x the largest zero-crossing step,
  * Armijo-like backtracking with clamp-to-zero (:290-327),
  * hard-wired driver constants tol=1e-2, maxnfeval=150, decr=0.25, c=0.01,
    max_ls=20 (poismf.c:315-320).

Function-evaluation accounting matches the reference: the initial evaluation
counts 1, and each *unsuccessful* line-search trial counts 1 (nonnegcg.c:316
increments only after the acceptance check).

Known deliberate deviation: when a row exhausts all line-search trials without
acceptance, the reference continues iterating but overwrites the row's current
objective value with that of the last (rejected, possibly worse) trial point
(nonnegcg.c:328 runs even without a break).  We keep the true objective of the
unchanged iterate instead - strictly safer and monotone.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..sparse import CountsMatrix
from ..ops import objective as obj
from ..ops import ell as ell_ops

EPS_LIMIT = 1e-15  # nonnegcg.c:94 clamp threshold under limit_step
CG_TOL = 1e-2
CG_MAXNFEVAL = 150
CG_DECR = 0.25
CG_LNSRCH_C = 0.01
CG_MAX_LS = 20
# candidates per ray-trial round: the backtracking sequence is fixed, so
# one px/pd/vals stream can score the next CAND steps at once (the extra
# work is CAND-1 more pred/log chains on in-register data)
CG_RAY_CAND = 4

# Cached-plane ray line search (see _cg_core): on by default wherever
# limit_step keeps the ray exact; POISMF_CG_RAY=0 restores fused trials.
import os as _os


def _cg_ray_default() -> bool:
    # read per call, not at import: harnesses set the env var after import
    return _os.environ.get("POISMF_CG_RAY", "1") != "0"


def _cg_core(
    x0: jnp.ndarray,
    has_nnz: jnp.ndarray,
    fg,
    *,
    maxupd: int,
    limit_step: bool,
    maxnfeval: int,
    ray=None,
    init=None,
) -> jnp.ndarray:
    """Backend-agnostic batched Li-2013 non-negative CG driver.

    Two statically-selected line-search evaluation modes:

    * ``ray=None`` (FUSED): every trial computes (f, g) in one data pass —
      acceptance tests the trial's f (which carries the reference's inf/nan
      poisoning at non-positive predictions), and the accepted trial's g
      becomes the gradient the next iteration builds its direction from.
      The reference evaluates f at trials and re-evaluates the gradient at
      the accepted point afterwards (nonnegcg.c:290-334); since the
      accepted point IS the last successful trial, fusing halves the data
      sweeps per iteration with an identical iterate trajectory.
      ``fg: x -> (f, g)``.

    * ``ray=(f_ray, bdot, trial_frac, fg_weight)`` (RAY): predictions are
      linear in the factor vector, so along the search ray
      ``pred(x + a*d) = px + a*<B,d>`` with ``px`` the prediction planes
      cached by the previous full evaluation and ``<B,d>`` hoisted out of
      the trial loop (one ``bdot`` plane pass per line search).  Each
      trial then costs only a few [P,R]/[nnz] streams (``trial_frac`` of a
      full sweep) instead of a full plane read; ONE full ``fg`` refresh at
      the accepted point closes the iteration and writes the next px.
      Batched line searches run ~5-12 trial rounds per iteration (the
      max over rows), so this cuts CG's data traffic ~3x.  Requires
      ``limit_step=True``: the step cap keeps the trial strictly within
      the first bound crossing (nonnegcg.c:272-288), so the ray
      linearization is exact (modulo the reference's own 1e-15 clamp).
      ``fg: x -> (f, g, px)``; ``f_ray: (alphas [C,R], coef, px, bd) ->
      f [C,R]`` scores the next ``CG_RAY_CAND`` candidates of the fixed
      backtracking sequence per round in one plane stream.

    The iterate trajectory is identical between the modes up to fp
    rounding (tested: test_cg.py::test_ray_matches_fused_trajectory).

    ``init`` (ray mode only): precomputed ``(f0, g0, px0)`` at ``x0`` —
    skips the initial full evaluation.  Used by the active-set compaction
    driver, whose probe already evaluated (f, g, px) at the entry point
    (full-batch or gathered into the compact layout); the probe's sweep is
    accounted by the caller, so passes start at 0.
    """
    R, k = x0.shape
    dtype = x0.dtype
    use_ray = ray is not None
    if use_ray and not limit_step:
        # hard error (not assert: -O must not strip it) — without the step
        # cap a trial clips against the bounds mid-ray, px + a*<B,d> no
        # longer equals pred(trial), and acceptance tests a wrong objective
        raise ValueError("ray trials require limit_step (no bound crossing)")
    if init is not None and ray is None:
        raise ValueError("init carries px planes: ray mode only")
    if use_ray:
        f_ray, bdot, ray_coef, trial_frac, fg_weight = ray
        if init is not None:
            f0, g0, px0 = init
            passes0 = jnp.zeros((), dtype=jnp.float32)
        else:
            f0, g0, px0 = fg(x0)
            passes0 = jnp.asarray(fg_weight, dtype=jnp.float32)
    else:
        f0, g0 = fg(x0)
        passes0 = jnp.ones((), dtype=jnp.float32)
    nfeval0 = jnp.ones((R,), dtype=jnp.int32)
    # rows with nan/inf initial objective terminate immediately
    # (nonnegcg.c:223-226); rows with no nonzeros are done (zeroed) already
    active0 = has_nnz & jnp.isfinite(f0)

    state0 = dict(
        x=x0,
        f=f0,
        g=g0,
        it=jnp.zeros((), dtype=jnp.int32),
        grad_prev=jnp.zeros_like(x0),
        dir_prev=jnp.zeros_like(x0),
        gnorm_prev=jnp.ones((R,), dtype=dtype),
        nfeval=nfeval0,
        active=active0,
        # GLOBAL full-sweep count; see tncg._tncg_core.passes
        passes=passes0,
    )
    if use_ray:
        state0["px"] = px0

    def cond(s):
        return (s["it"] < maxupd) & jnp.any(s["active"])

    def body(s):
        x, f, active = s["x"], s["f"], s["active"]
        g = s["g"]  # gradient at x, carried from the last full evaluation

        nonpos = x <= 0.0
        d = jnp.where(nonpos & (g >= 0.0), 0.0, -g)

        def with_prp(d):
            free = ~nonpos  # x_i > 0
            gp, dp = s["grad_prev"], s["dir_prev"]
            gn = s["gnorm_prev"]
            theta = jnp.sum(jnp.where(free, g * dp, 0.0), axis=1) / gn
            beta = jnp.sum(jnp.where(free, g * (g - gp), 0.0), axis=1) / gn
            corr = beta[:, None] * dp - theta[:, None] * (g - gp)
            return d + jnp.where(free, corr, 0.0)

        d = lax.cond(s["it"] > 0, with_prp, lambda d: d, d)

        prod_gd = jnp.sum(g * d, axis=1)
        converged_now = jnp.abs(prod_gd) <= CG_TOL
        active = active & ~converged_now

        # maximum step (per row)
        neg = d < 0.0
        ratios = jnp.where(neg, -x / jnp.where(neg, d, -1.0), 0.0)
        if limit_step:
            cap = jnp.where(neg, ratios, jnp.inf).min(axis=1)
            max_step = jnp.minimum(1.0, cap)
        else:
            cap = jnp.where(neg, ratios, 0.0).max(axis=1)
            max_step = jnp.minimum(1.0, 0.99 * cap)

        dnorm_sq = jnp.sum(d * d, axis=1)

        if use_ray:
            bd = bdot(d)  # <B,d> planes, ONE plane pass per line search
            px = s["px"]
            coef = ray_coef(x, d)  # per-row quadratic coefs, once per LS

        # ---- batched backtracking line search ----
        ls0 = dict(
            step=max_step,
            found=jnp.zeros((R,), dtype=bool),
            searching=active,
            nfeval=s["nfeval"],
            ls=jnp.zeros((), dtype=jnp.int32),
        )
        if use_ray:
            # accepted STEP, not point: ray trials touch no [R, k] data;
            # the accepted point is reconstructed once after the loop
            ls0["a_new"] = jnp.zeros((R,), dtype=dtype)
        else:
            ls0["x_new"] = x
            ls0["f_new"] = f
            ls0["g_new"] = g

        # ray mode evaluates the next CG_RAY_CAND candidates of the FIXED
        # backtracking sequence {max_step * CG_DECR^j} per round — same
        # px/pd/vals plane bandwidth as one trial, ~CAND-times fewer
        # whole-batch rounds, identical per-row trajectory (the accepted
        # trial and the reference's rejected-trial nfeval accounting,
        # nonnegcg.c:290-327, are reproduced exactly)
        n_rounds = -(-CG_MAX_LS // CG_RAY_CAND) if use_ray else CG_MAX_LS
        decays = (CG_DECR ** jnp.arange(CG_RAY_CAND, dtype=dtype)
                  if use_ray else None)
        j_arange = (jnp.arange(CG_RAY_CAND, dtype=jnp.int32)[:, None]
                    if use_ray else None)

        def ls_cond(t):
            return (t["ls"] < n_rounds) & jnp.any(t["searching"])

        def ls_body(t):
            if use_ray:
                # trial f at CAND steps from the cached prediction planes;
                # full (f, g) is refreshed once at the accepted point
                # after the loop.  The EPS_LIMIT cleanup is applied at
                # reconstruction; its effect on f is below f32 resolution
                # (components < 1e-15 against Bsum-scale linear terms)
                cand = t["step"][None, :] * decays[:, None]  # [CAND, R]
                f_c = f_ray(cand, coef, px, bd)
                # a candidate may only be evaluated while the reference's
                # budgets allow it: nfeval (rejections so far) and the
                # CG_MAX_LS per-search trial cap both advance one per
                # prior rejection
                allowed = (
                    (t["nfeval"][None, :] + j_arange < maxnfeval)
                    & (t["ls"] * CG_RAY_CAND + j_arange < CG_MAX_LS)
                )
                ok_c = (
                    jnp.isfinite(f_c)
                    & (f_c <= f[None]
                       - CG_LNSRCH_C * cand * dnorm_sq[None])
                    & allowed
                )
                any_ok = jnp.any(ok_c, axis=0)
                j_star = jnp.argmax(ok_c, axis=0)  # first accepted j
                accept = t["searching"] & any_ok
                a_acc = t["step"] * (CG_DECR ** j_star.astype(dtype))
                found = t["found"] | accept
                # rejections consumed this round: j_star before an
                # acceptance, every allowed candidate otherwise
                n_allowed = jnp.sum(allowed.astype(jnp.int32), axis=0)
                rej = jnp.where(
                    accept, j_star.astype(jnp.int32),
                    jnp.where(t["searching"], n_allowed, 0),
                )
                nfeval = t["nfeval"] + rej.astype(jnp.int32)
                searching = (
                    t["searching"] & ~any_ok & (nfeval < maxnfeval)
                    & ((t["ls"] + 1) * CG_RAY_CAND < CG_MAX_LS)
                )
                step = jnp.where(
                    searching, t["step"] * (CG_DECR ** CG_RAY_CAND),
                    t["step"],
                )
                return dict(
                    step=step, found=found,
                    a_new=jnp.where(accept, a_acc, t["a_new"]),
                    searching=searching, nfeval=nfeval,
                    ls=t["ls"] + 1,
                )
            trial = x + t["step"][:, None] * d
            if limit_step:
                trial = jnp.where(trial >= EPS_LIMIT, trial, 0.0)
            else:
                trial = jnp.maximum(trial, 0.0)
            # fused: the trial's f decides acceptance; its g (floored
            # weights, finite even where f poisons) is kept on
            # acceptance as the next iteration's gradient
            f_trial, g_trial = fg(trial)
            ok = (
                jnp.isfinite(f_trial)
                & (f_trial <= f - CG_LNSRCH_C * t["step"] * dnorm_sq)
            )
            accept = t["searching"] & ok
            found = t["found"] | accept
            rejected = t["searching"] & ~ok
            nfeval = t["nfeval"] + rejected.astype(jnp.int32)
            searching = rejected & (nfeval < maxnfeval)
            step = jnp.where(rejected, t["step"] * CG_DECR, t["step"])
            return dict(
                step=step, found=found,
                x_new=jnp.where(accept[:, None], trial, t["x_new"]),
                f_new=jnp.where(accept, f_trial, t["f_new"]),
                g_new=jnp.where(accept[:, None], g_trial, t["g_new"]),
                searching=searching, nfeval=nfeval,
                ls=t["ls"] + 1,
            )

        ls = lax.while_loop(ls_cond, ls_body, ls0)

        if use_ray:
            # reconstruct the accepted point from its step (limit_step
            # holds in ray mode, so apply the same EPS_LIMIT cleanup the
            # in-loop trial used to get bit-identical accepted iterates)
            x_sel = x + ls["a_new"][:, None] * d
            x_sel = jnp.where(x_sel >= EPS_LIMIT, x_sel, 0.0)
            x_next = jnp.where(ls["found"][:, None], x_sel, x)
        else:
            x_next = jnp.where(ls["found"][:, None], ls["x_new"], x)
        n_trials = ls["ls"].astype(jnp.float32)
        if use_ray:
            # one full refresh at the accepted point (unmoved rows
            # recompute their unchanged values); writes the next px
            f_next, g_next, px_next = fg(x_next)
            passes_next = (
                s["passes"] + 1.0 + n_trials * trial_frac + fg_weight
            )
        else:
            f_next = jnp.where(ls["found"], ls["f_new"], f)
            g_next = jnp.where(ls["found"][:, None], ls["g_new"], g)
            # one fused fg sweep per line-search trial (the gradient's
            # extra [R, k] output write is invisible next to the planes)
            passes_next = s["passes"] + n_trials
        # rows that ran out of the nfeval budget terminate (stop_maxnfeval)
        active = active & (ls["nfeval"] < maxnfeval)

        nxt = dict(
            x=x_next,
            f=f_next,
            g=g_next,
            it=s["it"] + 1,
            grad_prev=g,
            dir_prev=d,
            gnorm_prev=jnp.maximum(jnp.sum(g * g, axis=1), 1e-30),
            nfeval=ls["nfeval"],
            active=active,
            passes=passes_next,
        )
        if use_ray:
            nxt["px"] = px_next
        return nxt

    out = lax.while_loop(cond, body, state0)
    return out["x"], out["passes"]


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "limit_step", "w_mult", "nnz_chunk",
                     "maxnfeval", "return_passes", "use_ray"),
)
def _cg_update_jit(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    *,
    l2_reg: float,
    w_mult: float,
    maxupd: int,
    limit_step: bool,
    nnz_chunk: Optional[int],
    maxnfeval: int,
    return_passes: bool,
    use_ray: bool,
):
    k = A.shape[1]

    def fg3(Acur):
        return obj.poisson_fg(Acur, B, X, Bsum, l2_reg, w_mult, nnz_chunk)

    ray = None
    fg = fg3
    if use_ray:
        def f_ray(alphas, coef, px, bd):
            return obj.poisson_f_ray_multi(
                alphas, coef, px, bd, X, l2_reg, w_mult, nnz_chunk
            )

        def bdot(d):
            return obj.poisson_bdot(d, B, X)

        def ray_coef(x, d):
            return obj.ray_coef(x, d, Bsum)

        # sweep-cost fractions for the achieved-bandwidth accounting: a
        # full COO sweep streams rows+cols+vals (12 B/nnz) plus the
        # k-vector B gather; a ray trial streams rows+vals+px+bd
        # (16 B/nnz); fg additionally writes px (4 B/nnz)
        full_b = 4.0 * k + 12.0
        ray = (f_ray, bdot, ray_coef, 16.0 / full_b, 1.0 + 4.0 / full_b)
    else:
        def fg(Acur):  # noqa: F811 - fused mode wants the 2-tuple
            return fg3(Acur)[:2]

    has_nnz = X.row_nnz > 0
    x0 = jnp.where(has_nnz[:, None], A, 0.0)
    x, passes = _cg_core(
        x0, has_nnz, fg,
        maxupd=maxupd, limit_step=limit_step, maxnfeval=maxnfeval, ray=ray,
    )
    return (x, passes) if return_passes else x


def cg_update(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    *,
    l2_reg: float,
    w_mult: float = 1.0,
    maxupd: int = 5,
    limit_step: bool = True,
    nnz_chunk: Optional[int] = None,
    maxnfeval: int = CG_MAXNFEVAL,
    return_passes: bool = False,
    use_ray: Optional[bool] = None,
):
    """Run up to ``maxupd`` batched CG iterations on every row of A
    (flat-COO backend).  ``return_passes=True`` additionally returns the
    global full-sweep count (bandwidth accounting).  ``use_ray`` selects
    the cached-plane ray line search (default: on whenever ``limit_step``
    keeps the ray exact; ``POISMF_CG_RAY=0`` disables)."""
    if use_ray is None:
        use_ray = limit_step and _cg_ray_default()
    return _cg_update_jit(
        A, B, X, Bsum, l2_reg=l2_reg, w_mult=w_mult, maxupd=maxupd,
        limit_step=limit_step, nnz_chunk=nnz_chunk, maxnfeval=maxnfeval,
        return_passes=return_passes, use_ray=bool(use_ray),
    )


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "limit_step", "w_mult", "maxnfeval",
                     "return_passes", "use_ray"),
)
def _cg_update_ell_jit(
    A_perm: jnp.ndarray,
    planes,
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    init=None,
    *,
    l2_reg: float,
    w_mult: float,
    maxupd: int,
    limit_step: bool,
    maxnfeval: int,
    return_passes: bool,
    use_ray: bool,
):
    k = A_perm.shape[1]

    def fg3(Acur):
        return ell_ops.fg_ell(Acur, planes, ell, Bsum, l2_reg, w_mult)

    ray = None
    fg = fg3
    if use_ray:
        def f_ray(alphas, coef, pxs, bds):
            return ell_ops.f_ray_multi_ell(
                alphas, coef, pxs, bds, ell, l2_reg, w_mult
            )

        def bdot(d):
            return ell_ops.bdot_ell(d, planes, ell)

        def ray_coef(x, d):
            return obj.ray_coef(x, d, Bsum)

        # sweep-cost fractions: a full plane sweep streams k*itemsize + 4
        # (vals) bytes per slot; a ray trial streams px+pd+vals f32
        # (12 B/slot); fg additionally writes the px plane (4 B/slot)
        it = planes[0].dtype.itemsize if planes else A_perm.dtype.itemsize
        full_b = float(k * it + 4)
        ray = (f_ray, bdot, ray_coef, 12.0 / full_b, 1.0 + 4.0 / full_b)
    else:
        def fg(Acur):  # noqa: F811 - fused mode wants the 2-tuple
            # want_px=False also skips the pallas prediction-plane write
            return ell_ops.fg_ell(
                Acur, planes, ell, Bsum, l2_reg, w_mult, want_px=False
            )[:2]

    has_nnz = ell.row_nnz_perm > 0
    x0 = jnp.where(has_nnz[:, None], A_perm, 0.0)
    x, passes = _cg_core(
        x0, has_nnz, fg,
        maxupd=maxupd, limit_step=limit_step, maxnfeval=maxnfeval, ray=ray,
        init=init,
    )
    return (x, passes) if return_passes else x


def cg_update_ell(
    A_perm: jnp.ndarray,
    planes,
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    *,
    l2_reg: float,
    w_mult: float = 1.0,
    maxupd: int = 5,
    limit_step: bool = True,
    maxnfeval: int = CG_MAXNFEVAL,
    return_passes: bool = False,
    use_ray: Optional[bool] = None,
    init=None,
):
    """CG iterations on the gather-free planar-ELL backend (permuted rows;
    ``planes`` from :func:`poismf_tpu.ops.ell.gather_planes`).  ``use_ray``
    as in :func:`cg_update`; ``init`` = precomputed ``(f0, g0, px0)`` at
    the entry point from :func:`cg_probe_ell` (ray mode only)."""
    if use_ray is None:
        use_ray = limit_step and _cg_ray_default()
    return _cg_update_ell_jit(
        A_perm, planes, ell, Bsum, init, l2_reg=l2_reg, w_mult=w_mult,
        maxupd=maxupd, limit_step=limit_step, maxnfeval=maxnfeval,
        return_passes=return_passes, use_ray=bool(use_ray),
    )


@functools.partial(jax.jit, static_argnames=("w_mult",))
def cg_probe_ell(
    A_perm: jnp.ndarray,
    planes,
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    l2_reg,
    *,
    w_mult: float = 1.0,
):
    """Entry-point probe for the CG active-set compaction driver: ONE full
    evaluation sweep yielding the solver's own init ``(f0, g0, px0)`` plus
    the rows that would run at all — the batched analog of the reference's
    per-row first-iteration exit ``|<g, d>| <= tol`` (nonnegcg.c:264-269
    with the capped direction of :236-239).  Rows already converged at
    entry (the common case for most rows after the first few epochs) can
    then be excluded from the iteration structure entirely instead of
    paying plane bandwidth for every remaining batched iteration; the
    returned init makes the probe's sweep REPLACE (not duplicate) the
    solver's initial evaluation on both the full and the compact path."""
    f0, g0, px0 = ell_ops.fg_ell(A_perm, planes, ell, Bsum, l2_reg, w_mult)
    has_nnz = ell.row_nnz_perm > 0
    x0 = jnp.where(has_nnz[:, None], A_perm, 0.0)
    d = jnp.where((x0 <= 0.0) & (g0 >= 0.0), 0.0, -g0)
    conv = jnp.abs(jnp.sum(g0 * d, axis=1)) <= CG_TOL
    active = has_nnz & jnp.isfinite(f0) & ~conv
    return f0, g0, px0, active
