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


def _cg_core(
    x0: jnp.ndarray,
    has_nnz: jnp.ndarray,
    fg,
    *,
    maxupd: int,
    limit_step: bool,
    maxnfeval: int,
) -> jnp.ndarray:
    """Backend-agnostic batched Li-2013 non-negative CG driver.

    Evaluation is FUSED: every line-search trial computes (f, g) in one
    pass — acceptance tests the trial's f (which carries the reference's
    inf/nan poisoning at non-positive predictions), and the accepted
    trial's g becomes the gradient the next iteration builds its direction
    from.  The reference evaluates f at trials and re-evaluates the
    gradient at the accepted point afterwards (nonnegcg.c:290-334); since
    the accepted point IS the last successful trial, fusing halves the
    data sweeps per iteration (2 -> ~1) with an identical iterate
    trajectory.  The gradient computed at a rejected trial is discarded —
    with the reference's lenient Armijo constant (c=0.01) first-trial
    acceptance is the common case, so the waste is rare.
    """
    R, k = x0.shape
    dtype = x0.dtype

    f0, g0 = fg(x0)
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
        # GLOBAL full-sweep count (init fg = 1); see tncg._tncg_core.passes
        passes=jnp.ones((), dtype=jnp.float32),
    )

    def cond(s):
        return (s["it"] < maxupd) & jnp.any(s["active"])

    def body(s):
        x, f, active = s["x"], s["f"], s["active"]
        g = s["g"]  # gradient at x, carried from the fused trial eval

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

        # ---- batched backtracking line search ----
        ls0 = dict(
            step=max_step,
            found=jnp.zeros((R,), dtype=bool),
            x_new=x,
            f_new=f,
            g_new=g,
            searching=active,
            nfeval=s["nfeval"],
            ls=jnp.zeros((), dtype=jnp.int32),
        )

        def ls_cond(t):
            return (t["ls"] < CG_MAX_LS) & jnp.any(t["searching"])

        def ls_body(t):
            trial = x + t["step"][:, None] * d
            if limit_step:
                trial = jnp.where(trial >= EPS_LIMIT, trial, 0.0)
            else:
                trial = jnp.maximum(trial, 0.0)
            # fused: the trial's f decides acceptance; its g (floored
            # weights, finite even where f poisons) is kept on acceptance
            # as the next iteration's gradient
            f_trial, g_trial = fg(trial)
            ok = (
                jnp.isfinite(f_trial)
                & (f_trial <= f - CG_LNSRCH_C * t["step"] * dnorm_sq)
            )
            accept = t["searching"] & ok
            x_new = jnp.where(accept[:, None], trial, t["x_new"])
            f_new = jnp.where(accept, f_trial, t["f_new"])
            g_new = jnp.where(accept[:, None], g_trial, t["g_new"])
            found = t["found"] | accept
            rejected = t["searching"] & ~ok
            nfeval = t["nfeval"] + rejected.astype(jnp.int32)
            searching = rejected & (nfeval < maxnfeval)
            step = jnp.where(rejected, t["step"] * CG_DECR, t["step"])
            return dict(
                step=step, found=found, x_new=x_new, f_new=f_new,
                g_new=g_new, searching=searching, nfeval=nfeval,
                ls=t["ls"] + 1,
            )

        ls = lax.while_loop(ls_cond, ls_body, ls0)

        x_next = jnp.where(ls["found"][:, None], ls["x_new"], x)
        f_next = jnp.where(ls["found"], ls["f_new"], f)
        g_next = jnp.where(ls["found"][:, None], ls["g_new"], g)
        # rows that ran out of the nfeval budget terminate (stop_maxnfeval)
        active = active & (ls["nfeval"] < maxnfeval)

        return dict(
            x=x_next,
            f=f_next,
            g=g_next,
            it=s["it"] + 1,
            grad_prev=g,
            dir_prev=d,
            gnorm_prev=jnp.maximum(jnp.sum(g * g, axis=1), 1e-30),
            nfeval=ls["nfeval"],
            active=active,
            # one fused fg sweep per line-search trial (the gradient's
            # extra [R, k] output write is invisible next to the planes)
            passes=s["passes"] + ls["ls"].astype(jnp.float32),
        )

    out = lax.while_loop(cond, body, state0)
    return out["x"], out["passes"]


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "limit_step", "w_mult", "nnz_chunk",
                     "maxnfeval", "return_passes"),
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
):
    def fg(Acur):
        return obj.poisson_fg(Acur, B, X, Bsum, l2_reg, w_mult, nnz_chunk)

    has_nnz = X.row_nnz > 0
    x0 = jnp.where(has_nnz[:, None], A, 0.0)
    x, passes = _cg_core(
        x0, has_nnz, fg,
        maxupd=maxupd, limit_step=limit_step, maxnfeval=maxnfeval,
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
):
    """Run up to ``maxupd`` batched CG iterations on every row of A
    (flat-COO backend).  ``return_passes=True`` additionally returns the
    global full-sweep count (bandwidth accounting)."""
    return _cg_update_jit(
        A, B, X, Bsum, l2_reg=l2_reg, w_mult=w_mult, maxupd=maxupd,
        limit_step=limit_step, nnz_chunk=nnz_chunk, maxnfeval=maxnfeval,
        return_passes=return_passes,
    )


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "limit_step", "w_mult", "maxnfeval",
                     "return_passes"),
)
def _cg_update_ell_jit(
    A_perm: jnp.ndarray,
    planes,
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    *,
    l2_reg: float,
    w_mult: float,
    maxupd: int,
    limit_step: bool,
    maxnfeval: int,
    return_passes: bool,
):
    def fg(Acur):
        return ell_ops.fg_ell(Acur, planes, ell, Bsum, l2_reg, w_mult)

    has_nnz = ell.row_nnz_perm > 0
    x0 = jnp.where(has_nnz[:, None], A_perm, 0.0)
    x, passes = _cg_core(
        x0, has_nnz, fg,
        maxupd=maxupd, limit_step=limit_step, maxnfeval=maxnfeval,
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
):
    """CG iterations on the gather-free planar-ELL backend (permuted rows;
    ``planes`` from :func:`poismf_tpu.ops.ell.gather_planes`)."""
    return _cg_update_ell_jit(
        A_perm, planes, ell, Bsum, l2_reg=l2_reg, w_mult=w_mult,
        maxupd=maxupd, limit_step=limit_step, maxnfeval=maxnfeval,
        return_passes=return_passes,
    )
