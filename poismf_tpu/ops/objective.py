"""Batched Poisson-factorization objective / gradient / Hessian kernels.

TPU-native replacement for the reference's per-row scalar kernels
(``calc_fun_single`` / ``calc_grad_single`` / ``calc_grad_single_w`` /
``calc_fun_and_grad``, /root/reference/src/poismf.c:194-273, and the missing
``eval_llk`` declared at /root/reference/src/poismf.h:258-269).

The reference walks each row's nonzeros serially, issuing a length-k BLAS dot
and axpy per nonzero.  Here every evaluation is one fused tensor program over
the *whole* flat nnz stream:

  * SDDMM:  ``pred[nnz] = <A[row], B[col]>`` - gather + batched dot,
  * SpMM:   ``segment_sum((x/pred) * B[col])`` - the gradient's data term,

which maps onto TPU gathers + VPU reductions with fully static shapes.  The
per-row objective is

  ``f_r = <Bsum, a_r> + l2 * ||a_r||^2 - w_mult * sum_i x_ri * log(<a_r, B_i>)``

with ``Bsum = colsums(B) + l1`` (the L1 term folds into Bsum because a >= 0,
exactly as in the reference).  For weighted entries (``w_mult != 1``) Bsum is
per-row (see :func:`adjusted_bsum`, mirroring ``adjustment_Bsum``
poismf.c:85-123).

All kernels accept an optional ``nnz_chunk``: when set, the nnz stream is
processed in fixed-size chunks under ``lax.scan`` so the ``[nnz, k]`` gather
intermediates never materialize in HBM at full size - this is the
memory-bandwidth knob for very large datasets.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..sparse import CountsMatrix

# Guard for log/division at near-zero predictions.  The reference relies on
# Inf/NaN poisoning line searches instead (nonnegcg.c:223-226); on TPU we keep
# that behaviour for objective values (log of 0 -> -inf -> f = +inf) but avoid
# NaN gradients via this floor where division is involved.
PRED_EPS = 1e-30


def _maybe_chunk(nnz_pad: int, nnz_chunk: Optional[int]) -> Optional[int]:
    if nnz_chunk is None or nnz_chunk >= nnz_pad:
        return None
    # chunk must divide the padded length; round up to a divisor via padding
    # contract: CountsMatrix pads to multiples of 1024, so use multiples too.
    if nnz_pad % nnz_chunk != 0:
        raise ValueError(
            f"nnz_chunk ({nnz_chunk}) must divide padded nnz ({nnz_pad})"
        )
    return nnz_chunk


def sddmm(A: jnp.ndarray, B: jnp.ndarray, row_ids, col_ids) -> jnp.ndarray:
    """pred[e] = <A[row_ids[e]], B[col_ids[e]]> (rows out of range -> uses row 0
    semantics are irrelevant because padding values are 0)."""
    a = jnp.take(A, jnp.minimum(row_ids, A.shape[0] - 1), axis=0)
    b = jnp.take(B, col_ids, axis=0)
    return jnp.sum(a * b, axis=-1)


def segment_rowsum(values: jnp.ndarray, row_ids, n_rows_pad: int) -> jnp.ndarray:
    """Sum per-edge scalars into per-row scalars.  Padding rows (== n_rows_pad)
    fall into an extra dummy segment that is dropped."""
    out = jax.ops.segment_sum(
        values, row_ids, num_segments=n_rows_pad + 1, indices_are_sorted=True
    )
    return out[:n_rows_pad]


def spmm(
    weights: jnp.ndarray, B: jnp.ndarray, row_ids, col_ids, n_rows_pad: int
) -> jnp.ndarray:
    """out[r] = sum_{e: row(e)=r} weights[e] * B[col(e)]  ->  [n_rows_pad, k]."""
    contrib = weights[:, None] * jnp.take(B, col_ids, axis=0)
    out = jax.ops.segment_sum(
        contrib, row_ids, num_segments=n_rows_pad + 1, indices_are_sorted=True
    )
    return out[:n_rows_pad]


# ---------------------------------------------------------------------------
# Fused evaluations over a CountsMatrix
# ---------------------------------------------------------------------------


def poisson_data_terms(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    nnz_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row data terms of (f, grad), plus the per-edge predictions:

    returns ``(neg_llk_data, grad_data, px)`` where
      neg_llk_data[r] = - sum_i x_ri * log(pred_ri)              [R_pad]
      grad_data[r]    = - sum_i (x_ri / pred_ri) * B[i]          [R_pad, k]
      px[e]           = pred at edge e                           [nnz_pad]
    ``px`` feeds the CG ray line search (pred(x + a*d) = px + a*<B,d>).
    """
    R = X.n_rows_pad
    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)

    def eval_chunk(row_ids, col_ids, vals):
        pred = sddmm(A, B, row_ids, col_ids)
        safe = jnp.maximum(pred, PRED_EPS)
        # padding entries have vals == 0 -> contribute exactly 0.  The log
        # term is UNFLOORED so a non-positive prediction at a positive count
        # poisons the row's f with inf/nan (the reference's Inf-rejected
        # line search, nonnegcg.c:223-226, 308) — the CG solver evaluates
        # fg AT line-search trials and accepts on this f.  Only the
        # gradient weights keep the floor.
        log_term = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
        w = jnp.where(vals > 0, vals / safe, 0.0)
        neg_llk = -segment_rowsum(log_term, row_ids, R)
        grad = -spmm(w, B, row_ids, col_ids, R)
        return neg_llk, grad, pred

    if chunk is None:
        return eval_chunk(X.row_ids, X.col_ids, X.vals)

    n_chunks = X.nnz_pad // chunk

    def body(carry, xs):
        neg_llk, grad = carry
        r, c, v = xs
        nl, g, px_c = eval_chunk(r, c, v)
        return (neg_llk + nl, grad + g), px_c

    init = (
        jnp.zeros((R,), dtype=A.dtype),
        jnp.zeros((R, A.shape[1]), dtype=A.dtype),
    )
    xs = (
        X.row_ids.reshape(n_chunks, chunk),
        X.col_ids.reshape(n_chunks, chunk),
        X.vals.reshape(n_chunks, chunk),
    )
    (neg_llk, grad), pxs = lax.scan(body, init, xs)
    return neg_llk, grad, pxs.reshape(-1)


def poisson_f_data(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    nnz_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Only the per-row ``- sum x log(pred)`` term (for line searches).

    Unlike :func:`poisson_data_terms` this does NOT floor pred: a zero or
    negative prediction yields ``+inf``, poisoning the trial point exactly like
    the reference's line search (nonnegcg.c:308 checks isnan/isinf)."""
    R = X.n_rows_pad
    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)

    def eval_chunk(row_ids, col_ids, vals):
        pred = sddmm(A, B, row_ids, col_ids)
        log_term = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
        return -segment_rowsum(log_term, row_ids, R)

    if chunk is None:
        return eval_chunk(X.row_ids, X.col_ids, X.vals)

    n_chunks = X.nnz_pad // chunk

    def body(carry, xs):
        r, c, v = xs
        return carry + eval_chunk(r, c, v), None

    out, _ = lax.scan(body, jnp.zeros((R,), dtype=A.dtype), (
        X.row_ids.reshape(n_chunks, chunk),
        X.col_ids.reshape(n_chunks, chunk),
        X.vals.reshape(n_chunks, chunk),
    ))
    return out


def poisson_bdot(
    D: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
) -> jnp.ndarray:
    """Per-edge ``<B_col(e), d_row(e)>`` for a search direction D [R_pad, k].

    Computed ONCE per line search; every trial's directional derivative then
    needs only the trial's own predictions (see :func:`poisson_f_gtd`)."""
    return sddmm(D, B, X.row_ids, X.col_ids)


def combine_f_gtd(nll, gud, A_trial, D, Bsum, l2_reg, w_mult, l2_in_f):
    """Shared tail of every (f, g.d) trial evaluation: fold the data terms
    ``(nll, gud)`` with the linear/l2 parts into ``(f, gtd)``.  One
    definition for the four call sites (full/ray x COO/ELL) so the
    combination semantics — including the l2_in_f parity quirk — cannot
    drift between them."""
    if w_mult != 1.0:
        nll = w_mult * nll
        gud = w_mult * gud
    if Bsum.ndim == 1:
        lin = A_trial @ Bsum
        lin_d = D @ Bsum
    else:
        lin = jnp.sum(A_trial * Bsum, axis=-1)
        lin_d = jnp.sum(D * Bsum, axis=-1)
    if l2_in_f:
        lin = lin + l2_reg * jnp.sum(A_trial * A_trial, axis=-1)
    f = lin + nll
    gtd = lin_d + 2.0 * l2_reg * jnp.sum(A_trial * D, axis=-1) - gud
    return f, gtd


def ray_coef(x: jnp.ndarray, D: jnp.ndarray, Bsum: jnp.ndarray):
    """Per-row scalar coefficients of the exact quadratic linear/l2 part of
    ``f`` along the ray ``x + a*D`` — computed ONCE per line search so ray
    trials touch no [R, k] data at all (see :func:`combine_f_gtd_ray`):

      lin(a) = bx + a*bdl
      |x + a*D|^2 = xx + 2a*xd + a^2*dd
    """
    if Bsum.ndim == 1:
        bx = x @ Bsum
        bdl = D @ Bsum
    else:
        bx = jnp.sum(x * Bsum, axis=-1)
        bdl = jnp.sum(D * Bsum, axis=-1)
    xx = jnp.sum(x * x, axis=-1)
    xd = jnp.sum(x * D, axis=-1)
    dd = jnp.sum(D * D, axis=-1)
    return (bx, bdl, xx, xd, dd)


def combine_f_ray(nll, alpha, coef, l2_reg, w_mult, l2_in_f):
    """f-only tail of :func:`combine_f_gtd_ray` (CG trials test only f)."""
    bx, bdl, xx, xd, dd = coef
    if w_mult != 1.0:
        nll = w_mult * nll
    lin = bx + alpha * bdl
    if l2_in_f:
        lin = lin + l2_reg * (xx + 2.0 * alpha * xd + alpha * alpha * dd)
    return lin + nll


def combine_f_gtd_ray(nll, gud, alpha, coef, l2_reg, w_mult, l2_in_f):
    """Ray-trial tail of :func:`combine_f_gtd`: identical algebra with the
    trial's [R, k] reductions replaced by the per-row quadratic
    coefficients from :func:`ray_coef` (trial = x + alpha*D, so every
    linear/l2 term is an exact polynomial in alpha).  Differs from the
    full form only by the eps-level residue the solver's max(0, .)/clamp
    cleanup removes from the materialized trial."""
    bx, bdl, xx, xd, dd = coef
    if w_mult != 1.0:
        nll = w_mult * nll
        gud = w_mult * gud
    lin = bx + alpha * bdl
    if l2_in_f:
        lin = lin + l2_reg * (xx + 2.0 * alpha * xd + alpha * alpha * dd)
    f = lin + nll
    gtd = bdl + 2.0 * l2_reg * (xd + alpha * dd) - gud
    return f, gtd


def poisson_f_gtd(
    A_trial: jnp.ndarray,
    D: jnp.ndarray,
    bd: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
    l2_in_f: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Objective AND directional derivative ``g(trial)._dot(d)`` per row, in
    one pass over the nnz stream (one SDDMM - the ``B_i . d`` factors ``bd``
    come precomputed from :func:`poisson_bdot`).

    This is the batched equivalent of the reference line search evaluating
    its function at a trial point and dotting the returned gradient with the
    search direction (tnc.c linearSearch:1750-1772).  f keeps the reference's
    +inf poisoning on non-positive predictions; the derivative uses a floored
    pred (the poisoned f already rejects those trials)."""
    R = X.n_rows_pad

    def eval_chunk(row_ids, col_ids, vals, bd_c):
        pred = sddmm(A_trial, B, row_ids, col_ids)
        log_term = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
        nll = -segment_rowsum(log_term, row_ids, R)
        ratio = jnp.where(
            vals > 0, vals * bd_c / jnp.maximum(pred, PRED_EPS), 0.0
        )
        gud = segment_rowsum(ratio, row_ids, R)
        return nll, gud

    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)
    if chunk is None:
        nll, gud = eval_chunk(X.row_ids, X.col_ids, X.vals, bd)
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            r, c, v, b_ = xs
            nl, gd = eval_chunk(r, c, v, b_)
            return (carry[0] + nl, carry[1] + gd), None

        (nll, gud), _ = lax.scan(
            body,
            (jnp.zeros((R,), A_trial.dtype), jnp.zeros((R,), A_trial.dtype)),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.col_ids.reshape(n_chunks, chunk),
                X.vals.reshape(n_chunks, chunk),
                bd.reshape(n_chunks, chunk),
            ),
        )

    return combine_f_gtd(nll, gud, A_trial, D, Bsum, l2_reg, w_mult,
                         l2_in_f)


def poisson_f_gtd_multi(
    alphas: jnp.ndarray,
    x: jnp.ndarray,
    D: jnp.ndarray,
    bd: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
    l2_in_f: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """COMPLETE (f, g(trial).d) at C PROJECTED trial steps
    ``max(0, x + alphas[c]*d)`` in one pass over the nnz stream — the
    flat-COO analog of :func:`poismf_tpu.ops.ell.f_gtd_multi_ell` (the
    reverted round-3.5 projected-trial TNCG search's multi-candidate
    round — RETAINED FOR TESTS/REFERENCE, no solver reaches it).  The x/D/B row gathers
    (the dominant traffic, ~3k floats per edge) are shared across the C
    candidates; each candidate adds only its own in-register dot/log
    chain.  ``alphas`` [C, R_pad] -> (f [C, R_pad], gtd [C, R_pad]).
    Unlike the CG ray trials the projection makes predictions NONLINEAR
    in alpha, so each candidate needs its own k-deep dot; ``bd`` (the
    per-edge <B, d> from :func:`poisson_bdot`, candidate-independent) is
    hoisted once per line search exactly like :func:`poisson_f_gtd`.
    Same +inf poisoning on non-positive trial predictions."""
    R = X.n_rows_pad
    C = alphas.shape[0]
    dtype = x.dtype

    def eval_chunk(row_ids, col_ids, vals, bd_c):
        safe_rows = jnp.minimum(row_ids, R - 1)
        Xg = jnp.take(x, safe_rows, axis=0)  # [nnz, k]
        Dg = jnp.take(D, safe_rows, axis=0)
        Bg = jnp.take(B, col_ids, axis=0)
        nlls, guds = [], []
        for c in range(C):
            a_e = jnp.take(alphas[c], safe_rows)
            trial_e = jnp.maximum(Xg + a_e[:, None] * Dg, 0.0)
            pred = jnp.sum(trial_e * Bg, axis=1)
            log_term = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
            nlls.append(-segment_rowsum(log_term, row_ids, R))
            ratio = jnp.where(
                vals > 0, vals * bd_c / jnp.maximum(pred, PRED_EPS), 0.0
            )
            guds.append(segment_rowsum(ratio, row_ids, R))
        return jnp.stack(nlls), jnp.stack(guds)

    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)
    if chunk is None:
        nll, gud = eval_chunk(X.row_ids, X.col_ids, X.vals, bd)
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            r, c, v, b_ = xs
            nl, gd = eval_chunk(r, c, v, b_)
            return (carry[0] + nl, carry[1] + gd), None

        (nll, gud), _ = lax.scan(
            body,
            (jnp.zeros((C, R), dtype), jnp.zeros((C, R), dtype)),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.col_ids.reshape(n_chunks, chunk),
                X.vals.reshape(n_chunks, chunk),
                bd.reshape(n_chunks, chunk),
            ),
        )

    fs, gs = [], []
    for c in range(C):
        trial = jnp.maximum(x + alphas[c][:, None] * D, 0.0)
        f_c, g_c = combine_f_gtd(nll[c], gud[c], trial, D, Bsum, l2_reg,
                                 w_mult, l2_in_f)
        fs.append(f_c)
        gs.append(g_c)
    return jnp.stack(fs), jnp.stack(gs)


def poisson_f_gtd_ray(
    alpha: jnp.ndarray,
    coef,
    px: jnp.ndarray,
    bd: jnp.ndarray,
    X: CountsMatrix,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
    l2_in_f: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Line-search trial objective + directional derivative along the ray
    ``x + alpha*d`` touching NO [R, k] data and NO planes beyond px/bd:
    predictions are linear in the factor vector, so ``pred(trial) =
    px + alpha[row]*bd`` with ``px`` the per-edge predictions cached by
    :func:`poisson_fgh` and ``bd`` from :func:`poisson_bdot`; the
    linear/l2 terms are exact quadratics in alpha with per-row
    coefficients hoisted out of the trial loop (``coef`` from
    :func:`ray_coef`).  Exact while the step stays within the first bound
    crossing (the solver caps alpha at the reference's stepMax distance,
    tnc.c:795); f keeps the +inf poisoning on non-positive trial
    predictions."""
    R = X.n_rows_pad
    dtype = alpha.dtype

    def eval_chunk(row_ids, vals, px_c, bd_c):
        a_e = jnp.take(alpha, jnp.minimum(row_ids, R - 1))
        pred = px_c + a_e * bd_c
        log_term = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
        nll = -segment_rowsum(log_term, row_ids, R)
        ratio = jnp.where(
            vals > 0, vals * bd_c / jnp.maximum(pred, PRED_EPS), 0.0
        )
        gud = segment_rowsum(ratio, row_ids, R)
        return nll, gud

    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)
    if chunk is None:
        nll, gud = eval_chunk(X.row_ids, X.vals, px, bd)
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            r, v, p_, b_ = xs
            nl, gd = eval_chunk(r, v, p_, b_)
            return (carry[0] + nl, carry[1] + gd), None

        (nll, gud), _ = lax.scan(
            body,
            (jnp.zeros((R,), dtype), jnp.zeros((R,), dtype)),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.vals.reshape(n_chunks, chunk),
                px.reshape(n_chunks, chunk),
                bd.reshape(n_chunks, chunk),
            ),
        )

    return combine_f_gtd_ray(nll, gud, alpha, coef, l2_reg, w_mult,
                             l2_in_f)


def poisson_f_ray_multi(
    alphas: jnp.ndarray,
    coef,
    px: jnp.ndarray,
    bd: jnp.ndarray,
    X: CountsMatrix,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
    l2_in_f: bool = True,
) -> jnp.ndarray:
    """Trial objective at C candidate steps along the ray in one pass over
    the cached px/bd edge streams (flat-COO analog of
    :func:`poismf_tpu.ops.ell.f_ray_multi_ell`).  ``alphas`` [C, R_pad] ->
    f [C, R_pad]."""
    R = X.n_rows_pad
    C = alphas.shape[0]
    dtype = alphas.dtype

    def eval_chunk(row_ids, vals, px_c, bd_c):
        rows = jnp.minimum(row_ids, R - 1)
        valid = vals > 0
        out = []
        for c in range(C):
            a_e = jnp.take(alphas[c], rows)
            pred = px_c + a_e * bd_c
            log_term = jnp.where(valid, vals * jnp.log(pred), 0.0)
            out.append(-segment_rowsum(log_term, row_ids, R))
        return jnp.stack(out)

    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)
    if chunk is None:
        nll = eval_chunk(X.row_ids, X.vals, px, bd)
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            return carry + eval_chunk(*xs), None

        nll, _ = lax.scan(
            body,
            jnp.zeros((C, R), dtype),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.vals.reshape(n_chunks, chunk),
                px.reshape(n_chunks, chunk),
                bd.reshape(n_chunks, chunk),
            ),
        )

    return jnp.stack([
        combine_f_ray(nll[c], alphas[c], coef, l2_reg, w_mult, l2_in_f)
        for c in range(C)
    ])


def poisson_f_gtd_ray_multi(
    alphas: jnp.ndarray,
    coef,
    px: jnp.ndarray,
    bd: jnp.ndarray,
    X: CountsMatrix,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
    l2_in_f: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """COMPLETE (f, g(trial).d) at C candidate steps along the ray in one
    pass over the cached px/bd edge streams (flat-COO analog of
    :func:`poismf_tpu.ops.ell.f_gtd_ray_multi_ell`; the multi-candidate
    twin of :func:`poisson_f_gtd_ray`).  ``alphas`` [C, R_pad] ->
    (f [C, R_pad], gtd [C, R_pad])."""
    R = X.n_rows_pad
    C = alphas.shape[0]
    dtype = alphas.dtype

    def eval_chunk(row_ids, vals, px_c, bd_c):
        rows = jnp.minimum(row_ids, R - 1)
        valid = vals > 0
        nls, gds = [], []
        for c in range(C):
            a_e = jnp.take(alphas[c], rows)
            pred = px_c + a_e * bd_c
            log_term = jnp.where(valid, vals * jnp.log(pred), 0.0)
            nls.append(-segment_rowsum(log_term, row_ids, R))
            ratio = jnp.where(
                valid, vals * bd_c / jnp.maximum(pred, PRED_EPS), 0.0
            )
            gds.append(segment_rowsum(ratio, row_ids, R))
        return jnp.stack(nls), jnp.stack(gds)

    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)
    if chunk is None:
        nll, gud = eval_chunk(X.row_ids, X.vals, px, bd)
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            nl, gd = eval_chunk(*xs)
            return (carry[0] + nl, carry[1] + gd), None

        (nll, gud), _ = lax.scan(
            body,
            (jnp.zeros((C, R), dtype), jnp.zeros((C, R), dtype)),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.vals.reshape(n_chunks, chunk),
                px.reshape(n_chunks, chunk),
                bd.reshape(n_chunks, chunk),
            ),
        )

    fs, gs = [], []
    for c in range(C):
        f_c, g_c = combine_f_gtd_ray(nll[c], gud[c], alphas[c], coef,
                                     l2_reg, w_mult, l2_in_f)
        fs.append(f_c)
        gs.append(g_c)
    return jnp.stack(fs), jnp.stack(gs)


def poisson_fg(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused per-row objective, gradient, and per-edge predictions for ALL
    rows at once.

    ``Bsum`` is either ``[k]`` (shared; already includes l1) or ``[R_pad, k]``
    (per-row, for w_mult != 1 - see :func:`adjusted_bsum`).

    Equivalent of calc_fun_and_grad (poismf.c:242-273) vmapped over rows;
    the predictions ``px`` additionally seed the CG ray line search.
    """
    neg_llk, grad_data, px = poisson_data_terms(A, B, X, nnz_chunk)
    if w_mult != 1.0:
        neg_llk = w_mult * neg_llk
        grad_data = w_mult * grad_data
    if Bsum.ndim == 1:
        lin = A @ Bsum
        g_lin = Bsum[None, :]
    else:
        lin = jnp.sum(A * Bsum, axis=-1)
        g_lin = Bsum
    f = lin + l2_reg * jnp.sum(A * A, axis=-1) + neg_llk
    g = g_lin + 2.0 * l2_reg * A + grad_data
    return f, g, px


def poisson_f(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
    l2_in_f: bool = True,
) -> jnp.ndarray:
    """Per-row objective only (calc_fun_single, poismf.c:194-208, batched).

    Returns +inf for rows whose trial point has a non-positive prediction at a
    positive count (matching the reference's Inf-poisoned line search).

    ``l2_in_f=False`` reproduces the TNCG objective ``calc_fun_and_grad``
    (poismf.c:242-273), whose function value OMITS the l2 penalty even though
    its gradient includes ``2*l2*a`` - an asymmetry that weakens the effective
    regularization of the published tncg results and must be replicated for
    parity.  The CG path's ``calc_fun_single`` includes the penalty."""
    neg_llk = poisson_f_data(A, B, X, nnz_chunk)
    if w_mult != 1.0:
        neg_llk = w_mult * neg_llk
    if Bsum.ndim == 1:
        lin = A @ Bsum
    else:
        lin = jnp.sum(A * Bsum, axis=-1)
    if l2_in_f:
        lin = lin + l2_reg * jnp.sum(A * A, axis=-1)
    return lin + neg_llk


def poisson_fgh(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    l2_reg: float,
    w_mult: float = 1.0,
    nnz_chunk: Optional[int] = None,
    l2_in_f: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused per-row objective, gradient, HVP edge weights, and Hessian
    diagonal in ONE pass over the nnz stream.  ``l2_in_f=False`` omits the
    l2 penalty from f only (calc_fun_and_grad parity - see poisson_f).

    Returns ``(f [R], g [R,k], w2 [nnz], diag [R,k], px [nnz])`` —
    everything the TNCG outer iteration needs at a new iterate, including
    the raw per-edge predictions ``px`` that make line-search trials
    plane-read-free (see :func:`poisson_f_gtd_ray`).  One SDDMM and one
    gather of ``B[cols]`` feed all outputs; the two per-row segment
    reductions (gradient data term and Hessian diagonal) are fused into a
    single segment-sum over a ``[nnz, 2k]`` concatenation so the TPU issues
    one scatter instead of two.

    Equivalent to calc_fun_and_grad (poismf.c:242-273) + the finite-difference
    Hessian machinery it feeds (tnc.c:1388-1435), collapsed into a single
    fused evaluation with exact second-order information.
    """
    R = X.n_rows_pad
    k = A.shape[1]
    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)

    def eval_chunk(row_ids, col_ids, vals):
        a = jnp.take(A, jnp.minimum(row_ids, A.shape[0] - 1), axis=0)
        b = jnp.take(B, col_ids, axis=0)
        pred = jnp.sum(a * b, axis=-1)
        safe = jnp.maximum(pred, PRED_EPS)
        valid = vals > 0
        log_term = jnp.where(valid, vals * jnp.log(safe), 0.0)
        w = jnp.where(valid, vals / safe, 0.0)  # x / pred
        w2 = jnp.where(valid, w_mult * vals / (safe * safe), 0.0)
        neg_llk = -segment_rowsum(log_term, row_ids, R)
        both = jnp.concatenate(
            [(-w)[:, None] * b, w2[:, None] * (b * b)], axis=-1
        )
        seg = jax.ops.segment_sum(
            both, row_ids, num_segments=R + 1, indices_are_sorted=True
        )[:R]
        return neg_llk, seg[:, :k], seg[:, k:], w2, pred

    if chunk is None:
        neg_llk, grad_data, diag_data, w2, px = eval_chunk(
            X.row_ids, X.col_ids, X.vals
        )
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            nl, gd, dd = carry
            r, c, v = xs
            nl_c, gd_c, dd_c, w2_c, px_c = eval_chunk(r, c, v)
            return (nl + nl_c, gd + gd_c, dd + dd_c), (w2_c, px_c)

        (neg_llk, grad_data, diag_data), (w2s, pxs) = lax.scan(
            body,
            (
                jnp.zeros((R,), dtype=A.dtype),
                jnp.zeros((R, k), dtype=A.dtype),
                jnp.zeros((R, k), dtype=A.dtype),
            ),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.col_ids.reshape(n_chunks, chunk),
                X.vals.reshape(n_chunks, chunk),
            ),
        )
        w2 = w2s.reshape(-1)
        px = pxs.reshape(-1)

    if w_mult != 1.0:
        neg_llk = w_mult * neg_llk
        grad_data = w_mult * grad_data
    if Bsum.ndim == 1:
        lin = A @ Bsum
        g_lin = Bsum[None, :]
    else:
        lin = jnp.sum(A * Bsum, axis=-1)
        g_lin = Bsum
    if l2_in_f:
        lin = lin + l2_reg * jnp.sum(A * A, axis=-1)
    f = lin + neg_llk
    g = g_lin + 2.0 * l2_reg * A + grad_data
    diag = 2.0 * l2_reg + diag_data
    return f, g, w2, diag, px


def poisson_hvp_weights(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    w_mult: float = 1.0,
) -> jnp.ndarray:
    """Cache ``w2[e] = w_mult * x_e / pred_e^2`` for Hessian-vector products
    at a fixed iterate A.  One SDDMM; reused across all inner-CG HVPs."""
    pred = sddmm(A, B, X.row_ids, X.col_ids)
    safe = jnp.maximum(pred, PRED_EPS)
    return jnp.where(X.vals > 0, w_mult * X.vals / (safe * safe), 0.0)


def poisson_hvp(
    V: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    w2: jnp.ndarray,
    l2_reg: float,
    nnz_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Exact batched Hessian-vector product: for each row r,

      (H_r v_r) = 2*l2*v_r + sum_i w2_ri * <B_i, v_r> * B_i

    Replaces the reference's finite-difference Hv (tnc.c:1388-1435), which
    costs a full extra function evaluation and is inexact.  Here an HVP is one
    SDDMM + one SpMM with the cached ``w2`` weights - no log/exp at all.
    """
    R = X.n_rows_pad
    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)

    def eval_chunk(row_ids, col_ids, w2c):
        bv = sddmm(V, B, row_ids, col_ids)  # <B_col, v_row> per edge
        return spmm(w2c * bv, B, row_ids, col_ids, R)

    if chunk is None:
        data = eval_chunk(X.row_ids, X.col_ids, w2)
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            r, c, w = xs
            return carry + eval_chunk(r, c, w), None

        data, _ = lax.scan(
            body,
            jnp.zeros((R, V.shape[1]), dtype=V.dtype),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.col_ids.reshape(n_chunks, chunk),
                w2.reshape(n_chunks, chunk),
            ),
        )
    return 2.0 * l2_reg * V + data


def poisson_hess_diag(
    B: jnp.ndarray,
    X: CountsMatrix,
    w2: jnp.ndarray,
    l2_reg: float,
    nnz_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Per-row Hessian diagonal: 2*l2 + sum_i w2_ri * B_i^2  ->  [R_pad, k].

    Used as the inner-CG Jacobi preconditioner (the TPU-friendly stand-in for
    the reference's SSBFGS diagonal preconditioner, tnc.c:1444-1658)."""
    R = X.n_rows_pad
    chunk = _maybe_chunk(X.nnz_pad, nnz_chunk)

    def eval_chunk(row_ids, col_ids, w2c):
        b = jnp.take(B, col_ids, axis=0)
        contrib = w2c[:, None] * (b * b)
        out = jax.ops.segment_sum(
            contrib, row_ids, num_segments=R + 1, indices_are_sorted=True
        )
        return out[:R]

    if chunk is None:
        data = eval_chunk(X.row_ids, X.col_ids, w2)
    else:
        n_chunks = X.nnz_pad // chunk

        def body(carry, xs):
            r, c, w = xs
            return carry + eval_chunk(r, c, w), None

        data, _ = lax.scan(
            body,
            jnp.zeros((R, B.shape[1]), dtype=B.dtype),
            (
                X.row_ids.reshape(n_chunks, chunk),
                X.col_ids.reshape(n_chunks, chunk),
                w2.reshape(n_chunks, chunk),
            ),
        )
    return 2.0 * l2_reg + data


# ---------------------------------------------------------------------------
# Bsum machinery
# ---------------------------------------------------------------------------


def make_bsum(M: jnp.ndarray, n_rows: int, l1_reg: float) -> jnp.ndarray:
    """colsums of the fixed matrix + l1  (sum_by_cols + l1 shift,
    poismf.c:512-514).  ``n_rows`` masks padded rows out of the sum."""
    if M.shape[0] != n_rows:
        M = M[:n_rows]
    return jnp.sum(M, axis=0) + l1_reg


def adjusted_bsum(
    B: jnp.ndarray,
    Bsum: jnp.ndarray,
    X: CountsMatrix,
    w_mult: float,
) -> jnp.ndarray:
    """Per-row weighted Bsum: ``Bsum + (w_mult - 1) * sum_{i in nnz(r)} B_i``
    (adjustment_Bsum, poismf.c:85-123).  Returns [R_pad, k]."""
    ones = jnp.where(X.vals > 0, jnp.ones_like(X.vals), 0.0)
    row_b = spmm(ones, B, X.row_ids, X.col_ids, X.n_rows_pad)
    return Bsum[None, :] + (w_mult - 1.0) * row_b


# ---------------------------------------------------------------------------
# Poisson log-likelihood evaluation (the reference declares eval_llk at
# poismf.h:258-269 but never defines it; implemented for real here).
# ---------------------------------------------------------------------------


def eval_llk_entries(
    A: jnp.ndarray,
    B: jnp.ndarray,
    row_ids,
    col_ids,
    vals,
    full_llk: bool = False,
) -> jnp.ndarray:
    """Sum over given entries of the Poisson log-likelihood
    ``x*log(pred) - pred`` (minus ``lgamma(x+1)`` when ``full_llk``)."""
    pred = sddmm(A, B, row_ids, col_ids)
    safe = jnp.maximum(pred, PRED_EPS)
    valid = vals > 0
    ll = jnp.where(valid, vals * jnp.log(safe) - pred, 0.0)
    if full_llk:
        ll = ll - jnp.where(valid, lax.lgamma(vals + 1.0), 0.0)
    return jnp.sum(ll)


def eval_llk(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    full_llk: bool = False,
    include_missing: bool = False,
    nnz_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Poisson LL over the entries of X; with ``include_missing``, the
    ``-pred`` term extends over ALL user-item pairs, computed in O((m+n)k) via
    ``<colsum(A), colsum(B)>`` instead of materializing A @ B^T.

    ``nnz_chunk`` bounds the [chunk, k] gather intermediates.  Auto-chunking
    triggers when the gathered intermediates approach HBM capacity; the
    chunk loop runs on the HOST over ONE small jitted program (a lax.scan
    formulation costs minutes of remote compile on the tunneled TPU for
    zero benefit — 17 extra dispatches are microseconds)."""
    k = int(A.shape[1])
    if nnz_chunk is None and X.nnz_pad * k * 4 > 1024**3:
        nnz_chunk = max((256 * 1024**2) // (k * 4), 1024)
    if nnz_chunk is None or nnz_chunk >= X.nnz_pad:
        return _eval_llk_jit(
            A, B, X.row_ids, X.col_ids, X.vals,
            full_llk=full_llk, include_missing=include_missing,
            n_rows=X.n_rows, n_cols=X.n_cols,
        )
    chunk = int(nnz_chunk)
    nnz_pad = X.nnz_pad
    starts = list(range(0, nnz_pad - chunk + 1, chunk))
    if starts[-1] + chunk < nnz_pad:
        starts.append(nnz_pad - chunk)  # overlap; new entries masked below
    ll = jnp.zeros((), dtype=A.dtype)
    prev_end = 0
    for s in starts:
        ll = _eval_llk_chunk_jit(
            A, B, X.row_ids, X.col_ids, X.vals, ll,
            jnp.asarray(s, dtype=jnp.int32),
            jnp.asarray(prev_end, dtype=jnp.int32),
            chunk=chunk, full_llk=full_llk,
            include_missing=include_missing,
        )
        prev_end = s + chunk
    if include_missing:
        ll = ll - jnp.dot(
            jnp.sum(A[: X.n_rows], axis=0), jnp.sum(B[: X.n_cols], axis=0)
        )
    return ll


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "full_llk", "include_missing"),
)
def _eval_llk_chunk_jit(
    A, B, row_ids, col_ids, vals, carry, start, from_idx,
    *, chunk: int, full_llk: bool, include_missing: bool,
):
    """One LL chunk accumulated into ``carry``; entries whose global index
    precedes ``from_idx`` are masked (the final chunk overlaps the previous
    one when the chunk size does not divide nnz_pad)."""
    r = lax.dynamic_slice_in_dim(row_ids, start, chunk)
    c = lax.dynamic_slice_in_dim(col_ids, start, chunk)
    v = lax.dynamic_slice_in_dim(vals, start, chunk)
    fresh = (start + jnp.arange(chunk, dtype=jnp.int32)) >= from_idx
    v = jnp.where(fresh, v, 0.0)
    pred = sddmm(A, B, r, c)
    safe = jnp.maximum(pred, PRED_EPS)
    valid = v > 0
    if include_missing:
        ll = jnp.sum(jnp.where(valid, v * jnp.log(safe), 0.0))
    else:
        ll = jnp.sum(jnp.where(valid, v * jnp.log(safe) - pred, 0.0))
    if full_llk:
        ll = ll - jnp.sum(jnp.where(valid, lax.lgamma(v + 1.0), 0.0))
    return carry + ll


@functools.partial(
    jax.jit,
    static_argnames=("full_llk", "include_missing", "n_rows", "n_cols"),
)
def _eval_llk_jit(
    A: jnp.ndarray,
    B: jnp.ndarray,
    row_ids,
    col_ids,
    vals_all,
    *,
    full_llk: bool,
    include_missing: bool,
    n_rows: int,
    n_cols: int,
) -> jnp.ndarray:
    """Single-sweep evaluation (small problems): one program, one dispatch."""
    pred = sddmm(A, B, row_ids, col_ids)
    safe = jnp.maximum(pred, PRED_EPS)
    valid = vals_all > 0
    if include_missing:
        ll = jnp.sum(jnp.where(valid, vals_all * jnp.log(safe), 0.0))
        ll = ll - jnp.dot(
            jnp.sum(A[:n_rows], axis=0), jnp.sum(B[:n_cols], axis=0)
        )
    else:
        ll = jnp.sum(
            jnp.where(valid, vals_all * jnp.log(safe) - pred, 0.0)
        )
    if full_llk:
        ll = ll - jnp.sum(
            jnp.where(valid, lax.lgamma(vals_all + 1.0), 0.0)
        )
    return ll
