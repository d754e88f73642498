"""Batched proximal-gradient solver.

TPU-native equivalent of ``pg_iteration`` + ``calc_grad_pgd``
(/root/reference/src/poismf.c:126-188).  The reference loops rows under OpenMP
and nonzeros under BLAS; here ALL rows take their ``maxupd`` PG steps together
as one jitted ``lax.fori_loop`` of SDDMM + SpMM sweeps.

Per step (for each row a with nonzeros (cols, x)):

    a <- max(0, (a + step * sum_i (x_i / <a, B_i>) * B_i - step * Bsum)
                 / (1 + 2 * l2 * step))

with ``step = step_size * w_mult`` and ``Bsum`` per-row when weighted.  Rows
with no nonzeros are zeroed (poismf.c:166-169).

Training step schedule: the reference halves the step BETWEEN the B-half and
the A-half of each epoch (poismf.c:532), so B steps at s while A steps at
s/2, and the proximal divisor ``cnst_div = 1/(1+2*l2*s)`` is computed once
per epoch from the B step (poismf.c:511) - stale for the A half.  The
drivers in train.py replicate this exactly via ``div_step``.

Note: the reference's A-side update scales ``cnst_sum`` by ``-step`` twice
when ``w_mult == 1`` (poismf.c:573-577), and its batch out-of-sample path
scales ``Bsum_w`` by ``-step`` twice when ``w_mult != 1`` (pred.c:126 then
:160-161) - sign/scale bugs flagged in SURVEY.md section 3.1.  We implement
the mathematically consistent single scaling in both places, matching the
reference's own B-side update and its w_mult==1 out-of-sample path
(pred.c:154-158).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..sparse import CountsMatrix
from ..ops.objective import spmm, sddmm, PRED_EPS
from ..ops import ell as ell_ops


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "w_mult", "nnz_chunk"),
)
def pg_update(
    A: jnp.ndarray,
    B: jnp.ndarray,
    X: CountsMatrix,
    Bsum: jnp.ndarray,
    l2_reg: jnp.ndarray,
    step_size: jnp.ndarray,
    *,
    w_mult: float = 1.0,
    maxupd: int = 10,
    nnz_chunk: Optional[int] = None,
    div_step: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run ``maxupd`` batched PG steps updating A (rows of X) with B fixed.

    ``Bsum`` is [k] (shared, incl. l1) or [R_pad, k] (weighted per-row).
    ``l2_reg``/``step_size`` are traced scalars (the step halves per epoch,
    poismf.c:532 - keeping it traced avoids a recompile per epoch).
    ``div_step`` overrides the step used in the proximal divisor (the
    reference computes it once per epoch from the pre-halving step,
    poismf.c:511; see module docstring).
    Returns the updated A of shape [R_pad, k].
    """
    R = X.n_rows_pad
    step = step_size * w_mult  # poismf.c:151
    ds = step_size if div_step is None else div_step
    cnst_div = 1.0 / (1.0 + 2.0 * l2_reg * ds)  # poismf.c:511
    if Bsum.ndim == 1:
        step_bsum = step_size * Bsum[None, :]
    else:
        step_bsum = step_size * Bsum

    def grad_part(Acur):
        # sum_i (x_i / pred_i) * B_i per row, chunked if requested
        if nnz_chunk is None or nnz_chunk >= X.nnz_pad:
            pred = sddmm(Acur, B, X.row_ids, X.col_ids)
            w = jnp.where(
                X.vals > 0, X.vals / jnp.maximum(pred, PRED_EPS), 0.0
            )
            return spmm(w, B, X.row_ids, X.col_ids, R)
        n_chunks = X.nnz_pad // nnz_chunk

        def body(carry, xs):
            r, c, v = xs
            pred = sddmm(Acur, B, r, c)
            w = jnp.where(v > 0, v / jnp.maximum(pred, PRED_EPS), 0.0)
            return carry + spmm(w, B, r, c, R), None

        out, _ = lax.scan(
            body,
            jnp.zeros((R, Acur.shape[1]), dtype=Acur.dtype),
            (
                X.row_ids.reshape(n_chunks, nnz_chunk),
                X.col_ids.reshape(n_chunks, nnz_chunk),
                X.vals.reshape(n_chunks, nnz_chunk),
            ),
        )
        return out

    def one_step(_, Acur):
        gp = grad_part(Acur)
        Anew = (Acur + step * gp - step_bsum) * cnst_div
        return jnp.maximum(Anew, 0.0)

    A = lax.fori_loop(0, maxupd, one_step, A)
    # rows with no nonzeros are zeroed (poismf.c:166-169)
    return jnp.where((X.row_nnz > 0)[:, None], A, 0.0)


def _pg_steps_ell(
    A_perm: jnp.ndarray,
    planes,
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    l2_reg: jnp.ndarray,
    step_size: jnp.ndarray,
    div_step: Optional[jnp.ndarray],
    maxupd: int,
    w_mult: float,
) -> jnp.ndarray:
    """Shared traced core: ``maxupd`` PG steps on the planar-ELL layout."""
    step = step_size * w_mult  # poismf.c:151
    ds = step_size if div_step is None else div_step
    cnst_div = 1.0 / (1.0 + 2.0 * l2_reg * ds)  # poismf.c:511
    if Bsum.ndim == 1:
        step_bsum = step_size * Bsum[None, :]
    else:
        step_bsum = step_size * Bsum

    def one_step(_, Acur):
        gp = ell_ops.pg_grad_ell(Acur, planes, ell)
        Anew = (Acur + step * gp - step_bsum) * cnst_div
        return jnp.maximum(Anew, 0.0)

    A_perm = lax.fori_loop(0, maxupd, one_step, A_perm)
    return jnp.where((ell.row_nnz_perm > 0)[:, None], A_perm, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "w_mult"),
)
def pg_update_ell(
    A_perm: jnp.ndarray,
    planes,
    ell: ell_ops.EllMatrix,
    Bsum: jnp.ndarray,
    l2_reg: jnp.ndarray,
    step_size: jnp.ndarray,
    *,
    w_mult: float = 1.0,
    maxupd: int = 10,
    div_step: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """PG steps on the gather-free planar-ELL backend (permuted rows)."""
    return _pg_steps_ell(
        A_perm, planes, ell, Bsum, l2_reg, step_size, div_step, maxupd,
        w_mult,
    )


def _pg_epoch_core(
    A_perm, B_perm, ell_user, ell_item, l2_reg, step_size, l1_reg,
    maxupd, w_mult, dtype_name,
):
    """Traced body of one alternating PG epoch: B-half (colsums, fixed-side
    plane gather, ``maxupd`` steps), the between-halves step halving of
    poismf.c:532, then the A-half with the pre-halving proximal divisor
    (poismf.c:511)."""
    # --- B half: optimize items against fixed A ---
    bsum_a = jnp.sum(A_perm, axis=0) + l1_reg
    planes_a = ell_ops.gather_planes(A_perm, ell_item, dtype_name)
    bsum_in = (
        bsum_a if w_mult == 1.0
        else ell_ops.adjusted_bsum_ell(planes_a, ell_item, bsum_a, w_mult)
    )
    B_new = _pg_steps_ell(
        B_perm, planes_a, ell_item, bsum_in, l2_reg, step_size, None,
        maxupd, w_mult,
    )
    # --- step halves BETWEEN the halves; A's divisor keeps the old step ---
    step_a = step_size * 0.5
    bsum_b = jnp.sum(B_new, axis=0) + l1_reg
    planes_b = ell_ops.gather_planes(B_new, ell_user, dtype_name)
    bsum_in_b = (
        bsum_b if w_mult == 1.0
        else ell_ops.adjusted_bsum_ell(planes_b, ell_user, bsum_b, w_mult)
    )
    A_new = _pg_steps_ell(
        A_perm, planes_b, ell_user, bsum_in_b, l2_reg, step_a, step_size,
        maxupd, w_mult,
    )
    return A_new, B_new


@functools.partial(
    jax.jit,
    static_argnames=("maxupd", "w_mult", "dtype_name"),
)
def pg_epoch_ell(
    A_perm: jnp.ndarray,
    B_perm: jnp.ndarray,
    ell_user: ell_ops.EllMatrix,
    ell_item: ell_ops.EllMatrix,
    l2_reg: jnp.ndarray,
    step_size: jnp.ndarray,
    l1_reg: jnp.ndarray,
    *,
    maxupd: int = 10,
    w_mult: float = 1.0,
    dtype_name: Optional[str] = None,
) -> tuple:
    """One FULL alternating PG epoch as a single program.  At the
    reference's tiny pg config (k=10, maxupd=1) fixed per-dispatch costs
    dominate the math, so the whole epoch rides one dispatch; ``step_size``
    is traced so all epochs share the program.  Returns
    ``(A_perm, B_perm)``.

    (Fusing ALL epochs into one program was tried and measured 2.4x SLOWER
    than per-epoch dispatches in the same tunnel window — the async
    dispatch queue hides per-epoch latency and XLA schedules the fused
    multi-epoch loop worse — so one-epoch-per-dispatch is the keeper.)"""
    return _pg_epoch_core(
        A_perm, B_perm, ell_user, ell_item, l2_reg, step_size, l1_reg,
        maxupd, w_mult, dtype_name,
    )
