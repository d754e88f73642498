"""Serving surface: pointwise prediction, top-N ranking, out-of-sample factors.

TPU-native equivalents of /root/reference/src/pred.c and src/topN.c:

  * :func:`predict_pairs`   <->  predict_multiple (pred.c:42-64)
  * :func:`top_n`           <->  topN (topN.c:112-284)
  * :func:`factors_multiple`<->  factors_multiple (pred.c:66-199)
  * :func:`factors_single`  <->  factors_single (pred.c:201-304)

The reference's three topN strategies (include-list dots / exclude-swap /
gemv + quickselect-argpartition) collapse on TPU into a single pattern:
matvec (or batched matmul) on the MXU, a -inf scatter for exclusions, and
``jax.lax.top_k`` - there is no quickselect to port because top_k IS the
hardware-friendly partial sort.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .sparse import CountsMatrix, build_counts, dedupe_sum
from .utils.transfer import fetch_host
from .ops import objective as obj
from .train import FitParams
from .solvers.pg import pg_update
from .solvers.cg import cg_update
from .solvers.tncg import tncg_update

NEG_INF = -jnp.inf

# batch out-of-sample solves larger than this take the planar-ELL path
ELL_SERVE_NNZ_THRESHOLD = 100_000


@jax.jit
def predict_pairs(A: jnp.ndarray, B: jnp.ndarray, ixA: jnp.ndarray,
                  ixB: jnp.ndarray) -> jnp.ndarray:
    """out[t] = <A[ixA[t]], B[ixB[t]]> - batched gather + rowwise dot."""
    return jnp.sum(jnp.take(A, ixA, axis=0) * jnp.take(B, ixB, axis=0),
                   axis=-1)


@functools.partial(jax.jit, static_argnames=("n_top",))
def _topn_scores_full(a_vec: jnp.ndarray, B: jnp.ndarray, n_top: int,
                      exclude_mask: Optional[jnp.ndarray] = None):
    scores = B @ a_vec  # [n_items] - MXU matvec (gemv of topN.c:219-223)
    if exclude_mask is not None:
        scores = jnp.where(exclude_mask, NEG_INF, scores)
    vals, idx = lax.top_k(scores, n_top)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("n_top",))
def _topn_include(a_vec: jnp.ndarray, B: jnp.ndarray,
                  include_ix: jnp.ndarray, n_top: int):
    scores = jnp.take(B, include_ix, axis=0) @ a_vec
    vals, pos = lax.top_k(scores, n_top)
    return vals, jnp.take(include_ix, pos)


def top_n(
    a_vec: jnp.ndarray,
    B: jnp.ndarray,
    n_top: int = 10,
    include_ix: Optional[np.ndarray] = None,
    exclude_ix: Optional[np.ndarray] = None,
    n_items: Optional[int] = None,
    output_score: bool = False,
):
    """Top-N highest-score items for one user vector.

    Mirrors topN's validation (topN.c:121-128): include and exclude are
    mutually exclusive; bounds are checked by the caller (model layer).
    ``n_items`` masks out padded B rows.
    """
    n = B.shape[0] if n_items is None else n_items
    if include_ix is not None and exclude_ix is not None:
        raise ValueError("Can pass only one of 'include' or 'exclude'.")
    if n_top <= 0:
        raise ValueError("'n_top' must be positive.")
    if include_ix is not None:
        include_ix = jnp.asarray(include_ix, dtype=jnp.int32)
        if n_top > include_ix.shape[0]:
            raise ValueError("'n_top' is larger than the include list.")
        vals, idx = _topn_include(a_vec, B, include_ix, n_top)
    else:
        mask = None
        n_excl = 0
        if exclude_ix is not None or B.shape[0] != n:
            mask = jnp.zeros((B.shape[0],), dtype=bool)
            if B.shape[0] != n:  # mask padded item rows
                mask = mask.at[n:].set(True)
            if exclude_ix is not None:
                n_excl = int(np.unique(np.asarray(exclude_ix)).shape[0])
                mask = mask.at[jnp.asarray(exclude_ix, dtype=jnp.int32)].set(
                    True
                )
        if n_top > n:
            raise ValueError("'n_top' is larger than the number of items.")
        if n_excl > n - n_top:
            # the reference REFUSES rather than returning a short list
            # (topN.c:127 ``n_exclude > n-n_top -> return 2`` -> the Python
            # wrapper raises); callers always get exactly n_top items
            raise ValueError(
                "Too many excluded items: fewer than 'n_top' candidates "
                "remain."
            )
        vals, idx = _topn_scores_full(a_vec, B, n_top, mask)
    if output_score:
        return fetch_host(idx), fetch_host(vals)
    return fetch_host(idx)


@functools.partial(jax.jit, static_argnames=("n_top", "n_items"))
def top_n_batched(
    A_query: jnp.ndarray,
    B: jnp.ndarray,
    n_top: int,
    exclude_mask: Optional[jnp.ndarray] = None,
    n_items: Optional[int] = None,
):
    """Full-catalog top-N for a BATCH of user vectors: one [Q,k]x[k,n] MXU
    matmul + top_k.  ``exclude_mask`` is an optional [Q, n_items] bool mask
    (True = forbidden); ``n_items`` masks padded B rows in-kernel via an
    iota compare (no [Q, n] mask tensor needed for the padding alone).
    This is the high-throughput serving path with no per-user host
    round-trips.

    Positions whose candidate pool is exhausted (every remaining item was
    masked) return the sentinel id ``-1`` with a ``-inf`` score, never a
    masked item's id — the batched analog of the reference's refusal when
    ``n_exclude > n - n_top`` (topN.c:127)."""
    scores = A_query @ B.T
    masked = False
    if n_items is not None and n_items < B.shape[0]:
        cols = lax.broadcasted_iota(jnp.int32, (1, B.shape[0]), 1)
        scores = jnp.where(cols >= n_items, NEG_INF, scores)
        masked = True
    if exclude_mask is not None:
        scores = jnp.where(exclude_mask, NEG_INF, scores)
        masked = True
    vals, idx = lax.top_k(scores, n_top)
    if masked:
        idx = jnp.where(vals == NEG_INF, -1, idx)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("n_top", "n_items"))
def top_n_batched_excl(
    A_query: jnp.ndarray,
    B: jnp.ndarray,
    excl_items: jnp.ndarray,  # [Q, L] int32 (padded per-user lists)
    excl_valid: jnp.ndarray,  # [Q, L] bool
    n_top: int,
    n_items: Optional[int] = None,
):
    """``top_n_batched`` with per-user exclusion lists scattered to -inf ON
    DEVICE — the scalable form of ``exclude_seen``: the host supplies only
    the padded [Q, L] train-item lists (L = the batch's max list length),
    never a [Q, n_items] mask (at the Last.FM catalog that mask is ~160 KB
    PER USER).  Matches the reference's per-query C-side exclusion
    (topN.c:155-169) at batch scale.  Exhausted candidate pools yield the
    sentinel id ``-1`` exactly like ``top_n_batched``."""
    Q = A_query.shape[0]
    scores = A_query @ B.T  # [Q, n_rows_pad]
    if n_items is not None and n_items < B.shape[0]:
        cols = lax.broadcasted_iota(jnp.int32, (1, B.shape[0]), 1)
        scores = jnp.where(cols >= n_items, NEG_INF, scores)
    rows = lax.broadcasted_iota(jnp.int32, excl_items.shape, 0)
    safe = jnp.where(excl_valid, excl_items, 0)
    # scatter-min of -inf at the valid slots; invalid slots write +inf
    # (a no-op for min) into column 0
    upd = jnp.where(excl_valid, NEG_INF, jnp.inf).astype(scores.dtype)
    scores = scores.at[rows.reshape(-1), safe.reshape(-1)].min(
        upd.reshape(-1), mode="drop"
    )
    del Q
    vals, idx = lax.top_k(scores, n_top)
    idx = jnp.where(vals == NEG_INF, -1, idx)
    return vals, idx


# ---------------------------------------------------------------------------
# Out-of-sample factors
# ---------------------------------------------------------------------------


def factors_multiple(
    B: jnp.ndarray,
    Bsum: jnp.ndarray,
    Amean: jnp.ndarray,
    X_new: CountsMatrix,
    params: FitParams,
    reuse_mean: bool = True,
) -> jnp.ndarray:
    """Solve factors for a batch of NEW rows with B fixed (pred.c:66-199).

    Init rows to Amean (or 1e-3 for tncg with reuse_mean=False); one solver
    pass with the training method:
      * pg:  ``niter`` outer iterations with step halving (pred.c:149-168),
      * cg:  ``maxupd * niter`` updates in ONE call (pred.c:171-178),
      * tncg: one tncg pass, early-stop disabled (pred.c:180-189).
    ``Bsum`` must already include the training l1 (pred.c:78).
    """
    p = params.resolved()
    # large batches take the gather-free planar-ELL path
    if p.layout == "ell" and X_new.nnz > ELL_SERVE_NNZ_THRESHOLD:
        return _factors_multiple_ell(B, Bsum, Amean, X_new, p, reuse_mean)

    R = X_new.n_rows_pad
    k = B.shape[1]
    dtype = B.dtype

    A0 = jnp.broadcast_to(Amean.astype(dtype), (R, k))

    bsum_in = Bsum
    if p.w_mult != 1.0:
        bsum_in = obj.adjusted_bsum(B, Bsum, X_new, p.w_mult)

    if p.method == "pg":
        step = p.initial_step
        A = A0
        for _ in range(p.niter):
            A = pg_update(
                A, B, X_new, bsum_in,
                jnp.asarray(p.l2_reg, dtype=dtype),
                jnp.asarray(step, dtype=dtype),
                w_mult=p.w_mult, maxupd=p.maxupd, nnz_chunk=p.nnz_chunk,
            )
            step *= 0.5
    elif p.method == "cg":
        A = cg_update(
            A0, B, X_new, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult,
            maxupd=p.maxupd * p.niter, limit_step=p.limit_step,
            nnz_chunk=p.nnz_chunk,
        )
    else:  # tncg
        # ftol=0: serving solves mirror the reference's f-rescaled ftol,
        # which tightens toward zero near the optimum (tnc.c:720-746)
        A, _ = tncg_update(
            A0, B, X_new, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
            reuse_prev=reuse_mean,  # reuse_mean=False -> 1e-3 init, like C
            track_unchanged=False, nnz_chunk=p.nnz_chunk, ftol=0.0,
            l2_in_f=True,
        )
    return A


def _factors_multiple_ell(
    B: jnp.ndarray,
    Bsum: jnp.ndarray,
    Amean: jnp.ndarray,
    X_new: CountsMatrix,
    p: FitParams,
    reuse_mean: bool,
) -> jnp.ndarray:
    """Batch out-of-sample solve on the planar-ELL layout (B fixed, columns
    reference B's original row order).  Returns rows in X_new's order."""
    from .ops import ell as ell_ops
    from .solvers.pg import pg_update_ell
    from .solvers.cg import cg_update_ell
    from .solvers.tncg import tncg_update_ell

    k = B.shape[1]
    dtype = B.dtype
    ell = ell_ops.ell_from_counts(X_new)
    plane_dtype = None if p.plane_dtype is None else jnp.dtype(p.plane_dtype)
    planes = ell_ops.gather_planes(B, ell, plane_dtype)
    bsum_in = Bsum.astype(dtype)
    if p.w_mult != 1.0:
        bsum_in = ell_ops.adjusted_bsum_ell(planes, ell, bsum_in, p.w_mult)

    A0 = jnp.broadcast_to(Amean.astype(dtype), (ell.n_rows_ell, k))

    if p.method == "pg":
        step = p.initial_step
        A = A0
        for _ in range(p.niter):
            A = pg_update_ell(
                A, planes, ell, bsum_in,
                jnp.asarray(p.l2_reg, dtype=dtype),
                jnp.asarray(step, dtype=dtype),
                w_mult=p.w_mult, maxupd=p.maxupd,
            )
            step *= 0.5
    elif p.method == "cg":
        A = cg_update_ell(
            A0, planes, ell, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult,
            maxupd=p.maxupd * p.niter, limit_step=p.limit_step,
        )
    else:
        A, _ = tncg_update_ell(
            A0, planes, ell, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
            reuse_prev=reuse_mean, track_unchanged=False, ftol=0.0,
            l2_in_f=True,
        )
    out = ell_ops.permute_rows(A, ell.inv_perm)  # back to input row order
    return out


def factors_single(
    B: jnp.ndarray,
    Bsum: jnp.ndarray,
    Amean: jnp.ndarray,
    item_ix: np.ndarray,
    counts: np.ndarray,
    *,
    l2_reg: float,
    l1_new: float = 0.0,
    l1_old: float = 0.0,
    w_mult: float = 1.0,
    maxupd: int = 1000,
    reuse_mean: bool = True,
    n_items: Optional[int] = None,
) -> jnp.ndarray:
    """Factors for ONE new row - ALWAYS via TNCG regardless of the training
    method (pred.c:201-304; docstring poismf/__init__.py:511-515).

    Handles the ``l1_new - l1_old`` Bsum shift (pred.c:254-257) and the
    w_mult re-weighting of Bsum over this row's items (pred.c:242-248).
    """
    k = B.shape[1]
    dtype = B.dtype
    item_ix = np.asarray(item_ix, dtype=np.int32).reshape(-1)
    counts = np.asarray(counts).reshape(-1)
    if item_ix.size == 0:
        return jnp.zeros((k,), dtype=dtype)

    n = B.shape[0] if n_items is None else n_items
    # aggregate duplicate items so the w_mult Bsum re-weighting below counts
    # each item once (the training ingest sums duplicates the same way)
    _, item_ix, counts = dedupe_sum(
        np.zeros_like(item_ix), item_ix, counts.astype(dtype), n
    )
    X1 = build_counts(
        np.zeros_like(item_ix), item_ix, counts, 1, n, dtype=np.dtype(str(dtype))
    )

    bsum_pass = Bsum.astype(dtype)
    if w_mult != 1.0:
        row_b = jnp.sum(jnp.take(B, jnp.asarray(item_ix), axis=0), axis=0)
        bsum_pass = bsum_pass + (w_mult - 1.0) * row_b
    l1_delta = l1_new - l1_old
    if l1_delta > 0.0:
        bsum_pass = bsum_pass + l1_delta

    A0 = jnp.zeros((X1.n_rows_pad, k), dtype=dtype)
    A0 = A0.at[0].set(Amean.astype(dtype))
    out, _ = tncg_update(
        A0, B, X1, bsum_pass,
        l2_reg=float(l2_reg), w_mult=float(w_mult), maxupd=int(maxupd),
        reuse_prev=reuse_mean, track_unchanged=False, ftol=0.0,
            l2_in_f=True,
    )
    return out[0]
