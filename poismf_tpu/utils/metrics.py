"""Batched ranking metrics for implicit-feedback evaluation on TPU.

The reference delegates quality evaluation to the external ``recometrics``
package (example/example_poismf_lastfm.ipynb cells 5-7; R/poismf.R:35-36):
P@K, Recall@K (called TP@K there), NDCG@K and ROC-AUC over per-user held-out
items, with the user's training items excluded from the candidate set.  This
module provides the same metrics as batched XLA programs: per chunk of users,
one ``[U, n_items]`` score matmul on the MXU, an exclusion mask, `lax.top_k`
for the @K metrics, and a full sort + searchsorted for AUC ranks.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -jnp.inf


def _csr_rows(indptr, indices, data, row):
    lo, hi = indptr[row], indptr[row + 1]
    return indices[lo:hi], data[lo:hi]


def _pad_lists(indptr, indices, data, rows, width):
    """[len(rows), width] padded item-id / value arrays (pad id = -1)."""
    ids = np.full((len(rows), width), -1, dtype=np.int64)
    vals = np.zeros((len(rows), width), dtype=np.float64)
    for i, r in enumerate(rows):
        ix, v = _csr_rows(indptr, indices, data, r)
        m = min(len(ix), width)
        ids[i, :m] = ix[:m]
        vals[i, :m] = v[:m]
    return ids, vals


def ranking_metrics(
    A: np.ndarray,
    B: np.ndarray,
    X_train,
    X_test,
    k: int = 5,
    users: Optional[np.ndarray] = None,
    chunk: int = 256,
) -> Dict[str, float]:
    """Mean P@K, Recall@K, NDCG@K (graded by held-out counts) and ROC-AUC
    over test users.

    ``A``: [n_users, f] user factors; ``B``: [n_items, f] item factors;
    ``X_train`` / ``X_test``: SciPy CSR (or convertible) of training /
    held-out counts, same shape.  ``users`` restricts evaluation to a subset
    (default: users with at least one held-out item).  Matches the protocol
    of the reference's Last.FM notebook: training items are excluded from
    the candidate set; AUC uses the full remaining catalog.
    """
    Xtr = X_train.tocsr()
    Xte = X_test.tocsr()
    n_items = B.shape[0]

    if users is None:
        users = np.flatnonzero(np.diff(Xte.indptr) > 0)
    users = np.asarray(users)
    if users.size == 0:
        raise ValueError("no test users with held-out items")

    test_w = int(np.diff(Xte.indptr)[users].max())
    train_w = int(np.diff(Xtr.indptr)[users].max()) if Xtr.nnz else 1
    test_w = max(test_w, 1)
    train_w = max(train_w, 1)

    B_d = jnp.asarray(B)

    @jax.jit
    def eval_chunk(A_u, train_ids, test_ids, test_vals):
        scores = A_u @ B_d.T  # [U, n_items] — MXU
        U = scores.shape[0]
        # mask training items out of the candidate set
        tr_valid = train_ids >= 0
        safe_tr = jnp.where(tr_valid, train_ids, 0)
        mask = jnp.zeros((U, n_items), dtype=bool)
        # max-combine: pad slots (safe id 0, False) must not clobber a real
        # True written at item 0 by another slot of the same row
        mask = mask.at[jnp.arange(U)[:, None], safe_tr].max(tr_valid)
        cand = jnp.where(mask, NEG_INF, scores)

        te_valid = test_ids >= 0
        safe_te = jnp.where(te_valid, test_ids, 0)
        n_test = te_valid.sum(axis=1)

        # ---- @K metrics off one top_k ----
        _, topk = lax.top_k(cand, k)
        hit = (topk[:, :, None] == safe_te[:, None, :]) & te_valid[:, None, :]
        hit_any = hit.any(axis=2)  # [U, k]
        p_at_k = hit_any.sum(axis=1) / k
        recall = hit_any.sum(axis=1) / jnp.maximum(n_test, 1)

        # graded NDCG@K: gain of a ranked item = its held-out count
        gains = jnp.where(te_valid, test_vals, 0.0)
        topk_gain = jnp.einsum("ukt,ut->uk", hit.astype(gains.dtype), gains)
        disc = 1.0 / jnp.log2(jnp.arange(k) + 2.0)
        dcg = topk_gain @ disc
        # ideal: top-k largest gains in descending order
        ideal_sorted = lax.top_k(gains, k)[0]
        idcg = ideal_sorted @ disc
        ndcg = jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-30), 0.0)

        # ---- ROC-AUC via ranks in the full candidate list ----
        s_sorted = jnp.sort(cand, axis=1)  # ascending
        pos_scores = jnp.take_along_axis(scores, safe_te, axis=1)
        # rank from bottom among candidates (ties: conservative lower rank);
        # the -inf-masked training items sort below everything, so subtract
        # them from each positive's rank
        n_tr = tr_valid.sum(axis=1)
        ranks = jax.vmap(jnp.searchsorted)(s_sorted, pos_scores)
        ranks = jnp.where(te_valid, ranks - n_tr[:, None], 0).astype(
            jnp.float64 if pos_scores.dtype == jnp.float64 else jnp.float32
        )
        n_cand = n_items - n_tr
        n_pos = n_test
        n_neg = jnp.maximum(n_cand - n_pos, 1)
        sum_ranks = (ranks * te_valid).sum(axis=1)
        auc = (sum_ranks - (n_pos * (n_pos - 1)) / 2.0) / (
            jnp.maximum(n_pos, 1) * n_neg
        )
        auc = jnp.clip(auc, 0.0, 1.0)
        return p_at_k, recall, ndcg, auc

    acc = {m: [] for m in ("p_at_k", "recall_at_k", "ndcg_at_k", "roc_auc")}
    for lo in range(0, users.size, chunk):
        u = users[lo : lo + chunk]
        tr_ids, _ = _pad_lists(Xtr.indptr, Xtr.indices, Xtr.data, u, train_w)
        te_ids, te_vals = _pad_lists(
            Xte.indptr, Xte.indices, Xte.data, u, test_w
        )
        out = eval_chunk(
            jnp.asarray(A[u]),
            jnp.asarray(tr_ids),
            jnp.asarray(te_ids),
            jnp.asarray(te_vals.astype(A.dtype)),
        )
        for name, arr in zip(acc, out):
            acc[name].append(np.asarray(arr))
    return {name: float(np.concatenate(v).mean()) for name, v in acc.items()}
