"""Ranking metrics vs a slow NumPy reference implementation."""

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from poismf_tpu.utils.metrics import ranking_metrics


def _numpy_reference(A, B, Xtr, Xte, k):
    n_items = B.shape[0]
    users = np.flatnonzero(np.diff(Xte.indptr) > 0)
    p, rec, ndcg, auc = [], [], [], []
    for u in users:
        scores = A[u] @ B.T
        tr = Xtr.indices[Xtr.indptr[u]:Xtr.indptr[u + 1]]
        te = Xte.indices[Xte.indptr[u]:Xte.indptr[u + 1]]
        tv = Xte.data[Xte.indptr[u]:Xte.indptr[u + 1]]
        cand = scores.copy()
        cand[tr] = -np.inf
        order = np.argsort(-cand, kind="stable")
        topk = order[:k]
        te_set = set(te.tolist())
        hits = np.array([i in te_set for i in topk])
        p.append(hits.sum() / k)
        rec.append(hits.sum() / max(len(te), 1))
        gain_of = dict(zip(te.tolist(), tv.tolist()))
        disc = 1.0 / np.log2(np.arange(k) + 2.0)
        dcg = sum(
            gain_of.get(int(i), 0.0) * disc[j] for j, i in enumerate(topk)
        )
        ideal = np.sort(tv)[::-1][:k]
        idcg = (ideal * disc[: len(ideal)]).sum()
        ndcg.append(dcg / idcg if idcg > 0 else 0.0)
        # AUC over candidates (train excluded)
        mask = np.ones(n_items, dtype=bool)
        mask[tr] = False
        neg_mask = mask.copy()
        neg_mask[te] = False
        neg_scores = scores[neg_mask]
        pos_scores = scores[te]
        wins = (pos_scores[:, None] > neg_scores[None, :]).sum()
        auc.append(wins / (len(pos_scores) * max(len(neg_scores), 1)))
    return dict(
        p_at_k=float(np.mean(p)),
        recall_at_k=float(np.mean(rec)),
        ndcg_at_k=float(np.mean(ndcg)),
        roc_auc=float(np.mean(auc)),
    )


def test_ranking_metrics_vs_numpy(rng):
    n_users, n_items, f = 40, 60, 5
    A = rng.uniform(0, 1, (n_users, f)).astype(np.float32)
    B = rng.uniform(0, 1, (n_items, f)).astype(np.float32)

    def sample(density):
        m = rng.random((n_users, n_items)) < density
        vals = rng.poisson(3.0, size=m.sum()) + 1.0
        out = np.zeros((n_users, n_items))
        out[m] = vals
        return out

    tr = sample(0.15)
    te = sample(0.08)
    te[tr > 0] = 0  # disjoint
    Xtr = scipy_sparse.csr_matrix(tr)
    Xte = scipy_sparse.csr_matrix(te)

    ours = ranking_metrics(A, B, Xtr, Xte, k=5, chunk=16)
    ref = _numpy_reference(A, B, Xtr, Xte, 5)
    for name in ref:
        assert abs(ours[name] - ref[name]) < 2e-3, (name, ours, ref)
