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


def test_train_test_split(rng):
    from poismf_tpu.utils.data import train_test_split

    n_users, n_items = 80, 40
    dense = (rng.random((n_users, n_items)) < 0.2) * (
        rng.poisson(3.0, (n_users, n_items)) + 1.0
    )
    X = scipy_sparse.csr_matrix(dense)
    Xtr, Xte, test_users = train_test_split(
        X, test_fraction=0.25, users_test=30, seed=3
    )
    # partition: train + test == original, disjoint
    assert (Xtr + Xte != X).nnz == 0
    assert Xtr.multiply(Xte).nnz == 0
    assert len(test_users) <= 30 and len(test_users) > 0
    # every test user keeps at least one training item
    tr_nnz = np.diff(Xtr.indptr)
    te_nnz = np.diff(Xte.indptr)
    assert (tr_nnz[test_users] >= 1).all()
    assert (te_nnz[test_users] >= 1).all()
    # non-test users have nothing held out
    others = np.setdiff1d(np.arange(n_users), test_users)
    assert te_nnz[others].sum() == 0


def test_split_plus_metrics_end_to_end(rng):
    """Full quality workflow: split -> fit -> ranking metrics."""
    from poismf_tpu import PoisMF
    from poismf_tpu.utils.data import train_test_split
    from poismf_tpu.utils.metrics import ranking_metrics

    n_users, n_items = 100, 60
    # genuinely low-rank Poisson data so there is structure to learn
    A_true = rng.gamma(0.7, 1.0, (n_users, 4))
    B_true = rng.gamma(0.7, 1.0, (n_items, 4))
    dense = rng.poisson(A_true @ B_true.T)
    X = scipy_sparse.csr_matrix(dense)
    Xtr, Xte, test_users = train_test_split(X, seed=2)
    m = PoisMF(k=6, method="tncg", niter=3, maxupd=60).fit(Xtr.tocoo())
    mets = ranking_metrics(m.A, m.B, Xtr, Xte, k=5, users=test_users)
    assert 0.0 <= mets["p_at_k"] <= 1.0
    assert 0.0 <= mets["roc_auc"] <= 1.0
    assert mets["roc_auc"] > 0.5  # model beats random ranking
