"""Ranking-quality parity against the compiled reference C.

The golden trajectory tests (test_reference_parity.py) check per-epoch LL on
identical inits; this checks what the reference's notebook actually reports
(BASELINE.md): ranking metrics on a per-user holdout.  Both implementations
fit the SAME power-law train split from the SAME initialization, then P@5,
Recall@5, NDCG@5 and ROC-AUC are computed with the same evaluator
(poismf_tpu.utils.metrics.ranking_metrics) and compared.

Reference protocol: example/example_poismf_lastfm.ipynb cells 5-7 (metrics
via recometrics), run_poismf poismf.c:435-632.
"""

import numpy as np
import pytest

from tests import ref_c
from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.train import FitParams, run_poismf, initialize_factors
from poismf_tpu.utils.data import train_test_split
from poismf_tpu.utils.metrics import ranking_metrics

pytestmark = [
    pytest.mark.skipif(
        ref_c.load() is None,
        reason="reference C library unavailable (no gcc or /root/reference)",
    ),
    # slow tier: these compile and fit the reference C in-process
    # (minutes each on this host) — excluded from `-m quick`
    pytest.mark.slow,
]

N_USERS, N_ITEMS, K = 1500, 600, 10


def _powerlaw_counts(rng, n_users, n_items, nnz):
    item_p = 1.0 / np.arange(1, n_items + 1) ** 0.9
    item_p /= item_p.sum()
    user_w = rng.lognormal(0.0, 1.0, size=n_users)
    user_p = user_w / user_w.sum()
    rows = rng.choice(n_users, size=nnz, p=user_p)
    cols = rng.choice(n_items, size=nnz, p=item_p)
    key = rows * n_items + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx].astype(np.int32), cols[idx].astype(np.int32)
    vals = (1.0 + rng.poisson(5.0, size=rows.shape[0])).astype(np.float32)
    return rows, cols, vals


def _fit_both(method, l2, maxupd, niter, reuse_prev):
    import scipy.sparse as sp

    rng = np.random.default_rng(7)
    rows, cols, vals = _powerlaw_counts(rng, N_USERS, N_ITEMS, 45_000)
    X = sp.csr_matrix(
        (vals, (rows, cols)), shape=(N_USERS, N_ITEMS), dtype=np.float64
    )
    Xtr, Xte, _ = train_test_split(X, test_fraction=0.25, seed=3)

    nprng = np.random.default_rng(11)
    A0 = 0.3 + nprng.uniform(0.0, 0.01, size=(N_USERS, K))
    B0 = 0.3 + nprng.uniform(0.0, 0.01, size=(N_ITEMS, K))

    # --- reference C, float64, in place ---
    A_ref = np.ascontiguousarray(A0)
    B_ref = np.ascontiguousarray(B0)
    rc = ref_c.run_poismf_reference(
        A_ref, B_ref, Xtr.tocsr(), Xtr.tocsc(),
        method=method, l2_reg=l2, numiter=niter, maxupd=maxupd,
        early_stop=True, reuse_prev=reuse_prev,
    )
    assert rc == 0

    # --- this implementation, same init ---
    coo = Xtr.tocoo()
    by_user, by_item = build_both_orientations(
        coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data.astype(np.float32), N_USERS, N_ITEMS,
    )
    import jax.numpy as jnp

    A = jnp.zeros((by_user.n_rows_pad, K), dtype=jnp.float32)
    A = A.at[:N_USERS].set(jnp.asarray(A0, dtype=jnp.float32))
    B = jnp.zeros((by_item.n_rows_pad, K), dtype=jnp.float32)
    B = B.at[:N_ITEMS].set(jnp.asarray(B0, dtype=jnp.float32))
    params = FitParams(
        k=K, method=method, l2_reg=l2, maxupd=maxupd, niter=niter,
        reuse_prev=reuse_prev,
    )
    A, B, st = run_poismf(A, B, by_user, by_item, params)
    assert st == 0
    A_ours = np.asarray(A[:N_USERS], dtype=np.float64)
    B_ours = np.asarray(B[:N_ITEMS], dtype=np.float64)

    m_ref = ranking_metrics(A_ref, B_ref, Xtr, Xte, k=5)
    m_ours = ranking_metrics(A_ours, B_ours, Xtr, Xte, k=5)
    return m_ref, m_ours


@pytest.mark.parametrize(
    "method,l2,maxupd,niter,reuse_prev",
    [
        ("tncg", 1e3, 15 * K, 10, True),
        ("cg", 1e4, 5, 30, False),
    ],
)
def test_ranking_quality_matches_reference(method, l2, maxupd, niter,
                                           reuse_prev):
    m_ref, m_ours = _fit_both(method, l2, maxupd, niter, reuse_prev)
    for key in ("p_at_k", "recall_at_k", "ndcg_at_k", "roc_auc"):
        ref_v, our_v = m_ref[key], m_ours[key]
        # same data, same init, different arithmetic orders: demand the
        # rebuilt solver lands in the same quality regime — within 10%
        # relative or 0.02 absolute, and never materially WORSE
        tol = max(0.02, 0.10 * ref_v)
        assert our_v >= ref_v - tol, (method, key, ref_v, our_v)
        assert abs(our_v - ref_v) <= max(tol, 0.05 * max(ref_v, our_v)), (
            method, key, ref_v, our_v,
        )
