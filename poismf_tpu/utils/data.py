"""Dataset helpers for implicit-feedback evaluation.

The reference's quality workflow depends on the external ``recometrics``
package to carve a per-user train/test split out of a counts matrix
(example/example_poismf_lastfm.ipynb cells 5-7).  This module provides the
equivalent split natively so the full workflow (fit -> split -> ranking
metrics) needs nothing outside this package + SciPy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def train_test_split(
    X,
    test_fraction: float = 0.2,
    users_test: Optional[int] = None,
    min_items_pool: int = 2,
    min_pos_test: int = 1,
    seed: int = 1,
):
    """Per-user holdout split of a sparse counts matrix.

    For up to ``users_test`` eligible users (enough interactions to leave at
    least ``min_pos_test`` held-out and one training item), moves
    ``test_fraction`` of their observed items into the test matrix.  All
    other users keep their full history in train.  Mirrors the protocol of
    recometrics' ``split_reco_train_test`` as used by the reference's
    notebook.

    Returns ``(X_train, X_test, test_users)`` as CSR matrices plus the ids
    of users with held-out items.
    """
    import scipy.sparse as sp

    Xcsr = X.tocsr()
    n_users, n_items = Xcsr.shape
    rng = np.random.default_rng(seed)
    nnz_per_user = np.diff(Xcsr.indptr)
    eligible = np.flatnonzero(nnz_per_user >= max(min_items_pool, 2))
    if users_test is not None and eligible.size > users_test:
        eligible = rng.choice(eligible, size=users_test, replace=False)
        eligible.sort()
    eligible_set = set(eligible.tolist())

    tr_r, tr_c, tr_v = [], [], []
    te_r, te_c, te_v = [], [], []
    test_users = []
    for u in range(n_users):
        lo, hi = Xcsr.indptr[u], Xcsr.indptr[u + 1]
        cols = Xcsr.indices[lo:hi]
        vals = Xcsr.data[lo:hi]
        if u in eligible_set:
            n_test = max(min_pos_test, int(round(test_fraction * cols.size)))
            n_test = min(n_test, cols.size - 1)  # keep >= 1 train item
            pick = rng.choice(cols.size, size=n_test, replace=False)
            mask = np.zeros(cols.size, dtype=bool)
            mask[pick] = True
            te_r.append(np.full(n_test, u))
            te_c.append(cols[mask])
            te_v.append(vals[mask])
            tr_r.append(np.full(cols.size - n_test, u))
            tr_c.append(cols[~mask])
            tr_v.append(vals[~mask])
            test_users.append(u)
        else:
            tr_r.append(np.full(cols.size, u))
            tr_c.append(cols)
            tr_v.append(vals)

    def build(r, c, v):
        if not r:
            return sp.csr_matrix((n_users, n_items))
        return sp.csr_matrix(
            (np.concatenate(v), (np.concatenate(r), np.concatenate(c))),
            shape=(n_users, n_items),
        )

    return build(tr_r, tr_c, tr_v), build(te_r, te_c, te_v), np.asarray(
        test_users
    )
