"""Python mirror of the R package's test script contracts.

The repo ships an R binding (``r-pkg/poismf.tpu``, a reticulate bridge) whose
``tests/run_tests.R`` has never executed — no R toolchain exists in this
environment.  This module mirrors that script's checks against the SAME
Python surface the bridge calls, simulating the bridge's own marshalling
(R ``factor()`` level sort, 0-based codes, ``reindex=FALSE`` COO fit,
transposed ``[k, dim]`` views, 1-based output remap through levels, the
R-specific pg ``maxupd="auto" -> 1`` quirk) so the binding's contracts are
exercised by CI even though R itself is not.  Reference semantics:
/root/reference/R/poismf.R:172-218 (@examples), :241 (pg maxupd), :161-164
([k, dim] storage), :807-845 (topN remap).
"""

import numpy as np
import pytest

import scipy.sparse as sp

from poismf_tpu.models.poismf import PoisMF


def _r_factor(values):
    """R ``factor()``: levels are the SORTED unique strings; codes are
    positions in that order (1-based in R; 0-based here)."""
    levels = np.unique(np.asarray(values, dtype=str))
    codes = np.searchsorted(levels, np.asarray(values, dtype=str))
    return levels, codes


@pytest.fixture(scope="module")
def r_style_model():
    rng = np.random.default_rng(1)
    n_users, n_items, nnz = 120, 90, 1500
    users = np.array([f"u{i:03d}" for i in rng.integers(0, n_users, nnz)])
    items = np.array([f"i{i:03d}" for i in rng.integers(0, n_items, nnz)])
    counts = (rng.poisson(3, nnz) + 1).astype(np.float64)
    key = np.char.add(users, items)
    _, first = np.unique(key, return_index=True)
    users, items, counts = users[first], items[first], counts[first]

    levels_A, rows = _r_factor(users)
    levels_B, cols = _r_factor(items)
    X = sp.coo_matrix(
        (counts.astype(np.float32), (rows.astype(np.int32),
                                     cols.astype(np.int32))),
        shape=(len(levels_A), len(levels_B)),
    )
    # the bridge fits with reindex=False (reindexing done R-side via factor)
    py_model = PoisMF(k=10, method="tncg", niter=3).fit(X)
    return dict(py=py_model, levels_A=levels_A, levels_B=levels_B,
                users=users, items=items, counts=counts)


def test_r_model_shapes_and_transpose(r_style_model):
    """pmf_wrap_model stores A, B transposed [k, dim] (R/poismf.R:161-164);
    shapes and the print(model) fields must line up."""
    m = r_style_model
    A_r = np.asarray(m["py"].A).T  # the bridge's t(py_model$A)
    B_r = np.asarray(m["py"].B).T
    assert A_r.shape == (10, len(m["levels_A"]))
    assert B_r.shape == (10, len(m["levels_B"]))
    # get.factor.matrices returns the [dim, k] views back (t() again)
    np.testing.assert_array_equal(A_r.T, np.asarray(m["py"].A))


def test_r_predict_matches_explicit_dot(r_style_model):
    """predict.poismf maps string ids through the sorted levels (1-based
    match() - 1) and must equal the explicit factor dot product."""
    m = r_style_model
    u, it = m["users"][0], m["items"][0]
    ia = int(np.searchsorted(m["levels_A"], u))  # match(u, levels) - 1
    ib = int(np.searchsorted(m["levels_B"], it))
    p1 = float(m["py"].predict(ia, ib))
    p2 = float(np.asarray(m["py"].A)[ia] @ np.asarray(m["py"].B)[ib])
    assert abs(p1 - p2) <= 1e-4 * (1 + abs(p2))


def test_r_topn_remap_include_exclude(r_style_model):
    """pmf_topn_internal: 0-based backend ids come back 1-based through
    levels_B; exclude removes, include restricts, scores sorted desc."""
    m = r_style_model
    u = m["users"][0]
    ia = int(np.searchsorted(m["levels_A"], u))
    ix0, score = m["py"].topN(ia, n=5, output_score=True)
    ix_r = m["levels_B"][np.asarray(ix0)]  # levels_B[ix + 1L] in R
    assert len(ix_r) == 5 and np.all(np.diff(score) <= 0)
    # exclude the top item (bridge maps the string back through match())
    exc = int(np.searchsorted(m["levels_B"], ix_r[0]))
    ix2 = m["py"].topN(ia, n=5, exclude=np.array([exc]))
    assert exc not in set(np.asarray(ix2).tolist())
    ix3 = m["py"].topN(ia, n=3, include=np.asarray(ix0))
    assert set(np.asarray(ix3).tolist()) <= set(np.asarray(ix0).tolist())


def test_r_factors_single_and_batch(r_style_model):
    """factors.single (always-TNCG deep solve) and factors (training
    method, sorted-level row order) contracts from run_tests.R."""
    m = r_style_model
    u = m["users"][0]
    sel = m["users"] == u
    item_codes = np.searchsorted(m["levels_B"], m["items"][sel])
    a_vec = m["py"].predict_factors(
        (item_codes.astype(np.int64), m["counts"][sel])
    )
    assert a_vec.shape == (10,) and np.all(np.isfinite(a_vec))
    assert a_vec.max() > 0
    # batch: the bridge builds the CSR with sorted-level row codes so row i
    # of the output is levels(fA)[i]
    lv, rcodes = _r_factor(m["users"])
    icodes = np.searchsorted(m["levels_B"], m["items"])
    Xn = sp.coo_matrix(
        (m["counts"].astype(np.float32),
         (rcodes.astype(np.int32), icodes.astype(np.int32))),
        shape=(len(lv), len(m["levels_B"])),
    ).tocsr()
    A_new = m["py"].transform(Xn)
    assert A_new.shape == (len(lv), 10)
    assert np.all(np.isfinite(A_new))


def test_r_pg_auto_maxupd_quirk():
    """pmf_auto_params replicates the reference R package's pg
    maxupd="auto" -> 1 (R/poismf.R:241) where Python uses 10 — assert the
    quirk table the bridge hardcodes stays consistent with a pg fit at
    maxupd=1."""
    # the bridge-side table (poismf_tpu.R pmf_auto_params)
    r_auto_maxupd = {"tncg": 15 * 10, "cg": 5, "pg": 1}
    assert r_auto_maxupd["pg"] == 1  # the quirk itself
    rng = np.random.default_rng(2)
    X = sp.random(60, 30, density=0.1, random_state=3, format="coo",
                  dtype=np.float32)
    X.data = np.ceil(X.data * 5).astype(np.float32)
    model = PoisMF(k=5, method="pg", niter=2, maxupd=1, l2_reg=1e9)
    model.fit(X)
    assert model.is_fitted and np.all(np.isfinite(model.A))
