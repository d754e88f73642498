"""Tests for the serving kernels (predict / topN / out-of-sample factors),
mirroring the behaviors of pred.c and topN.c."""

import numpy as np
import pytest
import jax.numpy as jnp

from poismf_tpu import serve
from poismf_tpu.sparse import build_counts
from poismf_tpu.train import FitParams
from tests.conftest import synth_counts


@pytest.fixture
def factors(rng):
    A = rng.uniform(0, 1, size=(30, 6)).astype(np.float32)
    B = rng.uniform(0, 1, size=(50, 6)).astype(np.float32)
    return jnp.asarray(A), jnp.asarray(B)


def test_predict_pairs(factors, rng):
    A, B = factors
    u = rng.integers(0, 30, size=17).astype(np.int32)
    it = rng.integers(0, 50, size=17).astype(np.int32)
    out = np.asarray(serve.predict_pairs(A, B, jnp.asarray(u), jnp.asarray(it)))
    ref = np.sum(np.asarray(A)[u] * np.asarray(B)[it], axis=1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_topn_general(factors):
    A, B = factors
    a = A[3]
    scores = np.asarray(B) @ np.asarray(a)
    ref = np.argsort(-scores)[:10]
    idx, sc = serve.top_n(a, B, n_top=10, output_score=True)
    np.testing.assert_array_equal(idx, ref)
    np.testing.assert_allclose(sc, scores[ref], rtol=1e-5)


def test_topn_exclude(factors):
    A, B = factors
    a = A[0]
    excl = np.array([1, 5, 9, 30], dtype=np.int32)
    idx = serve.top_n(a, B, n_top=10, exclude_ix=excl)
    assert len(set(idx.tolist()) & set(excl.tolist())) == 0
    scores = np.asarray(B) @ np.asarray(a)
    scores[excl] = -np.inf
    np.testing.assert_array_equal(idx, np.argsort(-scores)[:10])


def test_topn_include(factors):
    A, B = factors
    a = A[1]
    incl = np.array([2, 3, 11, 17, 23, 42], dtype=np.int32)
    idx, sc = serve.top_n(a, B, n_top=4, include_ix=incl, output_score=True)
    assert set(idx.tolist()) <= set(incl.tolist())
    scores = np.asarray(B) @ np.asarray(a)
    ref = incl[np.argsort(-scores[incl])][:4]
    np.testing.assert_array_equal(idx, ref)


def test_topn_validation(factors):
    A, B = factors
    a = A[0]
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=5, include_ix=np.array([1]),
                    exclude_ix=np.array([2]))
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=0)
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=3, include_ix=np.array([1, 2]))
    # excluding more than n - n_top items refuses (topN.c:127); the largest
    # serveable request still returns exactly n_top items
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=49, exclude_ix=np.arange(5))
    idx = serve.top_n(a, B, n_top=45, exclude_ix=np.arange(5))
    assert len(idx) == 45
    assert len(set(idx.tolist()) & set(range(5))) == 0


def test_topn_masks_padded_items(factors):
    """Padded B rows (all zeros) must never be recommended even when scores
    are all negative ... here all scores are >= 0 so zero rows could tie;
    they are masked via n_items."""
    A, B = factors
    Bpad = jnp.concatenate([B, jnp.zeros((6, B.shape[1]), B.dtype)], axis=0)
    idx = serve.top_n(A[2], Bpad, n_top=10, n_items=50)
    assert np.all(idx < 50)


def test_topn_batched(factors):
    A, B = factors
    vals, idx = serve.top_n_batched(A[:5], B, 7)
    scores = np.asarray(A[:5]) @ np.asarray(B).T
    for q in range(5):
        np.testing.assert_array_equal(
            np.asarray(idx[q]), np.argsort(-scores[q])[:7]
        )


def _fit_small(rng, method="tncg"):
    from poismf_tpu.sparse import build_both_orientations
    from poismf_tpu.train import initialize_factors, run_poismf
    from poismf_tpu.ops.objective import make_bsum

    n_users, n_items, k = 60, 25, 6
    rows, cols, vals = synth_counts(rng, n_users, n_items, density=0.3)
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    A = initialize_factors(n_users, by_user.n_rows_pad, k, rng)
    B = initialize_factors(n_items, by_item.n_rows_pad, k, rng)
    p = FitParams(k=k, method=method, l2_reg=1.0, niter=5, maxupd=100)
    A, B, _ = run_poismf(A, B, by_user, by_item, p)
    Bsum = make_bsum(B, n_items, 0.0)
    Amean = jnp.mean(A[:n_users], axis=0)
    return A, B, Bsum, Amean, (rows, cols, vals), (n_users, n_items, k), p


def test_factors_single_close_to_training_row(rng):
    """Cold-start factors for an existing user's data should predict similarly
    to that user's trained factors."""
    A, B, Bsum, Amean, (rows, cols, vals), (n_users, n_items, k), p = \
        _fit_small(rng)
    r = int(np.argmax(np.bincount(rows)))  # densest user
    sel = rows == r
    a_new = serve.factors_single(
        B, Bsum, Amean, cols[sel], vals[sel],
        l2_reg=p.l2_reg, maxupd=1000, n_items=n_items,
    )
    a_new = np.asarray(a_new)
    assert not np.any(np.isnan(a_new))
    assert a_new.min() >= 0 and a_new.max() > 0
    # same data, same objective -> predictions on this user's items close
    pred_new = np.asarray(B)[cols[sel]] @ a_new
    pred_old = np.asarray(B)[cols[sel]] @ np.asarray(A[r])
    corr = np.corrcoef(pred_new, pred_old)[0, 1]
    assert corr > 0.8, corr


def test_factors_single_empty_returns_zeros(rng):
    A, B, Bsum, Amean, _, (n_users, n_items, k), p = _fit_small(rng)
    a_new = serve.factors_single(
        B, Bsum, Amean, np.array([], dtype=np.int32), np.array([]),
        l2_reg=p.l2_reg, n_items=n_items,
    )
    assert np.all(np.asarray(a_new) == 0.0)


@pytest.mark.parametrize("method", ["tncg", "cg", "pg"])
def test_factors_multiple_matches_training_users(rng, method):
    A, B, Bsum, Amean, (rows, cols, vals), (n_users, n_items, k), p = \
        _fit_small(rng, method=method)
    # re-solve the first 10 training users as if they were new
    sel = rows < 10
    X_new = build_counts(rows[sel], cols[sel], vals[sel], 10, n_items,
                         dtype=np.float32)
    A_new = serve.factors_multiple(B, Bsum, Amean, X_new, p, reuse_mean=True)
    A_new = np.asarray(A_new)[:10]
    assert not np.any(np.isnan(A_new))
    assert A_new.min() >= 0
    if method == "tncg":
        # the optimization problem is identical -> factors should be close
        pred_new = np.einsum("ij,ij->i", A_new[rows[sel]],
                             np.asarray(B)[cols[sel]])
        pred_old = np.einsum("ij,ij->i", np.asarray(A)[rows[sel]],
                             np.asarray(B)[cols[sel]])
        corr = np.corrcoef(pred_new, pred_old)[0, 1]
        assert corr > 0.8, corr


@pytest.mark.parametrize("method", ["pg", "cg", "tncg"])
def test_factors_multiple_ell_path(rng, method, monkeypatch):
    """The large-batch planar-ELL transform path matches the COO path."""
    from poismf_tpu import serve as serve_mod
    from poismf_tpu.sparse import build_both_orientations, build_counts
    from poismf_tpu.train import FitParams, initialize_factors, run_poismf

    rows, cols, vals = synth_counts(rng, 120, 50, density=0.15)
    by_user, by_item = build_both_orientations(rows, cols, vals, 120, 50)
    k = 6
    r = np.random.default_rng(1)
    A0 = initialize_factors(120, by_user.n_rows_pad, k, r, np.float32)
    B0 = initialize_factors(50, by_item.n_rows_pad, k, r, np.float32)
    p = FitParams(k=k, method=method, niter=3, l2_reg=1e2, maxupd=20)
    A, B, _ = run_poismf(A0, B0, by_user, by_item, p)
    Bsum = jnp.sum(B, axis=0)
    Amean = jnp.mean(A[:120], axis=0)

    new_rows, new_cols, new_vals = synth_counts(
        np.random.default_rng(5), 40, 50, density=0.2
    )
    X_new = build_counts(new_rows, new_cols, new_vals, 40, 50,
                         dtype=np.float32)

    out_coo = serve_mod.factors_multiple(B, Bsum, Amean, X_new, p)
    monkeypatch.setattr(serve_mod, "ELL_SERVE_NNZ_THRESHOLD", 0)
    out_ell = serve_mod.factors_multiple(B, Bsum, Amean, X_new, p)
    a, b = np.asarray(out_coo)[:40], np.asarray(out_ell)[:40]
    ll_diff = np.abs(a - b).max()
    # same math, different fp trajectory -> allow small divergence
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)


def test_top_n_batched_with_exclusion_mask(rng):
    """Batched full-catalog ranking with per-user exclusion masks."""
    A = jnp.asarray(rng.uniform(0, 1, (6, 5)).astype(np.float32))
    B = jnp.asarray(rng.uniform(0, 1, (30, 5)).astype(np.float32))
    mask = np.zeros((6, 30), dtype=bool)
    banned = rng.integers(0, 30, size=(6, 4))
    for u in range(6):
        mask[u, banned[u]] = True
    vals, idx = serve.top_n_batched(A, B, 5, jnp.asarray(mask))
    idx = np.asarray(idx)
    for u in range(6):
        assert not set(idx[u].tolist()) & set(np.flatnonzero(mask[u]).tolist())
        # equals per-user top_n with the same exclusions
        ref = serve.top_n(A[u], B, n_top=5,
                          exclude_ix=np.flatnonzero(mask[u]).astype(np.int32))
        np.testing.assert_array_equal(idx[u], ref)


def test_top_n_validation_errors(rng):
    a = jnp.asarray(rng.uniform(0, 1, (5,)).astype(np.float32))
    B = jnp.asarray(rng.uniform(0, 1, (10, 5)).astype(np.float32))
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=0)
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=11)
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=3, include_ix=np.array([1, 2]))
    # excluding more than n - n_top REFUSES, like topN.c:127 (the result is
    # never silently shorter than n_top)
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=8, exclude_ix=np.arange(5))
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=5, exclude_ix=np.arange(7))
    # excluding exactly n - n_top items still returns exactly n_top
    idx = serve.top_n(a, B, n_top=3, exclude_ix=np.arange(7))
    assert sorted(idx.tolist()) == [7, 8, 9]
    with pytest.raises(ValueError):  # nothing left to recommend
        serve.top_n(a, B, n_top=1, exclude_ix=np.arange(10))
    with pytest.raises(ValueError):
        serve.top_n(a, B, n_top=2, include_ix=np.array([1, 2, 3]),
                    exclude_ix=np.array([4]))


def test_top_n_batched_exhausted_candidates_sentinel(rng):
    """Users whose exclusion mask leaves fewer than n_top candidates get the
    sentinel id -1 (never a masked item's id) in the exhausted slots."""
    A = jnp.asarray(rng.uniform(0, 1, (3, 5)).astype(np.float32))
    B = jnp.asarray(rng.uniform(0, 1, (10, 5)).astype(np.float32))
    mask = np.zeros((3, 10), dtype=bool)
    mask[1, :8] = True  # user 1: only items 8, 9 remain but n_top=4
    mask[2, :] = True  # user 2: nothing remains
    vals, idx = serve.top_n_batched(A, B, 4, jnp.asarray(mask))
    idx, vals = np.asarray(idx), np.asarray(vals)
    assert np.all(idx[0] >= 0)
    assert sorted(idx[1, :2].tolist()) in ([8, 9], [9, 8]) or \
        set(idx[1, :2].tolist()) == {8, 9}
    np.testing.assert_array_equal(idx[1, 2:], [-1, -1])
    np.testing.assert_array_equal(idx[2], [-1] * 4)
    assert np.all(np.isneginf(vals[1, 2:])) and np.all(np.isneginf(vals[2]))
