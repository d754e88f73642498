"""Golden tests of the batched objective/gradient kernels against a direct
NumPy reimplementation of the reference math (poismf.c:194-273)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poismf_tpu.sparse import build_counts, build_both_orientations
from poismf_tpu.ops import objective as obj


def numpy_fg_row(a, B, cols, xvals, Bsum, l2, w_mult=1.0):
    """f and grad for ONE row - literal transcription of the reference math."""
    pred = B[cols] @ a
    f = Bsum @ a + l2 * (a @ a) - w_mult * np.sum(xvals * np.log(pred))
    g = Bsum + 2.0 * l2 * a - w_mult * (B[cols].T @ (xvals / pred))
    return f, g


def make_problem(rng, n_rows=23, n_cols=17, k=7, density=0.3):
    nnz = int(n_rows * n_cols * density)
    rows = rng.integers(0, n_rows, size=nnz).astype(np.int32)
    cols = rng.integers(0, n_cols, size=nnz).astype(np.int32)
    key = rows.astype(np.int64) * n_cols + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = (rng.poisson(2.0, size=rows.shape[0]) + 1.0).astype(np.float32)
    A = (0.3 + rng.uniform(0, 0.01, size=(n_rows, k))).astype(np.float32)
    B = (0.3 + rng.uniform(0, 0.01, size=(n_cols, k))).astype(np.float32)
    return rows, cols, vals, A, B


@pytest.mark.parametrize("w_mult", [1.0, 2.5])
@pytest.mark.parametrize("nnz_chunk", [None, 1024])
def test_poisson_fg_matches_numpy(rng, w_mult, nnz_chunk):
    rows, cols, vals, A, B = make_problem(rng)
    n_rows, n_cols, k = A.shape[0], B.shape[0], A.shape[1]
    l1, l2 = 0.7, 1.3

    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    A_pad = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A_pad[:n_rows] = A
    Bsum = np.sum(B, axis=0) + l1

    if w_mult == 1.0:
        bsum_in = jnp.asarray(Bsum)
    else:
        bsum_in = obj.adjusted_bsum(jnp.asarray(B), jnp.asarray(Bsum), X, w_mult)

    f, g, _ = obj.poisson_fg(
        jnp.asarray(A_pad), jnp.asarray(B), X, bsum_in, l2, w_mult, nnz_chunk
    )
    f, g = np.asarray(f), np.asarray(g)

    # reference per-row computation
    for r in range(n_rows):
        sel = rows == r
        if not np.any(sel):
            continue
        if w_mult == 1.0:
            bs = Bsum
        else:
            bs = Bsum + (w_mult - 1.0) * B[cols[sel]].sum(axis=0)
        f_ref, g_ref = numpy_fg_row(
            A[r].astype(np.float64),
            B.astype(np.float64),
            cols[sel],
            vals[sel].astype(np.float64),
            bs.astype(np.float64),
            l2,
            w_mult,
        )
        assert np.isclose(f[r], f_ref, rtol=2e-4), r
        np.testing.assert_allclose(g[r], g_ref, rtol=2e-3, atol=1e-4)


def test_poisson_f_only_matches_fg(rng):
    rows, cols, vals, A, B = make_problem(rng)
    X = build_counts(rows, cols, vals, A.shape[0], B.shape[0], dtype=np.float32)
    A_pad = np.zeros((X.n_rows_pad, A.shape[1]), dtype=np.float32)
    A_pad[: A.shape[0]] = A
    Bsum = jnp.asarray(np.sum(B, axis=0))
    f1 = obj.poisson_fg(jnp.asarray(A_pad), jnp.asarray(B), X, Bsum, 0.5)[0]
    f2 = obj.poisson_f(jnp.asarray(A_pad), jnp.asarray(B), X, Bsum, 0.5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5)


def test_poisson_f_infinite_on_zero_pred(rng):
    """A row whose prediction is 0 at a positive count must get f = +inf
    (poisoned trial point), matching nonnegcg.c:308 semantics."""
    rows = np.array([0, 1], dtype=np.int32)
    cols = np.array([0, 1], dtype=np.int32)
    vals = np.array([2.0, 3.0], dtype=np.float32)
    X = build_counts(rows, cols, vals, 2, 2, dtype=np.float32)
    A = np.zeros((X.n_rows_pad, 3), dtype=np.float32)
    A[1] = 0.5  # row 1 fine; row 0 all-zero -> pred 0
    B = np.ones((2, 3), dtype=np.float32)
    f = obj.poisson_f(jnp.asarray(A), jnp.asarray(B), X, jnp.asarray(B.sum(0)), 0.0)
    f = np.asarray(f)
    assert np.isinf(f[0]) and f[0] > 0
    assert np.isfinite(f[1])


def test_hvp_matches_jax_autodiff(rng):
    """Exact HVP kernel vs jax.jvp-of-grad on the dense per-row objective."""
    rows, cols, vals, A, B = make_problem(rng, n_rows=11, n_cols=9, k=5)
    n_rows, k = A.shape[0], A.shape[1]
    l2 = 0.9
    X = build_counts(rows, cols, vals, n_rows, B.shape[0], dtype=np.float32)
    A_pad = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A_pad[:n_rows] = A
    V = rng.normal(size=A_pad.shape).astype(np.float32)
    Bsum = jnp.asarray(B.sum(axis=0))

    w2 = obj.poisson_hvp_weights(jnp.asarray(A_pad), jnp.asarray(B), X)
    hv = obj.poisson_hvp(jnp.asarray(V), jnp.asarray(B), X, w2, l2)

    def total_f(Amat):
        f = obj.poisson_fg(Amat, jnp.asarray(B), X, Bsum, l2)[0]
        return jnp.sum(f)

    grad_fn = jax.grad(total_f)
    _, hv_ad = jax.jvp(grad_fn, (jnp.asarray(A_pad),), (jnp.asarray(V),))
    np.testing.assert_allclose(
        np.asarray(hv)[:n_rows], np.asarray(hv_ad)[:n_rows], rtol=5e-3, atol=1e-3
    )


def test_hess_diag_matches_hvp_basis(rng):
    rows, cols, vals, A, B = make_problem(rng, n_rows=6, n_cols=8, k=4)
    X = build_counts(rows, cols, vals, A.shape[0], B.shape[0], dtype=np.float32)
    A_pad = np.zeros((X.n_rows_pad, 4), dtype=np.float32)
    A_pad[: A.shape[0]] = A
    l2 = 0.3
    w2 = obj.poisson_hvp_weights(jnp.asarray(A_pad), jnp.asarray(B), X)
    diag = np.asarray(obj.poisson_hess_diag(jnp.asarray(B), X, w2, l2))
    for j in range(4):
        e = np.zeros_like(A_pad)
        e[:, j] = 1.0
        hv = np.asarray(obj.poisson_hvp(jnp.asarray(e), jnp.asarray(B), X, w2, l2))
        np.testing.assert_allclose(diag[:, j], hv[:, j], rtol=1e-4, atol=1e-5)


def test_eval_llk(rng):
    rows, cols, vals, A, B = make_problem(rng)
    X = build_counts(rows, cols, vals, A.shape[0], B.shape[0], dtype=np.float32)
    A_pad = np.zeros((X.n_rows_pad, A.shape[1]), dtype=np.float32)
    A_pad[: A.shape[0]] = A
    from scipy.special import gammaln

    pred = np.sum(A[rows] * B[cols], axis=1)
    ll_ref = np.sum(vals * np.log(pred) - pred)
    ll = obj.eval_llk(jnp.asarray(A_pad), jnp.asarray(B), X)
    assert np.isclose(float(ll), ll_ref, rtol=1e-3, atol=0.1)

    ll_full_ref = ll_ref - np.sum(gammaln(vals + 1.0))
    ll_full = obj.eval_llk(jnp.asarray(A_pad), jnp.asarray(B), X, full_llk=True)
    assert np.isclose(float(ll_full), ll_full_ref, rtol=1e-3, atol=0.1)

    ll_miss_ref = np.sum(vals * np.log(pred)) - A.sum(0) @ B.sum(0)
    ll_miss = obj.eval_llk(
        jnp.asarray(A_pad), jnp.asarray(B), X, include_missing=True
    )
    assert np.isclose(float(ll_miss), ll_miss_ref, rtol=1e-3, atol=0.1)


def test_build_both_orientations(rng):
    rows, cols, vals, A, B = make_problem(rng)
    by_row, by_col = build_both_orientations(
        rows, cols, vals, A.shape[0], B.shape[0], dtype=np.float32
    )
    assert by_row.nnz == by_col.nnz == rows.shape[0]
    # by_col must contain the transposed triplets
    s1 = sorted(zip(np.asarray(by_row.row_ids[: by_row.nnz]).tolist(),
                    np.asarray(by_row.col_ids[: by_row.nnz]).tolist()))
    s2 = sorted(zip(np.asarray(by_col.col_ids[: by_col.nnz]).tolist(),
                    np.asarray(by_col.row_ids[: by_col.nnz]).tolist()))
    assert s1 == s2
    # row_ids sorted
    ri = np.asarray(by_row.row_ids)
    assert np.all(np.diff(ri) >= 0)


def test_eval_llk_chunked_matches_single_sweep(rng):
    """The host-side chunk loop (incl. the overlapping final chunk when the
    chunk size does not divide nnz_pad) must match the one-sweep program."""
    from tests.conftest import synth_counts

    rows, cols, vals = synth_counts(rng, n_users=200, n_items=90,
                                    density=0.15)
    bu, _ = build_both_orientations(rows, cols, vals, 200, 90)
    r = np.random.default_rng(3)
    A = jnp.asarray(r.uniform(0.1, 0.5, (bu.n_rows_pad, 6)).astype(np.float32))
    B = jnp.asarray(r.uniform(0.1, 0.5, (94, 6)).astype(np.float32))
    for miss in (False, True):
        one = float(obj.eval_llk(A, B, bu, include_missing=miss))
        # 1000 does not divide the padded nnz -> exercises the overlap mask
        ovl = float(obj.eval_llk(A, B, bu, include_missing=miss,
                                 nnz_chunk=1000))
        even = float(obj.eval_llk(A, B, bu, include_missing=miss,
                                  nnz_chunk=1024))
        assert abs(one - ovl) <= 1e-3 * abs(one)
        assert abs(one - even) <= 1e-3 * abs(one)
