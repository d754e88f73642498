"""Tests for the batched non-negative CG solver (M2).

Validation strategy per SURVEY.md section 4: per-row agreement with a SciPy
reference solution of the same constrained problem, plus end-to-end fit
quality."""

import numpy as np
import pytest
import jax.numpy as jnp

from poismf_tpu.sparse import build_both_orientations, build_counts
from poismf_tpu.solvers.cg import cg_update
from poismf_tpu.train import FitParams, initialize_factors, run_poismf
from poismf_tpu.ops.objective import eval_llk, poisson_f, make_bsum
from tests.conftest import synth_counts


def _solve_rows_scipy(A0, B, rows, cols, vals, Bsum, l2):
    """Reference optima via scipy L-BFGS-B with x >= 0 bounds."""
    from scipy.optimize import minimize

    out = np.array(A0, dtype=np.float64)
    for r in range(A0.shape[0]):
        sel = rows == r
        if not np.any(sel):
            out[r] = 0.0
            continue
        c = cols[sel]
        x = vals[sel].astype(np.float64)

        def fun(a):
            pred = B[c] @ a
            if np.any(pred <= 0):
                return np.inf
            return Bsum @ a + l2 * (a @ a) - np.sum(x * np.log(pred))

        def grad(a):
            pred = np.maximum(B[c] @ a, 1e-300)
            return Bsum + 2 * l2 * a - B[c].T @ (x / pred)

        res = minimize(
            fun, out[r], jac=grad, method="L-BFGS-B",
            bounds=[(0, None)] * A0.shape[1],
        )
        out[r] = res.x
    return out


def test_cg_approaches_scipy_optimum(rng):
    n_rows, n_cols, k = 20, 15, 6
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.4)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    B = np.asarray(
        0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), dtype=np.float32
    )
    A0 = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A0[:n_rows] = 0.3 + rng.uniform(0, 0.01, size=(n_rows, k))
    l2 = 0.5
    Bsum = np.sum(B, axis=0)

    A_cg = cg_update(
        jnp.asarray(A0), jnp.asarray(B), X, jnp.asarray(Bsum),
        l2_reg=l2, maxupd=200,
    )
    A_cg = np.asarray(A_cg)

    A_ref = _solve_rows_scipy(A0[:n_rows], B.astype(np.float64), rows, cols,
                              vals, Bsum.astype(np.float64), l2)

    # compare OBJECTIVE values (the optimum may be flat in some directions)
    f_cg = np.asarray(
        poisson_f(jnp.asarray(A_cg), jnp.asarray(B), X, jnp.asarray(Bsum), l2)
    )[:n_rows]
    f_ref = np.asarray(
        poisson_f(
            jnp.asarray(np.vstack([A_ref, np.zeros((X.n_rows_pad - n_rows, k))])
                        .astype(np.float32)),
            jnp.asarray(B), X, jnp.asarray(Bsum), l2,
        )
    )[:n_rows]
    # CG should come close to the scipy optimum on nearly all rows
    gap = f_cg - f_ref
    rel = gap / np.maximum(np.abs(f_ref), 1.0)
    assert np.median(rel) < 5e-3, (np.median(rel), np.max(rel))
    assert np.mean(rel < 0.05) > 0.9


def test_cg_descends_objective(rng):
    n_rows, n_cols, k = 30, 20, 5
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.3)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    B = np.asarray(0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), np.float32)
    A0 = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A0[:n_rows] = 0.3 + rng.uniform(0, 0.01, size=(n_rows, k))
    Bsum = jnp.asarray(np.sum(B, axis=0))
    f0 = np.asarray(poisson_f(jnp.asarray(A0), jnp.asarray(B), X, Bsum, 0.5))
    A1 = cg_update(jnp.asarray(A0), jnp.asarray(B), X, Bsum, l2_reg=0.5,
                   maxupd=5)
    f1 = np.asarray(poisson_f(A1, jnp.asarray(B), X, Bsum, 0.5))
    # objective never increases on any row (monotone line search)
    assert np.all(f1[:n_rows] <= f0[:n_rows] + 1e-3)
    assert np.sum(f1[:n_rows]) < np.sum(f0[:n_rows])
    assert float(jnp.min(A1)) >= 0.0


@pytest.mark.parametrize("limit_step", [True, False])
def test_cg_fit_improves_llk(rng, limit_step):
    n_users, n_items, k = 100, 40, 8
    rows, cols, vals = synth_counts(rng, n_users, n_items, density=0.2)
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    A = initialize_factors(n_users, by_user.n_rows_pad, k, rng)
    B = initialize_factors(n_items, by_item.n_rows_pad, k, rng)
    ll0 = float(eval_llk(A, B, by_user, include_missing=True))
    params = FitParams(k=k, method="cg", l2_reg=1.0, niter=10, maxupd=5,
                       limit_step=limit_step)
    A1, B1, status = run_poismf(A, B, by_user, by_item, params)
    assert status == 0
    ll1 = float(eval_llk(A1, B1, by_user, include_missing=True))
    assert ll1 > ll0, (ll0, ll1)
    assert not bool(jnp.any(jnp.isnan(A1)))
