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


def test_fused_fg_poisons_row_zeroing_trial(rng):
    """The fused (f, g) trial evaluation must keep the reference's
    Inf-rejected line search (nonnegcg.c:223-226, 308): a trial that
    zeroes a row's last positive coordinate has pred = 0 at positive
    counts, so its f must be non-finite (rejected) while the gradient
    stays finite (floored weights)."""
    from poismf_tpu.ops.objective import poisson_fg

    n_rows, n_cols, k = 4, 6, 5
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.5)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    B = np.asarray(
        0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), dtype=np.float32
    )
    Bsum = make_bsum(jnp.asarray(B), n_cols, 0.0)
    A = jnp.zeros((X.n_rows_pad, k), dtype=jnp.float32)  # all-zero rows
    f, g, _ = poisson_fg(A, jnp.asarray(B), X, Bsum, 0.5)
    f = np.asarray(f)[:n_rows]
    has = np.asarray(X.row_nnz)[:n_rows] > 0
    assert np.any(has)
    assert not np.any(np.isfinite(f[has])), f  # every nnz row poisoned
    assert np.all(np.isfinite(np.asarray(g))), "gradient must stay finite"


def test_fused_fg_ell_poisons_like_coo(rng):
    """ELL-backend fg must poison identically to the flat-COO fg."""
    from poismf_tpu.ops import ell as ell_ops
    from poismf_tpu.ops.objective import poisson_fg

    n_rows, n_cols, k = 30, 12, 4
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.3)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    ell = ell_ops.ell_from_counts(X)
    B = np.asarray(
        0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), dtype=np.float32
    )
    Bsum = make_bsum(jnp.asarray(B), n_cols, 0.0)
    # zero out a few rows entirely -> those rows' f poisons in both backends
    A = np.asarray(
        0.3 + rng.uniform(0, 0.01, size=(X.n_rows_pad, k)), dtype=np.float32
    )
    A[1] = 0.0
    A[7] = 0.0
    A = jnp.asarray(A)
    f_coo, g_coo, _ = poisson_fg(A, jnp.asarray(B), X, Bsum, 0.5)
    planes = ell_ops.gather_planes(jnp.asarray(B), ell)
    A_perm = ell_ops.permute_rows(A, ell.perm)
    f_ell_v, g_ell_v, _ = ell_ops.fg_ell(A_perm, planes, ell, Bsum, 0.5)
    f_back = np.asarray(jnp.take(f_ell_v, ell.inv_perm, axis=0))[:n_rows]
    g_back = np.asarray(jnp.take(g_ell_v, ell.inv_perm, axis=0))[:n_rows]
    f_ref = np.asarray(f_coo)[:n_rows]
    has = np.asarray(X.row_nnz)[:n_rows] > 0
    fin = np.isfinite(f_ref)
    assert not np.any(fin[[1, 7]] & has[[1, 7]]) and np.any(has[[1, 7]])
    assert np.array_equal(fin, np.isfinite(f_back))
    np.testing.assert_allclose(f_back[fin], f_ref[fin], rtol=2e-4)
    np.testing.assert_allclose(
        g_back, np.asarray(g_coo)[:n_rows], rtol=2e-4, atol=1e-4
    )


def test_ray_matches_fused_trajectory(rng):
    """The cached-plane ray line search must reproduce the fused-trial
    trajectory: with limit_step=True every trial stays within the first
    bound crossing, so pred(x + a*d) = px + a*<B,d> is exact (modulo fp)
    and the Armijo decisions — hence the iterates — coincide."""
    from poismf_tpu.ops import ell as ell_ops
    from poismf_tpu.solvers.cg import cg_update_ell

    # k large enough that the accounted ray cost undercuts fused trials
    # (the crossover is ~k=20 on COO; the bench runs k=50)
    n_rows, n_cols, k = 60, 25, 32
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.3)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    B = np.asarray(0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), np.float32)
    A0 = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A0[:n_rows] = 0.3 + rng.uniform(0, 0.01, size=(n_rows, k))
    Bsum = jnp.asarray(np.sum(B, axis=0) + 0.7)  # l1 folded in, as in training

    kw = dict(l2_reg=0.5, maxupd=8, limit_step=True, return_passes=True)
    A_fused, p_fused = cg_update(
        jnp.asarray(A0), jnp.asarray(B), X, Bsum, use_ray=False, **kw
    )
    A_ray, p_ray = cg_update(
        jnp.asarray(A0), jnp.asarray(B), X, Bsum, use_ray=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(A_ray), np.asarray(A_fused), rtol=2e-4, atol=1e-6
    )
    # the ray mode must actually be cheaper in accounted sweeps
    assert float(p_ray) < float(p_fused), (float(p_ray), float(p_fused))

    # ELL backend: same equivalence on the permuted layout
    ell = ell_ops.ell_from_counts(X)
    planes = ell_ops.gather_planes(jnp.asarray(B), ell)
    A0p = ell_ops.permute_rows(jnp.asarray(A0), ell.perm)
    E_fused, ep_fused = cg_update_ell(
        A0p, planes, ell, Bsum, use_ray=False, **kw
    )
    E_ray, ep_ray = cg_update_ell(
        A0p, planes, ell, Bsum, use_ray=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(E_ray), np.asarray(E_fused), rtol=2e-4, atol=1e-6
    )
    assert float(ep_ray) < float(ep_fused)
    # Cross-backend: iterates can diverge on knife-edge accept/reject
    # decisions (ELL and COO sum in different orders), so compare the
    # achieved objective instead of the raw factors.
    back = jnp.take(E_ray, ell.inv_perm, axis=0)
    f_ell = np.asarray(
        poisson_f(back.astype(jnp.float32), jnp.asarray(B), X, Bsum, 0.5)
    )[:n_rows]
    f_coo = np.asarray(
        poisson_f(A_ray, jnp.asarray(B), X, Bsum, 0.5)
    )[:n_rows]
    np.testing.assert_allclose(f_ell, f_coo, rtol=1e-3)


def test_cg_compact_tail_matches_full_fit():
    """The CG active-set compaction (probe + compact continuation,
    train.py cg branch) must reproduce the plain full-batch fit: CG
    dynamics are row-local, so excluding entry-converged rows from the
    iteration structure is result-exact (up to fp assembly order — on
    the same bucket structure it is bit-identical)."""
    import dataclasses

    rng = np.random.default_rng(3)
    n_u, n_i, nnz = 400, 150, 6000
    rows = rng.integers(0, n_u, nnz).astype(np.int32)
    cols = rng.integers(0, n_i, nnz).astype(np.int32)
    vals = (rng.poisson(2.0, nnz) + 1).astype(np.float32)
    by_user, by_item = build_both_orientations(rows, cols, vals, n_u, n_i)
    A0 = initialize_factors(n_u, by_user.n_rows_pad, 16,
                            np.random.default_rng(1))
    B0 = initialize_factors(n_i, by_item.n_rows_pad, 16,
                            np.random.default_rng(2))
    p_on = FitParams(k=16, method="cg", niter=8, compact_tail=True)
    p_off = dataclasses.replace(p_on, compact_tail=False)
    A1, B1, st1 = run_poismf(A0, B0, by_user, by_item, p_on)
    A2, B2, st2 = run_poismf(A0, B0, by_user, by_item, p_off)
    assert st1 == 0 and st2 == 0
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2),
                               rtol=1e-5, atol=1e-7)


def test_cg_probe_init_matches_plain_call():
    """cg_update_ell with the probe's (f0, g0, px0) init must match the
    plain call (which computes the same quantities internally)."""
    from poismf_tpu.ops import ell as ell_ops
    from poismf_tpu.solvers.cg import cg_probe_ell, cg_update_ell

    rows, cols, vals = synth_counts(np.random.default_rng(11), 200, 60, 0.2)
    n_rows, n_cols = 200, 60
    X = build_counts(rows, cols, vals.astype(np.float32), n_rows, n_cols)
    B = 0.3 + np.random.default_rng(5).uniform(0, 0.2, (n_cols, 12))
    Bsum = make_bsum(jnp.asarray(B, dtype=jnp.float32), n_cols, 0.0)
    A0 = initialize_factors(n_rows, X.n_rows_pad, 12,
                            np.random.default_rng(7))
    ell = ell_ops.ell_from_counts(X)
    planes = ell_ops.gather_planes(jnp.asarray(B, dtype=jnp.float32), ell)
    A0p = ell_ops.permute_rows(A0, ell.perm)
    kw = dict(l2_reg=0.5, maxupd=6)
    f0, g0, px0, active = cg_probe_ell(
        A0p, planes, ell, Bsum, jnp.asarray(0.5, dtype=jnp.float32)
    )
    assert bool(np.asarray(active).any())
    out_plain = cg_update_ell(A0p, planes, ell, Bsum, **kw)
    out_init = cg_update_ell(A0p, planes, ell, Bsum, init=(f0, g0, px0),
                             **kw)
    np.testing.assert_array_equal(np.asarray(out_plain),
                                  np.asarray(out_init))


def test_cg_compact_zeroes_empty_rows():
    """The reference memsets zero-nnz rows every half-update (poismf.c:
    166-168, 308-311).  On the ELL layout empty rows are structurally
    zeroed (they belong to no bucket; inv_perm maps them to the zero
    tail), and the CG compact path additionally re-asserts the invariant
    after its scatter (ADVICE r4).  This is the end-to-end contract test:
    a poisoned empty row must come back exactly zero from a warm refit
    whose first A-half runs compact."""
    rng = np.random.default_rng(9)
    n_u, n_i, nnz = 300, 120, 5000
    rows = rng.integers(1, n_u, nnz).astype(np.int32)  # user 0 stays empty
    cols = rng.integers(0, n_i, nnz).astype(np.int32)
    vals = (rng.poisson(2.0, nnz) + 1).astype(np.float32)
    by_user, by_item = build_both_orientations(rows, cols, vals, n_u, n_i)
    A0 = initialize_factors(n_u, by_user.n_rows_pad, 12,
                            np.random.default_rng(1))
    B0 = initialize_factors(n_i, by_item.n_rows_pad, 12,
                            np.random.default_rng(2))
    p = FitParams(k=12, method="cg", niter=6, compact_tail=True)
    A1, B1, st = run_poismf(A0, B0, by_user, by_item, p)
    assert st == 0
    # poison the empty row with stale values, refit warm: the first
    # A-half should select a compact plan (rows converged) and the empty
    # row must come back exactly zero
    A1 = np.array(A1)  # writable host copy
    A1[0] = 0.5
    A2, _, st2 = run_poismf(jnp.asarray(A1), B1, by_user, by_item, p)
    assert st2 == 0
    np.testing.assert_array_equal(np.asarray(A2)[0], 0.0)


def test_topn_batched_empty_users():
    """topN_batched on an empty user array returns empty results on every
    path (exclude_seen chunking used to raise on np.concatenate([]))."""
    import pandas as pd

    from poismf_tpu.models.poismf import PoisMF

    rng = np.random.default_rng(3)
    rows, cols, vals = synth_counts(rng, 50, 20, 0.2)
    df = pd.DataFrame({
        "UserId": [f"u{r}" for r in rows],
        "ItemId": [f"i{c}" for c in cols],
        "Count": vals,
    })
    model = PoisMF(k=4, method="cg", l2_reg=1.0, niter=2, maxupd=5)
    model.fit(df)
    empty = np.array([], dtype=object)
    for excl in (False, True):
        out, scores = model.topN_batched(empty, n=3, exclude_seen=excl,
                                         output_score=True)
        assert out.shape == (0, 3)
        assert scores.shape == (0, 3)
