"""Golden parity of the SERVING surface against the compiled reference C.

Training parity is covered by test_reference_parity (LL trajectories) and
test_quality_parity (ranking metrics); this closes the loop on pred.c:

  * predict_multiple (pred.c:42-64)  vs  serve.predict_pairs
  * factors_single   (pred.c:201-304) vs serve.factors_single
  * factors_multiple (pred.c:66-199) vs  serve.factors_multiple

The per-row subproblem (B fixed) is strictly convex for l2 > 0, so the two
implementations must land near the same optimum — tolerances cover f32 vs
f64 and reduction order, not algorithmic slack.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from tests import ref_c
from tests.conftest import synth_counts
from poismf_tpu import serve
from poismf_tpu.sparse import build_both_orientations, build_counts
from poismf_tpu.train import FitParams, initialize_factors, run_poismf

pytestmark = [
    pytest.mark.skipif(
        ref_c.load() is None,
        reason="reference C library unavailable (no gcc or /root/reference)",
    ),
    # slow tier: these compile and fit the reference C in-process
    # (minutes each on this host) — excluded from `-m quick`
    pytest.mark.slow,
]

N_USERS, N_ITEMS, K = 300, 120, 8


@pytest.fixture(scope="module")
def fitted_state():
    rng = np.random.default_rng(3)
    rows, cols, vals = synth_counts(rng, N_USERS, N_ITEMS, density=0.15)
    by_user, by_item = build_both_orientations(
        rows, cols, vals, N_USERS, N_ITEMS, dtype=np.float32
    )
    A0 = initialize_factors(N_USERS, by_user.n_rows_pad, K, 5)
    B0 = initialize_factors(N_ITEMS, by_item.n_rows_pad, K, 6)
    p = FitParams(k=K, method="tncg", l2_reg=10.0, niter=4, maxupd=120,
                  reuse_prev=True)
    A, B, _ = run_poismf(A0, B0, by_user, by_item, p)
    A = np.asarray(A[:N_USERS], dtype=np.float64)
    B = np.asarray(B[:N_ITEMS], dtype=np.float64)
    Bsum = B.sum(axis=0)
    Amean = A.mean(axis=0)
    return A, B, Bsum, Amean, (rows, cols, vals)


def test_predict_multiple_parity(fitted_state, rng):
    A, B, *_ = fitted_state
    ixA = rng.integers(0, N_USERS, size=64)
    ixB = rng.integers(0, N_ITEMS, size=64)
    ref = ref_c.predict_multiple_reference(A, B, ixA, ixB)
    ours = np.asarray(serve.predict_pairs(
        jnp.asarray(A, dtype=jnp.float32), jnp.asarray(B, dtype=jnp.float32),
        jnp.asarray(ixA, dtype=jnp.int32), jnp.asarray(ixB, dtype=jnp.int32),
    ))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-6)


def test_factors_single_parity(fitted_state, rng):
    A, B, Bsum, Amean, _ = fitted_state
    item_ix = np.unique(rng.integers(0, N_ITEMS, size=25))
    counts = (rng.poisson(3.0, size=item_ix.shape[0]) + 1.0)
    ref = ref_c.factors_single_reference(
        B, Bsum, Amean, item_ix, counts, l2_reg=10.0, maxupd=1000,
    )
    ours = np.asarray(serve.factors_single(
        jnp.asarray(B, dtype=jnp.float32),
        jnp.asarray(Bsum, dtype=jnp.float32),
        jnp.asarray(Amean, dtype=jnp.float32),
        item_ix, counts, l2_reg=10.0, maxupd=1000,
    ), dtype=np.float64)
    # strictly convex subproblem -> same optimum; compare the predictions on
    # this row's items (the quantity serving consumes) and the factors
    pred_ref = B[item_ix] @ ref
    pred_ours = B[item_ix] @ ours
    np.testing.assert_allclose(pred_ours, pred_ref, rtol=3e-2, atol=1e-3)
    np.testing.assert_allclose(ours, ref, rtol=8e-2, atol=5e-3)


@pytest.mark.parametrize("method,niter,maxupd,tol", [
    ("tncg", 1, 400, 8e-2),
    ("cg", 6, 10, 8e-2),
    ("pg", 6, 10, 5e-2),
])
def test_factors_multiple_parity(fitted_state, method, niter, maxupd, tol):
    A, B, Bsum, Amean, _ = fitted_state
    rng = np.random.default_rng(17)
    n_new = 40
    rows, cols, vals = synth_counts(rng, n_new, N_ITEMS, density=0.2)
    X = sp.csr_matrix((vals, (rows, cols)), shape=(n_new, N_ITEMS))
    ref = ref_c.factors_multiple_reference(
        B, Bsum, Amean, X, method=method, l2_reg=10.0,
        niter=niter, maxupd=maxupd, step_size=1e-5,
    )
    X_new = build_counts(rows, cols, vals.astype(np.float32), n_new,
                         N_ITEMS, dtype=np.float32)
    p = FitParams(k=K, method=method, l2_reg=10.0, niter=niter,
                  maxupd=maxupd, initial_step=1e-5)
    ours = np.asarray(serve.factors_multiple(
        jnp.asarray(B, dtype=jnp.float32),
        jnp.asarray(Bsum, dtype=jnp.float32),
        jnp.asarray(Amean, dtype=jnp.float32),
        X_new, p, reuse_mean=True,
    )[:n_new], dtype=np.float64)
    # compare the predictions each serving stack would produce; the tncg
    # batch path is a SHALLOW solve on both sides (pred.c:180-189 runs one
    # training-style tncg pass), so non-converged per-row trajectories have
    # genuine scatter — demand the bulk matches and the achieved
    # optimization quality is no worse
    pred_ref = np.einsum("ij,kj->ik", ref, B)
    pred_ours = np.einsum("ij,kj->ik", ours, B)
    denom = np.abs(pred_ref).max()
    err = np.abs(pred_ours - pred_ref) / denom
    assert np.quantile(err, 0.9) <= tol, np.quantile(err, 0.9)

    Xd = X.toarray()

    def mean_obj(F):
        pred = np.maximum(F @ B.T, 1e-12)
        return float(np.mean(
            pred.sum(axis=1) + 10.0 * (F * F).sum(axis=1)
            - (Xd * np.log(pred)).sum(axis=1)
        ))

    assert mean_obj(ours) <= mean_obj(ref) * (1 + 1e-2) + 1e-6, (
        mean_obj(ours), mean_obj(ref),
    )
