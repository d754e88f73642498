"""End-to-end fit with the PG solver on synthetic data (M1 minimum slice)."""

import numpy as np
import jax.numpy as jnp

from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.train import FitParams, initialize_factors, run_poismf
from poismf_tpu.ops.objective import eval_llk
from tests.conftest import synth_counts


def _setup(rng, n_users=100, n_items=40, k=8):
    rows, cols, vals = synth_counts(rng, n_users, n_items, density=0.2)
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    A = initialize_factors(n_users, by_user.n_rows_pad, k, rng)
    B = initialize_factors(n_items, by_item.n_rows_pad, k, rng)
    return by_user, by_item, A, B


def test_pg_fit_improves_llk(rng):
    by_user, by_item, A, B = _setup(rng)
    ll0 = float(eval_llk(A, B, by_user, include_missing=True))
    params = FitParams(
        k=8, method="pg", l2_reg=1.0, niter=10, maxupd=10, initial_step=1e-2
    )
    A1, B1, status = run_poismf(A, B, by_user, by_item, params)
    assert status == 0
    ll1 = float(eval_llk(A1, B1, by_user, include_missing=True))
    assert np.isfinite(ll1)
    assert ll1 > ll0, (ll0, ll1)
    # non-negativity and no NaNs
    assert float(jnp.min(A1)) >= 0.0
    assert float(jnp.min(B1)) >= 0.0
    assert not bool(jnp.any(jnp.isnan(A1)))


def test_pg_zero_rows_stay_zero(rng):
    """A user with no interactions must end with an all-zero factor row."""
    n_users, n_items = 50, 30
    rows, cols, vals = synth_counts(rng, n_users, n_items, density=0.2)
    keep = rows != 7  # empty out user 7
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    A = initialize_factors(n_users, by_user.n_rows_pad, 5, rng)
    B = initialize_factors(n_items, by_item.n_rows_pad, 5, rng)
    params = FitParams(k=5, method="pg", l2_reg=1.0, niter=3, maxupd=5,
                       initial_step=1e-3)
    A1, _, _ = run_poismf(A, B, by_user, by_item, params)
    assert float(jnp.max(jnp.abs(A1[7]))) == 0.0


def test_pg_weighted_runs(rng):
    by_user, by_item, A, B = _setup(rng, n_users=40, n_items=20, k=4)
    params = FitParams(
        k=4, method="pg", l2_reg=1.0, niter=3, maxupd=5, initial_step=1e-3,
        w_mult=2.0,
    )
    A1, B1, status = run_poismf(A, B, by_user, by_item, params)
    assert status == 0
    assert not bool(jnp.any(jnp.isnan(A1))) and not bool(jnp.any(jnp.isnan(B1)))
