"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4d):
the sharded fit must match the single-device fit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.train import FitParams, initialize_factors, run_poismf
from poismf_tpu.parallel.mesh import (
    make_mesh, shard_counts, run_poismf_sharded, pad_rows_for_mesh,
)
from poismf_tpu.ops.objective import eval_llk
from tests.conftest import synth_counts


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh()


def _problem(seed=1, n_users=100, n_items=40, k=6):
    rng = np.random.default_rng(seed)
    rows, cols, vals = synth_counts(rng, n_users, n_items, density=0.2)
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    A = initialize_factors(n_users, by_user.n_rows_pad, k, 11)
    B = initialize_factors(n_items, by_item.n_rows_pad, k, 12)
    return by_user, by_item, A, B, (n_users, n_items, k)


def test_shard_counts_partition():
    by_user, _, _, _, (n_users, n_items, _) = _problem()
    sx = shard_counts(by_user, 4)
    assert sx.n_shards == 4
    assert sx.rows_per_shard * 4 >= n_users
    # every true edge appears exactly once, with correct local offsets
    total = 0
    seen = set()
    for d in range(4):
        r = np.asarray(sx.row_ids[d])
        c = np.asarray(sx.col_ids[d])
        v = np.asarray(sx.vals[d])
        real = r < sx.rows_per_shard
        total += int(real.sum())
        for rr, cc in zip(r[real] + d * sx.rows_per_shard, c[real]):
            seen.add((int(rr), int(cc)))
    assert total == by_user.nnz
    orig = set(
        zip(np.asarray(by_user.row_ids[: by_user.nnz]).tolist(),
            np.asarray(by_user.col_ids[: by_user.nnz]).tolist())
    )
    assert seen == orig
    # per-shard nnz counters agree
    np.testing.assert_array_equal(
        np.asarray(sx.row_nnz).sum(), by_user.nnz
    )


@pytest.mark.parametrize("method,kw", [
    ("pg", dict(l2_reg=1.0, niter=4, maxupd=5, initial_step=1e-3)),
    ("cg", dict(l2_reg=1.0, niter=4, maxupd=5)),
    ("tncg", dict(l2_reg=1.0, niter=3, maxupd=100, reuse_prev=True)),
])
def test_sharded_fit_matches_single_device(mesh, method, kw):
    by_user, by_item, A, B, (n_users, n_items, k) = _problem()
    # the sharded path runs the flat-COO solvers per device; compare against
    # the same layout (the ELL default has a slightly different fp trajectory)
    p = FitParams(k=k, method=method, layout="coo", **kw)

    A1, B1, _ = run_poismf(A, B, by_user, by_item, p)
    A8, B8, _ = run_poismf_sharded(A, B, by_user, by_item, p, mesh)

    ll1 = float(eval_llk(A1, B1, by_user, include_missing=True))
    ll8 = float(eval_llk(pad_rows_for_mesh(jnp.asarray(A8), 1, A8.shape[0]),
                         B8, by_user, include_missing=True))
    # identical math on identical data, modulo reduction order
    assert np.isclose(ll1, ll8, rtol=5e-3), (ll1, ll8)
    np.testing.assert_allclose(
        np.asarray(A8)[:n_users], np.asarray(A1)[:n_users],
        rtol=5e-2, atol=5e-3,
    )


def test_sharded_model_class(mesh):
    """PoisMF(mesh=...) end-to-end."""
    import pandas as pd
    from poismf_tpu import PoisMF

    rng = np.random.default_rng(7)
    rows, cols, vals = synth_counts(rng, 60, 25, density=0.25)
    df = pd.DataFrame({
        "UserId": rows, "ItemId": cols, "Count": vals,
    })
    model = PoisMF(k=5, method="tncg", l2_reg=1.0, niter=3, maxupd=80,
                   reuse_prev=True, mesh=mesh)
    model.fit(df)
    assert model.is_fitted
    assert model.A.shape[0] == model.nusers
    top = model.topN(df["UserId"].iloc[0], n=5)
    assert len(top) == 5


def test_sharded_tncg_cascade_matches_and_shrinks(mesh):
    """The sharded cascade path (compact_tail=True, the default) matches the
    single-device cascade fit AND actually anneals: across the fit, rounds
    run on shrinking structures (compact rounds appear / active counts drop),
    so converged rows stop costing per-pass bandwidth on every device
    (reference analog: per-row early exit, poismf.c:393-403)."""
    from poismf_tpu.parallel import ell_mesh

    by_user, by_item, A, B, (n_users, n_items, k) = _problem(
        n_users=900, n_items=80
    )
    p = FitParams(k=k, method="tncg", l2_reg=1.0, niter=3, maxupd=150,
                  reuse_prev=True, compact_tail=True, early_stop=False)

    A1, B1, _ = run_poismf(A, B, by_user, by_item, p)

    ell_mesh.CASCADE_TRACE = []
    try:
        A8, B8, _ = run_poismf_sharded(A, B, by_user, by_item, p, mesh)
        trace = list(ell_mesh.CASCADE_TRACE)
    finally:
        ell_mesh.CASCADE_TRACE = None

    assert trace, "cascade path did not engage"
    # active rows shrink within at least one half-update's round sequence
    assert any(
        t_out < t_in for (_, _, t_in, t_out) in trace
    ), trace
    # compact structures are actually used once tails are small
    assert any(s.startswith("compact/") for (_, s, _, _) in trace), trace

    A8a = jnp.concatenate([
        jnp.asarray(A8)[:n_users],
        jnp.zeros((by_user.n_rows_pad - n_users, k)),
    ])
    ll1 = float(eval_llk(A1, B1, by_user))
    ll8 = float(eval_llk(A8a, jnp.asarray(B8)[: by_item.n_rows_pad],
                         by_user))
    assert abs(ll1 - ll8) / abs(ll1) < 5e-2, (ll1, ll8)


def test_sharded_tncg_cascade_early_stop(mesh):
    """early_stop converges the sharded cascade fit without full-matrix
    pulls; the fit still produces finite factors matching shapes."""
    by_user, by_item, A, B, (n_users, n_items, k) = _problem()
    p = FitParams(k=k, method="tncg", l2_reg=1.0, niter=10, maxupd=150,
                  reuse_prev=True, compact_tail=True, early_stop=True)
    A8, B8, status = run_poismf_sharded(A, B, by_user, by_item, p, mesh)
    assert status == 0
    assert np.all(np.isfinite(np.asarray(A8)))
    ll = float(eval_llk(
        jnp.concatenate([
            jnp.asarray(A8)[:n_users],
            jnp.zeros((by_user.n_rows_pad - n_users, k)),
        ]),
        jnp.asarray(B8)[: by_item.n_rows_pad], by_user,
    ))
    assert np.isfinite(ll)


@pytest.mark.parametrize("method,kw,tol", [
    ("pg", dict(l2_reg=1.0, niter=4, maxupd=5, initial_step=1e-3), 1e-5),
    # CG's trajectory is reduction-order sensitive at non-converged points
    ("cg", dict(l2_reg=1.0, niter=4, maxupd=5), 3e-2),
    # tncg: the getptc-style line search is sensitive to per-shard
    # reduction-order ulps (see tests/test_ell.py::test_ell_fit_matches_coo)
    ("tncg", dict(l2_reg=1.0, niter=3, maxupd=100, reuse_prev=True), 5e-2),
])
def test_sharded_ell_fit_matches_single_device(mesh, method, kw, tol):
    """The default (planar-ELL) sharded path vs the single-device ELL fit."""
    by_user, by_item, A, B, (n_users, n_items, k) = _problem()
    p = FitParams(k=k, method=method, layout="ell", compact_tail=False, **kw)

    A1, B1, _ = run_poismf(A, B, by_user, by_item, p)
    A8, B8, _ = run_poismf_sharded(A, B, by_user, by_item, p, mesh)

    A8a = jnp.concatenate([
        jnp.asarray(A8)[:n_users],
        jnp.zeros((by_user.n_rows_pad - n_users, k)),
    ])
    ll1 = float(eval_llk(A1, B1, by_user))
    ll8 = float(eval_llk(A8a, jnp.asarray(B8)[: by_item.n_rows_pad],
                         by_user))
    assert abs(ll1 - ll8) / abs(ll1) < tol, (ll1, ll8)
