"""Tests for the batched TNCG solver (M3) - validated per-row against
scipy.optimize TNC (which shares ancestry with the reference's tnc.c)."""

import numpy as np
import pytest
import jax.numpy as jnp

from poismf_tpu.sparse import build_both_orientations, build_counts
from poismf_tpu.solvers.tncg import tncg_update
from poismf_tpu.train import FitParams, initialize_factors, run_poismf
from poismf_tpu.ops.objective import eval_llk, poisson_f
from tests.conftest import synth_counts


def _f_rows(A_pad, B, X, Bsum, l2):
    return np.asarray(
        poisson_f(jnp.asarray(A_pad), jnp.asarray(B), X, jnp.asarray(Bsum), l2)
    )


def test_tncg_matches_scipy_tnc(rng):
    from scipy.optimize import minimize

    n_rows, n_cols, k = 20, 15, 6
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.4)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    B = np.asarray(0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), np.float32)
    A0 = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A0[:n_rows] = 0.3 + rng.uniform(0, 0.01, size=(n_rows, k))
    l2 = 0.5
    Bsum = np.sum(B, axis=0)

    A_t, _ = tncg_update(
        jnp.asarray(A0), jnp.asarray(B), X, jnp.asarray(Bsum),
        l2_reg=l2, maxupd=500, reuse_prev=True,
    )
    A_t = np.asarray(A_t)
    assert not np.any(np.isnan(A_t))
    assert A_t.min() >= 0.0

    # scipy TNC per row, fed the SAME inconsistent f/g pair the reference
    # uses (f omits the l2 penalty, g keeps 2*l2*a - calc_fun_and_grad,
    # poismf.c:242-273) so both solvers see identical problem dynamics
    f_ref = np.zeros(n_rows)
    B64 = B.astype(np.float64)
    Bsum64 = Bsum.astype(np.float64)
    for r in range(n_rows):
        sel = rows == r
        c = cols[sel]
        x = vals[sel].astype(np.float64)

        def fg(a):
            pred = np.maximum(B64[c] @ a, 1e-300)
            f = Bsum64 @ a - np.sum(x * np.log(pred))
            g = Bsum64 + 2 * l2 * a - B64[c].T @ (x / pred)
            return f, g

        res = minimize(fg, A0[r].astype(np.float64), jac=True, method="TNC",
                       bounds=[(0, None)] * k,
                       options={"maxfun": 500})
        f_ref[r] = fg(res.x)[0]

    f_ours = _f_rows(A_t, B, X, Bsum, 0.0)[:n_rows]  # f without l2
    rel = (f_ours - f_ref) / np.maximum(np.abs(f_ref), 1.0)
    # objective parity with scipy TNC on nearly all rows (sign-aware: ours
    # may be better, i.e. rel < 0, which also counts as parity)
    assert np.median(np.abs(rel)) < 5e-3, (np.median(rel), np.max(rel))
    assert np.mean(rel < 0.05) > 0.9, rel


def test_tncg_init_not_reuse_prev(rng):
    """reuse_prev=False must restart rows from 1e-3 (poismf.c:379-381):
    the result should not depend on the incoming A values."""
    n_rows, n_cols, k = 10, 8, 4
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.5)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    B = np.asarray(0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), np.float32)
    Bsum = jnp.asarray(np.sum(B, axis=0))
    A_a = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A_a[:n_rows] = 0.4
    A_b = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A_b[:n_rows] = 7.7
    out_a, _ = tncg_update(jnp.asarray(A_a), jnp.asarray(B), X, Bsum,
                           l2_reg=0.5, maxupd=300, reuse_prev=False)
    out_b, _ = tncg_update(jnp.asarray(A_b), jnp.asarray(B), X, Bsum,
                           l2_reg=0.5, maxupd=300, reuse_prev=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))


def test_tncg_fit_improves_llk_and_sparsifies(rng):
    n_users, n_items, k = 100, 40, 10
    rows, cols, vals = synth_counts(rng, n_users, n_items, density=0.2)
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    A = initialize_factors(n_users, by_user.n_rows_pad, k, rng)
    B = initialize_factors(n_items, by_item.n_rows_pad, k, rng)
    ll0 = float(eval_llk(A, B, by_user, include_missing=True))
    params = FitParams(k=k, method="tncg", l2_reg=1.0, niter=10, maxupd=150,
                       reuse_prev=True)
    A1, B1, status = run_poismf(A, B, by_user, by_item, params)
    assert status == 0
    ll1 = float(eval_llk(A1, B1, by_user, include_missing=True))
    assert ll1 > ll0, (ll0, ll1)
    # TNCG produces exact zeros via the projection
    A1np = np.asarray(A1)[:n_users]
    frac_zero = np.mean(A1np == 0.0)
    assert frac_zero > 0.05, frac_zero
    assert not np.any(np.isnan(A1np))


def test_tncg_early_stop_share(rng):
    """Re-running TNCG at (near-)convergence reports a high unchanged share."""
    n_rows, n_cols, k = 30, 20, 5
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.3)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    B = np.asarray(0.3 + rng.uniform(0, 0.01, size=(n_cols, k)), np.float32)
    Bsum = jnp.asarray(np.sum(B, axis=0))
    A0 = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A0[:n_rows] = 0.3 + rng.uniform(0, 0.01, size=(n_rows, k))
    A1, _ = tncg_update(jnp.asarray(A0), jnp.asarray(B), X, Bsum,
                        l2_reg=0.5, maxupd=400, reuse_prev=True,
                        track_unchanged=True)
    A2, share = tncg_update(A1, jnp.asarray(B), X, Bsum,
                            l2_reg=0.5, maxupd=400, reuse_prev=True,
                            track_unchanged=True)
    assert float(share) >= 0.9, float(share)


def test_max_cg_cap_cuts_passes_not_quality(rng):
    """The TPU-tuned inner-CG cap (FitParams.max_cg, default "auto"=3)
    must (a) actually bound the batched CG loop — visibly fewer global
    plane sweeps than the reference maxCGit clamp — and (b) land at an
    equivalent objective: stragglers get truncated directions but keep
    iterating, so final quality is preserved (measured flat across the
    full cap sweep at bench scale, docs/DESIGN.md)."""
    # the cap only binds when inner CG genuinely needs many iterations:
    # make the per-row Hessians ill-conditioned via near-collinear item
    # factors (on well-conditioned problems the Jacobi-preconditioned CG
    # meets its forcing tolerance in <= 2 iterations and the cap is inert)
    n_rows, n_cols, k = 60, 50, 24  # reference clamp = k/2 = 12 > cap 2
    rows, cols, vals = synth_counts(rng, n_rows, n_cols, density=0.4)
    X = build_counts(rows, cols, vals, n_rows, n_cols, dtype=np.float32)
    base = rng.uniform(0.5, 1.5, size=(n_cols, 1)).astype(np.float32)
    B = np.asarray(base * np.ones((1, k))
                   + 0.01 * rng.uniform(size=(n_cols, k)), np.float32)
    Bsum = jnp.asarray(np.sum(B, axis=0))
    A0 = np.zeros((X.n_rows_pad, k), dtype=np.float32)
    A0[:n_rows] = 0.3 + rng.uniform(0, 0.01, size=(n_rows, k))
    l2 = 1e-4

    outs = {}
    for cap in (None, 2):
        A1, _, st = tncg_update(
            jnp.asarray(A0), jnp.asarray(B), X, Bsum, l2_reg=l2,
            maxupd=600, reuse_prev=True, return_stats=True, max_cg=cap,
        )
        outs[cap] = (np.asarray(A1), float(st["passes"]))
    # demand a clear global-sweep reduction even though the capped run may
    # take more outer iterations
    assert outs[2][1] < 0.85 * outs[None][1], (outs[2][1], outs[None][1])
    f_ref = _f_rows(outs[None][0], B, X, np.asarray(Bsum), l2)[:n_rows]
    f_cap = _f_rows(outs[2][0], B, X, np.asarray(Bsum), l2)[:n_rows]
    # per-row objectives in the same band (capped may be equal or better)
    assert np.all(f_cap <= f_ref + 0.02 * np.abs(f_ref) + 1e-3)


def test_fitparams_max_cg_auto_resolution():
    p = FitParams(method="tncg").resolved()
    assert p.max_cg == 3
    p = FitParams(method="cg").resolved()
    assert p.max_cg is None
    p = FitParams(method="tncg", max_cg=None).resolved()
    assert p.max_cg is None
    p = FitParams(method="tncg", max_cg=7).resolved()
    assert p.max_cg == 7
    with pytest.raises(ValueError):
        FitParams(method="tncg", max_cg=0).resolved()
    # "auto" resolves to the tuned cap ONLY where the cascade's final
    # uncapped polish exists (ELL layout + compact_tail); cascade-less
    # paths get reference semantics, explicit caps are honored everywhere
    assert FitParams(method="tncg", layout="coo").resolved().max_cg is None
    assert FitParams(method="tncg",
                     compact_tail=False).resolved().max_cg is None
    assert FitParams(method="tncg", layout="coo",
                     max_cg=5).resolved().max_cg == 5
