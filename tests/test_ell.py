"""Planar-ELL layout: kernel parity vs the flat-COO kernels, row splitting,
and end-to-end tncg fit parity between layouts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import synth_counts
from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.ops import objective as obj
from poismf_tpu.ops import ell as ell_ops
from poismf_tpu.train import FitParams, initialize_factors, run_poismf


def _setup(rows, cols, vals, n_u, n_i, k=7, seed=3):
    by_user, by_item = build_both_orientations(rows, cols, vals, n_u, n_i)
    r = np.random.default_rng(seed)
    A = jnp.asarray(
        r.uniform(0.3, 0.31, (by_user.n_rows_pad, k)).astype(np.float32)
    )
    B = jnp.asarray(
        r.uniform(0.3, 0.31, (by_item.n_rows_pad, k)).astype(np.float32)
    )
    return by_user, by_item, A, B


def _check_parity(by_user, A, B, n_u, n_i):
    Bsum = obj.make_bsum(B, n_i, 0.5)
    nz = np.asarray(by_user.row_nnz[:n_u]) > 0
    ell = ell_ops.ell_from_counts(by_user)
    planes = ell_ops.gather_planes(B, ell)
    A_p = ell_ops.permute_rows(A, ell.perm)
    inv = ell.inv_perm

    def unp(x):
        return np.asarray(jnp.take(x, inv, axis=0))[:n_u][nz]

    def ref(x):
        return np.asarray(x)[:n_u][nz]

    f_r, g_r, _, d_r, _ = obj.poisson_fgh(A, B, by_user, Bsum, 1e2)
    f_e, g_e, w2_e, d_e, _ = ell_ops.fgh_ell(A_p, planes, ell, Bsum, 1e2)
    np.testing.assert_allclose(unp(f_e), ref(f_r), rtol=5e-5, atol=1e-2)
    np.testing.assert_allclose(unp(g_e), ref(g_r), rtol=5e-5, atol=1e-2)
    np.testing.assert_allclose(unp(d_e), ref(d_r), rtol=5e-5, atol=1e-2)

    f2_r = obj.poisson_f(A, B, by_user, Bsum, 1e2)
    f2_e = ell_ops.f_ell(A_p, planes, ell, Bsum, 1e2)
    np.testing.assert_allclose(unp(f2_e), ref(f2_r), rtol=5e-5, atol=1e-2)

    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal(A.shape).astype(np.float32))
    w2c = obj.poisson_hvp_weights(A, B, by_user)
    h_r = obj.poisson_hvp(V, B, by_user, w2c, 1e2)
    h_e = ell_ops.hvp_ell(
        ell_ops.permute_rows(V, ell.perm), planes, ell, w2_e, 1e2
    )
    np.testing.assert_allclose(unp(h_e), ref(h_r), rtol=5e-4, atol=5e-2)

    ab_r = obj.adjusted_bsum(B, Bsum, by_user, 1.5)
    ab_e = ell_ops.adjusted_bsum_ell(planes, ell, Bsum, 1.5)
    np.testing.assert_allclose(unp(ab_e), ref(ab_r), rtol=5e-5, atol=1e-2)
    return ell


def test_ell_kernel_parity(rng):
    rows, cols, vals = synth_counts(rng, n_users=200, n_items=80,
                                    density=0.08)
    by_user, _, A, B = _setup(rows, cols, vals, 200, 80)
    ell = _check_parity(by_user, A, B, 200, 80)
    assert all(b.src is None for b in ell.buckets)  # no long rows here


def test_ell_row_splitting(rng, monkeypatch):
    monkeypatch.setattr(ell_ops, "P_MAX", 16)
    rows = np.concatenate([
        np.zeros(70, np.int32),
        rng.integers(0, 50, 400).astype(np.int32),
    ])
    cols = np.concatenate([
        np.arange(70, dtype=np.int32) % 75,
        rng.integers(0, 75, 400).astype(np.int32),
    ])
    key = rows.astype(np.int64) * 75 + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = (rng.poisson(3.0, rows.shape[0]) + 1.0).astype(np.float64)
    by_user, _, A, B = _setup(rows, cols, vals, 50, 75)
    ell = _check_parity(by_user, A, B, 50, 75)
    assert any(b.src is not None for b in ell.buckets)  # splitting happened


def test_ell_fit_matches_coo(rng):
    rows, cols, vals = synth_counts(rng, n_users=150, n_items=60,
                                    density=0.1)
    by_user, by_item, _, _ = _setup(rows, cols, vals, 150, 60)
    k = 7
    r = np.random.default_rng(1)
    A0 = initialize_factors(150, by_user.n_rows_pad, k, r, np.float32)
    B0 = initialize_factors(60, by_item.n_rows_pad, k, r, np.float32)
    common = dict(k=k, method="tncg", niter=4, l2_reg=1e2, maxupd=100)
    Ac, Bc, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="coo", **common))
    Ae, Be, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="ell", **common))
    ll_c = float(obj.eval_llk(Ac, Bc, by_user))
    ll_e = float(obj.eval_llk(Ae, Be, by_user))
    # the getptc-style bracketing line search makes trajectories sensitive
    # to f32 reduction-order ulps, so the two layouts no longer match to
    # 1e-4; they must land in the same quality band (reference parity is
    # asserted separately in test_reference_parity.py)
    assert abs(ll_c - ll_e) / abs(ll_c) < 2e-2


def test_ell_fit_with_long_rows(rng, monkeypatch):
    monkeypatch.setattr(ell_ops, "P_MAX", 32)
    rows, cols, vals = synth_counts(rng, n_users=60, n_items=200,
                                    density=0.4)  # rows avg ~80 nnz > P_MAX
    by_user, by_item, _, _ = _setup(rows, cols, vals, 60, 200)
    k = 5
    r = np.random.default_rng(1)
    A0 = initialize_factors(60, by_user.n_rows_pad, k, r, np.float32)
    B0 = initialize_factors(200, by_item.n_rows_pad, k, r, np.float32)
    common = dict(k=k, method="tncg", niter=3, l2_reg=1e2, maxupd=80)
    Ac, Bc, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="coo", **common))
    Ae, Be, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="ell", **common))
    ll_c = float(obj.eval_llk(Ac, Bc, by_user))
    ll_e = float(obj.eval_llk(Ae, Be, by_user))
    assert abs(ll_c - ll_e) / abs(ll_c) < 5e-2  # see test_ell_fit_matches_coo


def test_ell_weighted_fit(rng):
    """w_mult != 1 exercises adjusted_bsum_ell inside the fit."""
    rows, cols, vals = synth_counts(rng, n_users=100, n_items=40,
                                    density=0.1)
    by_user, by_item, _, _ = _setup(rows, cols, vals, 100, 40)
    k = 5
    r = np.random.default_rng(1)
    A0 = initialize_factors(100, by_user.n_rows_pad, k, r, np.float32)
    B0 = initialize_factors(40, by_item.n_rows_pad, k, r, np.float32)
    common = dict(k=k, method="tncg", niter=3, l2_reg=1e2, maxupd=80,
                  w_mult=2.0)
    Ac, Bc, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="coo", **common))
    Ae, Be, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="ell", **common))
    ll_c = float(obj.eval_llk(Ac, Bc, by_user))
    ll_e = float(obj.eval_llk(Ae, Be, by_user))
    # Wider band than test_ell_fit_matches_coo: w_mult=2 doubles the data
    # term, so the bracketing line search's f32 reduction-order divergence
    # (docs/DESIGN.md) swings toy-problem trajectories ~2x harder — across
    # seeds the sign flips, the converged objectives agree (the weighted
    # Bsum KERNEL has exact golden parity coverage above via
    # adjusted_bsum_ell vs adjusted_bsum).
    assert abs(ll_c - ll_e) / abs(ll_c) < 1e-1


@pytest.mark.parametrize("method,l2,mu,ni", [
    ("pg", 1e3, 10, 6),
    ("cg", 1e3, 5, 8),
])
def test_ell_fit_pg_cg_matches_coo(rng, method, l2, mu, ni):
    rows, cols, vals = synth_counts(rng, n_users=150, n_items=60,
                                    density=0.1)
    by_user, by_item, _, _ = _setup(rows, cols, vals, 150, 60)
    k = 7
    r = np.random.default_rng(1)
    A0 = initialize_factors(150, by_user.n_rows_pad, k, r, np.float32)
    B0 = initialize_factors(60, by_item.n_rows_pad, k, r, np.float32)
    common = dict(k=k, method=method, niter=ni, l2_reg=l2, maxupd=mu)
    Ac, Bc, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="coo", **common))
    Ae, Be, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(layout="ell", **common))
    ll_c = float(obj.eval_llk(Ac, Bc, by_user))
    ll_e = float(obj.eval_llk(Ae, Be, by_user))
    assert abs(ll_c - ll_e) / abs(ll_c) < 1e-4


def test_ell_bf16_planes_quality(rng):
    """bfloat16 plane storage must not materially change the optimum."""
    rows, cols, vals = synth_counts(rng, n_users=300, n_items=100,
                                    density=0.08)
    by_user, by_item, _, _ = _setup(rows, cols, vals, 300, 100)
    k = 8
    r = np.random.default_rng(1)
    A0 = initialize_factors(300, by_user.n_rows_pad, k, r, np.float32)
    B0 = initialize_factors(100, by_item.n_rows_pad, k, r, np.float32)
    common = dict(k=k, method="tncg", niter=5, l2_reg=1e2, maxupd=120,
                  reuse_prev=True)
    Af, Bf, _ = run_poismf(A0, B0, by_user, by_item, FitParams(**common))
    Ab, Bb, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(plane_dtype="bfloat16", **common))
    llf = float(obj.eval_llk(Af, Bf, by_user))
    llb = float(obj.eval_llk(Ab, Bb, by_user))
    assert abs(llf - llb) / abs(llf) < 2e-2  # see test_ell_fit_matches_coo


def test_compact_selection_machinery(rng, monkeypatch):
    """select_active/build_compact/scatter_back: compact f/g/diag values
    must equal the full evaluation at the selected rows, including long-row
    extension chunks."""
    monkeypatch.setattr(ell_ops, "P_MAX", 32)
    rows, cols, vals = synth_counts(rng, n_users=300, n_items=120,
                                    density=0.3)
    by_user, _, _, B0 = _setup(rows, cols, vals, 300, 120, k=6)
    k = 6
    ell = ell_ops.ell_from_counts(by_user)
    assert any(b.src is not None for b in ell.buckets)
    r = np.random.default_rng(2)
    B = jnp.asarray(r.uniform(0.3, 0.31, (by_user.n_cols, k)).astype(np.float32))
    Ap = jnp.asarray(
        r.uniform(0.2, 0.5, (ell.n_rows_ell, k)).astype(np.float32)
    )
    has = np.asarray(ell.row_nnz_perm) > 0
    Ap = jnp.where(jnp.asarray(has)[:, None], Ap, 0.0)
    Bsum = obj.make_bsum(B, by_user.n_cols, 0.3)
    planes = ell_ops.gather_planes(B, ell)

    prim = np.where(has)[0]
    act_rows = r.choice(prim, size=max(3, len(prim) // 20), replace=False)
    active = np.zeros(ell.n_rows_ell, dtype=bool)
    active[act_rows] = True

    plan = ell_ops.plan_compact(ell)
    src_host = [None if b.src is None else np.asarray(b.src)
                for b in ell.buckets]
    sel = ell_ops.select_active(
        ell, plan, active, np.asarray(ell.row_nnz_perm), src_host
    )
    assert sel is not None
    compact, slot_map = ell_ops.build_compact(ell, plan, *sel)
    planes_c = ell_ops.gather_planes(B, compact)
    x_c = jnp.take(Ap, slot_map, axis=0)

    f_full, g_full, _, d_full, _ = ell_ops.fgh_ell(Ap, planes, ell, Bsum,
                                                   1e2)
    f_c, g_c, _, d_c, _ = ell_ops.fgh_ell(x_c, planes_c, compact, Bsum, 1e2)

    sm = np.asarray(slot_map)
    real = sm != ell.n_rows_ell - 1
    assert set(sm[real].tolist()) == set(act_rows.tolist())
    np.testing.assert_allclose(
        np.asarray(f_c)[real], np.asarray(f_full)[sm[real]],
        rtol=3e-5, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(g_c)[real], np.asarray(g_full)[sm[real]],
        rtol=3e-5, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(d_c)[real], np.asarray(d_full)[sm[real]],
        rtol=3e-5, atol=1e-2,
    )

    x2 = np.asarray(
        ell_ops.scatter_back(Ap, x_c * 2.0, slot_map, compact.row_nnz_perm)
    )
    Apn = np.asarray(Ap)
    np.testing.assert_allclose(x2[active], 2 * Apn[active], rtol=1e-6)
    inactive = ~active
    inactive[ell.n_rows_ell - 1] = False  # tail may be rewritten with zeros
    np.testing.assert_allclose(x2[inactive], Apn[inactive], rtol=1e-6)


def test_compact_tail_fit_parity(rng):
    """Staged compact-tail fit must match the single-stage fit."""
    rows, cols, vals = synth_counts(rng, n_users=400, n_items=150,
                                    density=0.15)
    by_user, by_item, _, _ = _setup(rows, cols, vals, 400, 150)
    k = 8
    r = np.random.default_rng(1)
    A0 = initialize_factors(400, by_user.n_rows_pad, k, r, np.float32)
    B0 = initialize_factors(150, by_item.n_rows_pad, k, r, np.float32)
    common = dict(k=k, method="tncg", niter=6, l2_reg=1e2, maxupd=150,
                  reuse_prev=True)
    Ac, Bc, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(compact_tail=False, **common))
    An, Bn, _ = run_poismf(A0, B0, by_user, by_item,
                           FitParams(compact_tail=True, **common))
    llc = float(obj.eval_llk(Ac, Bc, by_user))
    lln = float(obj.eval_llk(An, Bn, by_user))
    assert abs(llc - lln) / abs(llc) < 2e-2  # see test_ell_fit_matches_coo


def test_ray_trial_matches_full_eval(rng):
    """The ray linearization pred(x+a*d) = px + a*pd must reproduce the
    full f_gtd evaluation exactly (up to fp) while the step stays within
    the first bound crossing."""
    rows, cols, vals = synth_counts(rng, n_users=180, n_items=70,
                                    density=0.1)
    by_user, _, A, B = _setup(rows, cols, vals, 180, 70)
    ell = ell_ops.ell_from_counts(by_user)
    planes = ell_ops.gather_planes(B, ell)
    A_p = ell_ops.permute_rows(A, ell.perm)
    Bsum = obj.make_bsum(B, 70, 0.1)

    r = np.random.default_rng(3)
    D_p = jnp.asarray(r.standard_normal(A_p.shape).astype(np.float32) * 0.05)
    # keep every row inside its first bound crossing: alpha < spe
    Ap_np, Dp_np = np.asarray(A_p), np.asarray(D_p)
    with np.errstate(divide="ignore", invalid="ignore"):
        crossing = np.where(Dp_np < 0, Ap_np / np.maximum(-Dp_np, 1e-30),
                            np.inf)
    spe = np.min(crossing, axis=1)
    alpha_np = np.minimum(0.9 * spe, 1.0).astype(np.float32)
    alpha = jnp.asarray(np.where(np.isfinite(alpha_np), alpha_np, 1.0))

    _, _, _, _, pxs = ell_ops.fgh_ell(A_p, planes, ell, Bsum, 1e2)
    bds = ell_ops.bdot_ell(D_p, planes, ell)
    trial = jnp.maximum(A_p + alpha[:, None] * D_p, 0.0)

    f_full, gtd_full = ell_ops.f_gtd_ell(trial, D_p, bds, planes, ell,
                                         Bsum, 1e2)
    coef = obj.ray_coef(A_p, D_p, Bsum)
    f_ray, gtd_ray = ell_ops.f_gtd_ray_ell(alpha, coef, pxs, bds,
                                           ell, 1e2)

    ff, fr = np.asarray(f_full), np.asarray(f_ray)
    m = np.isfinite(ff)
    assert np.array_equal(m, np.isfinite(fr))
    np.testing.assert_allclose(fr[m], ff[m], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gtd_ray), np.asarray(gtd_full),
                               rtol=1e-3, atol=1e-1)

    # the TNCG multi-candidate round (f AND gtd at C steps in one stream)
    # must reproduce the single-candidate ray per candidate
    alphas4 = jnp.stack([0.25 * alpha, 0.5 * alpha, alpha,
                         jnp.minimum(2.0 * alpha, jnp.asarray(
                             np.where(np.isfinite(spe), 0.95 * spe,
                                      2.0 * alpha_np).astype(np.float32)))])
    fm, gm = ell_ops.f_gtd_ray_multi_ell(alphas4, coef, pxs, bds, ell, 1e2)
    for c in range(4):
        f1, g1 = ell_ops.f_gtd_ray_ell(alphas4[c], coef, pxs, bds, ell, 1e2)
        fmc, f1c = np.asarray(fm[c]), np.asarray(f1)
        mc = np.isfinite(f1c)
        assert np.array_equal(mc, np.isfinite(fmc))
        np.testing.assert_allclose(fmc[mc], f1c[mc], rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gm[c]), np.asarray(g1),
                                   rtol=1e-5, atol=1e-3)


def test_pallas_interpret_parity(rng, monkeypatch):
    """Pallas fused kernels (interpret mode) vs the jnp bucket path."""
    rows, cols, vals = synth_counts(rng, n_users=150, n_items=60,
                                    density=0.12)
    by_user, _, A, B = _setup(rows, cols, vals, 150, 60)
    ell = ell_ops.ell_from_counts(by_user)
    planes = ell_ops.gather_planes(B, ell)
    A_p = ell_ops.permute_rows(A, ell.perm)
    Bsum = obj.make_bsum(B, 60, 0.1)

    rngd = np.random.default_rng(7)
    D_p = jnp.asarray(
        rngd.standard_normal(A_p.shape).astype(np.float32) * 0.01
    )
    alpha = jnp.asarray(
        rngd.uniform(0.1, 1.0, A_p.shape[0]).astype(np.float32)
    )

    trial = jnp.maximum(A_p + 0.5 * D_p, 0.0)

    monkeypatch.setattr(ell_ops, "_PALLAS_MODE", "off")
    f0, g0, w20, d0, px0 = ell_ops.fgh_ell(A_p, planes, ell, Bsum, 1e2)
    h0 = ell_ops.hvp_ell(A_p, planes, ell, w20, 1e2)
    fo0 = ell_ops.f_ell(A_p, planes, ell, Bsum, 1e2)
    bd0 = ell_ops.bdot_ell(D_p, planes, ell)
    rcoef = obj.ray_coef(A_p, D_p, Bsum)
    fr0, gt0 = ell_ops.f_gtd_ray_ell(alpha, rcoef, px0, bd0, ell, 1e2)
    alphas4 = jnp.stack([alpha * s for s in (1.0, 0.25, 0.0625, 0.015625)])
    fm0 = ell_ops.f_ray_multi_ell(alphas4, rcoef, px0, bd0, ell, 1e2)
    cf0, cg0, cpx0 = ell_ops.fg_ell(A_p, planes, ell, Bsum, 1e2)
    tf0, tg0 = ell_ops.f_gtd_fused_ell(trial, D_p, planes, ell, Bsum, 1e2)

    monkeypatch.setattr(ell_ops, "_PALLAS_MODE", "interpret")
    f1, g1, w21, d1, px1 = ell_ops.fgh_ell(A_p, planes, ell, Bsum, 1e2)
    h1 = ell_ops.hvp_ell(A_p, planes, ell, w21, 1e2)
    fo1 = ell_ops.f_ell(A_p, planes, ell, Bsum, 1e2)
    fr1, gt1 = ell_ops.f_gtd_ray_ell(alpha, rcoef, px1, bd0, ell, 1e2)
    fm1 = ell_ops.f_ray_multi_ell(alphas4, rcoef, px1, bd0, ell, 1e2)
    cf1, cg1, cpx1 = ell_ops.fg_ell(A_p, planes, ell, Bsum, 1e2)
    tf1, tg1 = ell_ops.f_gtd_fused_ell(trial, D_p, planes, ell, Bsum, 1e2)
    # want_px=False drops only the prediction planes
    fnp, gnp, w2np, dnp, pxnp = ell_ops.fgh_ell(A_p, planes, ell, Bsum,
                                                1e2, want_px=False)
    assert pxnp is None
    np.testing.assert_allclose(fnp, f1, rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(gnp, g1, rtol=1e-6, atol=1e-3)
    np.testing.assert_allclose(dnp, d1, rtol=1e-6, atol=1e-3)

    np.testing.assert_allclose(f1, f0, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(h1, h0, rtol=1e-4, atol=1e-1)
    for a, b in zip(px1, px0):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    m = np.isfinite(np.asarray(fo0))
    np.testing.assert_allclose(
        np.asarray(fo1)[m], np.asarray(fo0)[m], rtol=1e-5, atol=1e-2
    )
    mr = np.isfinite(np.asarray(fr0))
    np.testing.assert_allclose(
        np.asarray(fr1)[mr], np.asarray(fr0)[mr], rtol=1e-5, atol=1e-2
    )
    np.testing.assert_allclose(gt1, gt0, rtol=1e-4, atol=1e-1)
    # multi-candidate ray f: interpret kernel vs jnp path, and candidate 0
    # must agree with the single-candidate ray evaluation
    mm = np.isfinite(np.asarray(fm0))
    np.testing.assert_array_equal(mm, np.isfinite(np.asarray(fm1)))
    np.testing.assert_allclose(
        np.asarray(fm1)[mm], np.asarray(fm0)[mm], rtol=1e-5, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(fm0[0])[mr], np.asarray(fr0)[mr], rtol=1e-5, atol=1e-2
    )
    # CG's fused (f, g, px) evaluation
    mc = np.isfinite(np.asarray(cf0))
    np.testing.assert_allclose(
        np.asarray(cf1)[mc], np.asarray(cf0)[mc], rtol=1e-5, atol=1e-2
    )
    np.testing.assert_allclose(cg1, cg0, rtol=1e-5, atol=1e-2)
    for a, b in zip(cpx1, cpx0):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    # TNCG's fused (f, g.d) trial evaluation (in-register <B,d>)
    mt = np.isfinite(np.asarray(tf0))
    np.testing.assert_array_equal(mt, np.isfinite(np.asarray(tf1)))
    np.testing.assert_allclose(
        np.asarray(tf1)[mt], np.asarray(tf0)[mt], rtol=1e-5, atol=1e-2
    )
    np.testing.assert_allclose(tg1, tg0, rtol=1e-4, atol=1e-1)
    # TNCG's multi-candidate projected-trial evaluation: interpret kernel
    # (linear terms folded in-kernel) vs the jnp combine_f_gtd fallback,
    # both l2_in_f parities.  Comparison scoped to TRUE rows: global pad
    # rows (nnz=0, covered by no bucket) get zeros from the kernel path
    # and combine junk from the [R,k] fallback — the solver never reads
    # either (they are never active).
    true_rows = np.asarray(ell.row_nnz_perm) > 0
    alphasP = jnp.stack([alpha * s for s in (0.5, 1.0, 2.0, 8.0)])
    for l2f in (True, False):
        monkeypatch.setattr(ell_ops, "_PALLAS_MODE", "off")
        mf0, mg0 = ell_ops.f_gtd_multi_ell(alphasP, A_p, D_p, planes, ell,
                                           Bsum, 1e2, l2_in_f=l2f)
        monkeypatch.setattr(ell_ops, "_PALLAS_MODE", "interpret")
        mf1, mg1 = ell_ops.f_gtd_multi_ell(alphasP, A_p, D_p, planes, ell,
                                           Bsum, 1e2, l2_in_f=l2f)
        mf0t = np.asarray(mf0)[:, true_rows]
        mf1t = np.asarray(mf1)[:, true_rows]
        mmk = np.isfinite(mf0t)
        np.testing.assert_array_equal(mmk, np.isfinite(mf1t))
        np.testing.assert_allclose(mf1t[mmk], mf0t[mmk],
                                   rtol=1e-5, atol=1e-2)
        np.testing.assert_allclose(np.asarray(mg1)[:, true_rows],
                                   np.asarray(mg0)[:, true_rows],
                                   rtol=1e-4, atol=1e-1)
    # and against the single-trial fused evaluation at matching alphas
    # (same l2_in_f=False as the loop's final iteration)
    trial2 = jnp.maximum(A_p + alphasP[1][:, None] * D_p, 0.0)
    sf, sg = ell_ops.f_gtd_fused_ell(trial2, D_p, planes, ell, Bsum, 1e2,
                                     l2_in_f=False)
    m1 = mmk[1]
    np.testing.assert_allclose(
        mf1t[1][m1], np.asarray(sf)[true_rows][m1], rtol=1e-5, atol=1e-2
    )
    np.testing.assert_allclose(np.asarray(mg1)[1][true_rows],
                               np.asarray(sg)[true_rows],
                               rtol=1e-4, atol=1e-1)
    # fused (non-ray) mode: want_px=False must skip the px output while
    # leaving (f, g) bit-identical to the px-producing call
    nf, ng, npx = ell_ops.fg_ell(A_p, planes, ell, Bsum, 1e2,
                                 want_px=False)
    assert npx is None
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(cf1))
    np.testing.assert_array_equal(np.asarray(ng), np.asarray(cg1))


def test_f_gtd_fused_matches_hoisted(rng):
    """f_gtd_fused_ell (in-register <B,d>) must equal f_gtd_ell fed the
    hoisted bdot planes — same trial point, same direction."""
    rows, cols, vals = synth_counts(rng, n_users=160, n_items=60,
                                    density=0.1)
    by_user, _, A, B = _setup(rows, cols, vals, 160, 60)
    ell = ell_ops.ell_from_counts(by_user)
    planes = ell_ops.gather_planes(B, ell)
    A_p = ell_ops.permute_rows(A, ell.perm)
    Bsum = obj.make_bsum(B, 60, 0.1)

    r = np.random.default_rng(11)
    D_p = jnp.asarray(r.standard_normal(A_p.shape).astype(np.float32) * 0.1)
    trial = jnp.maximum(A_p + 0.7 * D_p, 0.0)

    bds = ell_ops.bdot_ell(D_p, planes, ell)
    for l2_in_f in (True, False):
        f_h, gtd_h = ell_ops.f_gtd_ell(trial, D_p, bds, planes, ell,
                                       Bsum, 1e2, l2_in_f=l2_in_f)
        f_f, gtd_f = ell_ops.f_gtd_fused_ell(trial, D_p, planes, ell,
                                             Bsum, 1e2, l2_in_f=l2_in_f)
        fh, ff = np.asarray(f_h), np.asarray(f_f)
        m = np.isfinite(fh)
        np.testing.assert_array_equal(m, np.isfinite(ff))
        np.testing.assert_allclose(ff[m], fh[m], rtol=1e-5, atol=1e-2)
        np.testing.assert_allclose(np.asarray(gtd_f), np.asarray(gtd_h),
                                   rtol=1e-4, atol=1e-1)
