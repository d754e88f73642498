"""Inner-CG <B,d> accumulation (ROADMAP #0): the TNCG line search's pd
plane can be accumulated during the inner CG (pd = sum_i alpha_i <B,p_i>)
instead of a standalone full-plane bdot sweep, PROVIDED rows whose final
direction is discarded (feasible-cone violation / junk fallback) revert to
their first-iteration direction d1 — whose bd1 plane is also accumulated
and which provably never violates the cone (solvers/tncg.py).

These tests pin (a) the plane algebra (hvp_bv/axpy/select agree with the
direct bdot), and (b) solver equivalence: with accumulation on, the solve
matches the hoisted-bdot solve up to f32 summation-order noise, on both a
benign and a bound-heavy configuration, including mixed buckets with
long-row extension chunks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.ops import ell as ell_ops
from poismf_tpu.ops.ell import f_ell
from poismf_tpu.solvers.tncg import tncg_update_ell


def _setup(rng, n_users=300, n_items=120, k=16, nnz=5000, long_rows=0):
    rows = rng.integers(0, n_users, nnz).astype(np.int32)
    cols = rng.integers(0, n_items, nnz).astype(np.int32)
    if long_rows:
        # force rows past P_MAX so the ELL build emits extension chunks
        extra_r = np.repeat(
            np.arange(long_rows, dtype=np.int32),
            ell_ops.P_MAX + 64,
        )
        extra_c = rng.integers(0, n_items, extra_r.shape[0]).astype(np.int32)
        rows = np.concatenate([rows, extra_r])
        cols = np.concatenate([cols, extra_c])
    vals = (rng.pareto(1.2, rows.shape[0]) + 1).astype(np.float32).round()
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items
    )
    ell = ell_ops.ell_from_counts(by_user)
    A = jnp.asarray(
        0.3 + rng.uniform(0, 0.01, (by_user.n_rows_pad, k)),
        dtype=jnp.float32,
    )
    B = jnp.asarray(
        0.3 + rng.uniform(0, 0.01, (by_item.n_rows_pad, k)),
        dtype=jnp.float32,
    )
    A_p = ell_ops.permute_rows(A, ell.perm)
    planes = ell_ops.gather_planes(B, ell)
    Bsum = jnp.sum(B, axis=0)
    return ell, A_p, planes, Bsum


def test_hvp_bv_matches_hvp_and_bdot():
    rng = np.random.default_rng(3)
    ell, A_p, planes, Bsum = _setup(rng)
    _, _, w2s, _, _ = ell_ops.fgh_ell(A_p, planes, ell, Bsum, 10.0)
    V = jnp.asarray(
        rng.standard_normal(A_p.shape), dtype=jnp.float32
    )
    hv_ref = ell_ops.hvp_ell(V, planes, ell, w2s, 10.0)
    hv, bvs = ell_ops.hvp_bv_ell(V, planes, ell, w2s, 10.0)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(hv_ref),
                               rtol=1e-6, atol=1e-6)
    bd_ref = ell_ops.bdot_ell(V, planes, ell)
    for a, b in zip(bvs, bd_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_axpy_select_plane_algebra():
    rng = np.random.default_rng(4)
    ell, A_p, planes, Bsum = _setup(rng)
    R = A_p.shape[0]
    V1 = jnp.asarray(rng.standard_normal(A_p.shape), dtype=jnp.float32)
    V2 = jnp.asarray(rng.standard_normal(A_p.shape), dtype=jnp.float32)
    m1 = jnp.asarray(rng.uniform(-1, 1, R), dtype=jnp.float32)
    m2 = jnp.asarray(rng.uniform(-1, 1, R), dtype=jnp.float32)
    bv1 = ell_ops.bdot_ell(V1, planes, ell)
    bv2 = ell_ops.bdot_ell(V2, planes, ell)
    acc = ell_ops.bd_zeros_ell(ell, jnp.float32)
    acc = ell_ops.bd_axpy_ell(acc, m1, bv1, ell)
    acc = ell_ops.bd_axpy_ell(acc, m2, bv2, ell)
    # reference: bdot of the combined direction
    D = m1[:, None] * V1 + m2[:, None] * V2
    ref = ell_ops.bdot_ell(D, planes, ell)
    for a, b in zip(acc, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    # select: flagged rows take plane 1
    flags = jnp.asarray(rng.integers(0, 2, R).astype(bool))
    sel = ell_ops.bd_select_ell(flags, bv1, bv2, ell)
    for b_, s, p1, p2 in zip(ell.buckets, sel, bv1, bv2):
        f_b = np.asarray(
            ell_ops._bucket_x(flags[:, None].astype(jnp.float32), b_)
        )[:, 0] > 0.5
        exp = np.where(f_b[None, :], np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(s), exp)


@pytest.mark.parametrize("long_rows", [0, 2])
@pytest.mark.parametrize("reuse_prev", [True, False])
def test_solver_equivalence_accum_vs_bdot(long_rows, reuse_prev):
    rng = np.random.default_rng(5 + long_rows)
    ell, A_p, planes, Bsum = _setup(rng, long_rows=long_rows)
    mask = np.asarray(ell.row_nnz_perm) > 0
    outs = {}
    for accum in (False, True):
        x, share, st = tncg_update_ell(
            A_p, planes, ell, Bsum, l2_reg=1000.0, maxupd=300,
            reuse_prev=reuse_prev, max_cg=3, return_stats=True,
            bd_accum=accum,
        )
        F = float(np.asarray(
            f_ell(x, planes, ell, Bsum, 1000.0)
        )[mask].sum())
        outs[accum] = (np.asarray(x), F)
    xa, Fa = outs[False]
    xb, Fb = outs[True]
    # same optimum up to f32 summation-order drift in the accumulated
    # planes (discrete LS accept/reject decisions may flip on exact ties,
    # so factors agree loosely while the objective agrees tightly)
    assert abs(Fa - Fb) / max(abs(Fa), 1.0) < 1e-4
    assert np.mean(np.abs(xa - xb)) < 1e-3 * max(1.0, np.abs(xa).mean())


def test_gate_keeps_bdot_at_large_maxcg():
    """max_cg above the breakeven must produce BIT-IDENTICAL results to
    bd_accum=False (the accumulation is gated off, not just tolerated)."""
    rng = np.random.default_rng(9)
    ell, A_p, planes, Bsum = _setup(rng)
    xs = []
    for accum in (False, True):
        x, _ = tncg_update_ell(
            A_p, planes, ell, Bsum, l2_reg=1000.0, maxupd=200,
            reuse_prev=True, max_cg=10, bd_accum=accum,
        )
        xs.append(np.asarray(x))
    np.testing.assert_array_equal(xs[0], xs[1])
