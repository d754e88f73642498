"""Golden parity against the ACTUAL reference C implementation.

Compiles /root/reference/src/{poismf,nonnegcg,tnc,pred,topN}.c with a minimal
CBLAS shim (tests/ref_c/) and runs both implementations on identical data
from identical float64 initializations, asserting the per-epoch Poisson
log-likelihood trajectories agree for all three methods (run_poismf,
poismf.c:435-632).  This closes the correctness loop that synthetic
self-referential tests cannot: same problem, same init, same hyperparameters,
original solver vs. TPU-native batched solver.

Skips gracefully when gcc or the reference tree is unavailable.
"""

import numpy as np
import pytest

import jax

from tests import ref_c
from tests.conftest import synth_counts
from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.train import FitParams, run_poismf
from poismf_tpu.ops.ell import permute_rows  # noqa: F401 (import check)

pytestmark = [
    pytest.mark.skipif(
        ref_c.load() is None,
        reason="reference C library unavailable (no gcc or /root/reference)",
    ),
    # slow tier: these compile and fit the reference C in-process
    # (minutes each on this host) — excluded from `-m quick`
    pytest.mark.slow,
]

N_USERS, N_ITEMS, K = 100, 250, 10
NITER = 6


def _problem():
    rng = np.random.default_rng(42)
    rows, cols, vals = synth_counts(rng, N_USERS, N_ITEMS, density=0.2)
    import scipy.sparse as sp

    csr = sp.csr_matrix(
        (vals, (rows, cols)), shape=(N_USERS, N_ITEMS), dtype=np.float64
    )
    csc = csr.tocsc()
    A0 = np.ascontiguousarray(
        0.3 + rng.uniform(0, 0.01, size=(N_USERS, K)), dtype=np.float64
    )
    B0 = np.ascontiguousarray(
        0.3 + rng.uniform(0, 0.01, size=(N_ITEMS, K)), dtype=np.float64
    )
    return rows, cols, vals, csr, csc, A0, B0


def _full_ll(A, B, rows, cols, vals):
    """Poisson LL over the full matrix, minus the x-only constant:
    sum_nnz x*log(mu) - sum_all mu."""
    mu = np.sum(A[rows] * B[cols], axis=1)
    return float(np.sum(vals * np.log(np.maximum(mu, 1e-300)))
                 - np.dot(A.sum(axis=0), B.sum(axis=0)))


def _reference_trajectory(method, csr, csc, A0, B0, rows, cols, vals, *,
                          l2_reg, maxupd, step_size=1e-7, reuse_prev=False,
                          l1_reg=0.0, w_mult=1.0):
    """Per-epoch LL from the reference C, driving one fulliter per call
    (pg step halving applied externally, matching poismf.c:532)."""
    A = A0.copy()
    B = B0.copy()
    lls = []
    for epoch in range(NITER):
        rc = ref_c.run_poismf_reference(
            A, B, csr, csc, method=method, l2_reg=l2_reg,
            step_size=step_size * 0.5 ** epoch,
            numiter=1, maxupd=maxupd, early_stop=False,
            reuse_prev=reuse_prev, l1_reg=l1_reg, w_mult=w_mult,
        )
        assert rc == 0
        lls.append(_full_ll(A, B, rows, cols, vals))
    return np.array(lls), A, B


def _ours_trajectory(method, rows, cols, vals, A0, B0, *,
                     l2_reg, maxupd, step_size=1e-7, reuse_prev=False,
                     layout="ell", l1_reg=0.0, w_mult=1.0):
    with jax.enable_x64():
        by_user, by_item = build_both_orientations(
            rows, cols, vals, N_USERS, N_ITEMS, dtype=np.float64
        )
        A_pad = np.zeros((by_user.n_rows_pad, K))
        A_pad[:N_USERS] = A0
        B_pad = np.zeros((by_item.n_rows_pad, K))
        B_pad[:N_ITEMS] = B0
        p = FitParams(
            k=K, method=method, l2_reg=l2_reg, l1_reg=l1_reg, niter=NITER,
            maxupd=maxupd, initial_step=step_size, early_stop=False,
            reuse_prev=reuse_prev, layout=layout, w_mult=w_mult,
            # this test pins the reference's inner-solver DYNAMICS, so run
            # with its maxCGit clamp rather than the TPU-tuned "auto" cap
            max_cg=None,
        )
        lls = []

        def cb(epoch, A, B):
            lls.append(_full_ll(
                np.asarray(A)[:N_USERS], np.asarray(B)[:N_ITEMS],
                rows, cols, vals,
            ))

        import jax.numpy as jnp

        A_fit, B_fit, status = run_poismf(
            jnp.asarray(A_pad), jnp.asarray(B_pad), by_user, by_item, p,
            callback=cb,
        )
        assert status == 0
    return (np.array(lls), np.asarray(A_fit)[:N_USERS],
            np.asarray(B_fit)[:N_ITEMS])


def _assert_trajectories_close(ll_ref, ll_ours, rtol_epoch, rtol_final):
    """Relative agreement of per-epoch LL (both are large negative numbers;
    compare |diff| / |ref|)."""
    rel = np.abs(ll_ours - ll_ref) / np.abs(ll_ref)
    assert np.all(rel[:-1] <= rtol_epoch), (
        f"per-epoch LL drift: ref={ll_ref}, ours={ll_ours}, rel={rel}"
    )
    assert rel[-1] <= rtol_final, (
        f"final LL drift: ref={ll_ref[-1]}, ours={ll_ours[-1]}, "
        f"rel={rel[-1]}"
    )


def test_pg_trajectory_parity():
    rows, cols, vals, csr, csc, A0, B0 = _problem()
    kw = dict(l2_reg=1e9, maxupd=10, step_size=1e-7)
    ll_ref, _, _ = _reference_trajectory(
        "pg", csr, csc, A0, B0, rows, cols, vals, **kw
    )
    ll_ours, _, _ = _ours_trajectory("pg", rows, cols, vals, A0, B0, **kw)
    # the reference's A-update double-scales cnst_sum (poismf.c:573-577, a
    # known quirk documented in SURVEY.md section 3.1) which we deliberately
    # do not replicate; at step=1e-7 its effect on LL is tiny
    _assert_trajectories_close(ll_ref, ll_ours, 1e-3, 1e-3)


def test_cg_trajectory_parity():
    rows, cols, vals, csr, csc, A0, B0 = _problem()
    kw = dict(l2_reg=1e4, maxupd=5)
    ll_ref, _, _ = _reference_trajectory(
        "cg", csr, csc, A0, B0, rows, cols, vals, **kw
    )
    ll_ours, _, _ = _ours_trajectory("cg", rows, cols, vals, A0, B0, **kw)
    _assert_trajectories_close(ll_ref, ll_ours, 2e-2, 5e-3)


@pytest.mark.parametrize("reuse_prev", [False, True])
def test_tncg_trajectory_parity(reuse_prev):
    """TNCG parity carries a wider tolerance than pg/cg: the reference's TNC
    objective is an INCONSISTENT f/g pair (calc_fun_and_grad's f omits the
    l2 penalty its gradient carries, poismf.c:242-273), so its iterates are
    line-search artifacts rather than optima of any fixed objective.  We
    replicate the dynamics (l2-less f, getptc-style Wolfe acceptance with
    best-point fallback, 2f/|g.d| initial steps) and land within a few
    percent of the reference's per-epoch LL; exact agreement would require
    a branch-for-branch port of getptc's cubic interpolation."""
    rows, cols, vals, csr, csc, A0, B0 = _problem()
    kw = dict(l2_reg=1e3, maxupd=15 * K, reuse_prev=reuse_prev)
    ll_ref, A_ref, B_ref = _reference_trajectory(
        "tncg", csr, csc, A0, B0, rows, cols, vals, **kw
    )
    ll_ours, A_ours, B_ours = _ours_trajectory(
        "tncg", rows, cols, vals, A0, B0, **kw
    )
    _assert_trajectories_close(ll_ref, ll_ours, 5e-2, 4e-2)
    # the sparsity-inducing active-set behavior must carry over: share of
    # exact zeros within a few points of the reference
    sp_ref = float(np.mean(B_ref == 0.0))
    sp_ours = float(np.mean(B_ours == 0.0))
    assert abs(sp_ref - sp_ours) < 0.05, (sp_ref, sp_ours)


def _reg_objective(A, B, rows, cols, vals, l1, l2):
    mu = np.sum(A[rows] * B[cols], axis=1)
    ll = (np.sum(vals * np.log(np.maximum(mu, 1e-300)))
          - A.sum(axis=0) @ B.sum(axis=0))
    return float(ll - l1 * (A.sum() + B.sum())
                 - l2 * ((A * A).sum() + (B * B).sum()))


@pytest.mark.parametrize("method,l2,maxupd,extra,mode,rtol", [
    # weighted entries: the adjustment_Bsum path (poismf.c:85-123)
    ("tncg", 1e2, 150, dict(w_mult=2.0), "trajectory", 5e-2),
    ("cg", 1e3, 5, dict(w_mult=2.0), "trajectory", 3e-2),
    # l1 as a Bsum shift (poismf.c:512-514).  cg trajectories match; the
    # tncg l1 trajectories DON'T and shouldn't: the reference's
    # inconsistent-objective line search stalls shrinkage (keeping larger
    # factor norms and thus higher unregularized LL), while this solver
    # reaches a BETTER regularized objective (measured -43004 vs -45794 on
    # this problem) — so tncg-l1 is gated on regularized-objective quality.
    ("tncg", 1e2, 150, dict(l1_reg=5.0), "objective", 0.3),
    ("cg", 1e3, 5, dict(l1_reg=5.0), "trajectory", 3e-2),
    ("tncg", 1e2, 150, dict(l1_reg=5.0, w_mult=1.5), "objective", 0.3),
])
def test_weighted_l1_parity(method, l2, maxupd, extra, mode, rtol):
    """Golden parity for the WEIGHTED (w_mult != 1) and l1-regularized
    configurations against the actual compiled reference C — exercises
    adjusted_bsum / the l1 Bsum shift."""
    rows, cols, vals, csr, csc, A0, B0 = _problem()
    ll_ref, A_r, B_r = _reference_trajectory(
        method, csr, csc, A0, B0, rows, cols, vals,
        l2_reg=l2, maxupd=maxupd, **extra,
    )
    ll_ours, A_o, B_o = _ours_trajectory(
        method, rows, cols, vals, A0, B0,
        l2_reg=l2, maxupd=maxupd, **extra,
    )
    if mode == "trajectory":
        _assert_trajectories_close(ll_ref, ll_ours, rtol, rtol)
        return
    l1 = extra.get("l1_reg", 0.0)
    obj_ref = _reg_objective(A_r, B_r, rows, cols, vals, l1, l2)
    obj_ours = _reg_objective(A_o, B_o, rows, cols, vals, l1, l2)
    # we must do at least as well on the objective both claim to optimize
    assert obj_ours >= obj_ref - 0.01 * abs(obj_ref), (obj_ref, obj_ours)
    # and stay in the same LL regime (loose band; see note above)
    rel = abs(ll_ours[-1] - ll_ref[-1]) / abs(ll_ref[-1])
    assert rel <= rtol, (ll_ref[-1], ll_ours[-1], rel)
