"""Profile-adaptive compact plans and the stalled-read retry helper."""

import threading
import time

import numpy as np
import pytest

from tests.conftest import synth_counts
from poismf_tpu.sparse import build_both_orientations
from poismf_tpu import train
from poismf_tpu.ops import ell as ell_ops
from poismf_tpu.utils import transfer


def test_plan_from_profile_caps_and_gate(rng):
    rows, cols, vals = synth_counts(rng, n_users=3000, n_items=100,
                                    density=0.1)
    bu, _ = build_both_orientations(rows, cols, vals, 3000, 100)
    ell = ell_ops.ell_from_counts(bu)
    nb = len(ell.buckets)
    # the margin must be visible through the tile rounding: at least one
    # bucket must be big enough that the cap is not clamped to n_rows
    assert max(b.n_rows for b in ell.buckets) >= 2 * ell_ops.ROW_TILE

    # profile of 65 active rows per bucket: margin 2.0 -> want 130 ->
    # ladder-quantized cap 256; a margin regression to 1.5 would give want
    # 97 -> cap 128, so the assertion detects it (in unclamped buckets)
    MARGIN = 2.0  # plan_compact_from_profile's default
    prof = np.full(nb, 65)
    plan = ell_ops.plan_compact_from_profile(ell, prof)
    assert plan is not None and plan.denom == 0
    checked_unclamped = False
    for b, cap in zip(ell.buckets, plan.caps):
        want = max(int(MARGIN * 65), ell_ops.ROW_TILE)
        expect = min(b.n_rows, ell_ops._ladder_ceil(want))
        assert cap == expect
        checked_unclamped |= expect < b.n_rows
    assert checked_unclamped

    # near-full profile -> plan not worth a compile
    prof_full = np.array([b.n_rows for b in ell.buckets])
    assert ell_ops.plan_compact_from_profile(ell, prof_full) is None


def test_adaptive_plan_fit_matches_uniform(rng, monkeypatch):
    """Force rejections of every uniform-denominator plan (mocked
    per-bucket overflow): the fit must record the rejection profiles,
    build an adaptive (denom=0) plan, and still converge to the same
    quality as with adaptivity disabled.  Rejection is forced at the
    select_active seam rather than by contriving a straggler tail — the
    natural drain pattern is knife-edge-sensitive to eps-level solver
    changes and made the old contrivance flaky."""
    rows, cols, vals = synth_counts(rng, n_users=2500, n_items=150,
                                    density=0.06)
    bu, bi = build_both_orientations(rows, cols, vals, 2500, 150)
    r = np.random.default_rng(1)
    k = 6
    A0 = train.initialize_factors(2500, bu.n_rows_pad, k, r, np.float32)
    B0 = train.initialize_factors(150, bi.n_rows_pad, k, r, np.float32)
    p = train.FitParams(k=k, method="tncg", niter=4, l2_reg=10.0,
                        maxupd=150, max_cg=1)

    from poismf_tpu.ops import objective as obj

    real_select = ell_ops.select_active

    def fussy_select(ell, plan, active, row_nnz, src):
        if plan.denom != 0:
            return None  # every uniform plan "overflows"
        return real_select(ell, plan, active, row_nnz, src)

    monkeypatch.setattr(ell_ops, "select_active", fussy_select)

    monkeypatch.setenv("POISMF_ADAPTIVE_PLAN", "0")
    train._ELL_CACHE.clear()
    train._ELL_AUX.clear()
    A1, B1, _ = train.run_poismf(A0, B0, bu, bi, p)
    ll_plain = float(obj.eval_llk(A1, B1, bu))
    # with adaptivity off, every round fell back to full structure
    assert not any(
        any(pl.denom == 0 for pl in aux["plans"])
        for aux in train._ELL_AUX.values()
    )

    monkeypatch.setenv("POISMF_ADAPTIVE_PLAN", "1")
    train._ELL_CACHE.clear()
    train._ELL_AUX.clear()
    A2, B2, _ = train.run_poismf(A0, B0, bu, bi, p)
    ll_adapt = float(obj.eval_llk(A2, B2, bu))

    # every ell should have gained an adaptive (denom=0) plan from the
    # recorded rejection profiles
    assert all(
        any(pl.denom == 0 for pl in aux["plans"])
        for aux in train._ELL_AUX.values()
    )
    assert abs(ll_plain - ll_adapt) / abs(ll_plain) < 5e-2
    train._ELL_CACHE.clear()
    train._ELL_AUX.clear()


def test_warm_compact_plans(rng):
    """After a fit, warm_compact_plans dispatches one dummy round per plan
    (compiling them ahead of the next fit) and is idempotent."""
    rows, cols, vals = synth_counts(rng, n_users=400, n_items=80,
                                    density=0.1)
    bu, bi = build_both_orientations(rows, cols, vals, 400, 80)
    r = np.random.default_rng(4)
    k = 5
    A0 = train.initialize_factors(400, bu.n_rows_pad, k, r, np.float32)
    B0 = train.initialize_factors(80, bi.n_rows_pad, k, r, np.float32)
    p = train.FitParams(k=k, method="tncg", niter=2, l2_reg=10.0, maxupd=40)
    train._ELL_CACHE.clear()
    train._ELL_AUX.clear()
    A1, B1, _ = train.run_poismf(A0, B0, bu, bi, p)
    n = train.warm_compact_plans(bu, bi, p)
    assert n > 0
    assert train.warm_compact_plans(bu, bi, p) == 0  # idempotent
    # warming must not corrupt subsequent fits
    A2, B2, _ = train.run_poismf(A0, B0, bu, bi, p)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2))
    train._ELL_CACHE.clear()
    train._ELL_AUX.clear()


def test_pass_stats_accounting(rng):
    """train.PASS_STATS collects (sweeps, bytes/sweep) entries over an ELL
    fit, and the sweep counters are positive device scalars — the basis of
    bench.py's achieved-GB/s reporting."""
    rows, cols, vals = synth_counts(rng, n_users=200, n_items=60,
                                    density=0.1)
    bu, bi = build_both_orientations(rows, cols, vals, 200, 60)
    r = np.random.default_rng(2)
    k = 5
    A0 = train.initialize_factors(200, bu.n_rows_pad, k, r, np.float32)
    B0 = train.initialize_factors(60, bi.n_rows_pad, k, r, np.float32)
    train._ELL_CACHE.clear()
    train._ELL_AUX.clear()
    try:
        for method, niter in [("tncg", 2), ("cg", 2), ("pg", 2)]:
            train.PASS_STATS = []
            p = train.FitParams(k=k, method=method, niter=niter,
                                l2_reg=10.0, maxupd=30)
            train.run_poismf(A0, B0, bu, bi, p)
            entries = train.PASS_STATS
            assert entries, method
            total = 0.0
            for sweeps, bpp in entries:
                assert bpp > 0
                s = float(np.asarray(sweeps))
                assert s >= 1.0, (method, s)
                total += s * bpp
            # sanity: total traffic exceeds one full sweep of the data
            assert total > bu.nnz * k * 4, (method, total)
    finally:
        train.PASS_STATS = None
        train._ELL_CACHE.clear()
        train._ELL_AUX.clear()


class _StallingOnce:
    """numpy-conversion target whose FIRST conversion hangs, later ones
    return — the shape of the tunnel's lost-read failure."""

    def __init__(self):
        self.calls = 0
        self.lock = threading.Lock()
        self.release = threading.Event()

    def __array__(self, dtype=None, copy=None):
        with self.lock:
            self.calls += 1
            first = self.calls == 1
        if first:
            self.release.wait(30.0)  # "lost" until the test ends
        return np.arange(4, dtype=np.float32)


def test_fetch_host_races_a_stalled_read(monkeypatch):
    monkeypatch.setattr(transfer, "FIRST_TIMEOUT_S", 0.2)
    monkeypatch.setattr(transfer, "RETRY_TIMEOUTS_S", (5.0, 5.0))
    staller = _StallingOnce()
    t0 = time.time()
    out = transfer.fetch_host(staller)
    took = time.time() - t0
    staller.release.set()
    np.testing.assert_array_equal(out, np.arange(4, dtype=np.float32))
    assert took < 5.0  # the retry, not the stalled first read, returned
    assert staller.calls >= 2


def test_fetch_host_fast_path():
    out = transfer.fetch_host(np.ones(3))
    np.testing.assert_array_equal(out, np.ones(3))


def test_round_redispatch_recovers_lost_execution(monkeypatch):
    """A round whose result read stalls out is dispatched again from the
    same inputs, and the retry's result is used."""
    monkeypatch.setattr(transfer, "FIRST_TIMEOUT_S", 0.1)
    monkeypatch.setattr(transfer, "RETRY_TIMEOUTS_S", (0.1,))

    release = threading.Event()

    class _AlwaysStalling:
        def __array__(self, dtype=None, copy=None):
            release.wait(30.0)
            return np.arange(4, dtype=np.float32)

    calls = {"n": 0}

    def round_fn(x_in):
        calls["n"] += 1
        if calls["n"] == 1:
            # first dispatch: every read of the result hangs
            return x_in + 1, _AlwaysStalling()
        return x_in + 1, np.arange(4, dtype=np.float32)

    x, act = train._round_with_redispatch(round_fn, np.zeros(3))
    release.set()
    assert calls["n"] == 2
    np.testing.assert_array_equal(x, np.ones(3))
    np.testing.assert_array_equal(act, np.arange(4, dtype=np.float32))
