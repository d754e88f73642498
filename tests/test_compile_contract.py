"""Compile-count contract for the training cascade.

Cold-start wall time over the remote-compiler TPU tunnel is the SUM of
per-program compile times (docs/DESIGN.md §Cold-start compile time), so the
number of distinct programs a fit traces is a perf contract, not an
implementation detail.  Round 1's cascade recompiled every round (the
compact sub-ELL's true-row count leaked into static pytree aux; every
static-flag combination multiplied variants) — these tests pin the fix.
"""

import numpy as np
import pytest

from tests.conftest import synth_counts
from poismf_tpu.sparse import build_both_orientations
from poismf_tpu import train
from poismf_tpu.solvers import tncg as tncg_mod


def _fit(bu, bi, seed, **kw):
    r = np.random.default_rng(seed)
    k = kw.pop("k", 8)
    A0 = train.initialize_factors(bu.n_rows, bu.n_rows_pad, k, r, np.float32)
    B0 = train.initialize_factors(bi.n_rows, bi.n_rows_pad, k, r, np.float32)
    p = train.FitParams(k=k, method="tncg", niter=3, l2_reg=1e2, maxupd=120,
                        **kw)
    return train.run_poismf(A0, B0, bu, bi, p)


def _sizes():
    return (
        tncg_mod._tncg_update_ell_jit._cache_size(),
        train._compact_build._cache_size(),
        train._compact_scatter._cache_size(),
    )


def test_repeat_fit_compiles_nothing_new(rng, monkeypatch):
    """A second fit on the same data — different init, different epochs-to-
    converge, different active tails — must reuse every compiled program.
    (Profile-adaptive plans add at most ONE program set per orientation per
    dataset, at a data-dependent time — disabled here for determinism.)"""
    monkeypatch.setenv("POISMF_ADAPTIVE_PLAN", "0")
    rows, cols, vals = synth_counts(rng, n_users=300, n_items=120,
                                    density=0.08)
    bu, bi = build_both_orientations(rows, cols, vals, 300, 120)
    # two warmup fits so every cascade path (incl. tails that only trigger
    # from some inits) has compiled at least once
    _fit(bu, bi, seed=0)
    _fit(bu, bi, seed=1)
    before = _sizes()
    _fit(bu, bi, seed=2)
    _fit(bu, bi, seed=3, reuse_prev=True)  # traced flag: same programs
    assert _sizes() == before


def test_program_count_is_bounded(rng):
    """One fit compiles at most one solver program per orientation and one
    build/scatter set per (orientation, capacity level incl. the one
    optional profile-adaptive plan)."""
    rows, cols, vals = synth_counts(rng, n_users=280, n_items=110,
                                    density=0.09)
    bu, bi = build_both_orientations(rows, cols, vals, 280, 110)
    s0, b0, sc0 = _sizes()
    _fit(bu, bi, seed=3)
    s1, b1, sc1 = _sizes()
    n_levels = len(train.COMPACT_DENOMS) + train.MAX_ADAPTIVE_REBUILDS
    assert s1 - s0 <= 2 + 2 * n_levels  # full + per-level compact solves
    assert b1 - b0 <= 2 * n_levels
    assert sc1 - sc0 <= 2 * n_levels


def test_bench_floor_model():
    """The physical floor must scale monotonically in nnz and sit at a
    plausible magnitude (VERDICT r4: the old tncg floor of 0.0213 s for a
    ~100 s fit could not flag a bogus measurement)."""
    import bench

    for name in ("pg", "cg", "tncg"):
        f1 = bench.floor_seconds(name, 1_000_000)
        f2 = bench.floor_seconds(name, 2_000_000)
        assert 0 < f1 < f2 and abs(f2 - 2 * f1) < 1e-9
    # tncg floor counts every epoch's two half-updates (gather + init fgh)
    full = bench.floor_seconds("tncg", 17_164_027)
    assert full > 0.1  # was 0.0213 before the r5 fix
