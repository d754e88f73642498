"""Measure how often the post-CG direction fixups fire (ROADMAP #0 gate).

The TNCG inner CG could accumulate the line search's <B,d> planes for free
(pd = sum alpha_i <B,p_i>), killing the per-outer-iteration bdot sweep —
UNLESS the direction is altered after CG by the feasible-cone projection or
the steepest-descent fallback.  This script fits a small synthetic problem
on CPU and prints, per half-update, how many row-iterations were clipped /
fell back, versus total active row-iterations.

Run: JAX_PLATFORMS=cpu python scripts/clip_stats.py [scale]
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.03
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    from poismf_tpu import train as train_mod
    from poismf_tpu.train import FitParams, run_poismf, initialize_factors
    from poismf_tpu.solvers import tncg

    n_users = int(bench.N_USERS * scale)
    n_items = int(bench.N_ITEMS * scale)
    nnz = int(bench.NNZ_TARGET * scale)
    rng = np.random.default_rng(123)
    rows, cols, vals = bench.synth_lastfm_like(rng, n_users, n_items, nnz)

    from poismf_tpu.sparse import build_both_orientations
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items
    )

    # wrap the jitted solver entry to harvest stats from every cascade call
    orig = tncg.tncg_update_ell
    totals = {"clip": 0, "fb": 0, "outer": 0, "calls": 0, "rowit": 0}

    def spy(A_perm, planes, ell, Bsum, **kw):
        want = kw.pop("return_stats", False)
        x, share, st = orig(A_perm, planes, ell, Bsum,
                            return_stats=True, **kw)
        clip = int(st["clip_rows"])
        fb = int(st["fb_rows"])
        it = int(st["outer_iters"])
        lsr = int(st["ls_rounds"])
        hvr = int(st["hvp_rounds"])
        n_act = int(np.asarray(ell.row_nnz_perm > 0).sum())
        totals["clip"] += clip
        totals["fb"] += fb
        totals["outer"] += it
        totals["calls"] += 1
        totals["rowit"] += it * n_act  # upper bound on active row-iters
        print(
            f"  call R={A_perm.shape[0]:>7} outer={it:>3} ls={lsr:>4} "
            f"hvp={hvr:>4} clip_row_iters={clip:>8} fb_row_iters={fb:>6} "
            f"(rows={n_act})",
            flush=True,
        )
        return (x, share, st) if want else (x, share)

    tncg.tncg_update_ell = spy
    try:
        params = FitParams(k=50, method="tncg", l2_reg=1e3, maxupd=750,
                           niter=10, reuse_prev=False, early_stop=True)
        A0 = initialize_factors(n_users, by_user.n_rows_pad, 50, 1)
        B0 = initialize_factors(n_items, by_item.n_rows_pad, 50, 2)
        run_poismf(A0, B0, by_user, by_item, params)
    finally:
        tncg.tncg_update_ell = orig

    print(
        f"TOTAL: {totals['calls']} calls, {totals['outer']} outer iters; "
        f"clipped row-iters {totals['clip']}, fallback row-iters "
        f"{totals['fb']}, active row-iter bound {totals['rowit']} "
        f"(clip share <= {totals['clip'] / max(1, totals['rowit']):.4f})"
    )


if __name__ == "__main__":
    main()
