"""Headline benchmark: full TNCG training fit at Last.FM-360K scale.

The reference's best-quality configuration (tncg, k=50, niter=10, maxupd=750,
l2=1e3, reuse_prev=True, float32) takes 5 min 59 s wall (= 359 s) for the
full 10-epoch fit on Last.FM-360K (358,858 users x 160,112 items, 17.16M
train nnz) on a ~16-thread CPU host (example/example_poismf_lastfm.ipynb
cells 17-18; BASELINE.md).

We generate a synthetic dataset with the same dimensions, nnz count, and a
power-law row-popularity profile, compile-warm the solvers, then time the
full fit (fresh factor init, all 10 alternating epochs, same early-stop
semantics) on the available accelerator.

Prints ONE JSON line:
  {"metric": "tncg_fit_wall_s", "value": <s>, "unit": "s",
   "vs_baseline": <baseline_s / ours_s>}  (vs_baseline > 1 means faster)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the tncg while_loop program is large and
# first-compiles in minutes over the tunneled TPU; repeat runs hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BASELINE_FIT_S = 359.0  # 5:59 wall, BASELINE.md row 3

N_USERS = 358_858
N_ITEMS = 160_112
NNZ_TARGET = 17_164_027
K = 50
L2 = 1e3
MAXUPD = 750
NITER = 10


def synth_lastfm_like(rng, n_users=N_USERS, n_items=N_ITEMS,
                      nnz=NNZ_TARGET):
    """Power-law synthetic counts with Last.FM-like marginals: item popularity
    ~ Zipf, user activity ~ lognormal, counts ~ 1 + Poisson."""
    # draw with replacement then dedupe; oversample to land near nnz target
    over = int(nnz * 1.25)
    item_p = 1.0 / np.arange(1, n_items + 1) ** 0.9
    item_p /= item_p.sum()
    user_w = rng.lognormal(0.0, 1.2, size=n_users)
    user_p = user_w / user_w.sum()
    rows = rng.choice(n_users, size=over, p=user_p).astype(np.int64)
    cols = rng.choice(n_items, size=over, p=item_p).astype(np.int64)
    key = rows * n_items + cols
    _, idx = np.unique(key, return_index=True)
    idx = idx[:nnz]
    rows, cols = rows[idx].astype(np.int32), cols[idx].astype(np.int32)
    vals = (1.0 + rng.poisson(8.0, size=rows.shape[0])).astype(np.float32)
    return rows, cols, vals


def main():
    scale = 1.0
    for a in sys.argv[1:]:
        if a.startswith("--scale="):
            scale = float(a.split("=", 1)[1])
    n_users = max(int(N_USERS * scale), 64)
    n_items = max(int(N_ITEMS * scale), 64)
    nnz = max(int(NNZ_TARGET * scale), 1024)

    rng = np.random.default_rng(1)
    t0 = time.time()
    rows, cols, vals = synth_lastfm_like(rng, n_users, n_items, nnz)
    print(f"# data: {rows.shape[0]} nnz in {time.time()-t0:.1f}s",
          file=sys.stderr)

    import jax

    from poismf_tpu.sparse import build_both_orientations
    from poismf_tpu.train import FitParams, initialize_factors, run_poismf

    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    jax.block_until_ready((by_user.vals, by_item.vals))

    params = FitParams(
        k=K, method="tncg", l2_reg=L2, maxupd=MAXUPD, niter=NITER,
        reuse_prev=True, early_stop=True,
        # bf16 plane storage is the production default: halves the dominant
        # HBM traffic; full-scale LL matches f32 to ~7e-5 relative
        plane_dtype=(
            None
            if os.environ.get("POISMF_BENCH_PLANES") == "float32"
            else os.environ.get("POISMF_BENCH_PLANES", "bfloat16")
        ),
    )

    verbose = os.environ.get("POISMF_BENCH_VERBOSE")

    def fresh_fit():
        nprng = np.random.default_rng(1)
        A = initialize_factors(
            n_users, by_user.n_rows_pad, K, nprng, np.float32
        )
        B = initialize_factors(
            n_items, by_item.n_rows_pad, K, nprng, np.float32
        )
        t0 = time.time()
        marks = [t0]

        def cb(epoch, A_, B_):
            jax.block_until_ready((A_, B_))
            marks.append(time.time())
            if verbose:
                print(f"#   epoch {epoch}: {marks[-1]-marks[-2]:.1f}s",
                      file=sys.stderr, flush=True)

        A, B, _ = run_poismf(A, B, by_user, by_item, params,
                             callback=cb if verbose else None)
        jax.block_until_ready((A, B))
        return time.time() - t0, A, B

    # warmup fit: includes XLA compilation of both half-updates
    warm_s, _, _ = fresh_fit()
    print(f"# warmup fit (incl. compile): {warm_s:.1f}s", file=sys.stderr)

    fit_s, A, B = fresh_fit()
    print(f"# timed fit: {fit_s:.1f}s", file=sys.stderr)

    try:
        from poismf_tpu.ops.objective import eval_llk

        ll = float(eval_llk(A, B, by_user))
        sparsity = float(np.mean(np.asarray(A[:n_users]) == 0.0))
        print(f"# train LL: {ll:.6g}  A-sparsity: {sparsity:.3f}",
              file=sys.stderr)
    except Exception as e:  # diagnostics must never eat the JSON line
        print(f"# diagnostics failed: {e}", file=sys.stderr)

    baseline = BASELINE_FIT_S * scale  # cost scales ~linearly in nnz
    print(json.dumps({
        "metric": "tncg_fit_wall_s",
        "value": round(fit_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline / fit_s, 3),
    }))


if __name__ == "__main__":
    main()
