"""One full-scale CG fit with cascade logging — diagnose the entry-probe
compaction's engagement and cost (POISMF_CG_COMPACT=0 disables it for A/B).

Usage: python scripts/cg_diag.py [--scale 1.0] [--no-compact]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--no-compact", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from poismf_tpu.ops.objective import eval_llk
    from poismf_tpu.sparse import build_both_orientations
    from poismf_tpu.train import (FitParams, initialize_factors_device,
                                  run_poismf)
    from poismf_tpu.utils.transfer import fetch_host

    bench._require_device()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    scale = args.scale
    n_users = max(int(bench.N_USERS * scale), 256)
    n_items = max(int(bench.N_ITEMS * scale), 128)
    nnz = max(int(bench.NNZ_TARGET * scale), 4096)
    K = 50

    rng = np.random.default_rng(7)
    rows, cols, vals = bench.synth_lastfm_like(rng, n_users, n_items, nnz)
    by_user, by_item = build_both_orientations(
        rows.astype(np.int32), cols.astype(np.int32),
        vals.astype(np.float32), n_users, n_items,
    )
    params = FitParams(k=K, method="cg", plane_dtype=bench._plane_dtype(),
                       compact_tail=not args.no_compact)

    for rep in range(2):  # rep 0 = warmup (compiles), rep 1 = timed
        seed = time.time_ns() % (2**31)
        A = initialize_factors_device(n_users, by_user.n_rows_pad, K, seed)
        B = initialize_factors_device(n_items, by_item.n_rows_pad, K,
                                      seed + 1)
        jax.block_until_ready((A, B))
        t0 = time.time()
        A, B, st = run_poismf(A, B, by_user, by_item, params)
        ll = float(fetch_host(eval_llk(A, B, by_user)))
        print(f"# rep {rep}: {time.time()-t0:.2f} s  LL {ll:.6g}  "
              f"compact={not args.no_compact}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
