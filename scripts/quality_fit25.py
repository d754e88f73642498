"""One TPU parity fit at bench scale against the CACHED reference factors.

Bisect loop for the round-4 quality regression (QUALITY_r04: B-sparsity
0.41 vs ref 0.956, P@5 0.083 vs 0.201 at scale=0.25): reruns ONLY our
fit — same data/init as bench.run_quality — and compares to the cached
/tmp/poismf_ref_quality_s{scale}_seed7*.npz factors.  Env knobs
(POISMF_TNCG_LS_CAND, POISMF_TNCG_MAXCG, POISMF_ADAPTIVE_PLAN,
POISMF_BENCH_PLANES) apply as in bench.py.

Usage: python scripts/quality_fit25.py [--scale 0.25] [--config warm]
       [--compact-tail 0] [--tag label]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--config", default="warm", choices=["warm", "sparse"])
    ap.add_argument("--compact-tail", type=int, default=1)
    ap.add_argument("--tag", default="")
    ap.add_argument("--fresh", action="store_true",
                    help="clock-derived init: defeats the tunnel's "
                         "cross-process execution memoization so the wall "
                         "time is real (quality then varies slightly "
                         "with the init)")
    args = ap.parse_args()

    import scipy.sparse as sp
    import jax.numpy as jnp

    import bench
    from poismf_tpu.ops.objective import eval_llk
    from poismf_tpu.sparse import build_both_orientations
    from poismf_tpu.train import FitParams, run_poismf
    from poismf_tpu.utils.data import train_test_split
    from poismf_tpu.utils.metrics import ranking_metrics
    from poismf_tpu.utils.transfer import fetch_host

    bench._require_device()

    scale = args.scale
    n_users = max(int(bench.N_USERS * scale), 256)
    n_items = max(int(bench.N_ITEMS * scale), 128)
    nnz = max(int(bench.NNZ_TARGET * scale), 4096)
    K = 50

    rng = np.random.default_rng(7)
    rows, cols, vals = bench.synth_lastfm_like(rng, n_users, n_items, nnz)
    X = sp.csr_matrix((vals.astype(np.float64), (rows, cols)),
                      shape=(n_users, n_items))
    Xtr, Xte, _ = train_test_split(X, test_fraction=0.25,
                                   users_test=10_000, seed=3)

    init_seed = (time.time_ns() % (2**31)) if args.fresh else 11
    nprng = np.random.default_rng(init_seed)
    A0 = 0.3 + nprng.uniform(0.0, 0.01, size=(n_users, K))
    B0 = 0.3 + nprng.uniform(0.0, 0.01, size=(n_items, K))

    suffix = "" if args.config == "warm" else f"_{args.config}"
    cache = f"/tmp/poismf_ref_quality_s{scale}_seed7{suffix}.npz"
    assert os.path.exists(cache), f"missing ref cache {cache}"
    with np.load(cache) as d:
        A_ref, B_ref = d["A"], d["B"]

    coo = Xtr.tocoo()
    by_user, by_item = build_both_orientations(
        coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data.astype(np.float32), n_users, n_items,
    )

    cfg = bench.QUALITY_CONFIGS[args.config]
    A = jnp.zeros((by_user.n_rows_pad, K), dtype=jnp.float32)
    A = A.at[:n_users].set(jnp.asarray(A0, dtype=jnp.float32))
    B = jnp.zeros((by_item.n_rows_pad, K), dtype=jnp.float32)
    B = B.at[:n_items].set(jnp.asarray(B0, dtype=jnp.float32))
    params = FitParams(
        k=K, plane_dtype=bench._plane_dtype(),
        compact_tail=bool(args.compact_tail),
        max_cg=(
            None
            if os.environ.get("POISMF_TNCG_MAXCG", "").lower() == "none"
            else (int(os.environ.get("POISMF_TNCG_MAXCG", "0")) or "auto")
        ),
        **cfg,
    )
    t0 = time.time()
    A, B, st = run_poismf(A, B, by_user, by_item, params)
    ll_tpu = float(fetch_host(eval_llk(A, B, by_user)))
    wall = time.time() - t0
    assert st == 0
    A_t = np.asarray(A[:n_users], dtype=np.float64)
    B_t = np.asarray(B[:n_items], dtype=np.float64)
    m_tpu = ranking_metrics(A_t, B_t, Xtr, Xte, k=5)
    m_ref = ranking_metrics(A_ref, B_ref, Xtr, Xte, k=5)
    out = {
        "tag": args.tag, "config": args.config, "scale": scale,
        "ll_tpu": ll_tpu,
        "sparsity_b_tpu": float(np.mean(B_t == 0.0)),
        "sparsity_a_tpu": float(np.mean(A_t == 0.0)),
        "p5_tpu": round(m_tpu["p_at_k"], 5),
        "p5_ref": round(m_ref["p_at_k"], 5),
        "sparsity_b_ref": float(np.mean(B_ref <= 0.0)),
        "wall_s": round(wall, 1),
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("POISMF_")},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
