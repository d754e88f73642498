"""Per-epoch quality trace of one parity fit at bench scale.

Same data/init/config as bench.run_quality (and scripts/quality_fit25.py),
but prints ONE JSON line per epoch with train LL and the A/B sparsities —
the instrument for localizing WHERE a quality regression develops (e.g. the
round-4 collapse: B-sparsity 0.41 vs ref 0.956 with BETTER train LL, the
sparsity structure swapped between the sides).

Usage: python scripts/quality_trace25.py [--scale 0.25] [--config warm]
       [--compact-tail 0] [--tag label]
Env knobs as in bench.py / quality_fit25.py.
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

    nprng = np.random.default_rng(11)
    A0 = 0.3 + nprng.uniform(0.0, 0.01, size=(n_users, K))
    B0 = 0.3 + nprng.uniform(0.0, 0.01, size=(n_items, K))

    coo = Xtr.tocoo()
    by_user, by_item = build_both_orientations(
        coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data.astype(np.float32), n_users, n_items,
    )

    cfg = dict(method="tncg", l2_reg=1000.0, maxupd=750, niter=10,
               early_stop=True, reuse_prev=(args.config == "warm"))
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

    def trace(epoch, A_cur, B_cur):
        ll = float(fetch_host(eval_llk(A_cur, B_cur, by_user)))
        sa = float(fetch_host(
            jnp.mean((A_cur[:n_users] == 0.0).astype(jnp.float32))))
        sb = float(fetch_host(
            jnp.mean((B_cur[:n_items] == 0.0).astype(jnp.float32))))
        print(json.dumps({
            "tag": args.tag, "epoch": epoch, "ll": ll,
            "sparsity_a": round(sa, 4), "sparsity_b": round(sb, 4),
            "t": round(time.time() - t0, 1),
        }), flush=True)

    A, B, st = run_poismf(A, B, by_user, by_item, params, callback=trace)
    assert st == 0
    A_t = np.asarray(A[:n_users], dtype=np.float64)
    B_t = np.asarray(B[:n_items], dtype=np.float64)
    m_tpu = ranking_metrics(A_t, B_t, Xtr, Xte, k=5)
    print(json.dumps({
        "tag": args.tag, "final": True,
        "ll": float(fetch_host(eval_llk(A, B, by_user))),
        "sparsity_a": float(np.mean(A_t == 0.0)),
        "sparsity_b": float(np.mean(B_t == 0.0)),
        "p5": round(m_tpu["p_at_k"], 5),
        "wall_s": round(time.time() - t0, 1),
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("POISMF_")},
    }), flush=True)


if __name__ == "__main__":
    main()
