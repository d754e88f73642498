"""Small-scale CPU quality probe: bisect solver-quality regressions.

Fits the compiled reference C (tests/ref_c) and our solver on the SAME
synthetic power-law data + init at a small scale, entirely on the host CPU
(no TPU tunnel), and prints one JSON line with final LL / sparsity / P@5
for each side.  Used to adjudicate whether a solver change preserved the
reference's quality regime (README.md:28 — >90% exact zeros in B) without
paying a 25%-scale TPU quality run per experiment.

Usage:
  python scripts/quality_probe.py --scale 0.02 --config warm \
      [--compact-tail 0] [--maxcg none|N] [--lscand N] [--niter N]

Reference fits are cached in /tmp keyed on (scale, config); ours re-runs
every time (that's the variable under test).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.02)
    ap.add_argument("--config", default="warm", choices=["warm", "sparse"])
    ap.add_argument("--compact-tail", type=int, default=1)
    ap.add_argument("--maxcg", default="auto")
    ap.add_argument("--lscand", type=int, default=None)
    ap.add_argument("--niter", type=int, default=None)
    ap.add_argument("--planes", default=None,
                    help="plane dtype for the ELL fast path, e.g. bfloat16")
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    if args.lscand is not None:
        os.environ["POISMF_TNCG_LS_CAND"] = str(args.lscand)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import scipy.sparse as sp

    import bench
    from tests import ref_c
    from poismf_tpu.ops.objective import eval_llk
    from poismf_tpu.sparse import build_both_orientations
    from poismf_tpu.train import FitParams, run_poismf
    from poismf_tpu.utils.data import train_test_split
    from poismf_tpu.utils.metrics import ranking_metrics

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

    cfg = dict(bench.QUALITY_CONFIGS[args.config])
    if args.niter is not None:
        cfg["niter"] = args.niter

    out = {"scale": scale, "config": args.config,
           "compact_tail": bool(args.compact_tail),
           "maxcg": args.maxcg, "lscand": args.lscand,
           "niter": cfg["niter"]}

    coo = Xtr.tocoo()
    by_user, by_item = build_both_orientations(
        coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data.astype(np.float32), n_users, n_items,
    )

    if not args.skip_ref:
        cache = os.path.join(
            "/tmp", f"qprobe_ref_s{scale}_{args.config}_n{cfg['niter']}.npz")
        if os.path.exists(cache):
            with np.load(cache) as d:
                A_ref, B_ref = d["A"], d["B"]
        else:
            assert ref_c.load() is not None
            A_ref = np.ascontiguousarray(A0)
            B_ref = np.ascontiguousarray(B0)
            t0 = time.time()
            rc = ref_c.run_poismf_reference(
                A_ref, B_ref, Xtr.tocsr(), Xtr.tocsc(),
                method="tncg", l2_reg=cfg["l2_reg"], numiter=cfg["niter"],
                maxupd=cfg["maxupd"], early_stop=cfg["early_stop"],
                reuse_prev=cfg["reuse_prev"], nthreads=1,
            )
            assert rc == 0
            print(f"# ref fit {time.time()-t0:.0f}s", file=sys.stderr)
            np.savez_compressed(cache, A=A_ref, B=B_ref)
        m_ref = ranking_metrics(A_ref, B_ref, Xtr, Xte, k=5)
        Ar = jnp.zeros((by_user.n_rows_pad, K), dtype=jnp.float32)
        Ar = Ar.at[:n_users].set(jnp.asarray(A_ref, dtype=jnp.float32))
        Br = jnp.zeros((by_item.n_rows_pad, K), dtype=jnp.float32)
        Br = Br.at[:n_items].set(jnp.asarray(B_ref, dtype=jnp.float32))
        out.update(
            ll_ref=float(eval_llk(Ar, Br, by_user)),
            sparsity_b_ref=float(np.mean(B_ref <= 0.0)),
            sparsity_a_ref=float(np.mean(A_ref <= 0.0)),
            p5_ref=round(m_ref["p_at_k"], 5),
        )

    A = jnp.zeros((by_user.n_rows_pad, K), dtype=jnp.float32)
    A = A.at[:n_users].set(jnp.asarray(A0, dtype=jnp.float32))
    B = jnp.zeros((by_item.n_rows_pad, K), dtype=jnp.float32)
    B = B.at[:n_items].set(jnp.asarray(B0, dtype=jnp.float32))
    maxcg = (None if args.maxcg == "none"
             else ("auto" if args.maxcg == "auto" else int(args.maxcg)))
    params = FitParams(k=K, compact_tail=bool(args.compact_tail),
                       max_cg=maxcg, plane_dtype=args.planes, **cfg)
    t0 = time.time()
    A, B, st = run_poismf(A, B, by_user, by_item, params)
    wall = time.time() - t0
    assert st == 0
    A_t = np.asarray(A[:n_users], dtype=np.float64)
    B_t = np.asarray(B[:n_items], dtype=np.float64)
    m_tpu = ranking_metrics(A_t, B_t, Xtr, Xte, k=5)
    out.update(
        ll_tpu=float(eval_llk(A, B, by_user)),
        sparsity_b_tpu=float(np.mean(B_t == 0.0)),
        sparsity_a_tpu=float(np.mean(A_t == 0.0)),
        p5_tpu=round(m_tpu["p_at_k"], 5),
        wall_s=round(wall, 1),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
