"""End-to-end workflow mirroring the reference's Last.FM notebook
(/root/reference/example/example_poismf_lastfm.ipynb) on synthetic power-law
data: train/test split, fits with all three solvers, ranking evaluation,
cold-start factors, top-N, and checkpointing.

Run:  python examples/lastfm_style_workflow.py [--scale 0.02]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# Honor an explicit CPU selection at the config level: the pre-registered
# tunnel plugin ignores the env var alone, and a dead tunnel blocks
# backend init forever (see docs/DESIGN.md, tunnel hazards)
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.02,
                    help="fraction of Last.FM-360K size to synthesize")
    ap.add_argument("--k", type=int, default=50)
    args = ap.parse_args()

    from bench import synth_lastfm_like, N_USERS, N_ITEMS, NNZ_TARGET
    import scipy.sparse as sp
    from poismf_tpu import PoisMF
    from poismf_tpu.utils.data import train_test_split
    from poismf_tpu.utils.metrics import ranking_metrics

    n_users = int(N_USERS * args.scale)
    n_items = int(N_ITEMS * args.scale)
    rng = np.random.default_rng(1)
    rows, cols, vals = synth_lastfm_like(
        rng, n_users, n_items, int(NNZ_TARGET * args.scale)
    )

    # per-user holdout split (the reference notebook uses recometrics here)
    X = sp.csr_matrix((vals, (rows, cols)), shape=(n_users, n_items))
    Xtr, Xte, test_users = train_test_split(
        X, test_fraction=0.2, users_test=10_000, seed=1
    )
    print(f"{n_users} users x {n_items} items, "
          f"train nnz {Xtr.nnz}, test nnz {Xte.nnz}")

    print("note: each config's first fit includes XLA compilation "
          "(minutes on a tunneled TPU; cached afterwards)")
    configs = [
        ("pg",   dict(k=10, method="pg", l2_reg=1e9, niter=10, maxupd=1)),
        ("cg",   dict(k=args.k, method="cg", l2_reg=1e4, niter=30, maxupd=5)),
        ("tncg", dict(k=args.k, method="tncg", l2_reg=1e3, niter=10,
                      maxupd=750, reuse_prev=True)),
    ]
    model = None
    for name, cfg in configs:
        m = PoisMF(**cfg)
        t0 = time.time()
        m.fit(Xtr.tocoo())
        fit_s = time.time() - t0
        mets = ranking_metrics(m.A, m.B, Xtr, Xte, k=5, users=test_users)
        print(f"{name:5s} fit {fit_s:7.1f}s  "
              f"P@5 {mets['p_at_k']:.4f}  NDCG@5 {mets['ndcg_at_k']:.4f}  "
              f"AUC {mets['roc_auc']:.4f}  "
              f"A zeros {float((m.A == 0).mean()):.2%}")
        model = m

    # serving surface
    user = 0
    print("topN(user 0):", model.topN(user, n=5).tolist())
    seen = Xtr.indices[Xtr.indptr[user]:Xtr.indptr[user + 1]]
    print("topN excluding seen:",
          model.topN(user, n=5, exclude=seen).tolist())

    # cold start: a brand-new user who consumed a few items
    new_items = np.asarray(model.topN(user, n=8))
    new_counts = np.full(new_items.shape[0], 3.0)
    factors = model.predict_factors((new_items, new_counts))
    print("cold-start factors norm:", float(np.linalg.norm(factors)))
    print("topN_new:",
          model.topN_new((new_items, new_counts), n=5).tolist())

    # persistence round-trip
    model.save("/tmp/poismf_model.npz")
    restored = PoisMF.load("/tmp/poismf_model.npz")
    assert np.allclose(restored.predict(0, 0), model.predict(0, 0),
                       equal_nan=True)
    print("checkpoint round-trip OK")


if __name__ == "__main__":
    main()
