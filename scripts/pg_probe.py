"""Full-scale pg timing probe: decompose the fit into its cost pieces.

The round-3 verdict flagged pg at 45x above its physical floor (1.57 s,
22 GB/s achieved).  The modeled traffic says per-epoch plane GATHERS
dominate at k=10 (the sweep itself is ~24 B/slot while each gather
random-reads the fixed matrix and rewrites both planes), so this probe
times, at bench scale on the real TPU:

  1. one plane gather per orientation (the suspected dominant cost),
  2. one pg epoch on the ELL path (pg_epoch_ell),
  3. the whole ELL fit (layout="ell"),
  4. the whole flat-COO fit (layout="coo" — no planes, per-edge take),

each with a dependent d2h fingerprint fetch as the completion barrier
(block_until_ready lies on this transport — see CLAUDE.md).

Usage: python scripts/pg_probe.py [--scale 1.0]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from poismf_tpu.ops import ell as ell_ops
    from poismf_tpu.sparse import build_both_orientations
    from poismf_tpu.train import (FitParams, ell_pair_cached,
                                  initialize_factors_device, run_poismf)
    from poismf_tpu.utils.transfer import fetch_host

    bench._require_device()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    scale = args.scale
    n_users = max(int(bench.N_USERS * scale), 256)
    n_items = max(int(bench.N_ITEMS * scale), 128)
    nnz = max(int(bench.NNZ_TARGET * scale), 4096)
    K = 10  # the reference pg config (notebook cells 11-12)

    rng = np.random.default_rng(7)
    rows, cols, vals = bench.synth_lastfm_like(rng, n_users, n_items, nnz)
    by_user, by_item = build_both_orientations(
        rows.astype(np.int32), cols.astype(np.int32),
        vals.astype(np.float32), n_users, n_items,
    )

    def fingerprint(x):
        leaves = jax.tree_util.tree_leaves(x)
        s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves
                if hasattr(l, "ndim") and l.ndim >= 1)
        return float(fetch_host(s))

    seed = time.time_ns() % (2**31)
    A = initialize_factors_device(n_users, by_user.n_rows_pad, K, seed)
    B = initialize_factors_device(n_items, by_item.n_rows_pad, K, seed + 1)
    jax.block_until_ready((A, B))

    ell_user, ell_item = ell_pair_cached(by_user, by_item)
    A_p = ell_ops.permute_rows(A, ell_user.perm)
    B_p = ell_ops.permute_rows(B, ell_item.perm)
    jax.block_until_ready((A_p, B_p))

    pdt = jnp.dtype(bench._plane_dtype())

    # --- 1. plane gathers (warm up once, then time 3) ---
    for tag, ell, src in (("user(Bplanes)", ell_user, B_p),
                          ("item(Aplanes)", ell_item, A_p)):
        planes = ell_ops.gather_planes(src, ell, pdt)
        fingerprint(planes)
        ts = []
        for i in range(3):
            # chain a dependency so the tunnel can't memoize
            src2 = src + jnp.float32(1e-12 * (i + 1))
            t0 = time.time()
            planes = ell_ops.gather_planes(src2, ell, pdt)
            fingerprint(planes)
            ts.append(time.time() - t0)
        print(f"# gather {tag}: {min(ts)*1e3:.1f} ms (min of 3)",
              flush=True)

    # --- 2. one pg epoch (pg_epoch_ell) ---
    from poismf_tpu.solvers.pg import pg_epoch_ell

    p = FitParams(k=K, method="pg").resolved()

    def one_epoch(Ap, Bp, step):
        return pg_epoch_ell(
            Ap, Bp, ell_user, ell_item,
            jnp.asarray(p.l2_reg, dtype=jnp.float32),
            jnp.asarray(step, dtype=jnp.float32),
            jnp.asarray(p.l1_reg, dtype=jnp.float32),
            maxupd=p.maxupd, w_mult=p.w_mult,
            dtype_name=str(pdt),
        )

    Aw, Bw = one_epoch(A_p, B_p, p.initial_step)
    fingerprint((Aw, Bw))
    ts = []
    for i in range(3):
        t0 = time.time()
        Aw, Bw = one_epoch(Aw, Bw, p.initial_step * 0.9 ** (i + 1))
        fingerprint((Aw, Bw))
        ts.append(time.time() - t0)
    print(f"# pg epoch (ell, maxupd={p.maxupd}): {min(ts)*1e3:.1f} ms "
          f"(min of 3)", flush=True)

    # --- 3/4. whole fits ---
    for layout in ("ell", "coo"):
        params = FitParams(k=K, method="pg", layout=layout,
                           plane_dtype=str(pdt) if layout == "ell" else None)
        seed2 = time.time_ns() % (2**31)
        A2 = initialize_factors_device(n_users, by_user.n_rows_pad, K, seed2)
        B2 = initialize_factors_device(n_items, by_item.n_rows_pad, K,
                                       seed2 + 1)
        jax.block_until_ready((A2, B2))
        A2, B2, st = run_poismf(A2, B2, by_user, by_item, params)
        fingerprint((A2, B2))  # warmup incl. compile
        seed3 = time.time_ns() % (2**31)
        A3 = initialize_factors_device(n_users, by_user.n_rows_pad, K, seed3)
        B3 = initialize_factors_device(n_items, by_item.n_rows_pad, K,
                                       seed3 + 1)
        jax.block_until_ready((A3, B3))
        t0 = time.time()
        A3, B3, st = run_poismf(A3, B3, by_user, by_item, params)
        fingerprint((A3, B3))
        print(f"# pg fit layout={layout}: {time.time()-t0:.3f} s",
              flush=True)


if __name__ == "__main__":
    main()
