"""Headline benchmarks: full training fits at Last.FM-360K scale, one per
reference configuration (BASELINE.md):

  pg   : k=10, niter=10, maxupd=1,  l2=1e9  -> baseline   6.17 s wall
  cg   : k=50, niter=30, maxupd=5,  l2=1e4  -> baseline 236    s wall
  tncg : k=50, niter=10, maxupd=750, l2=1e3, reuse_prev=True
                                            -> baseline 359    s wall

The baselines are the reference's committed notebook outputs on a ~16-thread
CPU host (example/example_poismf_lastfm.ipynb cells 11-18).  We generate a
synthetic dataset with the same dimensions, nnz count, and a power-law
row-popularity profile, compile-warm each solver, then time the full fit
(fresh factor init, all alternating epochs, same early-stop semantics).

Prints one JSON line per configuration; the LAST line is the flagship tncg
row (the driver's headline metric):
  {"metric": "<cfg>_fit_wall_s", "value": <median s>, "unit": "s",
   "vs_baseline": <baseline_s / median_s>,   (vs_baseline > 1 means faster)
   "median": .., "min": .., "max": ..,       (over the timed repeats)
   "fingerprint_ok": bool,  "floor_s": ..,   (self-verification, see below)
   "init_ll": .., "final_ll": .., "achieved_gbs": ..}

The benchmark is SELF-VERIFYING (the round-2 pg row read 0.003 s because the
tunnel transport memoizes identical executions and `block_until_ready` can
resolve without forcing them):
  * every fit starts from a distinct device-generated init and ENDS with a
    host fetch of a scalar fingerprint of (A, B) inside the timed window —
    a d2h read is the only operation the transport cannot fake;
  * fingerprints must be finite and pairwise distinct across warmup and all
    timed repeats (``fingerprint_ok``);
  * each config carries a physical floor: a LOWER bound on the fit's HBM
    traffic (minimum plane sweeps x unpadded bytes/sweep) divided by peak
    bandwidth; a measurement below the floor is flagged not credible;
  * >= 3 timed repeats, median reported (tunnel variance is +-20%);
  * achieved GB/s from the driver's pass accounting (train.PASS_STATS) so
    the headline number can be judged against the chip's bandwidth roofline.

Flags:
  --scale=F        shrink users/items/nnz by F (baseline scaled linearly)
  --configs=a,b    subset of {pg, cg, tncg} (default: all three)
  --mesh[=N]       run the sharded multi-chip driver over an N-device mesh
                   (default: all visible devices); single-chip otherwise
Env: POISMF_BENCH_REPEATS (default 3), POISMF_BENCH_PEAK_GBS (default 819,
v5e HBM), POISMF_BENCH_VERBOSE, POISMF_BENCH_PLANES, POISMF_BENCH_SEED.
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

N_USERS = 358_858
N_ITEMS = 160_112
NNZ_TARGET = 17_164_027

# (k, l2, maxupd, niter, reuse_prev, baseline wall seconds)
CONFIGS = {
    "pg": dict(k=10, l2=1e9, maxupd=1, niter=10, reuse_prev=False,
               baseline_s=6.17),
    "cg": dict(k=50, l2=1e4, maxupd=5, niter=30, reuse_prev=False,
               baseline_s=236.0),
    "tncg": dict(k=50, l2=1e3, maxupd=750, niter=10, reuse_prev=True,
                 baseline_s=359.0),
}


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


def _plane_dtype():
    # bf16 plane storage is the production default: halves the dominant HBM
    # traffic; full-scale LL matches f32 to ~7e-5 relative
    v = os.environ.get("POISMF_BENCH_PLANES", "bfloat16")
    return None if v == "float32" else v


PEAK_GBS = float(os.environ.get("POISMF_BENCH_PEAK_GBS", "819"))  # v5e HBM
N_REPEATS = max(1, int(os.environ.get("POISMF_BENCH_REPEATS", "3")))


def _plane_itemsize():
    return 2 if _plane_dtype() == "bfloat16" else 4


def floor_seconds(name, nnz):
    """LOWER bound on one fit's wall time from HBM traffic alone: minimum
    full-data sweeps x unpadded bytes per sweep / peak bandwidth.  Any
    measurement below this is physically impossible on this chip and marks
    the row not credible (the round-2 pg row was 6x below its floor).

    Sweep minima per config (both halves per epoch):
      pg   : exactly 1 plane gather + maxupd gradient sweeps per half;
      cg   : 1 gather + 2 sweeps (init f + first fg) per half;
      tncg : 1 gather + 1 fgh sweep per half (the init evaluation always
             streams the planes even if every row converges instantly),
             for ALL niter epochs.  This assumes the >=95%-unchanged
             early stop does not fire before the last epoch — true of
             the bench config at every measured scale (epoch logs show
             all 10 epochs running); if early stop ever fires at epoch 1
             the floor overestimates by ~niter.  Note the floor bounds
             HBM TRAFFIC only: the tncg wall is dominated by per-row
             adaptive solve depth (outer iterations x HVP/LS sweeps),
             which has no nontrivial lower bound — a fit whose rows all
             converge at entry is physically possible at this traffic.
    """
    cfg = CONFIGS[name]
    k, it = cfg["k"], _plane_itemsize()
    sweep = nnz * (k * it + 4.0)  # bg plane + f32 vals plane, unpadded
    gather = nnz * k * (4.0 + it)  # read fixed rows + write planes
    if name == "pg":
        per_half = gather + cfg["maxupd"] * sweep
        n_halves = 2 * cfg["niter"]
    elif name == "cg":
        per_half = gather + 2 * sweep
        n_halves = 2 * cfg["niter"]
    else:
        per_half = gather + sweep
        n_halves = 2 * cfg["niter"]
    return n_halves * per_half / (PEAK_GBS * 1e9)


def _drain_pass_stats(entries):
    """Sum the driver's (sweeps, bytes_per_sweep) accounting entries into
    total bytes; device-scalar sweep counters are fetched in one batch."""
    import jax.numpy as jnp

    from poismf_tpu.utils.transfer import fetch_host

    host = 0.0
    dev = []
    for sweeps, bpp in entries:
        if isinstance(sweeps, (int, float)):
            host += float(sweeps) * bpp
        else:
            dev.append((sweeps, bpp))
    if dev:
        total = jnp.sum(
            jnp.stack([s.astype(jnp.float32) for s, _ in dev])
            * jnp.asarray([b for _, b in dev], dtype=jnp.float32)
        )
        host += float(fetch_host(total))
    return host


def run_config(name, by_user, by_item, n_users, n_items, mesh=None,
               verbose=False):
    """Warm-compile, then run N_REPEATS timed fits with self-verification.

    Returns (result_dict, A, B, params) where result_dict carries the
    median/min/max wall seconds, fingerprint check, physical floor and
    achieved bandwidth (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from poismf_tpu import train as train_mod
    from poismf_tpu.train import (FitParams, initialize_factors_device,
                                  run_poismf)
    from poismf_tpu.utils.transfer import fetch_host

    cfg = CONFIGS[name]
    params = FitParams(
        k=cfg["k"], method=name, l2_reg=cfg["l2"], maxupd=cfg["maxupd"],
        niter=cfg["niter"], reuse_prev=cfg["reuse_prev"], early_stop=True,
        plane_dtype=_plane_dtype(),
        # inner-CG cap experiment knob (see FitParams.max_cg): unset/0 =
        # the tuned "auto" default, "none" = the reference maxCGit clamp,
        # N = explicit cap
        max_cg=(
            None if os.environ.get("POISMF_TNCG_MAXCG", "").lower() == "none"
            else (int(os.environ.get("POISMF_TNCG_MAXCG", "0")) or "auto")
        ),
    )

    fingerprint = jax.jit(
        lambda A, B: jnp.sum(A * A) + 2.0 * jnp.sum(B * B)
    )
    # Init-distinctness witness over a SMALL slice: a full-matrix sum of
    # ~18M near-identical init values puts the seed-to-seed difference
    # (~1e-6 relative) below f32 resolution, so distinct seeds collided
    # (observed: two inits both fingerprinting 3158859.0).  Over 128 rows
    # the seed noise is ~2000x the float quantum.
    fingerprint_init = jax.jit(
        lambda A, B: jnp.sum(A[:128]) + 2.0 * jnp.sum(B[:128])
    )

    def fresh_fit(seed):
        # Every fit starts from a DIFFERENT init (and, unless
        # POISMF_BENCH_SEED pins it, one derived from the clock): the
        # tunnel memoizes identical remote executions ACROSS PROCESSES, so
        # re-running a previously-run computation — the warmup, or a fixed
        # seed from an earlier bench invocation — reads as ~0 s of fake
        # wall time.  The timed window ENDS with a host fetch of the
        # fingerprint scalar: a d2h read of a value depending on every
        # entry of (A, B) is the one completion barrier the transport
        # cannot satisfy without having run the computation.
        A0 = initialize_factors_device(
            n_users, by_user.n_rows_pad, cfg["k"], seed
        )
        B0 = initialize_factors_device(
            n_items, by_item.n_rows_pad, cfg["k"], seed + 7919
        )
        t0 = time.time()
        marks = [t0]

        def cb(epoch, A_, B_):
            jax.block_until_ready((A_, B_))
            marks.append(time.time())
            print(f"#   [{name}] epoch {epoch}: {marks[-1]-marks[-2]:.1f}s",
                  file=sys.stderr, flush=True)

        def dispatch_fit():
            if mesh is not None:
                from poismf_tpu.parallel.mesh import run_poismf_sharded

                A, B, _ = run_poismf_sharded(
                    A0, B0, by_user, by_item, params, mesh,
                    callback=cb if verbose else None,
                )
            else:
                A, B, _ = run_poismf(A0, B0, by_user, by_item, params,
                                     callback=cb if verbose else None)
            return A, B

        # The transport occasionally loses an execution rpc (the result
        # never lands); the fit is a pure function of host inputs and the
        # transport memoizes completed executions, so re-dispatching is
        # safe and nearly free when the work DID finish server-side.
        from poismf_tpu.utils.transfer import FetchStalled

        for attempt in range(3):
            if mesh is None:
                # reset per attempt: a re-dispatched fit would otherwise
                # append a second full set of traffic entries (the repeated
                # work is memoized server-side, so no real bytes moved)
                train_mod.PASS_STATS = []
                if name == "cg":
                    train_mod.CG_STATS = []
            A, B = dispatch_fit()
            try:
                fp = float(fetch_host(fingerprint(A, B), give_up=attempt < 2))
                break
            except FetchStalled:
                print(f"# [{name}] fit result never landed (attempt "
                      f"{attempt + 1}); re-dispatching", file=sys.stderr,
                      flush=True)
        dt = time.time() - t0
        stats = train_mod.PASS_STATS
        train_mod.PASS_STATS = None
        cg_stats = train_mod.CG_STATS
        train_mod.CG_STATS = None
        fit_bytes = _drain_pass_stats(stats) if stats else None
        # init fingerprint (outside the timed window): distinct per seed by
        # construction, so collisions prove the runs solved the SAME problem
        # (pg's final factors can legitimately collide: l2=1e9 collapses
        # different inits to the same fixed point, so fp alone is not a
        # distinctness witness there)
        fp0 = float(fetch_host(fingerprint_init(A0, B0)))
        return dt, A, B, A0, B0, (fp0, fp), fit_bytes, cg_stats

    base = os.environ.get("POISMF_BENCH_SEED")
    base = (int(base) if base
            else int(time.time_ns() % np.iinfo(np.int32).max) | 1)
    warm_s, _, _, _, _, warm_fp, _, _ = fresh_fit(base)
    print(f"# [{name}] warmup fit (incl. compile): {warm_s:.1f}s",
          file=sys.stderr, flush=True)

    # Plans built from the warmup's rejection profiles (often in its last
    # epochs) would otherwise pay their first-use compile INSIDE the first
    # timed fit (~25 s observed); compile them now with zero-data dummy
    # rounds.
    if mesh is None:
        warmed = train_mod.warm_compact_plans(by_user, by_item, params)
        if warmed:
            print(f"# [{name}] pre-compiled {warmed} cascade plan(s)",
                  file=sys.stderr, flush=True)

    # Freeze the cascade's adaptive-plan set after warmup: a timed fit
    # whose tail profile slightly outgrows the warmup's caps would
    # otherwise compile a new program set MID-FIT (~25 s on the remote
    # compiler, observed as an 80 s first timed fit).  Frozen plans at
    # worst fall back to already-compiled full-structure rounds — the
    # steady state a production service would run in.
    adaptive_preset = os.environ.get("POISMF_ADAPTIVE_PLAN")
    if adaptive_preset is None:
        os.environ["POISMF_ADAPTIVE_PLAN"] = "0"

    times, fps, gbss = [], [warm_fp], []
    cg_stats_last = None
    A = B = A0 = B0 = None
    try:
        for r in range(N_REPEATS):
            (fit_s, A, B, A0, B0, fp, fit_bytes,
             cg_stats_last) = fresh_fit(base + 1 + r)
            times.append(fit_s)
            fps.append(fp)
            if fit_bytes:
                gbss.append(fit_bytes / 1e9 / fit_s)
            print(f"# [{name}] timed fit {r + 1}/{N_REPEATS}: {fit_s:.1f}s"
                  + (f"  ({gbss[-1]:.0f} GB/s of {PEAK_GBS:.0f} peak)"
                     if fit_bytes else ""),
                  file=sys.stderr, flush=True)
    finally:
        if adaptive_preset is None:
            os.environ.pop("POISMF_ADAPTIVE_PLAN", None)

    floor_s = floor_seconds(name, by_user.nnz)
    fp0s = [f[0] for f in fps]
    fp1s = [f[1] for f in fps]
    fp_ok = (
        all(np.isfinite(fp0s)) and all(np.isfinite(fp1s))
        # every run must have STARTED from a distinct problem (init
        # fingerprints are distinct per seed by construction, so a collision
        # means the transport served a memoized execution)
        and len(set(fp0s)) == len(fp0s)
    )
    res = dict(
        median=float(np.median(times)),
        min=float(np.min(times)),
        max=float(np.max(times)),
        fingerprint_ok=bool(fp_ok),
        floor_s=round(floor_s, 4),
    )
    if gbss:
        res["achieved_gbs"] = round(float(np.median(gbss)), 1)
        res["bw_frac"] = round(res["achieved_gbs"] / PEAK_GBS, 4)
    if cg_stats_last:
        # compaction-engagement evidence for the cg row (one entry per
        # half-update of the LAST timed fit): how many halves ran the
        # entry probe, how many landed a compact plan (by divisor), and
        # the mean live-tail share at entry — so a cg regression can be
        # attributed to compaction (not) engaging vs tunnel variance
        probed = [e for e in cg_stats_last if e.get("probed")]
        engaged = [e for e in probed if e["denom"] is not None]
        res["cg_halves"] = len(cg_stats_last)
        res["cg_probed"] = len(probed)
        res["cg_compacted"] = len(engaged)
        if probed:
            res["cg_active_share_mean"] = round(float(np.mean(
                [e["active"] / max(e["rows"], 1) for e in probed])), 4)
        denoms = sorted({str(e["denom"]) for e in engaged})
        if denoms:
            res["cg_plan_denoms"] = ",".join(denoms)
    if not fp_ok:
        print(f"# [{name}] WARNING: fingerprints not distinct/finite "
              f"({fps}) — timing is NOT credible (memoized execution?)",
              file=sys.stderr, flush=True)
    if res["min"] < floor_s:
        res["below_floor"] = True
        print(f"# [{name}] WARNING: measured {res['min']:.3f}s beats the "
              f"physical floor {floor_s:.3f}s at {PEAK_GBS:.0f} GB/s — "
              f"timing is NOT credible", file=sys.stderr, flush=True)
    # init -> final LL delta proves the fit moved the factors
    try:
        from poismf_tpu.ops.objective import eval_llk

        res["init_ll"] = float(fetch_host(eval_llk(A0, B0, by_user)))
    except Exception as e:
        print(f"# [{name}] init-LL diagnostic failed: {e}", file=sys.stderr)
    return res, A, B, params


def bench_topn(A, B, n_users, n_top=10, q_chunk=4096, max_users=262_144):
    """Full-catalog topN serving throughput (queries/sec): chunks of user
    vectors through one [Q,k]x[k,n_items] MXU matmul + top_k each.  Every
    chunk is a DISTINCT user block so the tunnel's execution memoization
    cannot fake the numbers."""
    import jax

    from poismf_tpu.serve import top_n_batched

    import jax.numpy as jnp

    from poismf_tpu.utils.transfer import fetch_host

    # clamp so small --scale runs still execute >= 1 timed chunk of true
    # (unpadded) users instead of reporting ~0 qps from an empty loop
    q_chunk = min(q_chunk, n_users)
    out = top_n_batched(A[:q_chunk], B, n_top)  # compile
    float(fetch_host(jnp.sum(out[0])))
    t0 = time.time()
    total = 0
    # accumulate a value depending on EVERY chunk's scores and fetch it
    # inside the timed window: block_until_ready does not reliably wait on
    # this transport (measured: async dispatch of 840 MB of reduction work
    # "completed" in 0.04 ms), a d2h read is the only true barrier
    acc = jnp.zeros((), dtype=jnp.float32)
    for s in range(0, min(n_users, max_users) - q_chunk + 1, q_chunk):
        vals, _ = top_n_batched(
            jax.lax.dynamic_slice_in_dim(A, s, q_chunk, axis=0), B, n_top
        )
        acc = acc + jnp.sum(vals).astype(jnp.float32)
        total += q_chunk
    assert np.isfinite(float(fetch_host(acc)))
    return total / (time.time() - t0)


def reference_topn_qps(A, B, n_top=10, n_queries=24, nthreads=16):
    """Measured qps of the reference C ``topN`` (topN.c:111-210, OpenMP
    scoring loop) on this host, or None when gcc//root/reference is absent.

    Returns ``(qps, threads_effective)``: the call requests ``nthreads``
    OpenMP threads, but on this host the effective parallelism is
    ``min(nthreads, cpu cores)`` — 16 threads on a 1-core box measure
    single-core throughput.  The caller records both and normalizes the
    comparison to the ~16-thread notebook host (BASELINE.md)."""
    import ctypes

    try:
        from tests import ref_c

        lib = ref_c.load()
    except Exception:
        return None
    if lib is None:
        return None
    n, k = B.shape
    B64 = np.ascontiguousarray(np.asarray(B), dtype=np.float64)
    A64 = np.ascontiguousarray(np.asarray(A[:n_queries]), dtype=np.float64)
    outp_ix = np.zeros(n_top, dtype=np.uintp)
    outp_score = np.zeros(n_top, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    stp = ctypes.POINTER(ctypes.c_size_t)

    def ptr(a, t):
        return a.ctypes.data_as(t)

    # warm one query, then time
    lib.topN(ptr(A64[0], dp), ptr(B64, dp), k, None, 0, None, 0,
             ptr(outp_ix, stp), ptr(outp_score, dp), n_top, n, nthreads)
    t0 = time.time()
    for i in range(n_queries):
        lib.topN(ptr(A64[i], dp), ptr(B64, dp), k, None, 0, None, 0,
                 ptr(outp_ix, stp), ptr(outp_score, dp), n_top, n, nthreads)
    qps = n_queries / (time.time() - t0)
    threads_eff = min(nthreads, os.cpu_count() or 1)
    return qps, threads_eff


# Quality-parity configs: "warm" is the flagship timed config (notebook
# cells 17-18, reuse_prev=True f32); "sparse" is the reference's HEADLINE
# sparse-regime config (README.md:28 ">90% of entries exactly zero";
# notebook cells 19-24: reuse_prev=False float64, published A 82.68% /
# B 96.13% zeros).  The reference side always runs float64 (the harness is
# compiled double); ours runs the TPU f32 path for both.
QUALITY_CONFIGS = {
    "warm": dict(method="tncg", k=50, l2_reg=1e3, maxupd=750, niter=10,
                 early_stop=True, reuse_prev=True),
    "sparse": dict(method="tncg", k=50, l2_reg=1e3, maxupd=750, niter=10,
                   early_stop=True, reuse_prev=False),
    # the reference's other two published configs (notebook cells 11-15 /
    # BASELINE.md rows 1-2): cg k=50 niter=30 maxupd=5 l2=1e4 and the pg
    # sparse regime k=10 niter=10 maxupd=1 l2=1e9
    "cg": dict(method="cg", k=50, l2_reg=1e4, maxupd=5, niter=30,
               early_stop=True, reuse_prev=False),
    "pg": dict(method="pg", k=10, l2_reg=1e9, maxupd=1, niter=10,
               early_stop=True, reuse_prev=False),
}


def run_quality(scale: float, out_path: str = "QUALITY_r05.json",
                configs=("warm", "sparse", "cg", "pg"),
                ref_only: bool = False):
    """Full(-ish)-scale matched-quality evidence vs the compiled reference C:
    fit BOTH implementations on the same synthetic power-law data from the
    same init, then compare final train LL, factor sparsity (A and B) and
    ranking metrics on a per-user holdout with the same evaluator — one
    JSON line per config in QUALITY_CONFIGS, incl. the reference's headline
    >90%-B-sparsity regime.

    The reference fits run single-threaded on this 1-core host (~25 min
    each at scale=0.25), so their factors are cached in /tmp keyed on
    (scale, seed, config); delete the cache files to re-run them.
    ``ref_only=True`` runs/caches ONLY the reference fits and returns —
    the CPU-bound half can then run in the background without holding the
    TPU or fighting the (host-side) remote compiler.
    """
    import scipy.sparse as sp

    import jax
    import jax.numpy as jnp

    from tests import ref_c
    from poismf_tpu.ops.objective import eval_llk
    from poismf_tpu.sparse import build_both_orientations
    from poismf_tpu.train import FitParams, run_poismf
    from poismf_tpu.utils.data import train_test_split
    from poismf_tpu.utils.metrics import ranking_metrics
    from poismf_tpu.utils.transfer import fetch_host

    assert ref_c.load() is not None, "reference C library unavailable"

    n_users = max(int(N_USERS * scale), 256)
    n_items = max(int(N_ITEMS * scale), 128)
    nnz = max(int(NNZ_TARGET * scale), 4096)

    rng = np.random.default_rng(7)
    rows, cols, vals = synth_lastfm_like(rng, n_users, n_items, nnz)
    X = sp.csr_matrix((vals.astype(np.float64), (rows, cols)),
                      shape=(n_users, n_items))
    Xtr, Xte, _ = train_test_split(
        X, test_fraction=0.25, users_test=10_000, seed=3
    )
    print(f"# [quality] {n_users}x{n_items}, train nnz {Xtr.nnz}, "
          f"test nnz {Xte.nnz}", file=sys.stderr, flush=True)

    coo = Xtr.tocoo()
    by_user, by_item = build_both_orientations(
        coo.row.astype(np.int32), coo.col.astype(np.int32),
        coo.data.astype(np.float32), n_users, n_items,
    )

    lines = []
    for cname in configs:
        cfg = dict(QUALITY_CONFIGS[cname])
        K = cfg.pop("k")
        method = cfg["method"]
        nprng = np.random.default_rng(11)
        A0 = 0.3 + nprng.uniform(0.0, 0.01, size=(n_users, K))
        B0 = 0.3 + nprng.uniform(0.0, 0.01, size=(n_items, K))
        suffix = "" if cname == "warm" else f"_{cname}"  # cache-compat
        cache = os.path.join(
            tempfile_dir(), f"poismf_ref_quality_s{scale}_seed7{suffix}.npz"
        )
        if os.path.exists(cache):
            with np.load(cache) as d:
                A_ref, B_ref, ref_wall = d["A"], d["B"], float(d["wall_s"])
            print(f"# [quality/{cname}] reference fit loaded from cache "
                  f"({ref_wall:.0f}s when measured)", file=sys.stderr)
        else:
            A_ref = np.ascontiguousarray(A0)
            B_ref = np.ascontiguousarray(B0)
            print(f"# [quality/{cname}] fitting reference C (single-"
                  "threaded, may take tens of minutes at this scale)...",
                  file=sys.stderr, flush=True)
            t0 = time.time()
            rc = ref_c.run_poismf_reference(
                A_ref, B_ref, Xtr.tocsr(), Xtr.tocsc(),
                method=method, l2_reg=cfg["l2_reg"], numiter=cfg["niter"],
                maxupd=cfg["maxupd"], early_stop=cfg["early_stop"],
                reuse_prev=cfg["reuse_prev"], nthreads=1,
            )
            ref_wall = time.time() - t0
            assert rc == 0
            np.savez_compressed(cache, A=A_ref, B=B_ref, wall_s=ref_wall)
            print(f"# [quality/{cname}] reference fit: {ref_wall:.0f}s "
                  "(1 thread)", file=sys.stderr, flush=True)
        if ref_only:
            continue

        # --- ours, same data + init, TPU f32 path ---
        A = jnp.zeros((by_user.n_rows_pad, K), dtype=jnp.float32)
        A = A.at[:n_users].set(jnp.asarray(A0, dtype=jnp.float32))
        B = jnp.zeros((by_item.n_rows_pad, K), dtype=jnp.float32)
        B = B.at[:n_items].set(jnp.asarray(B0, dtype=jnp.float32))
        params = FitParams(
            k=K, plane_dtype=_plane_dtype(),
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
        tpu_wall = time.time() - t0
        assert st == 0
        A_t = np.asarray(A[:n_users], dtype=np.float64)
        B_t = np.asarray(B[:n_items], dtype=np.float64)

        # Warm steady-state wall time at the same scale: the parity fit
        # above pays every one-time XLA compile (and any transport stall),
        # so its wall is NOT a throughput number.  Re-fit from a
        # clock-derived init (the tunnel memoizes identical executions
        # across processes — a pinned-init rerun would read ~0 s) and end
        # the window with a dependent d2h fetch, the only true completion
        # barrier on this transport.
        wseed = time.time_ns() % (2**31)
        wrng = np.random.default_rng(wseed)
        Aw = jnp.zeros((by_user.n_rows_pad, K), dtype=jnp.float32)
        Aw = Aw.at[:n_users].set(jnp.asarray(
            0.3 + wrng.uniform(0.0, 0.01, size=(n_users, K)),
            dtype=jnp.float32))
        Bw = jnp.zeros((by_item.n_rows_pad, K), dtype=jnp.float32)
        Bw = Bw.at[:n_items].set(jnp.asarray(
            0.3 + wrng.uniform(0.0, 0.01, size=(n_items, K)),
            dtype=jnp.float32))
        jax.block_until_ready((Aw, Bw))
        t0 = time.time()
        Aw, Bw, stw = run_poismf(Aw, Bw, by_user, by_item, params)
        ll_warm = float(fetch_host(eval_llk(Aw, Bw, by_user)))
        tpu_wall_warm = time.time() - t0
        assert stw == 0 and np.isfinite(ll_warm)
        print(f"# [quality/{cname}] warm refit (seed {wseed}): "
              f"{tpu_wall_warm:.1f}s, LL {ll_warm:.6g}",
              file=sys.stderr, flush=True)

        # reference LL through the same evaluator
        Ar = jnp.zeros((by_user.n_rows_pad, K), dtype=jnp.float32)
        Ar = Ar.at[:n_users].set(jnp.asarray(A_ref, dtype=jnp.float32))
        Br = jnp.zeros((by_item.n_rows_pad, K), dtype=jnp.float32)
        Br = Br.at[:n_items].set(jnp.asarray(B_ref, dtype=jnp.float32))
        ll_ref = float(fetch_host(eval_llk(Ar, Br, by_user)))

        m_ref = ranking_metrics(A_ref, B_ref, Xtr, Xte, k=5)
        m_tpu = ranking_metrics(A_t, B_t, Xtr, Xte, k=5)

        out = {
            "metric": (f"quality_parity_tncg{suffix}" if method == "tncg"
                       else f"quality_parity_{cname}"),
            "scale": scale,
            "config": dict(cfg),
            "ll_ref": ll_ref,
            "ll_tpu": ll_tpu,
            "ll_rel_diff": abs(ll_tpu - ll_ref) / max(abs(ll_ref), 1.0),
            "sparsity_ref": float(np.mean(B_ref <= 0.0)),
            "sparsity_tpu": float(np.mean(B_t == 0.0)),
            "sparsity_a_ref": float(np.mean(A_ref <= 0.0)),
            "sparsity_a_tpu": float(np.mean(A_t == 0.0)),
            "p5_ref": round(m_ref["p_at_k"], 5),
            "p5_tpu": round(m_tpu["p_at_k"], 5),
            "ndcg5_ref": round(m_ref["ndcg_at_k"], 5),
            "ndcg5_tpu": round(m_tpu["ndcg_at_k"], 5),
            "auc_ref": round(m_ref["roc_auc"], 5),
            "auc_tpu": round(m_tpu["roc_auc"], 5),
            "ref_wall_s_1thread": round(ref_wall, 1),
            # cold = parity fit incl. every one-time XLA compile; warm =
            # fresh clock-seeded init through the already-compiled
            # programs (the comparable throughput number)
            "tpu_wall_cold_s": round(tpu_wall, 1),
            "tpu_wall_warm_s": round(tpu_wall_warm, 1),
        }
        if cname == "sparse":
            # the headline claim under test (README.md:28; notebook cells
            # 19-24 published B 96.13% zeros): >90% exact zeros in B at
            # comparable-or-better ranking quality.  The P@5 gate is
            # ONE-SIDED (>= 90% of the reference's) — the ray solver beats
            # the reference's P@5 on this config and a two-sided band
            # would fail it for being better.  LL within 3%: the 2508-s
            # single-threaded reference fit converges the train objective
            # slightly deeper at equal/worse ranking quality; train LL is
            # not the product metric (see docs/DESIGN.md, round-4 lesson).
            out["sparse_regime_pass"] = bool(
                out["sparsity_tpu"] >= 0.90
                and out["ll_rel_diff"] <= 0.03
                and out["p5_tpu"] >= 0.9 * out["p5_ref"]
            )
        line = json.dumps(out)
        lines.append(line)
        print(line)
    if lines:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")


def tempfile_dir():
    import tempfile

    return tempfile.gettempdir()


def _require_device(timeout_s: float = 180.0):
    """Fail fast (machine-readable) when backend init hangs.

    ``jax.devices()`` initializes every registered plugin; a dead TPU
    tunnel blocks that call in native code FOREVER (observed in round 3:
    three dryruns hung >9 min each with zero output).  Probe it from a
    watchdog-supervised thread so an environment outage yields an error
    artifact instead of a silent hang the driver cannot distinguish from
    a slow benchmark."""
    import threading

    out = {}
    done = threading.Event()

    def probe():
        try:
            import jax

            out["devices"] = list(jax.devices())
        except BaseException as e:  # report, don't misdiagnose as a hang
            out["error"] = f"{type(e).__name__}: {e}"
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    done.wait(timeout_s)
    if "devices" not in out:
        err = out.get(
            "error",
            f"device init hung > {timeout_s:.0f}s (backend/tunnel "
            "unreachable)",
        )
        print(json.dumps({
            "metric": "bench_error", "value": 0, "unit": "none",
            "error": err,
        }), flush=True)
        os._exit(3)
    print(f"# devices: {out['devices']}", file=sys.stderr)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    scale = 1.0
    configs = ["pg", "cg", "tncg"]
    mesh_n = None
    for a in argv:
        if a.startswith("--scale="):
            scale = float(a.split("=", 1)[1])
        elif a.startswith("--configs="):
            configs = [c for c in a.split("=", 1)[1].split(",") if c]
        elif a == "--mesh":
            mesh_n = -1
        elif a.startswith("--mesh="):
            mesh_n = int(a.split("=", 1)[1])
        elif a == "--quality" or a.startswith("--quality="):
            q_scale = (float(a.split("=", 1)[1]) if "=" in a else 0.25)
            q_cfgs = tuple(QUALITY_CONFIGS)
            ref_only = "--quality-ref-only" in argv
            for b in argv:
                if b.startswith("--quality-configs="):
                    q_cfgs = tuple(
                        c for c in b.split("=", 1)[1].split(",") if c
                    )
            for c in q_cfgs:
                if c not in QUALITY_CONFIGS:
                    raise SystemExit(f"unknown quality config {c!r}")
            if not ref_only:
                _require_device()
            cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
            if cache_dir:
                import jax

                jax.config.update("jax_compilation_cache_dir", cache_dir)
            return run_quality(q_scale, configs=q_cfgs, ref_only=ref_only)
    for c in configs:
        if c not in CONFIGS:
            raise SystemExit(f"unknown config {c!r}")

    # probe the backend BEFORE the (expensive) synthetic data generation so
    # a dead tunnel fails in seconds, not after minutes of host work
    _require_device()

    n_users = max(int(N_USERS * scale), 64)
    n_items = max(int(N_ITEMS * scale), 64)
    nnz = max(int(NNZ_TARGET * scale), 1024)

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    try:
        n_cached = len(os.listdir(cache_dir)) if cache_dir else 0
    except OSError:
        n_cached = 0
    print(f"# compile cache: {'WARM' if n_cached else 'COLD'} "
          f"({n_cached} entries in {cache_dir or '<none>'}) — warmup-fit "
          f"times include XLA compilation only when COLD",
          file=sys.stderr)

    rng = np.random.default_rng(1)
    t0 = time.time()
    rows, cols, vals = synth_lastfm_like(rng, n_users, n_items, nnz)
    print(f"# data: {rows.shape[0]} nnz in {time.time()-t0:.1f}s",
          file=sys.stderr)

    import jax

    if cache_dir:
        # the env var alone is not honored on every backend/version combo;
        # the config update is (measured: env-only left the cache empty)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    from poismf_tpu.sparse import build_both_orientations

    mesh = None
    if mesh_n is not None:
        from poismf_tpu.parallel.mesh import make_mesh

        if mesh_n > 0 and len(jax.devices()) < mesh_n:
            # same fallback as the driver dry-run: a virtual CPU platform
            # with mesh_n devices (validates the sharded program without a
            # multi-chip slice)
            from __graft_entry__ import _force_virtual_cpu_mesh

            _force_virtual_cpu_mesh(mesh_n)
        devices = jax.devices()
        if mesh_n > 0:
            devices = devices[:mesh_n]
        mesh = make_mesh(devices)
        print(f"# mesh: {len(devices)} device(s)", file=sys.stderr)

    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    jax.block_until_ready((by_user.vals, by_item.vals))

    verbose = bool(os.environ.get("POISMF_BENCH_VERBOSE"))
    lines = []
    for name in configs:
        res, A, B, params = run_config(
            name, by_user, by_item, n_users, n_items, mesh=mesh,
            verbose=verbose,
        )
        try:
            from poismf_tpu.ops.objective import eval_llk
            from poismf_tpu.utils.transfer import fetch_host

            ll = float(fetch_host(eval_llk(A, B, by_user)))
            spars = float(np.mean(fetch_host(A[:n_users]) == 0.0))
            res["final_ll"] = ll
            init_ll = res.get("init_ll", float("nan"))
            print(f"# [{name}] train LL: {init_ll:.6g} (init) -> {ll:.6g}"
                  f"  A-sparsity: {spars:.3f}", file=sys.stderr)
        except Exception as e:  # diagnostics must never eat the JSON lines
            print(f"# [{name}] diagnostics failed: {e}", file=sys.stderr)
        baseline = CONFIGS[name]["baseline_s"] * scale  # ~linear in nnz
        lines.append(json.dumps({
            "metric": f"{name}_fit_wall_s",
            "value": round(res["median"], 3),
            "unit": "s",
            "vs_baseline": round(baseline / res["median"], 3),
            **{k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in res.items()},
        }))
        if name == "tncg" and mesh is None:
            try:
                qps = bench_topn(A, B, n_users)
                measured = reference_topn_qps(A, B)
                # fallback: measured on the round-2 dev host (16 vCPU,
                # OpenMP topN.c, f64) when the reference tree is absent —
                # the JSON row says which case occurred
                if measured is not None:
                    ref_qps, ref_threads = measured
                    ref_src = "measured"
                else:
                    ref_qps, ref_threads = 84.0, 16
                    ref_src = "fallback"
                # normalize the comparison basis to the reference's
                # ~16-thread notebook host (BASELINE.md): the C scoring
                # loop is embarrassingly parallel over queries, so scale
                # the measured single/`ref_threads`-core qps linearly up
                # to 16 threads for the honest vs_baseline (VERDICT r3
                # weak #7: a 1-core denominator overstated the multiple)
                ref_qps_16t = ref_qps * (16.0 / ref_threads)
                print(f"# [serve] topN qps: {qps:.0f} "
                      f"(reference C: {ref_qps:.0f} @ {ref_threads}t "
                      f"-> {ref_qps_16t:.0f} @ 16t-normalized, {ref_src})",
                      file=sys.stderr, flush=True)
                lines.append(json.dumps({
                    "metric": "topn_qps",
                    "value": round(qps, 1),
                    "unit": "queries/s",
                    "vs_baseline": round(qps / ref_qps_16t, 2),
                    "baseline": ref_src,
                    "ref_qps": round(ref_qps, 1),
                    "ref_threads": ref_threads,
                    "ref_qps_16t_normalized": round(ref_qps_16t, 1),
                }))
            except Exception as e:
                print(f"# [serve] topN bench failed: {e}", file=sys.stderr)
    # flagship (tncg) last so a last-line parser picks up the headline row
    for ln in sorted(lines, key=lambda s: "tncg_fit" in s):
        print(ln)


if __name__ == "__main__":
    main()
