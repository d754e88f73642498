"""Decompose the pg fit's per-epoch cost on the real bench structure.

Times, with chained fori_loops and d2h fetch barriers (two different
iteration counts so the per-dispatch fixed cost cancels out of the
marginal): the fixed-side plane gather, one fused pg epoch, and a fully
fused multi-epoch program.  Usage: python scripts/pg_decomp.py [scale]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_lastfm_like, N_USERS, N_ITEMS, NNZ_TARGET  # noqa: E402

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
n_users, n_items = int(N_USERS * scale), int(N_ITEMS * scale)
nnz = int(NNZ_TARGET * scale)
rng = np.random.default_rng(int(time.time()))
rows, cols, vals = synth_lastfm_like(rng, n_users, n_items, nnz)

import jax
import jax.numpy as jnp
from jax import lax

from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.train import initialize_factors_device, ell_pair_cached
from poismf_tpu.ops import ell as ell_ops
from poismf_tpu.solvers.pg import _pg_epoch_core

K, L2, STEP, MAXUPD = 10, 1e9, 1e-7, 1

by_user, by_item = build_both_orientations(rows, cols, vals, n_users, n_items)
ell_user, ell_item = ell_pair_cached(by_user, by_item)
seed = int(time.time() * 1e3) % (1 << 31)
A_p = ell_ops.permute_rows(
    initialize_factors_device(n_users, by_user.n_rows_pad, K, seed),
    ell_user.perm)
B_p = ell_ops.permute_rows(
    initialize_factors_device(n_items, by_item.n_rows_pad, K, seed + 1),
    ell_item.perm)
jax.block_until_ready((A_p, B_p))

slots_u = sum(b.n_rows * b.P for b in ell_user.buckets)
slots_i = sum(b.n_rows * b.P for b in ell_item.buckets)
print(f"# k={K} slots: user {slots_u/1e6:.2f}M item {slots_i/1e6:.2f}M",
      flush=True)


def fetch(x):
    return float(np.asarray(jax.device_get(x)))


def marginal(step_fn, ops, c0, n_lo, n_hi, label, gb=None):
    @jax.jit
    def chain(ops, c, n_):
        return jnp.sum(
            lax.fori_loop(0, n_, lambda i, c: step_fn(ops, i, c), c) ** 2
        )

    fetch(chain(ops, c0 * 1.0001, jnp.asarray(n_lo)))  # compile+warm
    t0 = time.time(); fetch(chain(ops, c0, jnp.asarray(n_lo)))
    t_lo = time.time() - t0
    t0 = time.time(); fetch(chain(ops, c0 * 1.0002, jnp.asarray(n_hi)))
    t_hi = time.time() - t0
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    extra = f"  ({gb/max(dt,1e-9):6.1f} GB/s)" if gb else ""
    print(f"{label:>28}: {dt*1e3:8.2f} ms marginal "
          f"(lo {t_lo:.2f}s hi {t_hi:.2f}s){extra}", flush=True)
    return dt


ops = dict(ell_user=ell_user, ell_item=ell_item)

# gather alone (item side: gathers A rows)
def gather_step(ops, i, a):
    planes = ell_ops.gather_planes(a, ops["ell_item"], "bfloat16")
    return a + 1e-12 * planes[0][0, 0, 0].astype(a.dtype)


gather_gb = (ell_item.nnz * K * 4 + slots_i * K * 2) / 1e9
marginal(gather_step, ops, A_p, 4, 16, "gather_planes(item)", gather_gb)

# one fused epoch (2 gathers + 2 maxupd-sweeps + colsums)
def epoch_step(ops, i, ab):
    A_, B_ = ab[:, :K], ab[:, K:]
    # keep shapes static: stack A/B side by side in the carry
    A2, B2 = _pg_epoch_core(
        A_, B_[: ops["ell_item"].n_rows_ell],
        ops["ell_user"], ops["ell_item"],
        jnp.asarray(L2, jnp.float32), jnp.asarray(STEP, jnp.float32),
        jnp.asarray(0.0, jnp.float32), MAXUPD, 1.0, "bfloat16",
    )
    out = ab.at[:, :K].set(A2)
    return out.at[: B2.shape[0], K:].set(B2)


nu, ni = ell_user.n_rows_ell, ell_item.n_rows_ell
carry = jnp.zeros((max(nu, ni), 2 * K), jnp.float32)
carry = carry.at[:nu, :K].set(A_p[:nu]).at[:ni, K:].set(B_p[:ni])
sweep_gb = (slots_u + slots_i) * (K * 2 + 4) / 1e9
epoch_gb = 2 * gather_gb + MAXUPD * sweep_gb
marginal(epoch_step, ops, carry, 2, 12, "pg epoch (fused halves)",
         epoch_gb)
