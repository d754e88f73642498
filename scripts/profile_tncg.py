"""Diagnostics: outer-iteration counts and per-pass costs of tncg_update."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_lastfm_like, N_USERS, N_ITEMS, NNZ_TARGET, K, L2, MAXUPD

scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
n_users = int(N_USERS * scale)
n_items = int(N_ITEMS * scale)
nnz = int(NNZ_TARGET * scale)

rng = np.random.default_rng(1)
rows, cols, vals = synth_lastfm_like(rng, n_users, n_items, nnz)

import jax
import jax.numpy as jnp
from poismf_tpu.sparse import build_both_orientations
from poismf_tpu.train import initialize_factors
from poismf_tpu.ops import objective as obj
from poismf_tpu.solvers import tncg

by_user, by_item = build_both_orientations(rows, cols, vals, n_users, n_items)
nprng = np.random.default_rng(1)
A = initialize_factors(n_users, by_user.n_rows_pad, K, nprng, np.float32)
B = initialize_factors(n_items, by_item.n_rows_pad, K, nprng, np.float32)

Bsum = obj.make_bsum(B, n_items, 0.0)

# patch tncg_update to also return iteration stats
src = tncg.tncg_update.__wrapped__ if hasattr(tncg.tncg_update, "__wrapped__") else None

# simplest: time one full update and separately one fg pass
t0 = time.time()
out, share = tncg.tncg_update(A, B, by_user, Bsum, l2_reg=L2, maxupd=MAXUPD,
                              reuse_prev=True)
jax.block_until_ready(out)
print(f"tncg A-update (compile+run): {time.time()-t0:.2f}s")
t0 = time.time()
out, share = tncg.tncg_update(A, B, by_user, Bsum, l2_reg=L2, maxupd=MAXUPD,
                              reuse_prev=True)
jax.block_until_ready(out)
print(f"tncg A-update (cached):      {time.time()-t0:.2f}s")

# cost of one fused f+g pass
fg = jax.jit(lambda A_: obj.poisson_fg(A_, B, by_user, Bsum, L2))
f, g, _ = fg(A); jax.block_until_ready(g)
t0 = time.time()
for _ in range(10):
    f, g, _ = fg(A)
jax.block_until_ready(g)
print(f"one poisson_fg pass:         {(time.time()-t0)/10*1000:.2f}ms")

# HVP pass cost
w2 = obj.poisson_hvp_weights(A, B, by_user)
hvp = jax.jit(lambda V: obj.poisson_hvp(V, B, by_user, w2, L2))
V = jnp.ones_like(A)
h = hvp(V); jax.block_until_ready(h)
t0 = time.time()
for _ in range(10):
    h = hvp(V)
jax.block_until_ready(h)
print(f"one poisson_hvp pass:        {(time.time()-t0)/10*1000:.2f}ms")

# f-only pass cost (line search)
f_only = jax.jit(lambda A_: obj.poisson_f(A_, B, by_user, Bsum, L2))
f = f_only(A); jax.block_until_ready(f)
t0 = time.time()
for _ in range(10):
    f = f_only(A)
jax.block_until_ready(f)
print(f"one poisson_f pass:          {(time.time()-t0)/10*1000:.2f}ms")
