"""Decompose the tncg solver's wall time on the REAL bench ELL structure.

The kernel sweep (kernel_sweep.py) measures single synthetic buckets at
ideal shapes; the fit runs ~6 buckets of wildly different (P, R_b) plus
[R,k] state chains and lax.while control flow.  This probe times each
component ON the bench data's actual ELL (chained fori_loop, d2h fetch
barrier — same integrity rules as kernel_sweep) and the marginal cost of
one full outer iteration via max_outer diffs, so the gap between
accounted bytes and wall can be attributed.

Usage: python scripts/tncg_decomp.py [scale] [--planes=float32]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_lastfm_like, N_USERS, N_ITEMS, NNZ_TARGET  # noqa: E402

scale = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 0.25
plane_dtype = "float32" if "--planes=float32" in sys.argv else "bfloat16"

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
from poismf_tpu.solvers import tncg

K, L2 = 50, 1e3

by_user, by_item = build_both_orientations(rows, cols, vals, n_users, n_items)
ell_user, ell_item = ell_pair_cached(by_user, by_item)

seed = int(time.time() * 1e3) % (1 << 31)
A = initialize_factors_device(n_users, by_user.n_rows_pad, K, seed)
B = initialize_factors_device(n_items, by_item.n_rows_pad, K, seed + 1)
A_p = ell_ops.permute_rows(A, ell_user.perm)
B_p = ell_ops.permute_rows(B, ell_item.perm)

for name, ell in (("user", ell_user), ("item", ell_item)):
    slots = sum(b.n_rows * b.P for b in ell.buckets)
    print(f"# {name} ELL: {ell.n_rows} rows, buckets "
          + " ".join(f"P{b.P}x{b.n_rows}" for b in ell.buckets)
          + f"  padded={slots/1e6:.2f}M slots ({slots/max(ell.nnz,1):.2f}x)")

dt_name = plane_dtype
pit = 2 if dt_name == "bfloat16" else 4
Bsum_i = jnp.sum(A_p, axis=0)  # item side: fixed = A
planes_i = ell_ops.gather_planes(A_p, ell_item, jnp.dtype(dt_name))
jax.block_until_ready(planes_i)
# block_until_ready LIES on this transport: force a true pipeline drain with
# a dependent d2h fetch before any timed window (CLAUDE.md, lost-wakeup
# hazard — a read queued behind the plane uploads can hang for minutes)
from poismf_tpu.utils.transfer import fetch_host  # noqa: E402

fetch_host(jnp.sum(planes_i[0][0]) + jnp.sum(A_p[0]) + jnp.sum(B_p[0]))

ell = ell_item
target0 = B_p
Bsum = Bsum_i
planes = planes_i
slots = sum(b.n_rows * b.P for b in ell.buckets)
sweep_gb = slots * (K * pit + 4) / 1e9
print(f"# probing the ITEM side: sweep = {sweep_gb*1e3:.0f} MB "
      f"(planes {dt_name})")


def fetch(x):
    return float(np.asarray(jax.device_get(x)))


def timed(fn, n, label, gb_per_iter):
    """fn(ops, i, carry)->carry inside one jitted fori_loop.  Every big
    array rides as a jit OPERAND (ops pytree) — closures over planes blow
    the remote compiler's request-size limit (HTTP 413, CLAUDE.md)."""

    @jax.jit
    def chain(ops, c0, n_):
        return jnp.sum(
            lax.fori_loop(0, n_, lambda i, c: fn(ops, i, c), c0) ** 2
        )

    ops = dict(planes=planes, ell=ell, Bsum=Bsum, px0=px0, bds0=bds0,
               w2s0=w2s0, coef0=coef0)
    s = fetch(chain(ops, target0 * 1.0001, jnp.asarray(n)))  # compile+warm
    assert np.isfinite(s)
    t0 = time.time()
    s = fetch(chain(ops, target0, jnp.asarray(n)))
    dt = (time.time() - t0) / n
    assert np.isfinite(s)
    print(f"{label:>28}: {dt*1e3:8.2f} ms/iter  "
          f"({gb_per_iter/max(dt,1e-9):6.1f} GB/s of accounted bytes)",
          flush=True)
    return dt


# --- component probes on the real structure ---
def fgh_step(ops, i, x):
    f, g, w2, diag, px = ell_ops.fgh_ell(x, ops["planes"], ops["ell"],
                                         ops["Bsum"], L2, 1.0,
                                         l2_in_f=False, want_px=True)
    return jnp.maximum(x + 1e-9 * jnp.tanh(g)
                   + 1e-12 * jnp.tanh(f)[:, None], 1e-3)


def fgh_nopx_step(ops, i, x):
    f, g, w2, diag, px = ell_ops.fgh_ell(x, ops["planes"], ops["ell"],
                                         ops["Bsum"], L2, 1.0,
                                         l2_in_f=False, want_px=False)
    return jnp.maximum(x + 1e-9 * jnp.tanh(g)
                   + 1e-12 * jnp.tanh(f)[:, None], 1e-3)


_, _, w2s0, _, px0 = ell_ops.fgh_ell(target0, planes, ell, Bsum, L2, 1.0,
                                     l2_in_f=False, want_px=True)
jax.block_until_ready(px0)


def hvp_step(ops, i, x):
    hv = ell_ops.hvp_ell(x, ops["planes"], ops["ell"], ops["w2s0"], L2)
    return jnp.maximum(x + 1e-9 * jnp.tanh(hv), 1e-3)


def bdot_step(ops, i, x):
    bds = ell_ops.bdot_ell(x, ops["planes"], ops["ell"])
    return jnp.maximum(x + 1e-12 * jnp.tanh(bds[0][0, 0]), 1e-3)


bds0 = ell_ops.bdot_ell(target0, planes, ell)
jax.block_until_ready(bds0)
from poismf_tpu.ops import objective as obj

coef0 = obj.ray_coef(target0, target0, Bsum)


def ray4_step(ops, i, x):
    al = 0.1 + 0.001 * jnp.tanh(
        jnp.stack([x[:, 0], x[:, 1], x[:, 2], x[:, 3]]))
    f_c, g_c = ell_ops.f_gtd_ray_multi_ell(al.astype(x.dtype), ops["coef0"],
                                           ops["px0"], ops["bds0"],
                                           ops["ell"], L2, 1.0,
                                           l2_in_f=False)
    return jnp.maximum(
        x + 1e-12 * jnp.tanh(f_c[0])[:, None]
        + 1e-12 * jnp.tanh(g_c[0])[:, None], 1e-3)


def ray1_step(ops, i, x):
    al = 0.1 + 0.001 * jnp.tanh(x[:, :1].T)
    f_c, g_c = ell_ops.f_gtd_ray_multi_ell(al.astype(x.dtype), ops["coef0"],
                                           ops["px0"], ops["bds0"],
                                           ops["ell"], L2, 1.0,
                                           l2_in_f=False)
    return jnp.maximum(
        x + 1e-12 * jnp.tanh(f_c[0])[:, None]
        + 1e-12 * jnp.tanh(g_c[0])[:, None], 1e-3)


N = 20
t_fgh = timed(fgh_step, N, "fgh_ell (want_px)", sweep_gb)
t_fghn = timed(fgh_nopx_step, N, "fgh_ell (no px)", sweep_gb)
t_hvp = timed(hvp_step, N, "hvp_ell", sweep_gb)
t_bdot = timed(bdot_step, N, "bdot_ell", sweep_gb)
ray_gb = slots * 12 / 1e9
t_ray4 = timed(ray4_step, N, "f_gtd_ray_multi C=4", ray_gb)
t_ray1 = timed(ray1_step, N, "f_gtd_ray_multi C=1", ray_gb)

# --- whole-solver marginals: max_outer diffs on the same structure ---
from poismf_tpu.solvers.tncg import _tncg_update_ell_jit

mask = jnp.ones((target0.shape[0],), dtype=bool)


def solver_wall(max_outer, max_cg, ls_cand, n_rep=2):
    def run(x):
        out, share, st = _tncg_update_ell_jit(
            x, planes, ell, Bsum, jnp.asarray(True),
            jnp.asarray(max_outer, dtype=jnp.int32), mask,
            l2_reg=L2, w_mult=1.0, maxupd=750, l2_in_f=False,
            max_cg=max_cg, ls_cand=ls_cand,
        )
        return (out, st["passes"], st["ls_rounds"], st["hvp_rounds"],
                st["outer_iters"], st["dbg_search"], st["dbg_brack"])

    out = run(target0 * 1.0001)
    jax.block_until_ready(out[0])  # compile
    t0 = time.time()
    out = run(target0)
    s = fetch(jnp.sum(out[0] ** 2))
    dt = time.time() - t0
    assert np.isfinite(s)
    return (dt, fetch(out[1]), fetch(out[2]), fetch(out[3]), fetch(out[4]),
            np.asarray(jax.device_get(out[5])),
            np.asarray(jax.device_get(out[6])))


for mo in (1, 3, 5):
    dt, passes, ls, hvps, its, dbg_s, dbg_b = solver_wall(mo, 3, 4)
    print(f"   solver max_outer={mo}: {dt:6.2f} s  passes={passes:6.1f} "
          f"ls_rounds={ls:.0f} hvp={hvps:.0f} outer={its:.0f} "
          f"-> {passes*sweep_gb/dt:6.1f} GB/s accounted", flush=True)
    print(f"      last-outer LS tail: searching={dbg_s.tolist()}",
          flush=True)
    print(f"                bracketed={dbg_b.tolist()}", flush=True)
for lsc in (1, 2):
    dt, passes, ls, hvps, its, _, _ = solver_wall(3, 3, lsc)
    print(f"   solver ls_cand={lsc} mo=3: {dt:6.2f} s  passes={passes:6.1f} "
          f"ls_rounds={ls:.0f} hvp={hvps:.0f} outer={its:.0f}", flush=True)
