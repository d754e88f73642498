"""Isolate per-pallas_call fixed overhead on this backend.

Times (a) one TINY ray kernel call chained in a fori_loop, (b) the same
math in jnp, (c) the real-structure multi-bucket ray round with
POISMF_PALLAS on vs off.  Usage: python scripts/pallas_overhead.py [scale]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from poismf_tpu.ops import pallas_kernels as pk


def fetch(x):
    return float(np.asarray(jax.device_get(x)))


def timed(step, ops, c0, n, label):
    @jax.jit
    def chain(ops, c, n_):
        return jnp.sum(lax.fori_loop(0, n_, lambda i, a: step(ops, i, a),
                                     c) ** 2)

    s = fetch(chain(ops, c0 * 1.0001, jnp.asarray(n)))
    assert np.isfinite(s), label
    t0 = time.time()
    s = fetch(chain(ops, c0, jnp.asarray(n)))
    dt = (time.time() - t0) / n
    assert np.isfinite(s), label
    print(f"{label:>40}: {dt*1e6:9.1f} us/iter", flush=True)
    return dt


key = jax.random.PRNGKey(int(time.time()))
k1, k2, k3 = jax.random.split(key, 3)

# (a/b) tiny single bucket: P=32, Rb=256 (one grid step)
P, Rb, C = 32, 256, 4
px = jax.random.uniform(k1, (P, Rb), jnp.float32, 0.5, 1.5)
pd = jax.random.uniform(k2, (P, Rb), jnp.float32, -0.1, 0.1)
vals = jnp.floor(jax.random.uniform(k3, (P, Rb), jnp.float32, 1.0, 5.0))
a0 = jnp.full((C, Rb), 0.01, jnp.float32)


def tiny_pallas(ops, i, a):
    nll, gud = pk.raygtd_multi_bucket(ops["px"], ops["pd"], ops["vals"], a)
    return jnp.maximum(a + 1e-9 * jnp.tanh(nll + gud), 1e-3)


def tiny_jnp(ops, i, a):
    pred = ops["px"][None] + a[:, None, :] * ops["pd"][None]
    valid = (ops["vals"] > 0)[None]
    logt = jnp.where(valid, ops["vals"][None] * jnp.log(pred), 0.0)
    nll = -jnp.sum(logt, axis=1)
    ratio = jnp.where(valid, ops["vals"][None] * ops["pd"][None]
                      / jnp.maximum(pred, 1e-30), 0.0)
    gud = jnp.sum(ratio, axis=1)
    return jnp.maximum(a + 1e-9 * jnp.tanh(nll + gud), 1e-3)


ops = dict(px=px, pd=pd, vals=vals)
timed(tiny_pallas, ops, a0, 50, "tiny ray bucket, pallas")
timed(tiny_jnp, ops, a0, 50, "tiny ray bucket, jnp")

# one LARGE single bucket (overhead amortized)
P2, R2 = 64, 131072
pxL = jax.random.uniform(k1, (P2, R2), jnp.float32, 0.5, 1.5)
pdL = jax.random.uniform(k2, (P2, R2), jnp.float32, -0.1, 0.1)
valsL = jnp.floor(jax.random.uniform(k3, (P2, R2), jnp.float32, 1.0, 5.0))
a0L = jnp.full((C, R2), 0.01, jnp.float32)
opsL = dict(px=pxL, pd=pdL, vals=valsL)
gb = 3 * P2 * R2 * 4 / 1e9
dt = timed(tiny_pallas, opsL, a0L, 30, "large ray bucket, pallas")
print(f"{'':>42}  -> {gb/dt:.0f} GB/s", flush=True)
dt = timed(tiny_jnp, opsL, a0L, 30, "large ray bucket, jnp")
print(f"{'':>42}  -> {gb/dt:.0f} GB/s", flush=True)

# (c) 7 tiny pallas calls in one iteration (bucket-count scaling)
def seven_pallas(ops, i, a):
    out = a
    for _ in range(7):
        nll, gud = pk.raygtd_multi_bucket(ops["px"], ops["pd"],
                                          ops["vals"], out)
        out = jnp.maximum(out + 1e-9 * jnp.tanh(nll + gud), 1e-3)
    return out


timed(seven_pallas, ops, a0, 30, "7 chained tiny ray buckets, pallas")


def seven_jnp(ops, i, a):
    out = a
    for _ in range(7):
        out = tiny_jnp(ops, i, out)
    return out


timed(seven_jnp, ops, a0, 30, "7 chained tiny ray buckets, jnp")
