"""Microbenchmark of the Pallas bucket kernels on the real TPU.

Measures per-call wall time of f / f_gtd / fg / fgh / hvp / pg on a
realistic full-scale bucket shape, chaining the iterate input between calls
so the tunnel's execution memoization cannot fake the numbers (each call
sees a different a_t).  Reports effective GB/s of plane traffic per kernel.

Usage:  python scripts/kernel_bench.py [k P Rb iters] [--dtype=bfloat16]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from poismf_tpu.ops import pallas_kernels as pk  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k, P, Rb, iters = (int(x) for x in (args + [50, 64, 131072, 20])[:4])
    dtype = "float32"
    for a in sys.argv[1:]:
        if a.startswith("--dtype="):
            dtype = a.split("=", 1)[1]

    rng = np.random.default_rng(0)
    bg = jnp.asarray(
        rng.uniform(0.1, 1.0, (k, P, Rb)).astype(np.float32)
    ).astype(dtype)
    vals = jnp.asarray(
        (rng.poisson(3.0, (P, Rb)) + 1.0).astype(np.float32)
    )
    a0 = jnp.asarray(rng.uniform(0.1, 1.0, (k, Rb)).astype(np.float32))
    bd = jnp.asarray(rng.uniform(-0.5, 0.5, (P, Rb)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(0.0, 2.0, (P, Rb)).astype(np.float32))

    plane_gb = (bg.size * bg.dtype.itemsize + vals.size * 4) / 1e9
    print(f"# bucket [k={k}, P={P}, Rb={Rb}] {dtype}: plane = "
          f"{plane_gb * 1e3:.1f} MB", flush=True)

    # each variant chains the iterate with a perturbation LARGE enough to
    # change f32 bits (1e-12 deltas round away -> identical inputs -> the
    # tunnel memoizes and reports impossible GB/s)
    def mix(a, out):
        return 0.999 * a + 1e-4 * jnp.abs(out)

    def chain_f(a):
        return mix(a, pk.f_bucket(bg, vals, a)[None, :])

    def chain_f_gtd(a):
        nll, gud = pk.f_gtd_bucket(bg, vals, a, bd)
        return mix(a, (nll + gud)[None, :])

    def chain_fg(a):
        nll, g, _ = pk.fg_bucket(bg, vals, a)
        return mix(a, g)

    def chain_fgh(a):
        nll, g, d, w, _ = pk.fgh_bucket(bg, vals, a)
        return mix(a, g + d)

    def chain_hvp(a):
        return mix(a, pk.hvp_bucket(bg, w2, a))

    def chain_pg(a):
        return mix(a, pk.pg_bucket(bg, vals, a))

    # per-kernel HBM bytes (reads + plane writes), so GB/s is comparable
    # across kernels with different output mixes
    slots = P * Rb
    bg_b = bg.size * bg.dtype.itemsize
    kernel_gb = {
        "f": (bg_b + 4 * slots) / 1e9,
        "f_gtd": (bg_b + 8 * slots) / 1e9,          # + bd read
        "fg": (bg_b + 8 * slots) / 1e9,             # + pred write
        "fgh": (bg_b + 12 * slots) / 1e9,           # + w2, pred writes
        "hvp": (bg_b + 4 * slots) / 1e9,            # w2 read (no vals)
        "pg": (bg_b + 4 * slots) / 1e9,
    }
    for name, fn in [("f", chain_f), ("f_gtd", chain_f_gtd),
                     ("fg", chain_fg), ("fgh", chain_fgh),
                     ("hvp", chain_hvp), ("pg", chain_pg)]:
        a = fn(a0)  # compile
        # d2h fetch, NOT block_until_ready: the tunnel's block can resolve
        # without the compute having run (see bench.py docstring)
        float(jnp.sum(a))
        a = a0 * np.float32(1.0 + 1e-3)  # never repeat the warmup's inputs
        t0 = time.time()
        for _ in range(iters):
            a = fn(a)
        float(jnp.sum(a))  # true barrier on the whole dependent chain
        dt = (time.time() - t0) / iters
        print(f"{name:>6}: {dt * 1e3:8.2f} ms/call   "
              f"{kernel_gb[name] / dt:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
