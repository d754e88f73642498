"""Tile-size / variant sweep for the Pallas bucket kernels (TPU).

Each measurement runs the WHOLE dependent chain inside one jitted
lax.fori_loop — one dispatch + one d2h fetch per timing, so host dispatch
latency (1-core host, ~1-3 ms per eager op over the tunnel) cannot pollute
per-call numbers.  The fetched scalar depends on every iteration, so the
transport cannot fake completion.

Usage: python scripts/kernel_sweep.py [k P Rb iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from poismf_tpu.ops import pallas_kernels as pk  # noqa: E402


def timed_loop(step, operands, a0, iters, salt):
    """step(operands, a) -> a_next, all inside one jitted fori_loop."""

    @jax.jit
    def chain(operands, a, n):
        def body(i, a):
            return step(operands, a)

        a = lax.fori_loop(0, n, body, a)
        return jnp.sum(a)

    out = float(chain(operands, a0 * np.float32(1 + salt), iters))  # compile
    assert np.isfinite(out), out
    t0 = time.time()
    out = float(chain(operands, a0, iters))
    dt = (time.time() - t0) / iters
    assert np.isfinite(out), out
    return dt


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k, P, Rb, iters = (int(x) for x in (args + [50, 64, 131072, 20])[:4])

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bg = jax.random.uniform(k1, (k, P, Rb), jnp.float32, 0.1, 1.0).astype(
        jnp.bfloat16
    )
    vals = jnp.floor(
        jax.random.uniform(k2, (P, Rb), jnp.float32, 1.0, 9.0)
    )
    a0 = jax.random.uniform(k3, (k, Rb), jnp.float32, 0.1, 1.0)
    bd = jax.random.uniform(k4, (P, Rb), jnp.float32, -0.5, 0.5)
    px = jax.random.uniform(k4, (P, Rb), jnp.float32, 0.5, 1.5)
    plane_gb = (bg.size * bg.dtype.itemsize + vals.size * 4) / 1e9
    print(f"# [k={k} P={P} Rb={Rb}] plane {plane_gb * 1e3:.0f} MB; "
          f"iters={iters}; peak 819 GB/s", flush=True)

    def mix(a, out):
        return 0.999 * a + 1e-4 * jnp.abs(out)

    # ---- bandwidth ceiling reference: plain sum over the same bytes ----
    def step_sum(ops, a):
        bg, vals = ops
        s = jnp.sum(bg.astype(jnp.float32)) + jnp.sum(vals)
        return mix(a, s[None, None])

    dt = timed_loop(step_sum, (bg, vals), a0, iters, 1e-3)
    print(f"{'xla_sum (ceiling)':>22}: {dt * 1e3:7.2f} ms  "
          f"{plane_gb / dt:6.0f} GB/s", flush=True)

    # ---- jnp (pure XLA) kernel equivalents ----
    def step_jnp_f(ops, a):
        bg, vals = ops
        pred = jnp.sum(bg.astype(jnp.float32) * a[:, None, :], axis=0)
        logt = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
        return mix(a, -jnp.sum(logt, axis=0)[None, :])

    def step_jnp_fgh(ops, a):
        bg, vals = ops
        bgf = bg.astype(jnp.float32)
        pred = jnp.sum(bgf * a[:, None, :], axis=0)
        safe = jnp.maximum(pred, 1e-30)
        w = jnp.where(vals > 0, vals / safe, 0.0)
        w2 = jnp.where(vals > 0, vals / (safe * safe), 0.0)
        logt = jnp.where(vals > 0, vals * jnp.log(safe), 0.0)
        nll = -jnp.sum(logt, axis=0)
        grad = -jnp.sum(w[None] * bgf, axis=1)
        diag = jnp.sum(w2[None] * bgf * bgf, axis=1)
        return mix(a, grad + diag + nll[None, :])

    for name, fn in [("jnp_f", step_jnp_f), ("jnp_fgh", step_jnp_fgh)]:
        try:
            dt = timed_loop(fn, (bg, vals), a0, iters, 1e-3)
            print(f"{name:>22}: {dt * 1e3:7.2f} ms  "
                  f"{plane_gb / dt:6.0f} GB/s", flush=True)
        except Exception as e:
            print(f"{name:>22}: FAILED {str(e)[:90]}", flush=True)

    # ---- pallas tile sweep ----
    def step_f(ops, a):
        bg, vals = ops
        return mix(a, pk.f_bucket(bg, vals, a)[None, :])

    def step_f_gtd(ops, a):
        bg, vals, bd = ops
        nll, gud = pk.f_gtd_bucket(bg, vals, a, bd)
        return mix(a, (nll + gud)[None, :])

    def step_f_gtd_fused(ops, a):
        bg, vals = ops
        nll, gud = pk.f_gtd_fused_bucket(bg, vals, a, a * 0.01)
        return mix(a, (nll + gud)[None, :])

    def step_f_gtd_multi(ops, a):
        bg, vals, bsum = ops
        alphas = jnp.abs(a[:4]) * jnp.asarray([[0.1], [0.2], [0.4], [0.8]])
        f, gtd = pk.f_gtd_multi_bucket(
            bg, vals, a, a * 0.01, alphas, bsum,
            w_mult=1.0, l2_reg=1e3, l2_in_f=False,
        )
        return mix(a, jnp.sum(f + gtd, axis=0)[None, :])

    def step_fg(ops, a):
        bg, vals = ops
        nll, g, px = pk.fg_bucket(bg, vals, a)
        return mix(a, g + nll[None, :] + jnp.sum(px, axis=0)[None, :] * 1e-6)

    def step_fgh(ops, a):
        bg, vals = ops
        nll, g, d, w, _ = pk.fgh_bucket(bg, vals, a)
        return mix(a, g + d)

    def step_hvp(ops, a):
        bg, w2 = ops
        return mix(a, pk.hvp_bucket(bg, w2, a))

    def step_ray(ops, a):
        px, pd, vals = ops
        alpha = jnp.abs(a[:1]) * 1e-2  # [1, Rb] per-row step
        nll, gud = pk.ray_bucket(px, pd, vals, alpha)
        return mix(a, (nll + gud)[None, :])

    for tile_r in (256, 512, 1024):
        for tile_p in (8, 16, 32, 64):
            if tile_p > P:
                continue
            pk.TILE_R, pk.TILE_P = tile_r, tile_p
            # lift the production byte budget so the sweep actually explores
            # the labeled tile (otherwise _tiles silently clamps tr and
            # different rows measure the same block)
            pk.TILE_BYTES = 1 << 30
            tp_eff, tr_eff = pk._tiles(P, Rb, k, bg.dtype.itemsize)
            if (tp_eff, tr_eff) != (tile_p, tile_r):
                print(f"tile_r={tile_r:4d} tile_p={tile_p:2d}  -> actual "
                      f"({tp_eff},{tr_eff}), skipping duplicate",
                      flush=True)
                continue
            jax.clear_caches()
            out = []
            # per-kernel HBM bytes actually moved (reads + plane writes),
            # so GB/s figures are comparable across kernels with different
            # output mixes
            slots = P * Rb
            bg_b = bg.size * bg.dtype.itemsize
            bsum_t = jnp.abs(a0) + 0.5  # [k, Rb] stand-in for the bsum block
            for name, fn, ops, gb in [
                ("f", step_f, (bg, vals), (bg_b + 4 * slots) / 1e9),
                ("f_gtd", step_f_gtd, (bg, vals, bd),
                 (bg_b + 8 * slots) / 1e9),
                ("gtdF", step_f_gtd_fused, (bg, vals),
                 (bg_b + 4 * slots) / 1e9),
                ("gtdM4", step_f_gtd_multi, (bg, vals, bsum_t),
                 (bg_b + 4 * slots) / 1e9),
                ("fg", step_fg, (bg, vals), (bg_b + 8 * slots) / 1e9),
                ("fgh", step_fgh, (bg, vals), (bg_b + 12 * slots) / 1e9),
                ("hvp", step_hvp, (bg, bd), (bg_b + 4 * slots) / 1e9),
                ("ray", step_ray, (px, bd, vals), 12 * slots / 1e9),
            ]:
                try:
                    dt = timed_loop(fn, ops, a0, iters, 1e-3)
                    out.append(f"{name} {dt * 1e3:6.2f}ms "
                               f"{gb / dt:4.0f}GB/s")
                except Exception:
                    out.append(f"{name}   OOM/ERR   ")
            print(f"tile_r={tile_r:4d} tile_p={tile_p:2d}  "
                  + "   ".join(out), flush=True)


if __name__ == "__main__":
    main()
