"""Microbenchmark: plane-gather strategies at bench scale.

The per-half-update ``gather_planes`` (ops/ell.py:462) materializes
bg[k, P, R] planes from the fixed factor matrix.  The current lowering is
take(M, cols, axis=0) -> [R, P, k] then transpose to [k, P, R]; this probes
whether gathering from a pre-transposed source M_T [k, n] (take along
axis=1, no big transpose) or other orderings are faster on the real chip.

Timing discipline (docs/DESIGN.md, Benchmark model): every variant is
chained through a data dependency and the timed window ends with a d2h
fetch of a scalar depending on the result — block_until_ready is not a
reliable barrier on the tunneled transport, which also memoizes identical
executions (hence the clock-derived perturbation of M between reps).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from poismf_tpu.ops import ell as ell_ops
    from poismf_tpu.sparse import build_both_orientations
    from bench import synth_lastfm_like, N_USERS, N_ITEMS, NNZ_TARGET

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    rng = np.random.default_rng(0)
    n_users = max(64, int(N_USERS * scale))
    n_items = max(64, int(N_ITEMS * scale))
    rows, cols, vals = synth_lastfm_like(
        rng, n_users, n_items, max(1000, int(NNZ_TARGET * scale))
    )
    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=np.float32
    )
    ell_user, ell_item = ell_ops.ell_pair_from_counts(by_user, by_item)
    k = 50
    M = jnp.asarray(
        0.3 + rng.uniform(0, 0.01, size=(by_item.n_rows_pad, k)),
        dtype=jnp.float32,
    )
    jax.block_until_ready(M)
    out_bytes = sum(b.n_rows * b.P * k * 2 for b in ell_user.buckets)
    print(f"# plane bytes (bf16): {out_bytes/1e9:.2f} GB", file=sys.stderr)

    @jax.jit
    def current(M):
        return ell_ops.gather_planes(M, ell_user, "bfloat16")

    @jax.jit
    def from_t(M):
        Mt = M.T  # [k, n]
        planes = []
        for b in ell_user.buckets:
            bg = jnp.take(Mt, b.cols, axis=1)  # [k, P, R] directly
            planes.append(bg.astype(jnp.bfloat16))
        return tuple(planes)

    @jax.jit
    def cast_first(M):
        Mb = M.astype(jnp.bfloat16)
        planes = []
        for b in ell_user.buckets:
            bg = jnp.take(Mb, b.cols, axis=0)
            planes.append(jnp.transpose(bg, (2, 1, 0)))
        return tuple(planes)

    @jax.jit
    def cast_first_t(M):
        Mt = M.astype(jnp.bfloat16).T
        planes = []
        for b in ell_user.buckets:
            planes.append(jnp.take(Mt, b.cols, axis=1))
        return tuple(planes)

    fps = jax.jit(lambda ps: sum(jnp.sum(p.astype(jnp.float32)) for p in ps))

    for name, fn in [("current(take+T)", current), ("take-from-MT", from_t),
                     ("bf16-then-take", cast_first),
                     ("bf16-then-take-MT", cast_first_t)]:
        # compile + warm
        f0 = float(fps(fn(M)))
        reps = 5
        t0 = time.time()
        Mx = M + np.float32(time.time() % 1.0) * 1e-6  # defeat memoization
        acc = 0.0
        for _ in range(reps):
            ps = fn(Mx)
            acc += float(fps(ps))  # d2h barrier each rep
            Mx = Mx + ps[0][0, 0, :1].astype(Mx.dtype).sum() * 0.0 + 1e-7
        dt = (time.time() - t0) / reps
        print(f"{name:>20}: {dt*1e3:7.1f} ms  "
              f"{out_bytes/dt/1e9:6.1f} GB/s-out  (chk {f0:.3e})")


if __name__ == "__main__":
    main()
