"""Profiling / observability helpers.

The reference's only tracing is the TNC message bitmask and out-param
counters (SURVEY.md section 5), always disabled by poismf.  The TPU-native
equivalents: XLA profiler traces (viewable in TensorBoard/XProf or Perfetto)
and per-epoch host callbacks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace of the enclosed block::

        with profiling.trace("/tmp/poismf_trace"):
            model.fit(df)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def epoch_logger(
    by_user=None,
    every: int = 1,
    printer: Callable[[str], None] = print,
) -> Callable:
    """A ``callback`` for :func:`poismf_tpu.train.run_poismf` that reports
    per-epoch wall time (and training Poisson LL when ``by_user`` is given —
    note the LL evaluation itself costs one pass over the nonzeros)."""
    state = {"t": time.time()}

    def cb(epoch, A, B):
        import jax

        jax.block_until_ready((A, B))
        now = time.time()
        msg = f"[poismf] epoch {epoch}: {now - state['t']:.2f}s"
        if by_user is not None and epoch % every == 0:
            from ..ops.objective import eval_llk

            msg += f"  train_llk={float(eval_llk(A, B, by_user)):.6g}"
        state["t"] = time.time()
        printer(msg)

    return cb
