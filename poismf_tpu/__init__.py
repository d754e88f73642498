"""poismf_tpu - TPU-native non-Bayesian Poisson matrix factorization.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
david-cortes/poismf: factorizes sparse counts matrices ``X ~ Poisson(A @ B^T)``
with L1/L2 regularization by alternating batched per-row optimization
(truncated-Newton CG / non-negative CG / proximal gradient), plus the full
recommender serving surface (predict, out-of-sample factors, top-N ranking).

Where the reference parallelizes with OpenMP threads over rows of a
shared-memory CSR (one row at a time, one nonzero at a time), this package
solves ALL rows simultaneously as fused tensor programs over the flat nonzero
stream, sharded across TPU devices with ``jax.sharding`` when a mesh is given.
"""

__version__ = "0.1.0"

from .sparse import CountsMatrix, build_counts, build_both_orientations, ingest
from .ops.objective import eval_llk, poisson_fg, poisson_f
from .train import FitParams, run_poismf, initialize_factors
from .models import PoisMF
