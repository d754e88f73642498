"""Test configuration: run everything on a virtual 8-device CPU mesh so the
pjit/shard_map paths are exercised without TPU hardware (SURVEY.md section 4d).

Must set the flags BEFORE jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may pre-register a hardware backend (e.g. the axon TPU
# plugin) via sitecustomize before conftest runs; force the CPU platform at
# the config level too so tests always see the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(seed=1)


def synth_counts(rng, n_users=100, n_items=40, density=0.1):
    """Small synthetic counts matrix in triplet form (like the reference's
    R-example synthetic data, R/poismf.R:172-218)."""
    nnz = int(n_users * n_items * density)
    rows = rng.integers(0, n_users, size=nnz)
    cols = rng.integers(0, n_items, size=nnz)
    # dedupe
    key = rows.astype(np.int64) * n_items + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = rng.poisson(3.0, size=rows.shape[0]) + 1.0
    return rows.astype(np.int32), cols.astype(np.int32), vals.astype(np.float64)


@pytest.fixture
def small_problem(rng):
    return synth_counts(rng)


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not explicitly @pytest.mark.slow gets the
    ``quick`` marker, so ``-m quick`` runs the fast tier (< ~3 min — drops
    the golden-parity fits against the compiled reference C and the
    quality-harness fits, which dominate the ~30 min full-suite wall on
    this 1-core host) and the default invocation still runs everything."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
