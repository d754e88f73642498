"""Packaging / install-layout checks (reference: setup.py:29-212's build
probing; here the equivalents are pyproject metadata + the lazy native
build with overridable toolchain knobs).

The environment has no network and no throwaway venv, so instead of a real
``pip install`` the tests verify the two things an install depends on:
the package imports and works from an installed-style site-packages copy
(no repo cwd on the path), and the native build honors the documented
flag overrides / falls back when the tuned flags are rejected.
"""

import os
import shutil
import subprocess
import sys
import tomllib

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_metadata_matches_layout():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "poismf-tpu"
    assert proj["version"]
    assert any(d.startswith("jax") for d in proj["dependencies"])
    assert any(d.startswith("numpy") for d in proj["dependencies"])
    # the native source ships as package data (it is compiled lazily at
    # first use, native/host.py); without it an installed wheel would
    # silently lose the native fast path
    pkg_data = meta["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkg_data["poismf_tpu.native"]
    assert os.path.exists(
        os.path.join(REPO, "poismf_tpu", "native", "host.cpp")
    )


def test_installed_style_import_and_fit(tmp_path):
    """Copy the package into a site-packages-style dir and drive the public
    API from a subprocess whose cwd is NOT the repo — what `pip install`
    followed by `import poismf_tpu` must support."""
    site = tmp_path / "site-packages"
    site.mkdir()
    shutil.copytree(
        os.path.join(REPO, "poismf_tpu"), site / "poismf_tpu",
        ignore=shutil.ignore_patterns("__pycache__", "*.so"),
    )
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "import poismf_tpu, os\n"
        "assert os.path.realpath(poismf_tpu.__file__).startswith("
        f"{str(site)!r})\n"
        "from poismf_tpu import PoisMF\n"
        "rng = np.random.default_rng(0)\n"
        "rows = rng.integers(0, 40, 300); cols = rng.integers(0, 25, 300)\n"
        "vals = (rng.poisson(2.0, 300) + 1.0).astype(np.float64)\n"
        "m = PoisMF(k=4, method='pg', niter=2)"
        ".fit((rows, cols, vals, (40, 25)))\n"
        "print('TOPN', m.topN(rows[0], n=3).shape[0])\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(site)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", script], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TOPN 3" in out.stdout


@pytest.mark.parametrize("cflags", ["-O2", "-O3 -not-a-real-flag"])
def test_native_build_honors_flag_overrides(tmp_path, cflags):
    """POISMF_HOST_CFLAGS replaces the tuned flags; a rejected flag set
    falls back to a plain -O3 build instead of losing the native path."""
    from poismf_tpu.native import host as host_mod

    workdir = tmp_path / "native"
    workdir.mkdir()
    shutil.copy(host_mod._SRC, workdir / "host.cpp")
    saved = (host_mod._SRC, host_mod._LIB, host_mod._lib, host_mod._tried)
    try:
        host_mod._SRC = str(workdir / "host.cpp")
        host_mod._LIB = str(workdir / "libpoismf_host.so")
        host_mod._lib, host_mod._tried = None, False
        os.environ["POISMF_HOST_CFLAGS"] = cflags
        rng = np.random.default_rng(1)
        rows = rng.integers(0, 20, 100).astype(np.int32)
        cols = rng.integers(0, 10, 100).astype(np.int32)
        vals = rng.random(100).astype(np.float32)
        res = host_mod.sort_by_row(rows, cols, vals, 20)
        assert res is not None, "native build failed under flag override"
        r_out = res[0]
        assert np.all(np.diff(r_out) >= 0)
    finally:
        os.environ.pop("POISMF_HOST_CFLAGS", None)
        (host_mod._SRC, host_mod._LIB, host_mod._lib,
         host_mod._tried) = saved
