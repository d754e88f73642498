"""End-to-end tests of the PoisMF class API (parity with the reference's
Python surface, poismf/__init__.py), following the shape of the reference's
R documented examples (R/poismf.R:172-218) which are its de-facto tests."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from poismf_tpu import PoisMF
from tests.conftest import synth_counts


def make_df(rng, n_users=80, n_items=30):
    rows, cols, vals = synth_counts(rng, n_users, n_items, density=0.25)
    return pd.DataFrame({
        "UserId": np.array([f"u{r}" for r in rows]),
        "ItemId": np.array([f"i{c}" for c in cols]),
        "Count": vals,
    })


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(1)
    df = make_df(rng)
    model = PoisMF(k=6, method="tncg", l2_reg=1.0, niter=5, maxupd=100,
                   reuse_prev=True, random_state=1)
    model.fit(df)
    return model, df


def test_fit_dataframe_reindex(fitted):
    model, df = fitted
    assert model.is_fitted
    assert model.nusers == df["UserId"].nunique()
    assert model.nitems == df["ItemId"].nunique()
    assert model.A.shape == (model.nusers, 6)
    assert model.B.shape == (model.nitems, 6)
    assert model.A.min() >= 0
    assert len(model.user_mapping_) == model.nusers


def test_predict_by_id(fitted):
    model, df = fitted
    u = df["UserId"].iloc[0]
    i = df["ItemId"].iloc[0]
    p = model.predict(u, i)
    assert np.isfinite(p) and p >= 0
    # unknown ids give NaN
    assert np.isnan(model.predict("nonexistent-user", i))
    # vectorized
    preds = model.predict(df["UserId"].iloc[:5].to_numpy(),
                          df["ItemId"].iloc[:5].to_numpy())
    assert preds.shape == (5,)
    assert np.all(np.isfinite(preds))
    mixed = model.predict(
        np.array([u, "zzz-not-a-user"], dtype=object),
        np.array([i, i], dtype=object),
    )
    assert np.isfinite(mixed[0]) and np.isnan(mixed[1])


def test_topn_by_id(fitted):
    model, df = fitted
    u = df["UserId"].iloc[3]
    top = model.topN(u, n=5)
    assert len(top) == 5
    assert set(top) <= set(model.item_mapping_.tolist())
    top2, scores = model.topN(u, n=5, output_score=True)
    np.testing.assert_array_equal(top, top2)
    assert np.all(np.diff(scores) <= 1e-6)  # descending
    # exclude the top item -> it disappears
    top3 = model.topN(u, n=5, exclude=[top[0]])
    assert top[0] not in top3
    # include only 3 items
    incl = model.item_mapping_[:3]
    top4 = model.topN(u, n=3, include=incl)
    assert set(top4) <= set(incl.tolist())
    with pytest.raises(ValueError):
        model.topN("nope-user", n=5)


def test_topn_new_and_predict_factors(fitted):
    model, df = fitted
    sub = df[df["UserId"] == df["UserId"].iloc[0]][["ItemId", "Count"]]
    a = model.predict_factors(sub)
    assert a.shape == (6,)
    assert a.min() >= 0 and a.max() > 0
    top = model.topN_new(sub, n=5)
    assert len(top) == 5
    # tuple input path
    a2 = model.predict_factors(
        (sub["ItemId"].to_numpy(), sub["Count"].to_numpy())
    )
    np.testing.assert_allclose(a, a2, rtol=1e-4, atol=1e-6)


def test_transform_dataframe(fitted):
    model, df = fitted
    new_df = df.iloc[:40].copy()
    new_df["UserId"] = "new_" + new_df["UserId"].astype(str)
    A_new, mapping = model.transform(new_df)
    assert A_new.shape == (new_df["UserId"].nunique(), 6)
    assert not np.any(np.isnan(A_new))
    assert len(mapping) == A_new.shape[0]


def test_fit_coo_no_reindex():
    rng = np.random.default_rng(3)
    rows, cols, vals = synth_counts(rng, 50, 20, density=0.3)
    X = sp.coo_array((vals, (rows, cols)), shape=(50, 20))
    model = PoisMF(k=5, method="cg", l2_reg=1.0, niter=4, maxupd=5)
    model.fit(X)
    assert model.reindex is False
    assert model.nusers == 50 and model.nitems == 20
    p = model.predict(int(rows[0]), int(cols[0]))
    assert np.isfinite(p)
    top = model.topN(int(rows[0]), n=4)
    assert np.issubdtype(np.asarray(top).dtype, np.integer)
    # transform with CSR input
    csr = sp.csr_array((vals, (rows, cols)), shape=(50, 20))[:6]
    A_new = model.transform(csr)
    assert A_new.shape == (6, 5)


def test_fit_unsafe_warm_start():
    rng = np.random.default_rng(4)
    rows, cols, vals = synth_counts(rng, 40, 15, density=0.3)
    csr = sp.csr_array((vals.astype(np.float32), (rows, cols)),
                       shape=(40, 15))
    csc = csr.tocsc()
    A0 = np.asarray(0.3 + rng.uniform(0, 0.01, size=(40, 5)), np.float32)
    B0 = np.asarray(0.3 + rng.uniform(0, 0.01, size=(15, 5)), np.float32)
    model = PoisMF(k=5, method="pg", l2_reg=1.0, niter=3, maxupd=5,
                   initial_step=1e-3)
    model.fit_unsafe(A0, B0, csr, csc)
    assert model.is_fitted
    assert model.A.shape == (40, 5)


def test_produce_dicts():
    rng = np.random.default_rng(5)
    df = make_df(rng, 30, 12)
    model = PoisMF(k=4, method="cg", l2_reg=1.0, niter=3, maxupd=5,
                   produce_dicts=True)
    model.fit(df)
    assert len(model.user_dict_) == model.nusers
    u = df["UserId"].iloc[0]
    assert model.user_dict_[u] >= 0


def test_eval_llk_method(fitted):
    model, df = fitted
    ll = model.eval_llk()
    assert np.isfinite(ll)
    ll_triplets = model.eval_llk(
        (df["UserId"].to_numpy(), df["ItemId"].to_numpy(),
         df["Count"].to_numpy())
    )
    assert np.isfinite(ll_triplets)


def test_checkpoint_roundtrip(fitted, tmp_path):
    model, df = fitted
    path = str(tmp_path / "model.npz")
    model.save(path)
    loaded = PoisMF.load(path)
    assert loaded.is_fitted
    np.testing.assert_allclose(loaded.A, model.A)
    np.testing.assert_allclose(loaded.B, model.B)
    u, i = df["UserId"].iloc[0], df["ItemId"].iloc[0]
    assert np.isclose(loaded.predict(u, i), model.predict(u, i), rtol=1e-5)
    np.testing.assert_array_equal(loaded.topN(u, n=5), model.topN(u, n=5))
    # out-of-sample serving works from a restored checkpoint
    sub = df[df["UserId"] == u][["ItemId", "Count"]]
    a = loaded.predict_factors(sub)
    assert a.shape == (model.k,)


def test_repr(fitted):
    model, _ = fitted
    assert "fitted" in repr(model)


def test_float64_fit_subprocess():
    """use_float=False enables x64 globally; run in a subprocess to keep
    this process's f32 default intact."""
    import os, subprocess, sys, textwrap

    code = textwrap.dedent("""
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import numpy as np, pandas as pd
        from poismf_tpu import PoisMF
        rng = np.random.default_rng(1)
        df = pd.DataFrame({
            "UserId": rng.integers(0, 60, 800),
            "ItemId": rng.integers(0, 30, 800),
            "Count": rng.poisson(3, 800) + 1.0,
        })
        m = PoisMF(k=5, method="tncg", niter=2, maxupd=50, use_float=False)
        m.fit(df)
        assert m.A.dtype == np.float64, m.A.dtype
        ll = m.eval_llk()
        assert np.isfinite(ll)
        print("F64-OK", ll)
    """)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert "F64-OK" in out.stdout, out.stdout + out.stderr
