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
    # the produced dicts drive the remap fast path (the reference's O(1)
    # lookup, poismf/__init__.py:497-500) and must agree with the
    # pd.Index path used when no dicts were built — incl. unknown -> -1
    model_nd = PoisMF(k=4, method="cg", l2_reg=1.0, niter=3, maxupd=5,
                      produce_dicts=False)
    model_nd.fit(df)
    assert not model_nd.user_dict_
    queries = np.concatenate([df["UserId"].unique()[:5],
                              np.array(["nope"], dtype=object)])
    np.testing.assert_array_equal(model._map_users(queries),
                                  model_nd._map_users(queries))
    iq = np.concatenate([df["ItemId"].unique()[:5],
                         np.array(["nope"], dtype=object)])
    np.testing.assert_array_equal(model._map_items(iq),
                                  model_nd._map_items(iq))
    assert model._map_users(queries)[-1] == -1
    # end-to-end: predict/topN agree across the two remap paths
    np.testing.assert_allclose(
        model.predict(df["UserId"].iloc[:4], df["ItemId"].iloc[:4]),
        model_nd.predict(df["UserId"].iloc[:4], df["ItemId"].iloc[:4]),
        rtol=1e-5)


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


def test_predict_streams_large_pair_lists(fitted, monkeypatch):
    """Pair lists longer than PREDICT_CHUNK stream through padded chunks
    and match the one-shot result (invalid ids still NaN)."""
    from poismf_tpu.models import poismf as poismf_mod

    model, df = fitted
    rng = np.random.default_rng(3)
    users = rng.choice(df["UserId"].unique(), size=1000)
    items = rng.choice(df["ItemId"].unique(), size=1000)
    one_shot = model.predict(users, items)
    monkeypatch.setattr(poismf_mod, "PREDICT_CHUNK", 64)
    chunked = model.predict(users, items)
    np.testing.assert_allclose(chunked, one_shot, rtol=1e-6)
    # invalid ids inside a chunked call
    users2 = users.copy()
    users2[5] = "no-such-user"
    out = model.predict(users2, items)
    assert np.isnan(out[5]) and np.isfinite(out[6])


def test_checkpoint_persists_tpu_config(tmp_path):
    """layout / plane_dtype (the TPU-specific knobs) round-trip through a
    checkpoint, and the resolved FitParams of the reloaded model equal the
    saved model's (VERDICT r2 weak #7: these used to silently reset)."""
    import dataclasses

    rng = np.random.default_rng(3)
    df = make_df(rng, 40, 20)
    m = PoisMF(k=4, method="tncg", niter=2, maxupd=30, layout="coo",
               plane_dtype="float32", nnz_chunk=4096).fit(df)
    path = str(tmp_path / "cfg.npz")
    m.save(path)
    loaded = PoisMF.load(path)
    assert loaded.layout == "coo"
    assert loaded.plane_dtype == "float32"
    assert loaded.nnz_chunk == 4096
    assert dataclasses.asdict(loaded._params()) == \
        dataclasses.asdict(m._params())


def test_checkpoint_rejects_newer_format(tmp_path, fitted):
    """A checkpoint from a NEWER format version fails with a clear error
    instead of constructing a model with unknown kwargs."""
    import json

    from poismf_tpu.io import checkpoint as ckpt

    model, _ = fitted
    path = str(tmp_path / "future.npz")
    model.save(path)
    with np.load(path, allow_pickle=True) as data:
        arrays = {k: data[k] for k in data.files}
    hp = json.loads(bytes(arrays["hyperparams"]).decode("utf-8"))
    hp["__format_version__"] = ckpt._FORMAT_VERSION + 1
    arrays["hyperparams"] = np.frombuffer(
        json.dumps(hp).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)
    with pytest.raises(ValueError, match="format"):
        PoisMF.load(path)


def test_float64_fit_scoped():
    """use_float=False runs under a SCOPED x64 context: the f64 model works
    in-process and the global jax_enable_x64 flag is left untouched."""
    import jax

    assert not jax.config.jax_enable_x64
    rng = np.random.default_rng(1)
    df = make_df(rng, 60, 30)
    m = PoisMF(k=5, method="tncg", niter=2, maxupd=50, use_float=False)
    m.fit(df)
    assert m.A.dtype == np.float64
    ll = m.eval_llk()
    assert np.isfinite(ll)
    u = df["UserId"].iloc[0]
    assert np.isfinite(m.predict(u, df["ItemId"].iloc[0]))
    assert len(m.topN(u, n=5)) == 5
    # the process-global flag was never flipped (the reference builds twin
    # C extensions instead; a library must not mutate global config)
    assert not jax.config.jax_enable_x64


def test_float64_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    df = make_df(rng, 40, 20)
    m = PoisMF(k=4, method="cg", niter=3, maxupd=5, use_float=False).fit(df)
    path = str(tmp_path / "m64.npz")
    m.save(path)
    loaded = PoisMF.load(path)
    assert loaded.A.dtype == np.float64
    np.testing.assert_allclose(loaded.A, m.A)
    u = df["UserId"].iloc[0]
    assert np.isfinite(loaded.predict(u, df["ItemId"].iloc[0]))


def test_predict_factors_respects_reuse_prev():
    """reuse_prev plumbs through to the cold-start init: Amean when True,
    1e-3 when False (__init__.py:567; pred.c:273-279)."""
    rng = np.random.default_rng(7)
    df = make_df(rng, 50, 25)
    sub = df[df["UserId"] == df["UserId"].iloc[0]][["ItemId", "Count"]]
    kw = dict(k=5, method="tncg", l2_reg=1.0, niter=4, maxupd=25,
              random_state=3)
    m_reuse = PoisMF(reuse_prev=True, **kw).fit(df)
    m_fresh = PoisMF(reuse_prev=False, **kw).fit(df)
    # few updates from the two inits land in different places
    a_reuse = m_reuse.predict_factors(sub, maxupd=3)
    a_fresh = m_fresh.predict_factors(sub, maxupd=3)
    assert not np.allclose(a_reuse, a_fresh)


def test_eval_llk_after_load_raises(fitted, tmp_path):
    """A restored checkpoint has factors but no training data: eval_llk()
    without triplets must raise a clear error, and triplets must work."""
    model, df = fitted
    path = str(tmp_path / "m.npz")
    model.save(path)
    loaded = PoisMF.load(path)
    with pytest.raises(ValueError, match="training data"):
        loaded.eval_llk()
    ll = loaded.eval_llk(
        (df["UserId"].to_numpy(), df["ItemId"].to_numpy(),
         df["Count"].to_numpy())
    )
    assert np.isfinite(ll)


def test_back_to_back_fits_different_data():
    """Regression test for the ELL-structure cache: fitting a second,
    different dataset right after the first must not reuse the first
    dataset's layout (the cache pins its key arrays so a recycled id()
    can never alias)."""
    rng = np.random.default_rng(11)
    kw = dict(k=5, method="tncg", l2_reg=1.0, niter=3, maxupd=30,
              random_state=5)
    df1 = make_df(rng, 60, 24)
    df2 = make_df(rng, 60, 24)  # same shape, different entries
    m1 = PoisMF(**kw).fit(df1)
    m2 = PoisMF(**kw).fit(df2)
    ll_mixed = m2.eval_llk()
    # fresh process-state fit of df2 only
    import poismf_tpu.train as train_mod

    train_mod._ELL_CACHE.clear()
    train_mod._ELL_AUX.clear()
    m2_fresh = PoisMF(**kw).fit(df2)
    np.testing.assert_allclose(m2.A, m2_fresh.A, rtol=1e-6, atol=1e-7)
    assert np.isclose(ll_mixed, m2_fresh.eval_llk(), rtol=1e-6)


def test_duplicate_pairs_are_summed():
    """Ingest aggregates duplicate (user, item) pairs by summing, like the
    reference's coo.tocsr() (__init__.py:405-414); with w_mult != 1 the
    weighted Bsum adjustment then counts each pair once."""
    rng = np.random.default_rng(13)
    rows, cols, vals = synth_counts(rng, 40, 16, density=0.3)
    # duplicate a third of the entries, splitting their counts in half
    ndup = len(rows) // 3
    rows_dirty = np.concatenate([rows, rows[:ndup], rows[:ndup]])
    cols_dirty = np.concatenate([cols, cols[:ndup], cols[:ndup]])
    vals_dirty = np.concatenate(
        [np.where(np.arange(len(vals)) < ndup, vals / 2, vals),
         vals[:ndup] / 4, vals[:ndup] / 4]
    )
    kw = dict(k=4, method="cg", l2_reg=1.0, niter=4, maxupd=5,
              weight_mult=2.5, random_state=9, reindex=False)
    clean = (rows, cols, vals, (40, 16))
    dirty = (rows_dirty, cols_dirty, vals_dirty, (40, 16))
    m_clean = PoisMF(**kw).fit(clean)
    m_dirty = PoisMF(**kw).fit(dirty)
    np.testing.assert_allclose(m_dirty.A, m_clean.A, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m_dirty.B, m_clean.B, rtol=1e-5, atol=1e-6)


def test_topn_batched_model_api(fitted):
    model, df = fitted
    users = df["UserId"].unique()[:6]
    top = model.topN_batched(users, n=5)
    assert top.shape == (6, 5)
    # matches the per-user path
    for q, u in enumerate(users):
        np.testing.assert_array_equal(top[q], model.topN(u, n=5))
    # exclude_seen drops each user's own training items
    top_unseen, scores = model.topN_batched(users, n=5, exclude_seen=True,
                                            output_score=True)
    assert np.all(np.isfinite(scores))
    seen = df.groupby("UserId")["ItemId"].agg(set)
    for q, u in enumerate(users):
        assert not (set(top_unseen[q].tolist()) & seen[u])
    with pytest.raises(ValueError):
        model.topN_batched(["not-a-user"], n=3)


def test_topn_batched_exclude_seen_chunked(fitted, monkeypatch):
    """exclude_seen rides device-side scatter from padded per-user lists,
    chunked — results must not depend on the chunk size (incl. a padded
    tail chunk)."""
    model, df = fitted
    users = df["UserId"].unique()[:7]
    base, base_scores = model.topN_batched(users, n=4, exclude_seen=True,
                                           output_score=True)
    monkeypatch.setattr(type(model), "_EXCL_CHUNK", 3)  # 3+3+padded tail
    chunked, ch_scores = model.topN_batched(users, n=4, exclude_seen=True,
                                            output_score=True)
    np.testing.assert_array_equal(chunked, base)
    np.testing.assert_allclose(ch_scores, base_scores, rtol=1e-6)
    seen = df.groupby("UserId")["ItemId"].agg(set)
    for q, u in enumerate(users):
        assert not (set(np.asarray(chunked[q]).tolist()) & seen[u])
