"""Tests for the quality-filter / PII / set-op / gap-quantile operators."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from katydid_haskell_ray.functions import text as TX


def _rand_texts(n=60, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    out = []
    for i in range(n):
        k = int(rng.integers(0, 9))
        out.append(" ".join(rng.choice(vocab, size=k)))
    out += ["", "solo", "a a a a a a"]
    return pd.Series(out)


def test_repetition_metrics_bruteforce():
    texts = _rand_texts()
    m = TX.repetition_metrics(texts)
    for i, t in enumerate(texts):
        tk = t.split()
        bg = [f"{tk[j]} {tk[j + 1]}" for j in range(len(tk) - 1)]
        assert m["n_tokens"][i] == len(tk)
        assert m["n_distinct_tokens"][i] == len(set(tk))
        assert m["top_token_n"][i] == max(
            (tk.count(w) for w in set(tk)), default=0)
        assert m["n_bigrams"][i] == len(bg)
        assert m["n_distinct_bigrams"][i] == len(set(bg))


def test_pii_counts_and_redact():
    s = pd.Series(["mail a.b@x.co and c@d.io", "call 555-1234 or 555-9999",
                   "ssn 123-45-6789", "clean text", None])
    c = TX.pii_counts(s)
    assert c["n_emails"].tolist() == [2, 0, 0, 0, 0]
    assert c["n_phones"].tolist() == [0, 2, 0, 0, 0]
    assert c["n_ssns"].tolist() == [0, 0, 1, 0, 0]
    r = TX.pii_redact(pd.Series(["a@b.co 555-1234 123-45-6789 ok"]))
    assert r[0] == "<EMAIL> <PHONE> <SSN> ok"


def test_distinct_values_stage(ray_session):
    import ray.data
    from katydid_haskell_ray.stages.keys import distinct_values

    vals = [1, 2, 2, 3, None, 3, 3, 7] * 50
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(vals, type=pa.int64())})).repartition(8)
    out = sorted(distinct_values(ds, "k").to_pandas()["k"])
    assert out == [1, 2, 3, 7]  # nulls dropped, one row per value


def test_doc_quality_gopher_oracle(ray_session, sf_dir):
    import __ray_entry__ as E

    got = (E.queries()["doc_quality_gopher"](sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    exp = (con.execute(E.oracle_sql()["doc_quality_gopher"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["quality_pass"].dtype == bool
    for c in ("n_tokens", "dup_token_ratio_micro", "top_token_ratio_micro",
              "dup_bigram_ratio_micro"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert got["quality_pass"].tolist() == exp["quality_pass"].astype(bool).tolist()
    # the threshold actually splits the corpus (not vacuously all-pass)
    assert 0 < got["quality_pass"].sum() < len(got)


def test_events_gap_quantiles_oracle(ray_session, sf_dir):
    import __ray_entry__ as E

    got = (E.queries()["events_gap_quantiles"](sf_dir).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    exp = (con.execute(E.oracle_sql()["events_gap_quantiles"]).df()
           .sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["p50_gap_us"].tolist() == exp["p50_gap_us"].tolist()


def test_semi_join_vs_pandas(ray_session, sf_dir):
    import __ray_entry__ as E

    got = (E.queries()["parts_semi_heavy"](sf_dir).to_pandas()
           .sort_values("p_partkey").reset_index(drop=True))
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    line = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity"])
    keys = set(line.loc[line["l_quantity"] > 49, "l_partkey"])
    exp = (part[part["p_partkey"].isin(keys)]
           .sort_values("p_partkey").reset_index(drop=True))
    assert got["p_partkey"].tolist() == exp["p_partkey"].tolist()
    assert got["p_name"].tolist() == exp["p_name"].tolist()
    # semi: each part at most once
    assert got["p_partkey"].is_unique


def test_wh_corr_null_on_constant_column(ray_session, tmp_path, monkeypatch):
    """corr is NULL (not a crash / garbage) when a side has zero variance."""
    import ray.data
    from katydid_haskell_ray.pipelines import queries as Q

    img = pa.table({
        "fmt": pa.array(["png"] * 4 + ["bmp"] * 4),
        "w": pa.array([5, 5, 5, 5, 1, 2, 3, 4], type=pa.int32()),
        "h": pa.array([7, 8, 9, 10, 2, 4, 6, 8], type=pa.int32())})
    import pyarrow.parquet as pq
    p = tmp_path / "images.parquet"
    pq.write_table(img, str(p))
    monkeypatch.setattr(Q, "images_parquet", lambda sf: str(p))
    out = Q.images_wh_corr("ignored").to_pandas().set_index("fmt")
    assert pd.isna(out.loc["png", "corr_micro"])  # w constant
    # h = 2w exactly: num=40, den=sqrt(20*80)=40 -> corr exactly 1.0
    assert out.loc["bmp", "corr_micro"] == 1_000_000


def test_gap_quantiles_empty_and_single(ray_session, tmp_path):
    """Users with a single event produce no gap row; empty input -> empty."""
    import pyarrow.parquet as pq
    from katydid_haskell_ray.pipelines import queries as Q

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [10, 10, 99],
        "ts": [t0, t0 + pd.Timedelta(seconds=5), t0]})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    out = Q.events_gap_quantiles(str(tmp_path)).to_pandas()
    assert out["user_id"].tolist() == [10]
    assert out["p50_gap_us"].tolist() == [5_000_000]

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(pa.Table.from_pandas(df.iloc[0:0]),
                   str(empty / "events.parquet"))
    assert len(Q.events_gap_quantiles(str(empty)).to_pandas()) == 0


def test_outer_join_both_sides_survive(ray_session):
    import ray.data
    from katydid_haskell_ray.stages.join import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "l": pa.array(["a", "b", "c"])}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], type=pa.int64()),
        "r": pa.array([20, 30, 40], type=pa.int64())}))
    out = (hash_join(left, right, key="k", left_cols=["l"],
                     right_cols=["r"], how="outer")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["l"].tolist()[:3] == ["a", "b", "c"] and pd.isna(out["l"][3])
    assert pd.isna(out["r"][0]) and out["r"].tolist()[1:] == [20, 30, 40]


def test_outer_join_one_side_empty(ray_session):
    import ray.data
    from katydid_haskell_ray.stages.join import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([], type=pa.int64()), "l": pa.array([], type=pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([7], type=pa.int64()), "r": pa.array([70], type=pa.int64())}))
    out = hash_join(left, right, key="k", left_cols=["l"],
                    right_cols=["r"], how="outer").to_pandas()
    assert out["k"].tolist() == [7] and out["r"].tolist() == [70]
    assert pd.isna(out["l"][0])
    out2 = hash_join(right, left, key="k", left_cols=["r"],
                     right_cols=["l"], how="outer").to_pandas()
    assert out2["k"].tolist() == [7] and out2["r"].tolist() == [70]


def test_building_urgent_outer_reconciles(ray_session, sf_dir):
    import __ray_entry__ as E

    got = E.queries()["building_urgent_outer"](sf_dir).to_pandas()
    # rows unmatched on each side both survive
    assert (~got["in_building"]).any()       # urgent but not BUILDING
    assert (got["n_urgent"] == 0).any()      # BUILDING but no urgent order
    assert got["c_custkey"].is_unique


def test_events_cumsum_matches_pandas(ray_session, sf_dir):
    import __ray_entry__ as E

    got = (E.queries()["events_cumsum"](sf_dir).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ev["cum"] = ev.groupby("user_id")["cents"].cumsum()
    ev = ev.sort_values("event_id").reset_index(drop=True)
    assert got["cum_cents"].tolist() == ev["cum"].tolist()


def test_percent_rank_ties_share_rank(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from katydid_haskell_ray.pipelines import queries as Q

    tab = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "lang": pa.array(["en"] * 5),
        "n_chars": pa.array([10, 10, 20, 30, 30], type=pa.int64())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = (Q.docs_percent_rank(str(tmp_path)).to_pandas()
           .sort_values("doc_id"))
    # percent_rank = (rank_min - 1) / (N - 1): ties share the min rank
    assert out["pr_micro"].tolist() == [0, 0, 500_000, 750_000, 750_000]


def test_salted_group_sum_hot_key(ray_session):
    """Salted two-level aggregation matches the unsalted result on a
    pathologically hot key (50% of all rows on one key)."""
    import ray.data
    from katydid_haskell_ray.stages.exchange import (bucketed_group_sum,
                                                     salted_group_sum)

    rng = np.random.default_rng(3)
    n = 20_000
    keys = np.where(rng.random(n) < 0.5, 777,
                    rng.integers(0, 1000, n)).astype(np.int64)
    vals = rng.integers(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(16)

    salted = (salted_group_sum(ds, ["k"], n_salt=8).to_pandas()
              .sort_values("k").reset_index(drop=True))
    plain = (bucketed_group_sum(ds, ["k"]).to_pandas()
             .sort_values("k").reset_index(drop=True))
    exp = (pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)
           .sum().sort_values("k").reset_index(drop=True))
    for got in (salted, plain):
        assert got["k"].tolist() == exp["k"].tolist()
        assert got["v"].tolist() == exp["v"].tolist()


def test_trailing_window_tie_peers(ray_session, tmp_path):
    """RANGE-mode CURRENT ROW extends through equal-ts peers — both rows
    at the tied timestamp must see BOTH values in their frame."""
    import pyarrow.parquet as pq
    from katydid_haskell_ray.pipelines import queries as Q

    t0 = pd.Timestamp("2024-01-01 12:00:00")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [5, 5, 5, 5],
        "ts": [t0, t0 + pd.Timedelta(minutes=30),
               t0 + pd.Timedelta(minutes=30),          # tie with event 2
               t0 + pd.Timedelta(hours=2)],            # outside 1h of all
        "value": [1.0, 2.0, 3.0, 4.0]})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    out = (Q.events_trailing_1h(str(tmp_path)).to_pandas()
           .sort_values("event_id"))
    # events 2 and 3 are peers: both frames = 100+200+300
    assert out["trail_cents"].tolist() == [100, 600, 600, 400]


def test_checksum_matches_duckdb(ray_session, sf_dir):
    import __ray_entry__ as E

    got = (to := E.queries()["docs_checksum_per_lang"](sf_dir))
    got = (to.to_pandas() if hasattr(to, "to_pandas") else to) \
        .sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    exp = (con.execute(E.oracle_sql()["docs_checksum_per_lang"]).df()
           .sort_values("lang").reset_index(drop=True))
    assert got["checksum"].tolist() == exp["checksum"].tolist()
    assert got["n_docs"].tolist() == exp["n_docs"].tolist()


def test_embedding_centroids_long_form(ray_session, sf_dir):
    import __ray_entry__ as E

    got = (E.queries()["embedding_centroids"](sf_dir).to_pandas()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.floor(np.stack(emb["embedding"].to_numpy())
                   .astype(np.float64) * 1e6).astype(np.int64)
    for lab in got["label"].unique()[:3]:
        rows = mat[emb["label"].to_numpy() == lab]
        sub = got[got["label"] == lab]
        assert sub["sum_micro"].to_numpy().tolist() == rows.sum(0).tolist()
        assert (sub["n"] == len(rows)).all()


def test_kmeans_matches_numpy_reference(ray_session, sf_dir):
    """The distributed k-means must produce the same assignments as a
    single-process numpy run with identical arithmetic and init."""
    import __ray_entry__ as E

    got = (E.queries()["kmeans_embeddings"](sf_dir).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    k, iters = 4, 3
    cents = X[:k].copy()

    def d2_of(X, c):  # the exact expression of queries._kmeans_d2
        return ((X * X).sum(axis=1)[:, None] - 2.0 * (X @ c.T)
                + (c * c).sum(axis=1)[None, :])

    for _ in range(iters):
        cl = d2_of(X, cents).argmin(axis=1)
        for j in range(k):
            if (cl == j).any():
                cents[j] = X[cl == j].sum(axis=0) / (cl == j).sum()
    d2 = d2_of(X, cents)
    expect = d2.argmin(axis=1)
    # the distributed reduce sums per-block float partials in a different
    # order than the whole-array reference, so allow disagreement ONLY
    # where the best-two distance margin is within float noise
    mism = got["cluster"].to_numpy() != expect
    if mism.any():
        margins = np.partition(d2[mism], 1, axis=1)
        assert (margins[:, 1] - margins[:, 0] < 1e-6).all()
    assert (~mism).mean() >= 0.98
    assert got["cluster"].nunique() > 1  # actually clusters


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_trailing_window_random_vs_bruteforce(ray_session, tmp_path, seed):
    """Randomized cross-check of the RANGE-window searchsorted/offset math
    against an O(n^2) per-row reference, including tied timestamps."""
    import pyarrow.parquet as pq
    from katydid_haskell_ray.pipelines import queries as Q

    rng = np.random.default_rng(seed)
    n = 400
    base = pd.Timestamp("2024-03-01").value // 1000  # us
    ts_us = base + rng.integers(0, 4 * 3_600_000_000, n)
    ts_us[rng.integers(0, n, 30)] = ts_us[rng.integers(0, n, 30)]  # ties
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n).astype(np.int64),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "value": rng.uniform(0, 50, n)})
    d = tmp_path / f"tw{seed}"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))

    got = (Q.events_trailing_1h(str(d)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    cents = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
    HOUR = 3_600_000_000
    exp = []
    for i in range(n):
        u, t = df["user_id"][i], ts_us[i]
        # frame: same user, ts in [t-1h, t] INCLUDING peers at exactly t
        m = (df["user_id"].to_numpy() == u) & (ts_us >= t - HOUR) & (ts_us <= t)
        exp.append(int(cents[m].sum()))
    assert got["trail_cents"].tolist() == exp


def test_semi_anti_null_keys_sql_semantics(ray_session):
    """EXISTS/NOT EXISTS parity: a NULL key never matches — semi drops
    NULL-key left rows, anti keeps them, and NULL right keys match
    nothing (pandas NaN == NaN would say otherwise)."""
    import ray.data
    from katydid_haskell_ray.stages.join import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 3], type=pa.int64()),
        "l": pa.array(["a", "b", "c"])}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([None, 3], type=pa.int64())}))
    semi = hash_join(left, right, key="k", left_cols=["l"],
                     right_cols=[], how="left_semi").to_pandas()
    anti = hash_join(left, right, key="k", left_cols=["l"],
                     right_cols=[], how="left_anti").to_pandas()
    assert semi["l"].tolist() == ["c"]
    assert sorted(anti["l"]) == ["a", "b"]


def test_api_surface_validate_and_filter(ray_session):
    """The Relapse.parse/validate/filter Dataset-level API: all three
    grammar input forms, both flat and JSON modes, fallback path."""
    import ray.data
    from katydid_haskell_ray import api

    flat = ray.data.from_arrow(pa.table({
        "w": pa.array([1, 0, 5, None], type=pa.int64())}))
    doc = {"main": {"field": "w", "child": {"leaf": {
        "func": "ge", "args": [{"var": "int"}, {"int": 1}]}}}}

    # dict form, flat lowered path
    v = api.validate(flat, doc, concurrency=1).to_pandas()
    assert v["pass"].tolist() == [True, False, True, False]
    kept = api.filter(flat, doc, concurrency=1).to_pandas()
    assert kept["w"].tolist() == [1, 5]

    # compiled-Grammar form gives the same answer
    g = api.compile(doc)
    v2 = api.validate(flat, g, concurrency=1).to_pandas()
    assert v2["pass"].tolist() == v["pass"].tolist()

    # concrete-syntax string + JSON column mode
    js = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "p": pa.array(['{"k": 20}', '{"k": 99}', 'not json'])}))
    out = api.filter(js, "k: ->and(ge($int, 10), lt($int, 50))",
                     json_col="p", concurrency=1).to_pandas()
    assert out["id"].tolist() == [1]

    # NOT-lowerable grammar (non-trailing zany-star in a concat) must take
    # the per-actor MemDeriver fallback and still agree with the oracle
    from katydid_haskell_ray import colplan as CP
    from katydid_haskell_ray.api import _FlatValidator
    two = pa.table({"a": pa.array([1, 7], type=pa.int64()),
                    "b": pa.array([2, 3], type=pa.int64())})
    gr = {"main": {"concat": [{"star": "zany"}, {"field": "b", "child": {
        "leaf": {"func": "eq", "args": [{"var": "int"}, {"int": 2}]}}}]}}
    fv = _FlatValidator(gr, "pass")
    res = fv(two).column("pass").to_pylist()
    assert fv._lowerable is False  # actually exercised the fallback
    assert res == [True, False]
    two_ds = ray.data.from_arrow(two)
    got = api.validate(two_ds, gr, concurrency=1).to_pandas()
    assert got["pass"].tolist() == [True, False]


def test_user_rank_ntile_edges(ray_session, tmp_path):
    """NTILE when rows < tiles and when n % t != 0; dense_rank on ties."""
    import pyarrow.parquet as pq
    from katydid_haskell_ray.pipelines import queries as Q

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [1, 1, 1, 1, 1, 9, 9],
        #            ties on 5.0 for user 1
        "value": [9.0, 5.0, 5.0, 3.0, 1.0, 2.0, 2.0]})
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    out = (Q.events_user_rank(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    u1 = out[out["user_id"] == 1]
    assert u1["rn"].tolist() == [1, 2, 3, 4, 5]
    assert u1["dr"].tolist() == [1, 2, 2, 3, 4]      # ties compact
    # ntile(4) of 5 rows: sizes 2,1,1,1
    assert u1["tile"].tolist() == [1, 1, 2, 3, 4]
    u9 = out[out["user_id"] == 9]
    assert u9["tile"].tolist() == [1, 2]             # n < tiles


def test_grouped_approx_distinct_error_bound(ray_session):
    """Per-group HLL estimates within ~5% of exact at 20k keys/group."""
    import ray.data
    from katydid_haskell_ray.stages.keys import (grouped_approx_distinct,
                                                 grouped_distinct_count)

    rng = np.random.default_rng(11)
    n = 120_000
    grp = rng.integers(0, 3, n)
    key = rng.integers(0, 20_000, n) + grp * 1_000_000  # distinct per grp
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(grp, type=pa.int64()),
        "k": pa.array(key, type=pa.int64())})).repartition(8)
    approx = (grouped_approx_distinct(ds, "g", "k").to_pandas()
              .set_index("g")["n_distinct_approx"])
    exact = grouped_distinct_count(ds, "g", "k").set_index("g")["n_distinct"]
    for g in exact.index:
        rel = abs(approx[g] - exact[g]) / exact[g]
        assert rel < 0.05, (g, approx[g], exact[g])
