"""Brute-force references for the round-4 continuation operators:
split assignment, sequence packing, exact byte dedupe, byte entropy, RFM."""

import math
import os
from collections import Counter

import numpy as np
import pandas as pd
import pytest


def _docs(sf_dir):
    return pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def test_split_assign_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    out = Q.docs_split_assign(sf_dir)
    d = _docs(sf_dir)
    pct = ((d["doc_id"].to_numpy() * 2654435761) % 2**32) % 100
    split = np.where(pct < 5, "test", np.where(pct < 15, "val", "train"))
    ref = (d.assign(split=split)
           .groupby(["split", "lang"], as_index=False)
           .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")))
    got = out.sort_values(["split", "lang"]).reset_index(drop=True)
    ref = ref.sort_values(["split", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": np.int64, "sum_chars": np.int64}),
        ref.astype({"n_docs": np.int64, "sum_chars": np.int64}))
    # every doc is assigned to exactly one split
    assert got["n_docs"].sum() == len(d)


def _brute_pack(ntoks, budget):
    seq, sid, cur = [], 0, 0
    for t in ntoks:
        if cur + t > budget and cur > 0:
            sid, cur = sid + 1, 0
        seq.append(sid)
        cur += t
    return seq


def test_pack_sequences_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    out = Q.docs_pack_sequences(sf_dir).to_pandas() \
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)
    d = _docs(sf_dir)
    d["ntok"] = d["text"].fillna("").str.split().str.len()
    refs = []
    for lang, sub in d.sort_values("doc_id").groupby("lang"):
        refs.append(pd.DataFrame({
            "doc_id": sub["doc_id"].to_numpy(), "lang": lang,
            "ntok": sub["ntok"].to_numpy(dtype=np.int64),
            "seq_id": np.array(_brute_pack(sub["ntok"].tolist(),
                                           Q.PACK_BUDGET), dtype=np.int64)}))
    ref = pd.concat(refs).sort_values(["lang", "doc_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns.tolist()], ref)
    # no sequence (except oversized singletons) exceeds the budget
    fill = out.groupby(["lang", "seq_id"])["ntok"].agg(["sum", "size"])
    over = fill[fill["sum"] > Q.PACK_BUDGET]
    assert (over["size"] == 1).all()


def test_pack_sequences_edge_cases(ray_session, tmp_path):
    """Oversized docs get singleton bins; empty docs join the open bin."""
    from katydid_haskell_ray.pipelines import queries as Q

    texts = ["w " * 600,            # oversized (600 tokens > 512)
             "a b c",               # 3
             "",                    # 0 tokens
             "x " * 510,            # 510 -> fits with the 3+0 above? 513>512: new bin
             "y"]                   # 1
    d = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                      "text": texts, "lang": "en",
                      "n_chars": [len(t) for t in texts]})
    d.to_parquet(tmp_path / "documents.parquet")
    out = Q.docs_pack_sequences(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["seq_id"].tolist() == _brute_pack([600, 3, 0, 510, 1], 512)
    assert out["seq_id"].tolist() == [0, 1, 1, 2, 2]


def test_images_exact_dupes_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    img = pd.read_parquet(Q.images_parquet(sf_dir),
                          columns=["image_id", "bytes", "w"])
    aug = pd.concat([img, img[img["w"] % 5 == 0]])
    sizes = aug.groupby("bytes")["image_id"].size()
    dup_bytes = sizes[sizes > 1]
    ref = aug[aug["bytes"].isin(dup_bytes.index)].copy()
    ref["n_copies"] = ref["bytes"].map(dup_bytes).astype(np.int64)
    got = Q.images_exact_dupes(sf_dir).to_pandas()
    assert len(got) == len(ref)
    assert sorted(got["image_id"]) == sorted(ref["image_id"])
    assert (got["n_copies"] >= 2).all()
    g = got.groupby("image_id")["n_copies"].max().sort_index()
    r = ref.groupby("image_id")["n_copies"].max().sort_index()
    pd.testing.assert_series_equal(g, r)


def test_images_bytes_entropy_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    got = Q.images_bytes_entropy(sf_dir).to_pandas() \
        .set_index(["image_id", "phash"])["entropy_micro"]
    img = pd.read_parquet(Q.images_parquet(sf_dir),
                          columns=["image_id", "phash", "bytes"])
    assert len(got) == len(img)
    for _, row in img.sample(n=50, random_state=1).iterrows():
        payload = row["bytes"]
        tot = len(payload)
        ent = sum(int(math.floor(1e6 * -((n / tot) * math.log(n / tot))))
                  for n in Counter(payload).values())
        assert got.loc[(row["image_id"], row["phash"])] == ent


def test_customer_rfm_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    orders = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    orders["rec_day"] = orders["o_orderdate"].to_numpy() \
        .astype("datetime64[D]").astype(np.int64)
    orders["cents"] = np.floor(orders["o_totalprice"].to_numpy() * 100) \
        .astype(np.int64)
    a = orders.groupby("o_custkey").agg(
        rec_day=("rec_day", "max"), freq=("o_orderkey", "size"),
        mon_cents=("cents", "sum"))

    def disc_q(v, q):  # duckdb quantile_disc convention
        s = np.sort(v)
        return s[max(int(np.ceil(np.float64(q) * len(s))) - 1, 0)]

    def scores(v):
        t = [disc_q(v, q) for q in (0.25, 0.5, 0.75)]
        return 1 + (v > t[0]).astype(int) + (v > t[1]) + (v > t[2])

    ref = pd.DataFrame({
        "o_custkey": a.index.to_numpy(),
        "r_score": scores(a["rec_day"].to_numpy()),
        "f_score": scores(a["freq"].to_numpy()),
        "m_band": np.floor(np.log10(a["mon_cents"].to_numpy()
                                    .astype(np.float64))).astype(np.int64),
    }).sort_values("o_custkey").reset_index(drop=True)
    got = Q.customer_rfm(sf_dir).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"r_score": int, "f_score": int, "m_band": np.int64}),
        ref.astype({"r_score": int, "f_score": int, "m_band": np.int64}))
    assert set(got["r_score"]) <= {1, 2, 3, 4}


def test_keyword_search_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    got = Q.docs_keyword_search(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    d = _docs(sf_dir)
    rows = []
    for _, r in d.iterrows():
        toks = set((r["text"] or "").split())
        nm = sum(t in toks for t in Q._SEARCH_TERMS)
        if nm:
            rows.append({"doc_id": r["doc_id"], "lang": r["lang"],
                         "n_terms_matched": nm,
                         "all_matched": nm == len(Q._SEARCH_TERMS)})
    ref = pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_terms_matched": np.int64, "all_matched": bool}),
        ref.astype({"n_terms_matched": np.int64, "all_matched": bool}))


def test_unigram_surprisal_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    got = Q.docs_unigram_surprisal(sf_dir).to_pandas() \
        .set_index("doc_id").sort_index()
    d = _docs(sf_dir)
    toks = {r["doc_id"]: (r["text"] or "").split()
            for _, r in d.iterrows()}
    vocab = Counter()
    for t in toks.values():
        vocab.update(t)
    n_total = sum(vocab.values())
    for doc_id, t in toks.items():
        if not t:
            assert doc_id not in got.index
            continue
        s = sum(int(math.floor(1e6 * -math.log(vocab[w] / n_total)))
                for w in t)
        assert got.loc[doc_id, "n_tokens"] == len(t)
        assert got.loc[doc_id, "surprisal_micro"] == s


def test_big_orders_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])
    orders = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = pd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_name"])
    qty = li.assign(q=li["l_quantity"].astype(np.int64)) \
        .groupby("l_orderkey", as_index=False)["q"].sum()
    big = qty[qty["q"] > Q.BIG_ORDER_QTY]
    ref = (big.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey"))
    got = Q.big_orders_customers(sf_dir).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    ref = pd.DataFrame({
        "o_orderkey": ref["o_orderkey"], "total_qty": ref["q"],
        "total_cents": np.floor(ref["o_totalprice"] * 100).astype(np.int64),
        "c_name": ref["c_name"], "c_custkey": ref["c_custkey"],
    }).sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[ref.columns.tolist()].astype({"total_qty": np.int64}), ref)


def test_q6_and_promo_share_vs_duckdb(ray_session, sf_dir):
    import duckdb

    from katydid_haskell_ray.pipelines import queries as Q

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(sf_dir, t)}.parquet')")
    q6 = Q.q6_forecast_revenue(sf_dir)
    ref = con.sql("""
        SELECT COALESCE(SUM(CAST(floor(l_extendedprice * l_discount * 100)
               AS BIGINT)), 0) AS rc, COUNT(*) AS n FROM lineitem
        WHERE date_part('year', l_shipdate) = 1996
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24""").fetchone()
    assert int(q6["revenue_cents"][0]) == int(ref[0])
    assert int(q6["n_rows"][0]) == int(ref[1])

    share = Q.promo_revenue_share(sf_dir).sort_values("month") \
        .reset_index(drop=True)
    refs = con.sql("""
        WITH j AS (SELECT strftime(date_trunc('month', l_shipdate),
                          '%Y-%m-%d') AS month,
                   CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS dc, (p_type = 'PROMO') AS pr
                   FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT month, SUM(CASE WHEN pr THEN dc ELSE 0 END) AS pc,
               SUM(dc) AS tc FROM j GROUP BY 1 ORDER BY 1""").df()
    assert share["month"].tolist() == refs["month"].tolist()
    assert share["promo_cents"].tolist() == refs["pc"].astype(int).tolist()
    assert share["total_cents"].tolist() == refs["tc"].astype(int).tolist()
    # share is a ratio in [0, 1e6]
    assert share["promo_share_micro"].between(0, 10**6).all()


def test_quality_deciles_partition_of_corpus(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    out = Q.docs_quality_deciles(sf_dir)
    d = _docs(sf_dir)
    assert out["n_docs"].sum() == len(d)
    assert out["sum_chars"].sum() == d["n_chars"].sum()
    assert set(out["decile"]) <= set(range(1, 11))
    # deciles of a non-degenerate score are roughly balanced: no decile
    # holds more than half the corpus
    assert out["n_docs"].max() <= len(d) * 0.55


def test_dow_hour_heatmap_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    out = Q.events_dow_hour_heatmap(sf_dir) \
        .sort_values(["dow", "hour"]).reset_index(drop=True)
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "value"])
    us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ref = pd.DataFrame({
        "dow": (us // 86_400_000_000 + 4) % 7,
        "hour": (us % 86_400_000_000) // 3_600_000_000,
        "n": 1, "value_cents": np.floor(ev["value"].to_numpy() * 100)
        .astype(np.int64)}).groupby(["dow", "hour"], as_index=False).sum() \
        .sort_values(["dow", "hour"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({c: np.int64 for c in out.columns}),
        ref.astype({c: np.int64 for c in ref.columns}))
    # dow convention matches pandas dayofweek (Sunday=0 shift)
    py_dow = (pd.DatetimeIndex(ev["ts"]).dayofweek + 1) % 7
    got_total = out.groupby("dow")["n"].sum()
    ref_total = pd.Series(py_dow).value_counts().sort_index()
    assert got_total.tolist() == ref_total.tolist()


def _brute_debounce(df, gap_us):
    kept = {}
    out = []
    for _, r in df.sort_values(["user_id", "event_type", "ts_us",
                                "event_id"]).iterrows():
        k = (r["user_id"], r["event_type"])
        if k not in kept or r["ts_us"] >= kept[k] + gap_us:
            kept[k] = r["ts_us"]
            out.append((r["event_id"], True))
        else:
            out.append((r["event_id"], False))
    return dict(out)


def test_events_debounce_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id", "event_type"])
    ev["ts_us"] = ev["ts"].to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    ref = _brute_debounce(ev, Q.DEBOUNCE_GAP_US)
    got = Q.events_debounce(sf_dir).to_pandas()
    assert len(got) == len(ev)
    mism = [e for e, k in zip(got["event_id"], got["kept"])
            if ref[e] != bool(k)]
    assert not mism, mism[:5]
    assert got["kept"].sum() < len(ev)  # the gap actually drops events


def test_events_debounce_tie_and_boundary(ray_session, tmp_path):
    """Identical timestamps keep only the lowest event_id; an event at
    EXACTLY last_kept + gap is kept (>= semantics)."""
    from katydid_haskell_ray.pipelines import queries as Q

    g = Q.DEBOUNCE_GAP_US
    base = 1_600_000_000_000_000
    ev = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "ts": pd.to_datetime(
            np.array([base, base, base + g - 1, base + g,
                      base + g, base + 3 * g], dtype="int64"), unit="us"),
        "user_id": np.int64(7), "event_type": "view",
        "value": 0.0, "props": "{}"})
    ev.to_parquet(tmp_path / "events.parquet")
    got = Q.events_debounce(str(tmp_path)).to_pandas() \
        .sort_values("event_id")
    #            id0 anchor, id1 tie-dropped, id2 gap-1 dropped,
    #            id3 == anchor+g kept, id4 tie-dropped, id5 kept
    assert got["kept"].tolist() == [True, False, False, True, False, True]


def test_embedding_quantize_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    lo, hi = x.min(axis=0), x.max(axis=0)
    w = hi - lo
    code = np.minimum(np.floor((x - lo) / w * 255), 255.0)
    recon = lo + (code + 0.5) * w / 255
    err = np.floor(1e6 * np.abs(x - recon)).astype(np.int64)
    got = Q.embedding_quantize_int8(sf_dir).to_pandas() \
        .set_index("vec_id").loc[emb["vec_id"]]
    assert (got["max_err_micro"].to_numpy() == err.max(axis=1)).all()
    assert (got["sum_code"].to_numpy()
            == code.sum(axis=1).astype(np.int64)).all()
    # max error is bounded by half a quantization step (+ floor slack)
    step_micro = np.floor(1e6 * w / 255 / 2).max() + 1
    assert got["max_err_micro"].max() <= step_micro


def test_pack_sequences_zero_token_before_oversized(ray_session, tmp_path):
    """A bin holding only zero-token docs (cur == 0) still admits an
    oversized doc — 'new bin' needs BOTH cur + t > budget AND cur > 0
    (the review-confirmed divergence case)."""
    from katydid_haskell_ray.pipelines import queries as Q

    ntoks = [0, 600, 664, 0, 612, 0, 0, 700, 5]
    texts = ["w " * t if t else "" for t in ntoks]
    d = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts, "lang": "en",
                      "n_chars": [len(t) for t in texts]})
    d.to_parquet(tmp_path / "documents.parquet")
    out = Q.docs_pack_sequences(str(tmp_path)).to_pandas() \
        .sort_values("doc_id")
    assert out["seq_id"].tolist() == _brute_pack(ntoks, Q.PACK_BUDGET)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pack_sequences_random_stress(ray_session, tmp_path, seed):
    from katydid_haskell_ray.pipelines import queries as Q

    rng = np.random.default_rng(seed)
    ntoks = rng.choice([0, 1, 5, 100, 300, 511, 512, 513, 900],
                       size=120).tolist()
    texts = ["w " * t if t else "" for t in ntoks]
    d = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts,
                      "lang": rng.choice(["en", "fr"], size=len(texts)),
                      "n_chars": [len(t) for t in texts]})
    sub = tmp_path / f"s{seed}"
    sub.mkdir()
    d.to_parquet(sub / "documents.parquet")
    out = Q.docs_pack_sequences(str(sub)).to_pandas() \
        .sort_values(["lang", "doc_id"])
    for lang, g in d.sort_values("doc_id").groupby("lang"):
        ref = _brute_pack(
            [ntoks[i] for i in g.index], Q.PACK_BUDGET)
        got = out[out["lang"] == lang]["seq_id"].tolist()
        assert got == ref, (lang, got[:10], ref[:10])


def test_events_debounce_chunked_and_null_keys(ray_session, tmp_path,
                                               monkeypatch):
    """Group chunking (forced tiny chunks via a huge artificial span
    guard) and null event_type keys both match the brute scan."""
    from katydid_haskell_ray.pipelines import queries as Q

    g = Q.DEBOUNCE_GAP_US
    rng = np.random.default_rng(3)
    n = 400
    base = 1_600_000_000_000_000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            base + rng.integers(0, 4 * g, size=n), unit="us"),
        "user_id": rng.integers(0, 25, size=n).astype(np.int64),
        "event_type": rng.choice(["view", "click", None], size=n),
        "value": 0.0, "props": "{}"})
    ev.to_parquet(tmp_path / "events.parquet")
    # force multi-chunk scans: cap chunk_size*span so ~3 groups per chunk
    span = int(4 * g + g + 1)
    monkeypatch.setattr(Q, "_DEBOUNCE_OFFSET_CAP", span * 3)
    got = Q.events_debounce(str(tmp_path)).to_pandas()
    ev["ts_us"] = ev["ts"].to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    ref = _brute_debounce(ev.fillna({"event_type": "\0null"}),
                          Q.DEBOUNCE_GAP_US)
    assert len(got) == n
    mism = [e for e, k in zip(got["event_id"], got["kept"])
            if ref[e] != bool(k)]
    assert not mism, mism[:5]


def test_embedding_quantize_constant_dim(ray_session, tmp_path):
    """A constant (zero-width) dimension yields code 0 / zero error, not
    NaN-poisoned int64 garbage."""
    from katydid_haskell_ray.pipelines import queries as Q

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    vecs[:, 3] = 1.25  # constant dim
    emb = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                        "embedding": list(vecs),
                        "label": np.int32(0)})
    emb.to_parquet(tmp_path / "embeddings.parquet")
    got = Q.embedding_quantize_int8(str(tmp_path)).to_pandas()
    assert (got["max_err_micro"] >= 0).all()
    assert got["max_err_micro"].max() < 10**6  # sane micro error


def test_late_orders_bruteforce(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_shipdate"])
    orders = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    late = m[(m["l_shipdate"].to_numpy().astype("datetime64[D]")
              .astype(np.int64))
             > (m["o_orderdate"].to_numpy().astype("datetime64[D]")
                .astype(np.int64)) + 90]
    ref = (late.drop_duplicates("o_orderkey")
           .groupby("o_orderpriority", as_index=False)
           .size().rename(columns={"size": "n"})
           .sort_values("o_orderpriority").reset_index(drop=True))
    got = Q.late_orders_by_priority(sf_dir) \
        .sort_values("o_orderpriority").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n": np.int64}),
                                  ref.astype({"n": np.int64}))


def test_embedding_top_component_vs_eigh(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / len(x)
    vals, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    ref = np.floor(1e6 * (x - mu) @ v).astype(np.int64)
    got = Q.embedding_top_component(sf_dir).to_pandas() \
        .set_index("vec_id").loc[emb["vec_id"], "proj_micro"].to_numpy()
    # both sides eigensolve; the distributed centered-gram partials sum
    # in block order, so micro-floors may differ by 1 on a few entries
    assert np.abs(got - ref).max() <= 1
    assert (np.abs(got - ref) > 0).mean() < 0.05


def test_lang_len_regression_vs_numpy(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    d = _docs(sf_dir)
    d["x"] = d["text"].fillna("").str.split().str.len().astype(np.int64)
    got = Q.lang_len_regression(sf_dir).set_index("lang")
    for lang, g in d.groupby("lang"):
        slope, intercept = np.polyfit(g["x"].to_numpy(dtype=np.float64),
                                      g["n_chars"].to_numpy(np.float64), 1)
        # polyfit solves the same normal equations (lstsq); micro-floor
        # of a well-conditioned fit agrees to ~1 micro unit
        assert abs(got.loc[lang, "slope_micro"] - 1e6 * slope) < 50
        assert abs(got.loc[lang, "intercept_micro"] - 1e6 * intercept) < 50
        assert got.loc[lang, "n_docs"] == len(g)


def test_chi2_vs_scipy_formula(ray_session, sf_dir):
    from katydid_haskell_ray.pipelines import queries as Q

    d = _docs(sf_dir)
    obs = d.groupby(["lang", "source"]).size().unstack(fill_value=0)
    o = obs.to_numpy(dtype=np.float64)
    # exclude structurally-absent cells, matching the groupby cells
    exp = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    mask = o > 0
    chi2 = ((o - exp) ** 2 / exp)[mask].sum()
    got = Q.docs_lang_source_chi2(sf_dir)
    assert abs(got["chi2_micro"][0] / 1e6 - chi2) < 0.01
    assert got["dof"][0] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
    assert got["n_cells"][0] == int(mask.sum())


def test_export_by_lang_layout_and_counts(ray_session, sf_dir, tmp_path):
    """Hive layout (lang=<v>/ dirs), counts from the WRITTEN files, and
    partition pruning: reading one lang dir returns only that lang."""
    from katydid_haskell_ray.pipelines import queries as Q
    import ray as _ray

    out = str(tmp_path / "export")
    got = Q.docs_export_by_lang(sf_dir, out_root=out) \
        .sort_values("lang").reset_index(drop=True)
    d = _docs(sf_dir)
    ref = (d.groupby("lang", as_index=False).size()
           .rename(columns={"size": "n_rows"})
           .sort_values("lang").reset_index(drop=True))
    ref["lang"] = ref["lang"].astype(str)
    pd.testing.assert_frame_equal(got.astype({"n_rows": np.int64}),
                                  ref.astype({"n_rows": np.int64}))
    parts = sorted(os.listdir(out))
    assert parts == sorted(f"lang={v}" for v in ref["lang"])
    one = _ray.data.read_parquet(os.path.join(out, parts[0]))
    assert one.count() == int(ref["n_rows"].iloc[0])


def test_chi2_null_category(ray_session, tmp_path):
    """A null lang forms its own margin category (SQL NULL-group parity)
    instead of crashing the margin lookup."""
    from katydid_haskell_ray.pipelines import queries as Q

    d = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": "t", "n_chars": np.int64(1),
        "lang": ["en", "en", None, None, "fr", "fr", "en", None],
        "source": ["a", "b", "a", "b", "a", "a", "a", "a"]})
    d.to_parquet(tmp_path / "documents.parquet")
    got = Q.docs_lang_source_chi2(str(tmp_path))
    obs = d.groupby(["lang", "source"], dropna=False).size()
    r = d.groupby("lang", dropna=False).size()
    c = d.groupby("source", dropna=False).size()
    chi2 = sum(
        int(np.floor(1e6 * (n - r[la] * c[so] / len(d)) ** 2
                     / (r[la] * c[so] / len(d))))
        for (la, so), n in obs.items())
    assert got["chi2_micro"][0] == chi2
    assert got["dof"][0] == (len(r) - 1) * (len(c) - 1)
    assert got["n_cells"][0] == len(obs)


def test_export_null_lang_partition(ray_session, tmp_path):
    """A null lang round-trips through the hive default partition back
    to None (not the sentinel string)."""
    from katydid_haskell_ray.pipelines import queries as Q

    d = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                      "text": "t", "n_chars": np.int64(1),
                      "lang": ["en", None, "en", None, "fr", "en"],
                      "source": "s"})
    sub = tmp_path / "data"
    sub.mkdir()
    d.to_parquet(sub / "documents.parquet")
    got = Q.docs_export_by_lang(str(sub)).sort_values(
        "lang", na_position="last").reset_index(drop=True)
    assert "__HIVE_DEFAULT_PARTITION__" not in set(got["lang"].astype(str))
    by = dict(zip(got["lang"], got["n_rows"]))
    assert by.get("en") == 3 and by.get("fr") == 1
    assert sum(n for l, n in by.items() if l is None or l != l) == 2


def test_big_orders_broadcast_inner_semantics(ray_session, tmp_path):
    """An order whose custkey is absent from customer is DROPPED in the
    broadcast branch, exactly like the partitioned join / SQL inner."""
    from katydid_haskell_ray.pipelines import queries as Q

    li = pd.DataFrame({
        "l_orderkey": np.repeat(np.arange(2, dtype=np.int64), 4),
        "l_quantity": 50.0,
        "l_partkey": np.int64(1), "l_suppkey": np.int64(1),
        "l_linenumber": np.int32(1), "l_extendedprice": 1.0,
        "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
        "l_linestatus": "O",
        "l_shipdate": pd.Timestamp("1996-01-01")})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(2, dtype=np.int64),
        "o_custkey": np.array([1, 99], dtype=np.int64),  # 99 missing
        "o_orderstatus": "O", "o_totalprice": 10.0,
        "o_orderdate": pd.Timestamp("1996-01-01"),
        "o_orderpriority": "1-URGENT"})
    cust = pd.DataFrame({"c_custkey": np.array([1], dtype=np.int64),
                         "c_name": ["Customer#1"],
                         "c_nationkey": np.int32(0), "c_acctbal": 0.0,
                         "c_mktsegment": "BUILDING"})
    for name, df in (("lineitem", li), ("orders", orders),
                     ("customer", cust)):
        df.to_parquet(tmp_path / f"{name}.parquet")
    got = Q.big_orders_customers(str(tmp_path)).to_pandas()
    assert got["o_orderkey"].tolist() == [0]
    assert got["c_name"].tolist() == ["Customer#1"]


def test_phash_components_bruteforce(ray_session, sf_dir):
    """Components equal a brute union-find over the Hamming<=3 graph of
    distinct fingerprints, with multiplicity-weighted sizes."""
    from katydid_haskell_ray.pipelines import queries as Q

    img = pd.read_parquet(Q.images_parquet(sf_dir), columns=["phash"])
    counts = img.groupby("phash").size()
    fps = counts.index.to_numpy(dtype=np.int64)
    # brute pairs
    parent = {int(f): int(f) for f in fps}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    in_graph = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            x = (int(fps[i]) ^ int(fps[j])) & 0xFFFFFFFFFFFFFFFF
            if bin(x).count("1") <= 3:
                union(int(fps[i]), int(fps[j]))
                in_graph.add(int(fps[i]))
                in_graph.add(int(fps[j]))
    ref = {}
    for f in in_graph:
        r = find(f)
        st = ref.setdefault(r, [0, 0])
        st[0] += 1
        st[1] += int(counts[f])
    got = Q.images_phash_components(sf_dir).to_pandas() \
        .set_index("comp_rep").sort_index()
    assert len(got) == len(ref)
    for rep, (n_fps, n_rows) in ref.items():
        assert got.loc[rep, "n_fps"] == n_fps
        assert got.loc[rep, "n_rows"] == n_rows


def test_connected_components_empty_graph(ray_session):
    """An empty edge set yields an empty (node, label) Dataset, not a
    schemaless-state crash (the review-confirmed failure)."""
    import pyarrow as pa
    import ray as _ray

    from katydid_haskell_ray.stages.components import connected_components

    empty = _ray.data.from_arrow(pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "hamming": pa.array([], type=pa.int64())}))
    out = connected_components(empty, a_col="a", b_col="b")
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "label"}
