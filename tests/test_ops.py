"""Tests for dedup / similarity / text / multimodal / window operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from katydid_haskell_ray.functions import codecs
from katydid_haskell_ray.functions import text as TX
from katydid_haskell_ray.stages import dedupe as DD
from katydid_haskell_ray.stages import multimodal as MM
from katydid_haskell_ray.stages import similarity as SIM


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data
    texts = [f"unique document number {i} with words " +
             " ".join(f"w{(i * 7 + j) % 50}" for j in range(20))
             for i in range(100)]
    # near-dups: 100..109 copy 0..9 with one appended token
    ids = list(range(100)) + list(range(100, 110))
    texts += [texts[i] + " extra" for i in range(10)]
    # exact dups: 200..204 copy 20..24
    ids += list(range(200, 205))
    texts += [texts[i] for i in range(20, 25)]
    return ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                         "text": pa.array(texts)}))


def test_exact_dedupe(docs_ds):
    kept = sorted(DD.exact_dedupe(docs_ds).to_pandas()["doc_id"])
    assert len(kept) == 110  # 115 rows - 5 exact dups
    assert all(k < 200 for k in kept)  # originals (min ids) survive


def test_minhash_lsh_matches_bruteforce(docs_ds):
    clusters, kept_ds = DD.minhash_dedupe(docs_ds, threshold=0.5, concurrency=2)
    kept = set(kept_ds.to_pandas()["doc_id"])
    texts = dict(zip(docs_ds.to_pandas()["doc_id"], docs_ds.to_pandas()["text"]))
    brute = DD.ngram_jaccard_pairs_bruteforce(texts, threshold=0.5)
    # every brute-force pair must land in the same LSH cluster
    cl = dict(zip(clusters["id"], clusters["cluster"]))
    missed = [(a, b) for a, b, _ in brute if cl.get(a, a) != cl.get(b, b)]
    assert not missed, f"LSH missed {len(missed)}/{len(brute)} true pairs"
    # exact + near dup copies must be dropped
    assert all(i not in kept for i in range(200, 205))
    assert all(i not in kept for i in range(100, 110))


def test_minhash_tail_paths_agree(docs_ds):
    """The size-adaptive tail must be a pure latency optimization: the
    single-task small path and the fully distributed large path (forced via
    small_tail_max_pairs=0) produce identical clusters and kept sets."""
    small_cl, small_kept = DD.minhash_dedupe(docs_ds, threshold=0.5,
                                             concurrency=2)
    big_cl, big_kept = DD.minhash_dedupe(docs_ds, threshold=0.5,
                                         concurrency=2,
                                         small_tail_max_pairs=0)
    pd.testing.assert_frame_equal(small_cl.reset_index(drop=True),
                                  big_cl.reset_index(drop=True))
    assert (set(small_kept.to_pandas()["doc_id"])
            == set(big_kept.to_pandas()["doc_id"]))


def test_simhash_pairs(docs_ds):
    pairs = DD.simhash_near_pairs(docs_ds, max_hamming=6,
                                  concurrency=2).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    # exact dups have identical simhash -> always found
    for orig, copy in zip(range(20, 25), range(200, 205)):
        assert (orig, copy) in got, (orig, copy)
    # exactness: matches the brute-force O(n^2) pair set
    import itertools
    fp = DD.simhash_batch(pa.Table.from_pandas(docs_ds.to_pandas()))
    ids = fp.column("doc_id").to_pylist()
    sims = fp.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
    want = set()
    for i, j in itertools.combinations(range(len(ids)), 2):
        if bin(int(sims[i] ^ sims[j])).count("1") <= 6:
            a, b = sorted((ids[i], ids[j]))
            if a != b:
                want.add((a, b))
    assert got == want


def test_knn_lsh_recall(ray_session, sf_dir):
    import os
    import ray.data
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    tab = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sel = tab[tab["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    qids, qvecs = sel["vec_id"].tolist(), np.stack(sel["embedding"].to_numpy())
    brute = SIM.knn_topk(ds, qids, qvecs, k=5, concurrency=2)
    approx = SIM.knn_topk_lsh(ds, qids, qvecs, k=5, concurrency=2,
                              nbits=4, probe_hamming=2)
    bset = set(zip(brute["query_id"], brute["vec_id"]))
    aset = set(zip(approx["query_id"], approx["vec_id"]))
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.5, recall  # multi-probe LSH on random vectors
    # self-hit must always survive bucketing
    for q in qids:
        assert (q, q) in aset


def test_knn_ivf_recall(ray_session, sf_dir):
    import os
    import ray.data
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    tab = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sel = tab[tab["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    qids, qvecs = sel["vec_id"].tolist(), np.stack(sel["embedding"].to_numpy())
    brute = SIM.knn_topk(ds, qids, qvecs, k=5, concurrency=2)
    approx = SIM.knn_topk_ivf(ds, qids, qvecs, k=5, concurrency=2,
                              n_centroids=16, nprobe=6)
    bset = set(zip(brute["query_id"], brute["vec_id"]))
    aset = set(zip(approx["query_id"], approx["vec_id"]))
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.5, recall
    # self-hit always lands in its own probe set (probe[0] = argmax centroid)
    for q in qids:
        assert (q, q) in aset
    # deterministic: same centroids, same results
    again = SIM.knn_topk_ivf(ds, qids, qvecs, k=5, concurrency=2,
                             n_centroids=16, nprobe=6)
    pd.testing.assert_frame_equal(approx, again)


def test_text_kernels():
    s = pd.Series(["Hello big world", "", None, "  padded  text  "])
    assert list(TX.token_count(s)) == [3, 0, 0, 2]
    qm = TX.quality_metrics(s)
    assert qm["n_chars"][0] == 15 and qm["n_tokens"][3] == 2
    langs = TX.lang_id(pd.Series([
        "the cat and the dog is in a house",
        "der Hund ist nicht mit der Katze",
        "le chat est dans la maison pour un jour",
        "xyzzy plugh"]))
    assert list(langs) == ["en", "de", "fr", "und"]
    fp = TX.fingerprint64(pd.Series(["abcd efgh", "abcd efgh", "abcd efgx"]))
    assert fp[0] == fp[1] and fp[0] != fp[2]


def test_multimodal_image_ops():
    from katydid_haskell_ray.sources import synth_images as SI
    batch = SI.make_batch(0, 30)
    out = MM.ImageOps(out_w=8, out_h=8, bins=8)(batch)
    assert "bytes" not in out.column_names
    oks = out.column("decode_ok").to_numpy(zero_copy_only=False)
    assert oks.sum() >= 29  # only the corrupt row (i%1000==3) fails
    feat = out.column("feat")
    assert feat.type.list_size == 27
    # thumbnails are decodable PNGs
    thumb = out.column("thumb").to_pylist()[0]
    assert codecs.decode_png(thumb).shape == (8, 8, 3)


def test_multimodal_stubs_gated():
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"xxxx")
    with pytest.raises(NotImplementedError):
        MM.sample_video_frames(b"xxxx")
    wave = MM.decode_audio(b"somebytes" * 100, allow_stub=True)
    assert wave.shape == (1024,) and wave.dtype == np.float32
    frames = MM.sample_video_frames(b"somebytes" * 200, n_frames=4,
                                    allow_stub=True)
    assert len(frames) == 4 and frames[0].shape == (8, 8, 3)
    # deterministic
    assert (MM.decode_audio(b"somebytes" * 100, allow_stub=True) == wave).all()


def test_windowing(ray_session, sf_dir):
    import os
    import ray.data
    from katydid_haskell_ray.stages import window as W
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    agg = W.tumbling_aggregate(ds, width_s=3600).to_pandas()
    ref = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    assert agg["n_events"].sum() == len(ref)
    sess = W.sessionize(ds, gap_s=1800).to_pandas()
    assert sess["n_events"].sum() == len(ref)
    assert (sess["session_end"] >= sess["session_start"]).all()
    # fused per-key rollup == rollup of the per-session rows
    stats = (W.sessionize(ds, gap_s=1800, per_key_stats=True).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    want = (sess.groupby("user_id")
            .agg(n_sessions=("session_seq", "size"),
                 n_events=("n_events", "sum")).reset_index()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(stats, want, check_dtype=False)


def test_bloom_probe_stage(ray_session):
    import pyarrow as pa
    import ray as _ray
    import ray.data
    from katydid_haskell_ray.stages import keys as K
    from katydid_haskell_ray.state import sketches as SK

    vocab_keys = [f"tok{i}" for i in range(1000)]
    bloom = SK.Bloom(1000, 1e-4).add_hashes(SK.hash64_array(vocab_keys))
    ref = _ray.put(bloom)
    tab = pa.table({"k": ["tok1", "tok999", "missing", None, "tok500"]})
    out = ray.data.from_arrow(tab).map_batches(
        K.BloomProbe, fn_constructor_args=(ref, "k"),
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out["check_ref"]) == [True, True, False, False, True]


def test_bloom_probe_nullable_int_batch(ray_session):
    """ADVICE r3: an int64 key batch CONTAINING nulls must probe its
    non-null values against a Bloom built from null-free int64 values —
    the float64 to_pandas round-trip would re-key them all to False."""
    import pyarrow as pa
    import ray as _ray
    import ray.data
    from katydid_haskell_ray.stages import keys as K
    from katydid_haskell_ray.state import sketches as SK

    bloom = SK.Bloom(1000, 1e-4).add_hashes(
        SK.hash64_array(pa.array(range(100), type=pa.int64())))
    ref = _ray.put(bloom)
    tab = pa.table({"k": pa.array([5, None, 42, 5000, None],
                                  type=pa.int64())})
    out = ray.data.from_arrow(tab).map_batches(
        K.BloomProbe, fn_constructor_args=(ref, "k"),
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out["check_ref"]) == [True, False, True, False, False]


def test_build_bloom_from_dataset(ray_session):
    import pyarrow as pa
    import ray.data
    from katydid_haskell_ray.stages import keys as K
    from katydid_haskell_ray.state import sketches as SK

    ds = ray.data.from_arrow(pa.table({"k": [f"v{i}" for i in range(5000)]}))
    bloom = K.build_bloom_from_dataset(ds, "k")
    hits = bloom.contains_hashes(SK.hash64_array([f"v{i}" for i in range(5000)]))
    assert hits.all()
    misses = bloom.contains_hashes(SK.hash64_array([f"x{i}" for i in range(5000)]))
    assert misses.mean() < 0.02


def test_hash_join_matches_pandas(ray_session):
    import pyarrow as pa
    import ray.data
    from katydid_haskell_ray.stages.join import hash_join

    left = pa.table({"k": pa.array([1, 2, 2, 3, 5], type=pa.int64()),
                     "lv": pa.array([10, 20, 21, 30, 50], type=pa.int64())})
    right = pa.table({"k": pa.array([2, 3, 3, 4], type=pa.int64()),
                      "rv": pa.array(["b", "c", "c2", "d"])})
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key="k", left_cols=["lv"], right_cols=["rv"],
                    n_buckets=4).to_pandas()
    exp = left.to_pandas().merge(right.to_pandas(), on="k")
    out_s = out.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    exp_s = exp.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out_s[["k", "lv", "rv"]].astype({"k": "int64", "lv": "int64"}),
                                  exp_s[["k", "lv", "rv"]])


def test_hash_join_left_mark(ray_session):
    """left_mark = all left rows + an EXISTS bool; null keys never match
    on either side (SQL EXISTS semantics)."""
    import pyarrow as pa
    import ray.data
    from katydid_haskell_ray.stages.join import hash_join

    left = pa.table({"k": pa.array([1, 2, None, 3, 5], type=pa.int64())})
    right = pa.table({"k": pa.array([2, 2, None, 4], type=pa.int64())})
    out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    key="k", left_cols=[], right_cols=[], how="left_mark",
                    mark_col="hit", n_buckets=4).to_pandas()
    got = dict(zip(out["k"].fillna(-1).astype(int), out["hit"]))
    assert len(out) == 5
    assert got == {1: False, 2: True, -1: False, 3: False, 5: False}
    # empty right side: all False, all left rows kept
    empty = ray.data.from_arrow(pa.table(
        {"k": pa.array([], type=pa.int64())}))
    out2 = hash_join(ray.data.from_arrow(left), empty, key="k",
                     left_cols=[], right_cols=[], how="left_mark",
                     mark_col="hit", n_buckets=2).to_pandas()
    assert len(out2) == 5 and not out2["hit"].any()


def test_asof_join_keyed_vs_brute(ray_session):
    """Per-key as-of join equals the brute per-row max(right_ts <= ts)
    within the key, with null for keys lacking any prior right row."""
    import ray.data
    from katydid_haskell_ray.stages.join import asof_join_keyed

    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "k": rng.integers(0, 12, size=200),
        "ts": rng.integers(0, 1000, size=200).astype(np.int64),
        "payload": np.arange(200, dtype=np.int64)})
    # keys 10, 11 have NO right rows at all
    right = pd.DataFrame({
        "k": rng.integers(0, 10, size=80),
        "ts": rng.integers(0, 1000, size=80).astype(np.int64)})
    out = asof_join_keyed(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="k", ts_col="ts", out_col="m",
        left_cols=["payload"], n_buckets=4).to_pandas() \
        .sort_values("payload").reset_index(drop=True)

    def brute(row):
        c = right[(right["k"] == row["k"]) & (right["ts"] <= row["ts"])]
        return np.nan if c.empty else c["ts"].max()

    want = left.sort_values("payload").reset_index(drop=True)
    want_m = want.apply(brute, axis=1)
    got_m = out["m"].astype("float64")
    assert len(out) == len(left)
    assert np.allclose(got_m.fillna(-1), want_m.fillna(-1))
    assert got_m.isna().any()  # the no-right-rows keys produce nulls


def test_asof_join_keyed_timestamp_inputs(ray_session):
    """datetime64 ts columns normalize to epoch-us int64 before the merge
    (ADVICE r4: the Int64 cast used to raise on timestamp inputs), and a
    ns-resolution source scales to us — never a raw int64 view."""
    import ray.data
    from katydid_haskell_ray.stages.join import asof_join_keyed

    left = pd.DataFrame({
        "k": np.array([1, 1, 2, 3], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:01",
                              "2024-01-01 00:00:09", "2024-01-01 00:00:02"]),
        "payload": np.arange(4, dtype=np.int64)})
    right = pd.DataFrame({
        "k": np.array([1, 1, 2], dtype=np.int64),
        "ts": pd.to_datetime(["2024-01-01 00:00:02", "2024-01-01 00:00:04",
                              "2024-01-01 00:00:07"])})
    out = asof_join_keyed(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="k", ts_col="ts", out_col="m",
        left_cols=["payload"], n_buckets=2).to_pandas() \
        .sort_values("payload").reset_index(drop=True)

    def us(s):
        return int(pd.Timestamp(s).value // 1000)

    assert len(out) == 4
    # k=1 ts=05 -> right 04; k=1 ts=01 -> null; k=2 ts=09 -> 07; k=3 -> null
    got = out["m"].astype("float64")
    assert got[0] == us("2024-01-01 00:00:04")
    assert pd.isna(got[1])
    assert got[2] == us("2024-01-01 00:00:07")
    assert pd.isna(got[3])
    # left ts column came back as epoch-us int64, not raw ns
    assert out["ts"].to_numpy().dtype == np.int64
    assert out["ts"][0] == us("2024-01-01 00:00:05")


def test_asof_lookup(ray_session):
    import pyarrow as pa
    import ray.data
    from katydid_haskell_ray.stages.join import asof_lookup

    timeline = np.array([100, 200, 300], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "t": pa.array([50, 100, 250, 999], type=pa.int64())}))
    out = asof_lookup(ds, ts_col="t", timeline=timeline, out_col="last") \
        .to_pandas().sort_values("id")
    assert out["last"].tolist()[1:] == [100, 200, 300]
    assert pd.isna(out["last"].iloc[0])  # before the first timeline entry


def test_stats_partial_all_null_block(ray_session):
    """The stats partial must not crash on an all-null chunk and its
    neutral elements must not perturb the global min/max."""
    import ray.data
    import katydid_haskell_ray.pipelines.queries as Q
    t_null = pa.table({"w": pa.array([None, None], type=pa.int64()),
                       "h": pa.array([None, None], type=pa.int64()),
                       "phash": pa.array([None, None], type=pa.int64())})
    t_val = pa.table({"w": pa.array([3, 9], type=pa.int64()),
                      "h": pa.array([4, 2], type=pa.int64()),
                      "phash": pa.array([7, 8], type=pa.int64())})
    out = Q.stats_rollup(ray.data.from_arrow([t_null, t_val])).to_pandas()
    w = out[out["col"] == "w"].iloc[0]
    assert (w["n"], w["nulls"], w["min_v"], w["max_v"]) == (4, 2, 3, 9)


def test_hopping_aggregate(ray_session, sf_dir):
    import os
    import ray.data
    from katydid_haskell_ray.stages import window as W
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    agg = W.hopping_aggregate(ds, width_s=3600, hop_s=1800).to_pandas()
    ref = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    # every event lands in exactly width/hop = 2 windows
    assert agg["n_events"].sum() == 2 * len(ref)
    # window starts are hop-aligned and each tumbling window's rows are a
    # subset of the union of the two hopping windows covering it
    assert (agg["window_start_s"] % 1800 == 0).all()
    with pytest.raises(ValueError):
        W.hopping_aggregate(ds, width_s=3600, hop_s=1000)


def test_range_lookup(ray_session):
    import ray.data
    from katydid_haskell_ray.stages.join import range_lookup
    tab = pa.table({"x": pa.array([1.0, 5.0, 10.0, 15.0, 99.0])})
    ds = ray.data.from_arrow(tab)
    inner = range_lookup(ds, value_col="x",
                         lower=np.array([5.0, 10.0]),
                         upper=np.array([10.0, 20.0]),
                         labels=np.array(["a", "b"])).to_pandas()
    assert list(inner["x"]) == [5.0, 10.0, 15.0]
    assert list(inner["band"]) == ["a", "b", "b"]
    left = range_lookup(ds, value_col="x", how="left",
                        lower=np.array([5.0, 10.0]),
                        upper=np.array([10.0, 20.0]),
                        labels=np.array(["a", "b"])).to_pandas()
    assert len(left) == 5 and left["band"].isna().sum() == 2
    with pytest.raises(ValueError):
        range_lookup(ds, value_col="x", lower=np.array([0.0, 1.0]),
                     upper=np.array([2.0, 3.0]), labels=np.array(["a", "b"]))


def test_exact_quantiles_match_duckdb(ray_session):
    import duckdb
    import ray.data
    from katydid_haskell_ray.stages import quantiles as QT
    rng = np.random.default_rng(7)
    for n in (1, 2, 37, 5000):
        vals = rng.integers(0, 40, n).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
        hist = QT.value_histogram(ds, "v")
        got = QT.quantiles_from_histogram(
            hist, {25: 0.25, 50: 0.5, 90: 0.9, 99: 0.99}, value_name="v")
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": vals}))
        for _, r in got.iterrows():
            q = {25: 0.25, 50: 0.5, 90: 0.9, 99: 0.99}[r["q_pct"]]
            want = con.execute(
                f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert r["v"] == want, (n, q)


def test_hash_sample_partition_invariant(ray_session, sf_dir):
    # the sample is a pure per-row predicate: the kept set must equal the
    # pandas-computed expectation and survive any repartitioning
    import os
    import ray.data
    from katydid_haskell_ray.pipelines import queries as Q
    got = set(Q.sampled_docs(sf_dir).to_pandas()["doc_id"])
    ref = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id"])["doc_id"].to_numpy()
    want = set(ref[(ref * 2654435761) % 4294967296 % 100 < 10])
    assert got == want and len(want) > 0
    repart = (ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
              .repartition(7))

    def f(b):
        import pyarrow as _pa
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(_pa.array((ids * 2654435761) % 4294967296 % 100 < 10))

    got2 = set(repart.map_batches(f, batch_format="pyarrow")
               .to_pandas()["doc_id"])
    assert got2 == want


def test_rolling_sum_matches_pandas(ray_session, sf_dir):
    import os
    import ray.data
    from katydid_haskell_ray.stages import window as W
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "user_id", "ts", "value"])
    got = (W.rolling_sum(ds, key="user_id", order_cols=("ts", "event_id"),
                         value_col="value", window=3, out="r")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    ref = (pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
           .sort_values(["user_id", "ts", "event_id"]))
    ref["r"] = (ref.groupby("user_id")["value"]
                .rolling(3, min_periods=1).sum().reset_index(drop=True)
                .to_numpy())
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(got["r"].to_numpy(), ref["r"].to_numpy())


def test_grouped_quantiles(ray_session):
    import duckdb
    import ray.data
    from katydid_haskell_ray.stages import quantiles as QT
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.choice(["x", "y", "z"], 500),
                       "v": rng.integers(0, 30, 500).astype(np.int64)})
    hist = QT.grouped_value_histogram(ray.data.from_pandas(df), "g", "v")
    got = (QT.grouped_quantiles_from_histogram(hist, "g", {50: 0.5, 90: 0.9},
                                               value_name="v")
           .sort_values(["g", "q_pct"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT g, 50 AS q_pct, quantile_disc(v, 0.5) AS v FROM t GROUP BY g
        UNION ALL SELECT g, 90, quantile_disc(v, 0.9) FROM t GROUP BY g
        ORDER BY g, q_pct""").df()
    assert (got["v"].to_numpy() == want["v"].to_numpy()).all()


def test_hamming_near_pairs_exact(ray_session):
    import itertools
    import ray.data
    rng = np.random.default_rng(11)
    base = rng.integers(-2**62, 2**62, 40, dtype=np.int64)
    fps = list(base)
    # near copies: flip 1-3 bits of the first ten
    for i in range(10):
        flip = np.int64(0)
        for b in rng.choice(64, 1 + i % 3, replace=False):
            flip ^= np.int64(1) << np.int64(int(b))
        fps.append(base[i] ^ flip)
    ids = [f"id{i:03d}" for i in range(len(fps))]
    ds = ray.data.from_arrow(pa.table({
        "image_id": pa.array(ids),
        "phash": pa.array(np.array(fps, dtype=np.int64))}))
    got = DD.hamming_near_pairs(ds, id_col="image_id", fp_col="phash",
                                max_hamming=3).to_pandas()
    want = set()
    u = np.array(fps, dtype=np.int64).view(np.uint64)
    for i, j in itertools.combinations(range(len(fps)), 2):
        d = bin(int(u[i] ^ u[j])).count("1")
        if d <= 3:
            want.add((ids[i], ids[j], d))
    assert set(map(tuple, got.to_numpy())) == want and len(got) == len(want)


def test_json_flatten_types(ray_session):
    import ray.data
    from katydid_haskell_ray.stages.flatten import JsonFlatten
    tab = pa.table({"id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                    "j": pa.array(['{"k": 7, "s": "x", "d": 1.5, "b": true}',
                                   '{"k": "notint"}', '{"other": 1}',
                                   'not json', None, '{"k": true}'])})
    out = (ray.data.from_arrow(tab)
           .map_batches(JsonFlatten,
                        fn_constructor_args=("j", {"k": ("k", "int"),
                                                   "s": ("s", "string"),
                                                   "d": ("d", "double"),
                                                   "b": ("b", "bool")},
                                             ["id"]),
                        batch_format="pyarrow", concurrency=2)
           .to_pandas().sort_values("id"))
    assert list(out["k"].astype("Int64")) == [7] + [pd.NA] * 5
    assert out["s"].iloc[0] == "x" and out["s"].isna().sum() == 5
    assert out["d"].iloc[0] == 1.5
    # bool is not an int; int is not a bool (katydid type strictness)
    assert out["b"].iloc[0] == True  # noqa: E712
    assert out["b"].isna().iloc[5]  # {"k": true} carries no "b" key


def test_grouped_topk(ray_session):
    import ray.data
    from katydid_haskell_ray.stages.topk import grouped_topk
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 300),
                       "v": rng.permutation(300).astype(np.int64),
                       "id": np.arange(300, dtype=np.int64)})
    got = (grouped_topk(ray.data.from_pandas(df), group_cols=["g"], k=4,
                        by=["v", "id"], ascending=[False, True])
           .to_pandas().sort_values(["g", "v"],
                                    ascending=[True, False])
           .reset_index(drop=True))
    want = (df.sort_values(["v", "id"], ascending=[False, True])
            .groupby("g", sort=False).head(4)
            .sort_values(["g", "v"], ascending=[True, False])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantiles_cont_match_duckdb(ray_session):
    import duckdb
    import ray.data
    from katydid_haskell_ray.stages import quantiles as QT
    rng = np.random.default_rng(13)
    for n in (1, 2, 41, 4000):
        vals = rng.integers(0, 35, n).astype(np.int64)
        hist = QT.value_histogram(
            ray.data.from_arrow(pa.table({"v": pa.array(vals)})), "v")
        got = QT.quantiles_cont_from_histogram(
            hist, {25: 0.25, 50: 0.5, 90: 0.9}, value_name="v")
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": vals}))
        for _, r in got.iterrows():
            q = {25: 0.25, 50: 0.5, 90: 0.9}[r["q_pct"]]
            want = con.execute(
                f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
            assert r["v"] == want, (n, q, r["v"], want)


def test_new_ops_empty_inputs(ray_session):
    import ray.data
    from katydid_haskell_ray.stages import quantiles as QT
    from katydid_haskell_ray.stages.join import range_lookup
    from katydid_haskell_ray.stages.topk import grouped_topk
    empty = ray.data.from_arrow(pa.table({
        "v": pa.array([], type=pa.int64()),
        "g": pa.array([], type=pa.string())}))
    # quantiles over zero rows: NULL values like SQL
    q = QT.quantiles_from_histogram(QT.value_histogram(empty, "v"), {50: 0.5})
    assert len(q) == 1 and q["value"].isna().all()
    qc = QT.quantiles_cont_from_histogram(
        QT.value_histogram(empty, "v"), {50: 0.5})
    assert qc["value"].isna().all()
    # range lookup and grouped topk over zero rows: zero rows out
    fempty = ray.data.from_arrow(pa.table({"x": pa.array([], type=pa.float64())}))
    assert range_lookup(fempty, value_col="x", lower=np.array([0.0]),
                        upper=np.array([1.0]),
                        labels=np.array(["a"])).count() == 0
    assert grouped_topk(empty, group_cols=["g"], k=2, by=["v"],
                        ascending=[True]).count() == 0
    # hamming pairs over zero rows
    fp = ray.data.from_arrow(pa.table({
        "id": pa.array([], type=pa.string()),
        "fp": pa.array([], type=pa.int64())}))
    assert DD.hamming_near_pairs(fp, id_col="id", fp_col="fp").count() == 0


def test_knn_join_matches_bruteforce(ray_session, sf_dir):
    import os
    import ray.data
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    got = (SIM.knn_join(ds, k=2, concurrency=2).to_pandas()
           .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    tab = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    m = np.stack(tab["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = tab["vec_id"].to_numpy()
    sims = np.round(m @ m.T, 6)
    np.fill_diagonal(sims, -np.inf)
    for qi in range(min(20, len(ids))):
        order = np.lexsort((ids, -sims[qi]))[:2]
        sub = got[got["vec_id"] == ids[qi]].sort_values("rank")
        assert list(sub["neighbor"]) == list(ids[order]), ids[qi]


def test_knn_join_ivf_recall(ray_session, sf_dir):
    import os
    import ray.data
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    exact = SIM.knn_join(ds, k=2, concurrency=2).to_pandas()
    approx = SIM.knn_join_ivf(ds, k=2, n_centroids=16, nprobe=6).to_pandas()
    eset = set(zip(exact["vec_id"], exact["neighbor"]))
    aset = set(zip(approx["vec_id"], approx["neighbor"]))
    recall = len(eset & aset) / len(eset)
    assert recall >= 0.5, recall
    # every vector gets neighbors, ranks are 1..k
    assert set(approx["rank"]) == {1, 2}
    assert approx.groupby("vec_id").size().max() <= 2


def test_resolve_exchange_derives_bucket_count(ray_session):
    """Bucket count must scale with the exchange's materialized bytes
    (constant n_buckets = one bucket holds total/N at 100x)."""
    import ray.data
    from katydid_haskell_ray.stages.exchange import (
        BUCKET_SKEW_FACTOR, bucket_map_groups, resolve_exchange)
    from katydid_haskell_ray.stages.keys import add_hash_fn

    n = 20_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64) % 997,
                       "v": np.ones(n, dtype=np.int64)})
    bucketed = (ray.data.from_pandas(df)
                .map_batches(add_hash_fn("k"), batch_format="pyarrow"))

    # tiny target emulates a 1000x-inflated input: count grows ~bytes/target
    mat, nb, max_b = resolve_exchange(bucketed, target_bytes=16_384)
    sz = mat.size_bytes()
    assert nb == min(65536, max(8, -(-sz // 16_384)))
    assert nb > 8  # actually derived, not the floor
    # the asserted reduce-task bound documents the skew allowance
    assert max_b == BUCKET_SKEW_FACTOR * max(16_384, -(-sz // nb))

    # modular exchange at the derived count is exact: per-key sums match
    got = bucket_map_groups(
        mat,
        lambda g: g.groupby("k", as_index=False)["v"].sum(),
        n_buckets=nb, modular=True, max_bucket_bytes=max_b,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    expect = df.groupby("k", as_index=False)["v"].sum()
    assert got["v"].tolist() == expect["v"].tolist()
    assert got["k"].tolist() == expect["k"].tolist()

    # explicit n_buckets pins the count and disables the bound
    _, nb2, max_b2 = resolve_exchange(bucketed, 32)
    assert (nb2, max_b2) == (32, None)


def test_exchange_bucket_byte_bound_trips(ray_session):
    """A bucket beyond the skew allowance fails loudly, not OOM-silently."""
    import ray.data
    from katydid_haskell_ray.stages.exchange import bucket_map_groups
    from katydid_haskell_ray.stages.keys import add_hash_fn

    df = pd.DataFrame({"k": np.zeros(5000, dtype=np.int64),  # one hot key
                       "v": np.arange(5000, dtype=np.int64)})
    bucketed = (ray.data.from_pandas(df)
                .map_batches(add_hash_fn("k"), batch_format="pyarrow"))
    with pytest.raises(Exception, match="sizing bound"):
        bucket_map_groups(bucketed, lambda g: g, n_buckets=16,
                          modular=True, max_bucket_bytes=1024).materialize()


def test_bloom_prefilter_fp_rate_vs_exact_twin(ray_session, sf_dir):
    """docs_user_ref_bloom: the Bloom 'maybe' set vs the exact membership
    set — false-positive rate must be within a small multiple of the
    configured 1e-3, and the final output must equal exact semantics."""
    import os
    import ray.data
    from katydid_haskell_ray.stages import keys as K

    users = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                  columns=["user_id"])
    bloom = K.build_bloom_from_dataset(users, "user_id", fp_rate=1e-3)
    exact = frozenset(pd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id"])["user_id"].unique())
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])
    import ray as _ray
    probe = K.BloomProbe(_ray.put(bloom), "doc_id", "maybe")
    out = probe(pa.table({"doc_id": pa.array(docs["doc_id"])}))
    maybe = out.column("maybe").to_numpy(zero_copy_only=False)
    truth = docs["doc_id"].isin(exact).to_numpy()
    assert (maybe | ~truth).all() if False else not (truth & ~maybe).any()  # no false negatives
    absent = (~truth).sum()
    fps = int((maybe & ~truth).sum())
    assert fps <= max(2, int(0.01 * absent)), (fps, absent)

    # end-to-end: the query's output equals the exact semi-join bit
    import __ray_entry__ as E
    got = (E.queries()["docs_user_ref_bloom"](sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    expect = docs.sort_values("doc_id").reset_index(drop=True)["doc_id"] \
        .isin(exact).to_numpy()
    assert (got["ref_ok"].to_numpy() == expect).all()


def test_jaccard_near_pairs_exact_vs_bruteforce(docs_ds):
    """PPJoin prefix filtering must be lossless: the distributed exact
    Jaccard pairs equal the O(n^2) brute-force set at every threshold."""
    texts = dict(zip(docs_ds.to_pandas()["doc_id"],
                     docs_ds.to_pandas()["text"]))
    for t in (0.3, 0.5, 0.8):
        got = DD.jaccard_near_pairs(docs_ds, threshold=t).to_pandas()
        gset = {(a, b) for a, b in zip(got["a"], got["b"])}
        brute = DD.ngram_jaccard_pairs_bruteforce(texts, threshold=t)
        bset = {(a, b) for a, b, _ in brute}
        assert gset == bset, (t, gset ^ bset)
        # scores agree with the brute jaccard to the floored micro
        bj = {(a, b): j for a, b, j in brute}
        for (a, b), jm in zip(zip(got["a"], got["b"]), got["j_micro"]):
            assert jm == int(np.floor(1e6 * bj[(a, b)]))


def test_revenue_by_region_broadcast_and_join_paths_agree(ray_session,
                                                          sf_dir):
    """The star join's customer hop auto-selects broadcast vs partitioned
    by dimension byte size; both paths must produce identical results."""
    from katydid_haskell_ray.pipelines import queries as Q

    bc = Q.revenue_by_region(sf_dir).to_pandas() \
        .sort_values("r_name").reset_index(drop=True)
    pj = Q.revenue_by_region(sf_dir, broadcast_max_bytes=0).to_pandas() \
        .sort_values("r_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj[bc.columns], check_dtype=False)
    assert len(bc) == 5 and (bc["n_orders"] > 0).all()


def test_jaccard_hot_shingle_bounded_and_exact(ray_session, monkeypatch):
    """r3 verdict #3: one shingle in >=50% of docs must neither blow up a
    reduce task (posting self-merges run chunked) nor change the exact
    pair set (the hot-last prefix order is still a total order).  Forces
    the chunked path with a tiny slab bound and a hot_df of 2."""
    import ray.data

    # 60 docs; every EVEN doc contains the same hot trigram "alpha beta
    # gamma"; planted near-dup pairs on top
    texts, ids = [], []
    for i in range(60):
        base = " ".join(f"tok{(i * 5 + j) % 97}" for j in range(15))
        if i % 2 == 0:
            base = "alpha beta gamma " + base
        texts.append(base)
        ids.append(i)
    for i in range(8):  # near-dups of 0..7
        texts.append(texts[i] + " tail")
        ids.append(100 + i)
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "text": pa.array(texts)}))

    monkeypatch.setattr(DD, "MERGE_CHUNK_PAIRS", 64)  # force chunking
    got = DD.jaccard_near_pairs(ds, threshold=0.5, hot_df=2).to_pandas()
    gset = {(a, b) for a, b in zip(got["a"], got["b"])}
    brute = DD.ngram_jaccard_pairs_bruteforce(
        dict(zip(ids, texts)), threshold=0.5)
    bset = {(a, b) for a, b, _ in brute}
    assert gset == bset, gset ^ bset
    assert len(bset) >= 8  # planted pairs present
    bj = {(a, b): j for a, b, j in brute}
    for (a, b), jm in zip(zip(got["a"], got["b"]), got["j_micro"]):
        assert jm == int(np.floor(1e6 * bj[(a, b)]))


def test_self_merge_chunked_equals_full_merge():
    """_self_merge_chunked(consume) == consume(full self-merge) for a
    slab-insensitive consumer, at several slab bounds incl. degenerate."""
    rng = np.random.default_rng(3)
    g = pd.DataFrame({
        "sh": rng.integers(0, 12, size=300),
        "doc_id": rng.integers(0, 40, size=300),
        "sz": rng.integers(1, 9, size=300)}).drop_duplicates(
            ["sh", "doc_id"]).reset_index(drop=True)

    def consume(m: pd.DataFrame) -> pd.DataFrame:
        a = m["doc_id_x"].to_numpy()
        b = m["doc_id_y"].to_numpy()
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    want = consume(g.merge(g, on="sh")) \
        .groupby(["a", "b"], as_index=False).size() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    for max_pairs in (1, 7, 100, 10**9):
        got = DD._self_merge_chunked(g, consume, max_pairs=max_pairs) \
            .groupby(["a", "b"], as_index=False).size() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want), max_pairs


def test_edit1_near_pairs_vs_bruteforce(ray_session):
    """FastSS deletion-index join must equal brute-force DP levenshtein<=1
    over a random short-string corpus with planted single edits."""
    import itertools
    import ray.data

    def lev(a, b):  # independent full DP reference
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(7)
    alpha = "abcde"
    base = ["".join(rng.choice(list(alpha), size=rng.integers(3, 9)))
            for _ in range(60)]
    # planted edits: deletion, insertion, substitution
    mut = [s[1:] for s in base[:10]] + [s + "f" for s in base[10:20]] + \
        ["f" + s[1:] for s in base[20:30]]
    corpus = sorted(set(base + mut))
    ds = ray.data.from_arrow(pa.table({"caption": pa.array(corpus)}))
    got = DD.edit1_near_pairs(ds, col="caption").to_pandas()
    gset = {(a, b) for a, b in zip(got["a"], got["b"])}
    want = {(a, b) for a, b in itertools.combinations(corpus, 2)
            if lev(a, b) <= 1}
    assert gset == want, gset ^ want
    assert want  # planted edits guarantee a non-trivial pair set


def test_ivf_persisted_matches_inmemory(ray_session, sf_dir, tmp_path):
    """The persisted cell-partitioned IVF index must return exactly the
    in-memory IVF results under shared centroids, while reading only the
    probed cell= directories."""
    import os
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = SIM.train_centroids(ds, n_centroids=16)
    idx = str(tmp_path / "ivf")
    SIM.build_ivf_index(ds, idx, centroids=cents)
    # layout: hive cell dirs + persisted centroids
    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert len(cells) > 1 and os.path.exists(os.path.join(idx, "centroids.npy"))

    tab = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sel = tab[tab["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    qids, qvecs = sel["vec_id"].tolist(), np.stack(sel["embedding"].to_numpy())
    mem = SIM.knn_topk_ivf(ds, qids, qvecs, k=5, nprobe=6, centroids=cents,
                           concurrency=2)
    per = SIM.knn_topk_ivf_persisted(idx, qids, qvecs, k=5, nprobe=6)
    pd.testing.assert_frame_equal(
        mem[["query_id", "vec_id", "rank"]].reset_index(drop=True),
        per[["query_id", "vec_id", "rank"]].reset_index(drop=True))


def test_exchange_and_dedupe_empty_inputs(ray_session):
    """Empty/degenerate inputs flow through the auto-sized exchanges:
    resolve_exchange sizes the floor bucket count and operators return
    empty results instead of erroring."""
    import ray.data
    from katydid_haskell_ray.stages.exchange import resolve_exchange
    from katydid_haskell_ray.stages.keys import add_hash_fn

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    mat, nb, max_b = resolve_exchange(
        empty.map_batches(add_hash_fn("doc_id"), batch_format="pyarrow"))
    assert nb == 8  # the floor

    assert DD.exact_dedupe(empty).count() == 0
    assert DD.jaccard_near_pairs(empty, threshold=0.5).count() == 0
    assert DD.edit1_near_pairs(
        empty.map_batches(lambda t: t.select(["text"])
                          .rename_columns(["caption"]),
                          batch_format="pyarrow"),
        col="caption").count() == 0


def test_hierarchical_exchange_equals_flat(ray_session, monkeypatch):
    """Past _RETURNS_CAP the shard plan goes two-round (map -> regroup ->
    reduce); with the cap shrunk to force that path, bucket_map_groups
    and hash_join must produce exactly the flat-path results."""
    import ray.data
    from katydid_haskell_ray.stages import exchange as EX
    from katydid_haskell_ray.stages.join import hash_join
    from katydid_haskell_ray.stages.keys import add_hash_fn

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 200, size=5000),
                       "v": rng.integers(0, 100, size=5000)})
    ds = ray.data.from_pandas(df).repartition(7).map_batches(
        add_hash_fn("k"), batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    flat = EX.bucket_map_groups(ds, per_bucket, n_buckets=16, modular=True) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    monkeypatch.setattr(EX, "_RETURNS_CAP", 4)
    hier = EX.bucket_map_groups(ds, per_bucket, n_buckets=16, modular=True) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(hier[["k", "v"]], flat[["k", "v"]])
    want = df.groupby("k", as_index=False)["v"].sum()
    pd.testing.assert_frame_equal(
        hier[["k", "v"]].astype("int64"), want.astype("int64"))

    # cogroup through the hierarchical plan: hash_join vs pandas merge
    right = pd.DataFrame({"k": np.arange(0, 200, 3),
                          "r": np.arange(0, 200, 3) * 10})
    out = hash_join(ray.data.from_pandas(df), ray.data.from_pandas(right),
                    key="k", left_cols=["v"], right_cols=["r"],
                    n_buckets=16).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    exp = df.merge(right, on="k").sort_values(["k", "v"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["k", "v", "r"]].astype("int64"),
                                  exp[["k", "v", "r"]].astype("int64"))


def test_audio_video_actor_stages(ray_session):
    """The audio/video actor-pool plumbing runs end-to-end on Ray with the
    deterministic stub codecs: binary column in, fixed-size-list feature
    column + decode_ok out; stub-gated rows fail closed."""
    import ray.data

    n = 40
    tab = pa.table({
        "audio_id": pa.array(np.arange(n, dtype=np.int64)),
        "bytes": pa.array([bytes([i % 251]) * 4096 for i in range(n)],
                          type=pa.binary())})
    ds = ray.data.from_arrow(tab)
    out = ds.map_batches(MM.AudioOps, fn_constructor_kwargs={"allow_stub": True},
                         batch_format="pyarrow", batch_size=16,
                         concurrency=2).to_pandas()
    assert len(out) == n and out["decode_ok"].all()
    assert all(len(f) == 16 for f in out["audio_feat"])
    # deterministic across runs
    out2 = ds.map_batches(MM.AudioOps,
                          fn_constructor_kwargs={"allow_stub": True},
                          batch_format="pyarrow", batch_size=16,
                          concurrency=2).to_pandas().sort_values("audio_id")
    a = np.stack(out.sort_values("audio_id")["audio_feat"].to_numpy())
    b = np.stack(out2["audio_feat"].to_numpy())
    assert (a == b).all()

    vtab = pa.table({
        "video_id": pa.array(np.arange(n, dtype=np.int64)),
        "bytes": pa.array([bytes([i % 13]) * 2048 for i in range(n)],
                          type=pa.binary())})
    vout = (ray.data.from_arrow(vtab)
            .map_batches(MM.VideoOps,
                         fn_constructor_kwargs={"allow_stub": True},
                         batch_format="pyarrow", batch_size=16,
                         concurrency=2).to_pandas())
    assert len(vout) == n and vout["decode_ok"].all()
    assert all(len(f) == 4 * (3 + 3 * 4) for f in vout["video_feat"])

    # gated: without allow_stub every row fails closed, schema intact
    gated = ds.map_batches(MM.AudioOps, batch_format="pyarrow",
                           batch_size=16, concurrency=2).to_pandas()
    assert not gated["decode_ok"].any()


def test_cogroup_bucket_byte_bound_trips(ray_session):
    """The auto-sized join exchange fails loudly past the skew allowance."""
    import ray.data
    from katydid_haskell_ray.stages.exchange import bucket_cogroup
    from katydid_haskell_ray.stages.keys import add_hash_fn

    df = pd.DataFrame({"k": np.zeros(20000, dtype=np.int64),
                       "v": np.arange(20000, dtype=np.int64)})
    side = (ray.data.from_pandas(df)
            .map_batches(add_hash_fn("k"), batch_format="pyarrow"))
    with pytest.raises(Exception, match="sizing bound"):
        bucket_cogroup(side, side, lambda l, r: l, n_buckets=None,
                       modular=True, target_bytes=1024).materialize()
