"""Round-5 regression tests: the nullable-output parity convention (no
pandas extension dtype may leave a query — DuckDB ``.df()`` lands nullable
BIGINT as float64/NaN and the driver hashes the two differently), the
NULL-safe chi2 oracle joins, and revenue_by_region branch agreement on
referential violations."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _to_pandas(res):
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_prev_value_dtype_and_oracle(ray_session):
    """events_prev_value emits prev_cents as plain float64/NaN (the r4
    gate failed on a value-identical result solely because the column
    shipped as pandas 'Int64') and matches the LAG oracle exactly."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = _to_pandas(Q.events_prev_value(SF))
    assert str(got["prev_cents"].dtype) == "float64", \
        "nullable outputs must be float64/NaN, never an extension dtype"

    con = duckdb.connect()
    exp = con.execute(f"""
        SELECT event_id, user_id,
               LAG(CAST(floor(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents
        FROM read_parquet('{SF}/events.parquet')
    """).df()
    g = got.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["user_id"].to_numpy() == e["user_id"].to_numpy()).all()
    assert np.allclose(g["prev_cents"].fillna(-1).to_numpy(),
                       e["prev_cents"].fillna(-1).to_numpy())
    assert g["prev_cents"].isna().sum() == e["prev_cents"].isna().sum()


def test_no_extension_dtype_in_nullable_outputs(ray_session):
    """The nullable-output convention, enforced over every query that
    emits SQL-NULL-bearing columns: no pandas extension dtype survives to
    the driver-facing result."""
    from katydid_haskell_ray.pipelines import queries as Q

    nullable_emitters = [
        Q.events_prev_value, Q.events_user_asof, Q.events_asof_order,
        Q.building_urgent_outer,
    ]
    for fn in nullable_emitters:
        df = _to_pandas(fn(SF))
        bad = [c for c in df.columns
               if pd.api.types.is_extension_array_dtype(df[c].dtype)]
        assert not bad, f"{fn.__name__} leaks extension dtypes: {bad}"


def test_chi2_oracle_null_safe_joins(ray_session, tmp_path):
    """The chi2 oracle's margin joins are NULL-safe (IS NOT DISTINCT
    FROM): with a NULL lang present, engine and oracle agree on every
    output — plain USING joins would silently drop the NULL-keyed cells
    (ADVICE r4)."""
    import __ray_entry__ as RE
    from katydid_haskell_ray.pipelines import queries as Q

    d = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": "t", "n_chars": np.int64(1),
        "lang": ["en", "en", None, None, "fr", "fr", "en", None, "fr", None],
        "source": ["a", "b", "a", "b", "a", "a", "a", "a", None, "b"]})
    d.to_parquet(tmp_path / "documents.parquet")
    got = _to_pandas(Q.docs_lang_source_chi2(str(tmp_path)))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(RE.oracle_sql()["docs_lang_source_chi2"]).df()
    assert int(got["chi2_micro"][0]) == int(exp["chi2_micro"][0])
    assert int(got["dof"][0]) == int(exp["dof"][0])
    assert int(got["n_cells"][0]) == int(exp["n_cells"][0])


def test_connected_components_chain_multi_partition(ray_session):
    """Adversarial deep chain across forced-small partitions: a path graph
    0-1-2-...-63 needs many delta rounds and every label must reach 0;
    plus a disjoint triangle keeps its own min label.  Exercises the
    actor-pinned adjacency path (messages crossing partitions every
    round)."""
    import ray.data
    from katydid_haskell_ray.stages.components import connected_components

    n = 64
    a = np.arange(n - 1, dtype=np.int64)
    b = a + 1
    tri = np.array([[1000, 1001], [1001, 1002], [1002, 1000]],
                   dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(np.concatenate([a, tri[:, 0]])),
        "b": pa.array(np.concatenate([b, tri[:, 1]]))}))
    out = connected_components(edges, a_col="a", b_col="b",
                               n_buckets=4, max_rounds=200).to_pandas()
    assert len(out) == n + 3  # every endpoint exactly once
    chain = out[out["node"] < n]
    assert (chain["label"] == 0).all()
    tri_lab = out[out["node"] >= 1000]
    assert (tri_lab["label"] == 1000).all()


def test_connected_components_deep_local_chain(ray_session):
    """A chain resident in ONE partition deeper than the local pass cap
    must still converge (review finding: a cap-tripped fixpoint with no
    outgoing messages used to read as global convergence with wrong
    labels).  Covers n_buckets=1 and a same-residue chain at
    n_buckets=4."""
    import ray.data
    from katydid_haskell_ray.stages import components as C
    from katydid_haskell_ray.stages.components import connected_components

    n = 3 * C._CCPartition._LOCAL_PASS_CAP  # 3x the cap
    a = np.arange(n - 1, dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(a), "b": pa.array(a + 1)}))
    out = connected_components(edges, a_col="a", b_col="b",
                               n_buckets=1, max_rounds=50).to_pandas()
    assert (out["label"] == 0).all()

    # every node ≡ 0 mod 4 -> all land in the same partition of 4
    a4 = np.arange(0, 4 * n, 4, dtype=np.int64)
    edges4 = ray.data.from_arrow(pa.table({
        "a": pa.array(a4[:-1]), "b": pa.array(a4[1:])}))
    out4 = connected_components(edges4, a_col="a", b_col="b",
                                n_buckets=4, max_rounds=50).to_pandas()
    assert (out4["label"] == 0).all()


def test_connected_components_duplicate_and_self_edges(ray_session):
    """Duplicate edge rows and self-loops neither crash nor duplicate
    output nodes (the finalize dedup that also makes delivery retries
    idempotent)."""
    import ray.data
    from katydid_haskell_ray.stages.components import connected_components

    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([5, 5, 5, 7, 9], type=pa.int64()),
        "b": pa.array([6, 6, 5, 8, 9], type=pa.int64())}))
    out = connected_components(edges, a_col="a", b_col="b",
                               n_buckets=2).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [5, 6, 7, 8, 9]
    assert out["label"].tolist() == [5, 5, 7, 7, 9]


def test_revenue_by_region_branch_agreement(ray_session, tmp_path):
    """Both auto-selected branches of revenue_by_region drop orders whose
    custkey is absent from customer (inner semantics, matching the
    oracle's join chain) — the broadcast branch used to keep them as a
    NaN region group (ADVICE r4)."""
    from katydid_haskell_ray.pipelines import queries as Q

    pd.DataFrame({"r_regionkey": np.array([0, 1], dtype=np.int64),
                  "r_name": ["EAST", "WEST"]}) \
        .to_parquet(tmp_path / "region.parquet")
    pd.DataFrame({"n_nationkey": np.array([0, 1], dtype=np.int64),
                  "n_regionkey": np.array([0, 1], dtype=np.int64)}) \
        .to_parquet(tmp_path / "nation.parquet")
    pd.DataFrame({"c_custkey": np.array([1, 2], dtype=np.int64),
                  "c_nationkey": np.array([0, 1], dtype=np.int64)}) \
        .to_parquet(tmp_path / "customer.parquet")
    # custkey 99 violates referential integrity
    pd.DataFrame({"o_custkey": np.array([1, 2, 99, 1], dtype=np.int64),
                  "o_totalprice": [10.0, 20.0, 999.0, 5.0]}) \
        .to_parquet(tmp_path / "orders.parquet")

    wide = _to_pandas(Q.revenue_by_region(str(tmp_path)))  # broadcast
    narrow = _to_pandas(
        Q.revenue_by_region(str(tmp_path), broadcast_max_bytes=0))

    def canon(df):
        return df.sort_values("r_name").reset_index(drop=True)[
            ["r_name", "revenue_cents", "n_orders"]].astype(
            {"revenue_cents": np.int64, "n_orders": np.int64})

    w, n = canon(wide), canon(narrow)
    assert w.equals(n)
    assert set(w["r_name"]) == {"EAST", "WEST"}  # no NaN group
    assert w.loc[w["r_name"] == "EAST", "revenue_cents"].item() == 1500
    assert int(w["n_orders"].sum()) == 3  # the violating order is dropped


def test_interval_join_brute(ray_session):
    """interval_join == the brute O(N*M) BETWEEN join: inclusive bounds,
    cross-chunk intervals (n_buckets forced small so spans straddle
    chunks), each qualifying pair exactly once."""
    import ray.data
    from katydid_haskell_ray.stages.join import interval_join

    rng = np.random.default_rng(7)
    pts = pd.DataFrame({
        "pid": np.arange(400, dtype=np.int64),
        "v": rng.integers(0, 1000, 400).astype(np.int64)})
    lo = rng.integers(-50, 1000, 60).astype(np.int64)
    ivs = pd.DataFrame({
        "iid": np.arange(60, dtype=np.int64),
        "lo": lo,
        "hi": lo + rng.integers(0, 400, 60).astype(np.int64)})

    got = interval_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(ivs),
        value_col="v", lo_col="lo", hi_col="hi",
        point_cols=["pid"], interval_cols=["iid"],
        n_buckets=4).to_pandas()
    got = got.sort_values(["pid", "iid"]).reset_index(drop=True)

    exp = pts.merge(ivs, how="cross")
    exp = exp[(exp["v"] >= exp["lo"]) & (exp["v"] <= exp["hi"])]
    exp = exp[["pid", "iid"]].sort_values(["pid", "iid"]) \
        .reset_index(drop=True)
    assert got[["pid", "iid"]].astype(np.int64).equals(exp)
    # no pair duplicated across chunk replicas
    assert not got.duplicated(["pid", "iid"]).any()


def test_interval_join_edges(ray_session):
    """Boundary semantics: v == lo and v == hi match (BETWEEN); inverted
    (hi < lo) and wholly-out-of-range intervals match nothing; an empty
    interval side yields an empty result."""
    import ray.data
    from katydid_haskell_ray.stages.join import interval_join

    pts = pd.DataFrame({"pid": np.array([0, 1, 2], dtype=np.int64),
                        "v": np.array([10, 20, 30], dtype=np.int64)})
    ivs = pd.DataFrame({
        "iid": np.array([0, 1, 2, 3], dtype=np.int64),
        "lo": np.array([10, 30, 25, 100], dtype=np.int64),
        "hi": np.array([20, 30, 15, 200], dtype=np.int64)})
    got = interval_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(ivs),
        value_col="v", lo_col="lo", hi_col="hi",
        point_cols=["pid"], interval_cols=["iid"],
        n_buckets=3).to_pandas()
    pairs = set(map(tuple, got[["pid", "iid"]].to_numpy()))
    assert pairs == {(0, 0), (1, 0), (2, 1)}  # inclusive ends; 2,3 empty

    empty = interval_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(ivs.iloc[0:0]),
        value_col="v", lo_col="lo", hi_col="hi",
        point_cols=["pid"], interval_cols=["iid"], n_buckets=3).to_pandas()
    assert len(empty) == 0


def test_user_event_unpivot_zero_cells(ray_session, tmp_path):
    """The melt keeps zero cells: every user emits exactly 5 rows (one per
    type), zero-count cells included, and counts match a brute groupby —
    checked on sf0.001 (dense) AND a synthetic table with guaranteed
    absent (user, type) cells."""
    from katydid_haskell_ray.pipelines import queries as Q

    pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        "event_type": ["click", "click", "view", "error"],
        "ts": pd.to_datetime([0, 1, 2, 3], unit="s"),
        "event_id": np.arange(4, dtype=np.int64),
        "value": [1.0, 2.0, 3.0, 4.0], "props": ["{}"] * 4,
    }).to_parquet(tmp_path / "events.parquet")

    for sf, has_zero in ((SF, False), (str(tmp_path), True)):
        got = _to_pandas(Q.user_event_unpivot(sf))
        assert (got.groupby("user_id").size() == 5).all()
        ev = pd.read_parquet(f"{sf}/events.parquet",
                             columns=["user_id", "event_type"])
        brute = (ev.groupby(["user_id", "event_type"]).size()
                 .rename("n").reset_index())
        m = got.merge(brute, on=["user_id", "event_type"], how="left",
                      suffixes=("", "_b"))
        assert (m["n"].to_numpy()
                == np.nan_to_num(m["n_b"].to_numpy())).all()
        if has_zero:
            assert (got["n"] == 0).any()
            assert got.loc[(got.user_id == 2) & (got.event_type == "click"),
                           "n"].item() == 0


def test_triangle_counts_brute(ray_session):
    """local_triangle_counts vs an O(n^3) adjacency-matrix brute force on
    a random graph dense enough to have hubs (degree skew exercises the
    orientation bound)."""
    import ray.data
    from katydid_haskell_ray.stages.graph import local_triangle_counts

    rng = np.random.default_rng(11)
    n = 60
    adj = np.zeros((n, n), dtype=bool)
    # skewed: low-numbered nodes get much higher edge probability
    for a in range(n):
        for b in range(a + 1, n):
            p = 0.45 if a < 6 else 0.08
            if rng.random() < p:
                adj[a, b] = adj[b, a] = True
    aa, bb = np.nonzero(np.triu(adj, k=1))
    edges = pd.DataFrame({"a": aa.astype(np.int64) + 1000,
                          "b": bb.astype(np.int64) + 1000})

    # brute: per-node triangle count = diag(A^3) / 2
    a3 = np.linalg.matrix_power(adj.astype(np.int64), 3)
    exp_counts = np.diag(a3) // 2
    exp = pd.DataFrame({"node": np.arange(n, dtype=np.int64) + 1000,
                        "n_tri": exp_counts.astype(np.int64)})
    exp = exp[exp["n_tri"] > 0].reset_index(drop=True)

    got = (local_triangle_counts(ray.data.from_pandas(edges))
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = exp.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # cross-check the global count too: each triangle credits 3 corners
    assert int(got["n_tri"].sum()) % 3 == 0
    assert int(got["n_tri"].sum()) // 3 == int(np.trace(a3)) // 6


def test_triangle_counts_edge_cases(ray_session):
    """No triangles (a path), and a single triangle with a pendant."""
    import ray.data
    from katydid_haskell_ray.stages.graph import local_triangle_counts

    path = pd.DataFrame({"a": [1, 2, 3], "b": [2, 3, 4]})
    got = local_triangle_counts(ray.data.from_pandas(path)).to_pandas()
    assert len(got) == 0

    tri = pd.DataFrame({"a": [1, 1, 2, 3], "b": [2, 3, 3, 9]})
    got = (local_triangle_counts(ray.data.from_pandas(tri))
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = pd.DataFrame({"node": np.array([1, 2, 3], np.int64),
                        "n_tri": np.ones(3, np.int64)})
    pd.testing.assert_frame_equal(got, exp)


def test_events_user_mode_brute(ray_session):
    """Per-user mode vs a pandas brute with the same tie-break."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = (_to_pandas(Q.events_user_mode(SF))
           .sort_values("user_id").reset_index(drop=True))

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    cnt = (ev.groupby(["user_id", "event_type"], as_index=False)
           .size().rename(columns={"size": "n"}))
    cnt = cnt.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
    exp = (cnt.drop_duplicates("user_id", keep="first")
           .rename(columns={"event_type": "mode_type"})
           .sort_values("user_id").reset_index(drop=True)
           .astype({"user_id": np.int64, "n": np.int64}))
    pd.testing.assert_frame_equal(got, exp)


def test_q10_returned_revenue_brute(ray_session):
    """Q10 shape vs a pandas brute at sf0.001 (same floor-cents units)."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = _to_pandas(Q.q10_returned_revenue(SF)).reset_index(drop=True)

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_returnflag"] == "R"].copy()
    li["rev"] = np.floor(li["l_extendedprice"].to_numpy()
                         * (1 - li["l_discount"].to_numpy())
                         * 100).astype(np.int64)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    agg = (j.groupby("o_custkey", as_index=False)["rev"].sum()
           .rename(columns={"o_custkey": "c_custkey",
                            "rev": "revenue_cents"}))
    exp = (agg.merge(cu, on="c_custkey")
           .sort_values(["revenue_cents", "c_custkey"],
                        ascending=[False, True], kind="mergesort").head(20)
           [["c_custkey", "c_name", "revenue_cents"]]
           .reset_index(drop=True)
           .astype({"c_custkey": np.int64, "revenue_cents": np.int64}))
    pd.testing.assert_frame_equal(got, exp)


def test_global_row_number_brute(ray_session):
    """Range-partitioned global sort vs a local argsort, ascending and
    descending, with forced multi-bucket splits and duplicate keys."""
    import ray.data
    from katydid_haskell_ray.stages.sort import global_row_number

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 400, n).astype(np.int64),  # heavy duplicates
        "tie": np.arange(n, dtype=np.int64),
        "payload": rng.random(n)})
    ds = ray.data.from_pandas(df).repartition(13)

    for asc in (True, False):
        got = (global_row_number(ds, ["k", "tie"], out_col="rn",
                                 ascending=asc)
               .to_pandas().sort_values("tie").reset_index(drop=True))
        exp = df.copy()
        s = 1 if asc else -1  # descending applies to EVERY key
        order = np.lexsort((exp["tie"].to_numpy() * s,
                            exp["k"].to_numpy() * s))
        rn = np.empty(n, dtype=np.int64)
        rn[order] = np.arange(1, n + 1)
        exp["rn"] = rn
        exp = exp.sort_values("tie").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "tie", "payload", "rn"]],
            exp[["k", "tie", "payload", "rn"]])


def test_events_global_rank_oracle(ray_session):
    """events_global_rank vs the DuckDB ROW_NUMBER oracle at sf0.001."""
    import duckdb as d
    from katydid_haskell_ray.pipelines import queries as Q

    got = (_to_pandas(Q.events_global_rank(SF))
           .sort_values("event_id").reset_index(drop=True))
    exp = (d.connect().execute(f"""
        SELECT event_id,
               CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) rn
        FROM read_parquet('{SF}/events.parquet')""").df()
        .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_docs_winsorized_mean_brute(ray_session):
    """Quantile-clamp-aggregate vs a pandas brute with the same discrete
    rank definition (0-based floor((n-1)*q))."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = _to_pandas(Q.docs_winsorized_mean(SF)).reset_index(drop=True)

    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["lang", "n_chars"])
    rows = []
    for lang, g in d.groupby("lang", sort=True):
        v = np.sort(g["n_chars"].to_numpy())
        n = len(v)
        lo = v[int((n - 1) * 0.05)]
        hi = v[int((n - 1) * 0.95)]
        c = np.clip(g["n_chars"].to_numpy(), lo, hi).astype(np.int64)
        rows.append((lang, n, int(np.floor(c.sum() / n * 1e6))))
    exp = pd.DataFrame(rows, columns=["lang", "n_docs", "wmean_micro"]) \
        .astype({"n_docs": np.int64, "wmean_micro": np.int64})
    pd.testing.assert_frame_equal(got, exp)


def test_docs_substring_dupes_brute(ray_session):
    """Substring-duplication scan vs a pure-Python brute (same stride-8
    32-char windows, per-(doc, gram) distinct)."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = (_to_pandas(Q.docs_substring_dupes(SF))
           .sort_values("doc_id").reset_index(drop=True))

    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    per_doc = {}
    owners = {}
    for did, txt in zip(d["doc_id"], d["text"]):
        gs = {txt[o:o + 32] for o in range(0, max(len(txt) - 31, 0), 8)}
        if gs:
            per_doc[int(did)] = gs
            for g in gs:
                owners[g] = owners.get(g, 0) + 1
    rows = [(did, len(gs), sum(1 for g in gs if owners[g] >= 2))
            for did, gs in per_doc.items()]
    exp = (pd.DataFrame(rows, columns=["doc_id", "n_gram", "n_shared"])
           .astype(np.int64).sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert (exp["n_shared"] > 0).any()  # the fixture must exercise sharing


def test_events_top_paths_brute(ray_session):
    """Trigram path mining vs a pandas LEAD-style brute."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = _to_pandas(Q.events_top_paths(SF)).reset_index(drop=True)

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g = ev.groupby("user_id", sort=False)["event_type"]
    ev = ev.assign(t0=ev["event_type"], t1=g.shift(-1), t2=g.shift(-2))
    ev = ev.dropna(subset=["t1", "t2"])
    exp = (ev.groupby(["t0", "t1", "t2"], as_index=False)
           .size().rename(columns={"size": "n"})
           .sort_values(["n", "t0", "t1", "t2"],
                        ascending=[False, True, True, True],
                        kind="mergesort").head(10)
           .reset_index(drop=True).astype({"n": np.int64}))
    pd.testing.assert_frame_equal(got, exp)


def test_session_type_pairs_brute(ray_session):
    """Session co-occurrence vs a pandas brute with the same 30-min gap
    sessionization."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = _to_pandas(Q.session_type_pairs(SF)).reset_index(drop=True)

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts"], kind="mergesort")
    ts = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = ev["user_id"].to_numpy()
    new = np.empty(len(ev), np.int64)
    new[0] = 1
    new[1:] = ((u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > 1800_000_000)) \
        .astype(np.int64)
    ev = ev.assign(sid=np.cumsum(new))
    st = ev[["sid", "event_type"]].drop_duplicates()
    m = st.merge(st, on="sid", suffixes=("_a", "_b"))
    m = m[m["event_type_a"] < m["event_type_b"]]
    exp = (m.groupby(["event_type_a", "event_type_b"], as_index=False)
           .size()
           .rename(columns={"size": "n_sessions", "event_type_a": "type_a",
                            "event_type_b": "type_b"})
           .sort_values(["type_a", "type_b"]).reset_index(drop=True)
           .astype({"n_sessions": np.int64}))
    pd.testing.assert_frame_equal(got, exp)


def test_top_docs_diversified_brute(ray_session):
    """Quota ranking vs a pandas brute (per-lang ROW_NUMBER <= 2, global
    head 10, same tie-breaks)."""
    from katydid_haskell_ray.pipelines import queries as Q

    got = _to_pandas(Q.top_docs_diversified(SF)).reset_index(drop=True)

    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])
    d = d.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                      kind="mergesort")
    quota = d.groupby("lang", sort=False).head(2)
    exp = (quota.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True], kind="mergesort")
           .head(10)[["doc_id", "lang", "n_chars"]].reset_index(drop=True)
           .astype({"doc_id": np.int64, "n_chars": np.int64}))
    pd.testing.assert_frame_equal(got, exp)
    assert got["lang"].value_counts().max() <= 2
