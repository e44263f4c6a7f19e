"""Driver contract for the Ray-Data-native katydid validation engine.

``entry()``   — flagship validation pipeline over sf0.001 (Ray already
                initialised by the driver; nothing here calls ray.init).
``queries()`` — one callable per implemented operator/pipeline (SURVEY.md §2
                + §2.6 additions); each takes sf_dir.
``oracle_sql()`` — DuckDB-equivalent SQL per query.  Image-table queries
                read the SAME parquet file the Ray side reads (synthesized
                deterministically under /tmp/graft_images by ``queries()``),
                so both sides compare identical bytes.

Float-parity convention: see pipelines/queries.py docstring (floor to
integer cents/micros before aggregation on BOTH sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

def _images_sf001_path() -> str:
    from katydid_haskell_ray.sources.synth_images import images_path_for_sf
    return images_path_for_sf("sf0.01")


IMAGES_SF001 = _images_sf001_path()  # correctness-gate table (sf0.01)


def entry() -> Any:
    """Flagship: grammar + constraint + referential + decode verdicts over
    the sf0.001 images table (the full check set of the verdict pass)."""
    from katydid_haskell_ray.pipelines.validate import verdict_dataset
    from katydid_haskell_ray.sources.synth_images import _VOCAB, ensure_images_parquet

    path = ensure_images_parquet("sf0.001")
    return verdict_dataset(path, caption_vocab=_VOCAB, check_roundtrip=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from katydid_haskell_ray.pipelines import queries as Q
    from katydid_haskell_ray.sources.synth_images import ensure_images_parquet

    # synthesize the image tables the oracles read, before either side runs
    for sf in ("sf0.001", "sf0.01"):
        ensure_images_parquet(sf)

    # ORDER CONTRACT: the driver's correctness gate snapshots the FIRST ~50
    # entries of this dict.  r05 window = the 27 round-4-continuation
    # queries that had never been in an official snapshot, plus the three
    # queries whose behavior changed this round (events_prev_value's
    # nullable-dtype fix, revenue_by_region's broadcast-branch inner
    # semantics, docs_lang_source_chi2's NULL-safe oracle) and the NEW
    # flagship composite images_verdict_full, padded to 50 with flagship
    # re-certifications.  Every other query keeps its official r01-r04 row
    # and stays covered by scripts/selfcheck.py.
    return {
        # --- never officially gated before (round-4 continuation ops) ---
        "events_user_asof": Q.events_user_asof,
        "events_funnel": Q.events_funnel,
        "doc_char_entropy": Q.doc_char_entropy,
        "docs_pmi_bigrams": Q.docs_pmi_bigrams,
        "docs_contamination": Q.docs_contamination,
        "images_fmt_magic": Q.images_fmt_magic,
        "embedding_norms": Q.embedding_norms,
        "docs_split_assign": Q.docs_split_assign,
        "docs_pack_sequences": Q.docs_pack_sequences,
        "images_exact_dupes": Q.images_exact_dupes,
        "images_bytes_entropy": Q.images_bytes_entropy,
        "customer_rfm": Q.customer_rfm,
        "docs_keyword_search": Q.docs_keyword_search,
        "docs_unigram_surprisal": Q.docs_unigram_surprisal,
        "big_orders_customers": Q.big_orders_customers,
        "q6_forecast_revenue": Q.q6_forecast_revenue,
        "promo_revenue_share": Q.promo_revenue_share,
        "docs_quality_deciles": Q.docs_quality_deciles,
        "events_dow_hour_heatmap": Q.events_dow_hour_heatmap,
        "events_debounce": Q.events_debounce,
        "embedding_quantize_int8": Q.embedding_quantize_int8,
        "late_orders_by_priority": Q.late_orders_by_priority,
        "embedding_top_component": Q.embedding_top_component,  # rows-only (iterative)
        "lang_len_regression": Q.lang_len_regression,
        "docs_lang_source_chi2": Q.docs_lang_source_chi2,
        "docs_export_by_lang": Q.docs_export_by_lang,
        "images_phash_components": Q.images_phash_components,
        # --- changed this round: re-gate ---
        "events_prev_value": Q.events_prev_value,
        "revenue_by_region": Q.revenue_by_region,
        # --- NEW: the flagship composite (entry()'s pipeline, oracled) ---
        "images_verdict_full": Q.images_verdict_full,
        # --- NEW this round (must appear in an official snapshot once) ---
        "events_span_interval_join": Q.events_span_interval_join,
        "user_event_unpivot": Q.user_event_unpivot,
        "images_phash_triangles": Q.images_phash_triangles,
        "events_user_mode": Q.events_user_mode,
        "q10_returned_revenue": Q.q10_returned_revenue,
        "events_global_rank": Q.events_global_rank,
        "docs_winsorized_mean": Q.docs_winsorized_mean,
        "docs_substring_dupes": Q.docs_substring_dupes,
        "events_top_paths": Q.events_top_paths,
        "session_type_pairs": Q.session_type_pairs,
        "top_docs_diversified": Q.top_docs_diversified,
        # --- flagship re-certifications (to slot 50; the re-certs pushed
        # past 50 keep their official r01-r04 rows) ---
        "q1_lineitem_agg": Q.q1_lineitem_agg,
        "q3_join_revenue": Q.q3_join_revenue,
        "images_verdicts": Q.images_verdicts,
        "images_uniqueness": Q.images_uniqueness,
        "minhash_dedupe_docs": Q.minhash_dedupe_docs,
        "knn_brute": Q.knn_brute,
        "jaccard_pairs_docs": Q.jaccard_pairs_docs,
        "caption_edit1_pairs": Q.caption_edit1_pairs,
        "docs_drift_psi": Q.docs_drift_psi,
        "weighted_sample_docs": Q.weighted_sample_docs,
        "events_first_last": Q.events_first_last,
        "docs_top_bigrams": Q.docs_top_bigrams,
        "images_phash_neardups": Q.images_phash_neardups,
        "images_caption_grammar": Q.images_caption_grammar,
        "images_bytes_grammar": Q.images_bytes_grammar,
        "images_pass_rate_by_fmt": Q.images_pass_rate_by_fmt,
        "docs_user_ref_bloom": Q.docs_user_ref_bloom,
        "doc_quality_gopher": Q.doc_quality_gopher,
        "pii_scan_docs": Q.pii_scan_docs,
        "events_gap_quantiles": Q.events_gap_quantiles,
        # --- certified in r01-r04 gates (selfcheck keeps them honest) ---
        "images_resolution_hist": Q.images_resolution_hist,
        "images_wh_corr": Q.images_wh_corr,
        "caption_dup_xphash": Q.caption_dup_xphash,
        "parts_semi_heavy": Q.parts_semi_heavy,
        "png_only_captions": Q.png_only_captions,
        "png_and_jpeg_captions": Q.png_and_jpeg_captions,
        "knn_ivf_persisted": Q.knn_ivf_persisted,  # rows-only (approx ANN)
        "docs_top_tokens_approx": Q.docs_top_tokens_approx,  # rows-only (CMS)
        "doc_subword_stats": Q.doc_subword_stats,
        "lang_top_docs_concat": Q.lang_top_docs_concat,
        "docs_percent_rank": Q.docs_percent_rank,
        "events_cumsum": Q.events_cumsum,
        "lang_tfidf_terms": Q.lang_tfidf_terms,
        "events_outliers": Q.events_outliers,
        "building_urgent_outer": Q.building_urgent_outer,
        "events_trailing_1h": Q.events_trailing_1h,
        "events_latest_per_user": Q.events_latest_per_user,
        "docs_cube": Q.docs_cube,
        "docs_grouping_sets": Q.docs_grouping_sets,
        "orders_monthly_revenue": Q.orders_monthly_revenue,
        "user_monthly_retention": Q.user_monthly_retention,
        "docs_checksum_per_lang": Q.docs_checksum_per_lang,
        "embedding_centroids": Q.embedding_centroids,
        "kmeans_embeddings": Q.kmeans_embeddings,  # rows-only (iterative)
        "props_filter_rows": Q.props_filter_rows,
        "events_value_mad": Q.events_value_mad,
        "events_user_rank": Q.events_user_rank,
        "users_per_type_approx": Q.users_per_type_approx,  # rows-only (HLL)
        "top_orders": Q.top_orders,
        "filter_docs": Q.filter_docs,
        "distinct_users": Q.distinct_users,
        "events_windowed": Q.events_windowed,
        "events_sessions": Q.events_sessions,
        "events_hopping": Q.events_hopping,
        "orders_price_bands": Q.orders_price_bands,
        "doc_token_stats": Q.doc_token_stats,
        "doc_len_quantiles": Q.doc_len_quantiles,
        "doc_len_quantiles_cont": Q.doc_len_quantiles_cont,
        "events_window_users": Q.events_window_users,
        "lang_len_quantiles": Q.lang_len_quantiles,
        "events_rolling": Q.events_rolling,
        "embed_dedupe": Q.embed_dedupe,
        "sampled_docs": Q.sampled_docs,
        "exact_dedupe_docs": Q.exact_dedupe_docs,
        "dup_doc_groups": Q.dup_doc_groups,
        "simhash_docs": Q.simhash_docs,                 # rows-only
        "langid_docs": Q.langid_docs,
        "knn_lsh": Q.knn_lsh,                           # rows-only
        "knn_ivf": Q.knn_ivf,                           # rows-only
        "cosine_pairs": Q.cosine_pairs,
        "knn_join_docs": Q.knn_join_docs,
        "knn_join_ivf_docs": Q.knn_join_ivf_docs,  # rows-only (approximate)
        "docs_by_lang": Q.docs_by_lang,
        "docs_rollup": Q.docs_rollup,
        "docs_tokens_unnest": Q.docs_tokens_unnest,
        "docs_normalized": Q.docs_normalized,
        "longest_doc_per_lang": Q.longest_doc_per_lang,
        "docs_top_tokens": Q.docs_top_tokens,
        "supplier_nation_rollup": Q.supplier_nation_rollup,
        "top_orders_per_segment": Q.top_orders_per_segment,
        "part_filter_like": Q.part_filter_like,
        "events_props_valid": Q.events_props_valid,
        "props_flatten": Q.props_flatten,
        "stratified_sample_docs": Q.stratified_sample_docs,
        "user_event_pivot": Q.user_event_pivot,
        "props_name_choice": Q.props_name_choice,
        "isprime_quantity": Q.isprime_quantity,
        "order_priority_revenue": Q.order_priority_revenue,
        "lineitem_group_share": Q.lineitem_group_share,
        "customers_no_urgent": Q.customers_no_urgent,
        "customer_urgent_counts": Q.customer_urgent_counts,
        "events_asof_order": Q.events_asof_order,
        "distinct_event_types": Q.distinct_event_types,
        "users_per_type": Q.users_per_type,
        "images_stats": Q.images_stats,
        "images_phash_dups": Q.images_phash_dups,
        "images_grammar_verdicts": Q.images_grammar_verdicts,
        "images_check_failures": Q.images_check_failures,
        "images_caption_ref": Q.images_caption_ref,
        "images_decode_checks": Q.images_decode_checks,  # rows-only (codec)
        "images_features": Q.images_features,            # rows-only (codec)
    }


_IMAGES = f"read_parquet('{IMAGES_SF001}')"

# flat-check SQL fragments with katydid error-as-value semantics:
# NULL/type-error on either side of a comparison => FALSE (Compare.hs:50-53)
_CHECK_SQL = {
    "w_pos": "COALESCE(w >= 1, FALSE)",
    "w_max": "COALESCE(w <= 16384, FALSE)",
    "h_pos": "COALESCE(h >= 1, FALSE)",
    "h_max": "COALESCE(h <= 16384, FALSE)",
    "phash_nonzero": "COALESCE(phash <> 0, FALSE)",
    "fmt_known": "COALESCE(fmt IN ('png','bmp','jpeg'), FALSE)",
    "caption_present": "COALESCE(length(caption) > 0, FALSE)",
    "caption_len": "COALESCE(length(caption) <= 256, FALSE)",
    "caption_ascii": "COALESCE(regexp_matches(caption, '^[ -~]*$'), FALSE)",
}
# the byte-payload check is oracled separately (images_bytes_grammar): the
# metadata queries prune the ``bytes`` column out of their reads, mirroring
# validate.METADATA_CHECKS vs DEFAULT_CHECKS
_BYTES_CHECK_SQL = "COALESCE(octet_length(bytes) > 8, FALSE)"

# the caption-vocab referential set (synth_images._VOCAB) as a SQL IN list
def _vocab_sql() -> str:
    from katydid_haskell_ray.sources.synth_images import _VOCAB
    return ", ".join(f"'{w}'" for w in _VOCAB)


_VOCAB_SQL = _vocab_sql()

_AUG_DOCS = """
    SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL SELECT doc_id + 2000000, text || ' tailtoken' FROM documents
        WHERE doc_id % 7 = 0
"""


def oracle_sql() -> dict[str, str]:
    # the images_* oracles read the synthesized sf0.01 table at a literal
    # /tmp path — materialize it NOW so the oracle side never depends on a
    # Ray-side query having run first (n=10k takes the serial no-Ray path).
    # Non-fatal: if /tmp is unavailable the SQL strings still return and
    # only the images oracles themselves would fail at execution time.
    try:
        from katydid_haskell_ray.sources.synth_images import \
            ensure_images_parquet
        ensure_images_parquet("sf0.01")
    except Exception:
        pass
    pass_expr = " AND ".join(_CHECK_SQL.values())
    fail_counts = " UNION ALL ".join(
        f"SELECT '{name}' AS check, CAST(SUM(CASE WHEN NOT ({expr}) THEN 1 "
        f"ELSE 0 END) AS BIGINT) AS n_fail FROM {_IMAGES}"
        for name, expr in _CHECK_SQL.items())
    return {
        "q1_lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "q3_join_revenue": """
            SELECT c_mktsegment,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents
            FROM orders
            ORDER BY total_cents DESC, o_orderkey ASC LIMIT 10
        """,
        "filter_docs": """
            SELECT doc_id, source FROM documents
            WHERE lang = 'en' AND n_chars > 500
        """,
        "distinct_users": """
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
        """,
        "events_windowed": """
            SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
                   event_type,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_session,
                       1 AS one
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id,
                   CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   CAST(SUM(one) AS BIGINT) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "events_hopping": """
            SELECT CAST(floor(epoch(ts) / 1800) * 1800 - j.j * 1800 AS BIGINT)
                       AS window_start_s,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents
            FROM events CROSS JOIN (VALUES (0), (1)) AS j(j)
            GROUP BY 1, 2
        """,
        "orders_price_bands": """
            SELECT b.band, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
            FROM orders o
            JOIN (VALUES ('b0_5_50k',    5000.0,  50000.0),
                         ('b1_50_150k',  50000.0, 150000.0),
                         ('b2_150_300k', 150000.0, 300000.0),
                         ('b3_300_500k', 300000.0, 500000.0))
                 AS b(band, lo, hi)
              ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
            GROUP BY b.band
        """,
        "doc_len_quantiles": r"""
            WITH tok AS (
                SELECT CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                            x -> x <> '')) AS BIGINT) AS n_tokens
                FROM documents
            )
            SELECT CAST(25 AS BIGINT) AS q_pct,
                   quantile_disc(n_tokens, 0.25) AS n_tokens FROM tok
            UNION ALL SELECT 50, quantile_disc(n_tokens, 0.5) FROM tok
            UNION ALL SELECT 90, quantile_disc(n_tokens, 0.9) FROM tok
            UNION ALL SELECT 99, quantile_disc(n_tokens, 0.99) FROM tok
        """,
        "lang_len_quantiles": r"""
            WITH tok AS (
                SELECT lang,
                       CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                            x -> x <> '')) AS BIGINT) AS n_tokens
                FROM documents
            )
            SELECT lang, CAST(50 AS BIGINT) AS q_pct,
                   quantile_disc(n_tokens, 0.5) AS n_tokens
            FROM tok GROUP BY lang
            UNION ALL
            SELECT lang, 90, quantile_disc(n_tokens, 0.9)
            FROM tok GROUP BY lang
        """,
        "events_rolling": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS roll_sum_cents
            FROM events
        """,
        "embed_dedupe": """
            WITH pairs AS (
                SELECT a.vec_id AS a, b.vec_id AS b
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.40
            )
            SELECT vec_id FROM embeddings
            WHERE vec_id NOT IN (SELECT b FROM pairs)
        """,
        "sampled_docs": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE ((doc_id * 2654435761) % 4294967296) % 100 < 10
        """,
        "doc_token_stats": r"""
            SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                        x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(floor(1e6 * (
                        length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        / greatest(length(text), 1))) AS BIGINT) AS alpha_ratio_micro,
                   CAST(floor(1e6 * (
                        length(regexp_replace(text, '\s', '', 'g'))
                        / greatest(len(list_filter(regexp_split_to_array(text, '\s+'),
                                                   x -> x <> '')), 1))) AS BIGINT) AS mean_token_len_micro
            FROM documents
        """,
        "exact_dedupe_docs": f"""
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
            FROM ({_AUG_DOCS}) GROUP BY text
        """,
        "dup_doc_groups": f"""
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   COUNT(*) AS n_copies
            FROM ({_AUG_DOCS}) GROUP BY text HAVING COUNT(*) > 1
        """,
        "minhash_dedupe_docs": rf"""
            -- brute-force oracle: EXACT word-3-shingle Jaccard >= 0.5 over
            -- all pairs, components via recursive transitive closure,
            -- cluster = min id of component.  The Ray side's LSH candidate
            -- generation is probabilistic but its verify stage keeps only
            -- exact-Jaccard edges, and at these parameters (k=128, 32
            -- bands) recall is 1.0 on this corpus, so the cluster sets
            -- agree exactly.
            WITH RECURSIVE docs AS ({_AUG_DOCS}),
            tok AS (SELECT doc_id, list_filter(
                        regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
                    FROM docs),
            sh AS (SELECT doc_id, list_distinct(
                       CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                            WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(generate_series(1, len(t) - 2),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                       END) AS s
                   FROM tok),
            pairs AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN TRUE
                      ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                           / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
                      END
            ),
            edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
            reach(src, dst) AS (
                SELECT a, b FROM edges
                UNION
                SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
            )
            SELECT src AS id, CAST(least(src, min(dst)) AS BIGINT) AS cluster
            FROM reach GROUP BY src
        """,
        "langid_docs": r"""
            WITH toks AS (
                SELECT doc_id, list_distinct(list_transform(
                    list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> ''), x -> lower(x))) AS t
                FROM documents),
            scores AS (
                SELECT doc_id,
                    len(list_intersect(t, ['the','and','of','to','a','in','is','it','that','for'])) AS s_en,
                    len(list_intersect(t, ['der','die','das','und','ist','nicht','ein','mit','für','auf'])) AS s_de,
                    len(list_intersect(t, ['le','la','les','et','est','un','une','pour','dans','que'])) AS s_fr,
                    len(list_intersect(t, ['el','la','los','y','es','un','una','para','en','que'])) AS s_es
                FROM toks)
            SELECT doc_id, CASE
                WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                -- first profile in (en, de, fr, es) order wins ties,
                -- mirroring the strict > update in functions/text.py
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS lang_guess
            FROM documents JOIN scores USING (doc_id)
        """,
        "lineitem_group_share": """
            SELECT l.l_orderkey, l.l_returnflag, l.l_linenumber,
                   CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS price_cents,
                   g.grp_cents
            FROM lineitem l JOIN (
                SELECT l_orderkey, l_returnflag,
                       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                            AS BIGINT) AS grp_cents
                FROM lineitem GROUP BY 1, 2) g
              ON l.l_orderkey = g.l_orderkey
             AND l.l_returnflag = g.l_returnflag
        """,
        "docs_rollup": """
            SELECT lang, source,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY ROLLUP(lang, source)
        """,
        "doc_len_quantiles_cont": r"""
            WITH tok AS (
                SELECT CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                            x -> x <> '')) AS BIGINT) AS n_tokens
                FROM documents
            )
            SELECT CAST(25 AS BIGINT) AS q_pct,
                   quantile_cont(n_tokens, 0.25) AS n_tokens FROM tok
            UNION ALL SELECT 50, quantile_cont(n_tokens, 0.5) FROM tok
            UNION ALL SELECT 90, quantile_cont(n_tokens, 0.9) FROM tok
            UNION ALL SELECT 99, quantile_cont(n_tokens, 0.99) FROM tok
        """,
        "events_window_users": """
            SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "docs_tokens_unnest": r"""
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\s+'),
                x -> x <> '')) AS token
            FROM documents
        """,
        "docs_normalized": r"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
                        '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
            FROM documents
        """,
        "longest_doc_per_lang": """
            SELECT lang, doc_id, n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id ASC) AS rn
                FROM documents) WHERE rn = 1
        """,
        "knn_join_docs": """
            SELECT vec_id, neighbor, rank FROM (
                SELECT a.vec_id, b.vec_id AS neighbor,
                       CAST(row_number() OVER (PARTITION BY a.vec_id
                           ORDER BY round(list_cosine_similarity(
                               a.embedding, b.embedding), 6) DESC,
                           b.vec_id ASC) AS BIGINT) AS rank
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id <> b.vec_id)
            WHERE rank <= 3
        """,
        "users_per_type": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type
        """,
        "knn_brute": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id IN (0, 1, 2)),
                 s AS (SELECT q.query_id, e.vec_id,
                              round(list_cosine_similarity(e.embedding, q.qe), 6) AS sim
                       FROM embeddings e CROSS JOIN q),
                 r AS (SELECT query_id, vec_id,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY sim DESC, vec_id ASC) AS rank
                       FROM s)
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5
        """,
        "cosine_pairs": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.40
        """,
        "docs_by_lang": """
            SELECT lang, source,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang, source
        """,
        "docs_top_tokens": """
            SELECT token, COUNT(*) AS n FROM (
                SELECT unnest(string_split_regex(text, '\\s+')) AS token
                FROM documents WHERE text IS NOT NULL)
            WHERE token <> ''
            GROUP BY token
            ORDER BY n DESC, token ASC
            LIMIT 20
        """,
        "supplier_nation_rollup": """
            SELECT r_name,
                   CAST(SUM(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
                   COUNT(*) AS n_suppliers
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "top_orders_per_segment": """
            WITH j AS (
                SELECT c_mktsegment, o_orderkey,
                       CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents
                FROM orders JOIN customer ON o_custkey = c_custkey
            ),
            r AS (
                SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                          ORDER BY total_cents DESC, o_orderkey ASC) AS rank
                FROM j
            )
            SELECT c_mktsegment, o_orderkey, total_cents,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 2
        """,
        "part_filter_like": """
            SELECT p_partkey, p_brand, p_size FROM part
            WHERE p_type LIKE '%O%' AND p_size IN (5, 15, 25)
        """,
        "props_name_choice": """
            SELECT event_id,
                   COALESCE(CAST(json_extract(props, '$.k') AS BIGINT) <= 50,
                            FALSE) AS pass
            FROM events
        """,
        "events_props_valid": """
            SELECT event_id,
                   COALESCE(CAST(json_extract(props, '$.k') AS BIGINT) >= 0
                            AND CAST(json_extract(props, '$.k') AS BIGINT) < 90,
                            FALSE) AS pass
            FROM events
        """,
        "props_flatten": """
            SELECT event_id,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "stratified_sample_docs": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id) AS rn
                FROM documents) WHERE rn <= 5
        """,
        "user_event_pivot": """
            SELECT user_id,
                   COUNT(*) FILTER (event_type = 'click')    AS n_click,
                   COUNT(*) FILTER (event_type = 'error')    AS n_error,
                   COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
                   COUNT(*) FILTER (event_type = 'view')     AS n_view
            FROM events GROUP BY user_id
        """,
        "events_span_interval_join": """
            -- point-in-interval join: top-8 users' activity spans,
            -- BETWEEN is inclusive both ends (engine mirrors)
            WITH ranked AS (
                SELECT user_id, COUNT(*) AS n, MIN(ts) AS lo, MAX(ts) AS hi
                FROM events GROUP BY user_id
                ORDER BY n DESC, user_id LIMIT 8
            )
            SELECT r.user_id AS span_user,
                   COUNT(*) AS n_events,
                   CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types
            FROM ranked r JOIN events e ON e.ts BETWEEN r.lo AND r.hi
            GROUP BY r.user_id
            ORDER BY span_user
        """,
        "user_event_unpivot": """
            -- melt of the pivot shape, INCLUDING zero cells
            WITH u AS (SELECT DISTINCT user_id FROM events),
                 t(event_type) AS (VALUES ('click'), ('error'),
                                          ('purchase'), ('signup'), ('view')),
                 c AS (SELECT user_id, event_type, COUNT(*) AS n
                       FROM events GROUP BY user_id, event_type)
            SELECT u.user_id, t.event_type,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM u CROSS JOIN t
            LEFT JOIN c ON c.user_id = u.user_id
                       AND c.event_type = t.event_type
        """,
        "images_phash_triangles": f"""
            -- local triangle counts over the Hamming<=3 near-dup graph;
            -- top 20 fingerprints by triangle participation
            WITH fp AS (
                SELECT phash FROM {_IMAGES} GROUP BY phash
            ), c AS (
                SELECT phash, j.c AS chunk,
                       (phash >> (16 * j.c)) & 65535 AS val
                FROM fp CROSS JOIN (VALUES (0),(1),(2),(3)) j(c)
            ), e AS (
                SELECT DISTINCT a.phash AS a, b.phash AS b
                FROM c a JOIN c b
                  ON a.chunk = b.chunk AND a.val = b.val AND a.phash < b.phash
                WHERE bit_count(xor(a.phash, b.phash)) <= 3
            ), tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            ), corners AS (
                SELECT x AS phash FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_tri
            FROM corners GROUP BY phash
            ORDER BY n_tri DESC, phash LIMIT 20
        """,
        "events_user_mode": """
            -- exact per-user mode with (count desc, type asc) tie-break
            SELECT user_id, event_type AS mode_type, n FROM (
                SELECT user_id, event_type,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id
                           ORDER BY COUNT(*) DESC, event_type) AS rn
                FROM events GROUP BY user_id, event_type)
            WHERE rn = 1
        """,
        "q10_returned_revenue": """
            -- TPC-H Q10 shape: returned-item revenue per customer, top 20
            SELECT c_custkey, c_name,
                   CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                        * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name
            ORDER BY revenue_cents DESC, c_custkey LIMIT 20
        """,
        "events_global_rank": """
            -- total order over the whole table: the distributed sort
            SELECT event_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id)
                        AS BIGINT) AS rn
            FROM events
        """,
        "docs_winsorized_mean": """
            -- per-lang winsorized mean: clamp to exact discrete
            -- [p05, p95] (0-based rank floor((n-1)*q)), then average
            WITH r AS (
                SELECT lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY n_chars) - 1 AS rk,
                       COUNT(*) OVER (PARTITION BY lang) AS n
                FROM documents
            ), b AS (
                SELECT lang,
                       MAX(CASE WHEN rk = CAST(floor((n - 1) * 0.05)
                           AS BIGINT) THEN n_chars END) AS lo_v,
                       MAX(CASE WHEN rk = CAST(floor((n - 1) * 0.95)
                           AS BIGINT) THEN n_chars END) AS hi_v
                FROM r GROUP BY lang
            )
            SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(floor(CAST(SUM(LEAST(GREATEST(d.n_chars, b.lo_v),
                        b.hi_v)) AS DOUBLE) / COUNT(*) * 1e6) AS BIGINT)
                       AS wmean_micro
            FROM documents d JOIN b USING (lang)
            GROUP BY d.lang
        """,
        "docs_substring_dupes": """
            -- exact substring-duplication scan: stride-8 32-char windows,
            -- per doc (windows, windows shared with any other doc)
            WITH pos AS (
                SELECT doc_id, text,
                       unnest(generate_series(1, length(text) - 31, 8)) AS i
                FROM documents
            ), gd AS (
                SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 32)
                       AS gram
                FROM pos
            ), shared AS (
                SELECT gram FROM gd GROUP BY gram HAVING COUNT(*) >= 2
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_gram,
                   CAST(SUM(CASE WHEN gram IN (SELECT gram FROM shared)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
            FROM gd GROUP BY doc_id
        """,
        "events_top_paths": """
            -- top consecutive 3-event paths in per-user time order
            WITH s AS (
                SELECT event_type AS t0,
                       LEAD(event_type, 1) OVER w AS t1,
                       LEAD(event_type, 2) OVER w AS t2
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT t0, t1, t2, CAST(COUNT(*) AS BIGINT) AS n
            FROM s WHERE t1 IS NOT NULL AND t2 IS NOT NULL
            GROUP BY t0, t1, t2
            ORDER BY n DESC, t0, t1, t2 LIMIT 10
        """,
        "session_type_pairs": """
            -- within-session distinct type co-occurrence pairs
            WITH flagged AS (
                SELECT user_id, ts, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
                SELECT user_id, event_type,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            ), st AS (
                SELECT DISTINCT user_id, sid, event_type FROM sess
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM st a JOIN st b
              ON a.user_id = b.user_id AND a.sid = b.sid
             AND a.event_type < b.event_type
            GROUP BY type_a, type_b
        """,
        "top_docs_diversified": """
            -- global top-10 longest docs, at most 2 per lang
            WITH r AS (
                SELECT doc_id, lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) AS rn
                FROM documents)
            SELECT doc_id, lang, n_chars FROM r WHERE rn <= 2
            ORDER BY n_chars DESC, doc_id LIMIT 10
        """,
        "isprime_quantity": """
            -- exact for the TPC-H quantity domain 1..50
            SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS BIGINT) IN
                       (2,3,5,7,11,13,17,19,23,29,31,37,41,43,47) AS qty_prime
            FROM lineitem
        """,
        "order_priority_revenue": """
            SELECT o_orderpriority,
                   CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "customers_no_urgent": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                  (SELECT o_custkey FROM orders
                   WHERE o_orderpriority = '1-URGENT')
        """,
        "customer_urgent_counts": """
            SELECT c.c_custkey, c.c_mktsegment,
                   COUNT(o.o_orderkey) AS n_urgent
            FROM customer c
            LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                       WHERE o_orderpriority = '1-URGENT') o
              ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_mktsegment
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events
        """,
        "events_asof_order": """
            WITH od AS (SELECT DISTINCT CAST(epoch(o_orderdate) AS BIGINT) AS d
                        FROM orders),
                 ev AS (SELECT event_id, CAST(epoch(ts) AS BIGINT) AS ts_s
                        FROM events)
            SELECT ev.event_id,
                   (SELECT MAX(d) FROM od WHERE od.d <= ev.ts_s) AS last_order_s
            FROM ev
        """,
        "jaccard_pairs_docs": rf"""
            WITH aug AS ({_AUG_DOCS}),
            tok AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS t
                FROM aug),
            sh AS (
                SELECT doc_id,
                       CASE WHEN len(t) < 3
                            THEN [array_to_string(t, ' ')]
                            ELSE list_transform(
                                generate_series(1, len(t) - 2),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                       END AS s
                FROM tok WHERE len(t) > 0),
            d AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
            p AS (
                SELECT a.doc_id AS a, b.doc_id AS b,
                       len(list_intersect(a.s, b.s)) AS inter,
                       len(a.s) + len(b.s)
                           - len(list_intersect(a.s, b.s)) AS un
                FROM d a JOIN d b ON a.doc_id < b.doc_id)
            SELECT a, b,
                   CAST(floor(1e6 * inter / un) AS BIGINT) AS j_micro
            FROM p WHERE un > 0 AND inter * 1.0 / un >= 0.5
        """,
        "docs_top_bigrams": r"""
            WITH tok AS (
                SELECT list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS t
                FROM documents WHERE text IS NOT NULL),
            bg AS (
                SELECT unnest(list_transform(
                    generate_series(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1])) AS bigram
                FROM tok WHERE len(t) >= 2)
            SELECT bigram, COUNT(*) AS n FROM bg
            GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20
        """,
        "revenue_by_region": """
            SELECT r_name,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "events_first_last": """
            WITH e AS (SELECT user_id, event_id, ts,
                              CAST(floor(value * 100) AS BIGINT) AS cents
                       FROM events),
            w AS (SELECT user_id,
                         FIRST_VALUE(cents) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                             AS first_cents,
                         LAST_VALUE(cents) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING)
                             AS last_cents,
                         COUNT(*) OVER (PARTITION BY user_id) AS n_events
                  FROM e)
            SELECT DISTINCT user_id, first_cents, last_cents, n_events
            FROM w
        """,
        "weighted_sample_docs": """
            SELECT doc_id,
                   CAST(floor(1e9 * (-ln(
                       (CAST(('0x' || substr(md5(COALESCE(text, '')), 1, 15))
                             AS BIGINT)
                        + 1.0) / (power(2, 60) + 1.0))
                       / greatest(n_chars, 1))) AS BIGINT) AS key_nano
            FROM documents
            ORDER BY key_nano, doc_id LIMIT 20
        """,
        "doc_subword_stats": _subword_stats_sql(),
        "docs_drift_psi": """
            WITH b AS (SELECT least(n_chars // 256, 7) AS bin,
                              (lang = 'en') AS is_a
                       FROM documents),
            c AS (SELECT bin,
                         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_a,
                         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END)
                              AS BIGINT) AS n_b
                  FROM b GROUP BY bin),
            t AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb,
                         COUNT(*) AS nb FROM c)
            SELECT bin, n_a, n_b,
                   CAST(floor(1e6
                        * (((n_a + 0.5) / (ta + 0.5 * nb))
                           - ((n_b + 0.5) / (tb + 0.5 * nb)))
                        * ln(((n_a + 0.5) / (ta + 0.5 * nb))
                             / ((n_b + 0.5) / (tb + 0.5 * nb))))
                        AS BIGINT) AS psi_micro
            FROM c, t
        """,
        "caption_edit1_pairs": f"""
            WITH c AS (SELECT DISTINCT caption FROM {_IMAGES}
                       WHERE caption IS NOT NULL),
            aug AS (SELECT caption FROM c
                    UNION
                    SELECT CASE WHEN length(caption) % 2 = 0
                                THEN caption || 'x'
                                ELSE 'z' || substr(caption, 2) END
                    FROM c)
            SELECT a.caption AS a, b.caption AS b
            FROM aug a JOIN aug b
              ON a.caption < b.caption
             AND abs(length(a.caption) - length(b.caption)) <= 1
             AND levenshtein(a.caption, b.caption) <= 1
        """,
        "images_stats": " UNION ALL ".join(
            f"SELECT '{c}' AS col, COUNT(*) AS n, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls, "
            f"CAST(MIN({c}) AS BIGINT) AS min_v, CAST(MAX({c}) AS BIGINT) AS max_v "
            f"FROM {_IMAGES}" for c in ("w", "h", "phash")),
        "images_uniqueness": f"""
            SELECT image_id, COUNT(*) AS dup_count FROM {_IMAGES}
            GROUP BY image_id HAVING COUNT(*) > 1
        """,
        "images_phash_dups": f"""
            SELECT phash, COUNT(*) AS dup_count FROM {_IMAGES}
            GROUP BY phash HAVING COUNT(*) > 1
        """,
        "images_phash_neardups": f"""
            WITH fp AS (
                SELECT phash, COUNT(*) AS n FROM {_IMAGES} GROUP BY phash
            ), c AS (
                SELECT phash, n, j.c AS chunk,
                       (phash >> (16 * j.c)) & 65535 AS val
                FROM fp CROSS JOIN (VALUES (0),(1),(2),(3)) j(c)
            )
            SELECT DISTINCT a.phash AS phash_a, b.phash AS phash_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
                   CAST(a.n * b.n AS BIGINT) AS n_pairs
            FROM c a JOIN c b
              ON a.chunk = b.chunk AND a.val = b.val AND a.phash < b.phash
            WHERE bit_count(xor(a.phash, b.phash)) <= 3
        """,
        "images_verdicts": f"""
            SELECT image_id, ({pass_expr}) AS pass FROM {_IMAGES}
        """,
        # the flagship composite: entry()'s full pipeline per-row verdict.
        # Metadata / byte / grammar / vocab checks recompute from the
        # columns; the decode-dependent checks (decode, dims, fmt-magic,
        # phash recompute) are exact functions of the generator's anomaly
        # residue classes (synth_images.py: i%1000 in {3,5,7}, i%20==11),
        # recovered from the row index embedded in image_id.  A duplicate-id
        # row (i%1000==1) decodes i-1 from its id — residue 0, predicted
        # clean — which matches, because only its id is copied; every other
        # column is row i's own valid value and i%1000==1 rows are never in
        # another anomaly class (and never hot: 1000 ≡ 0 mod 20).
        "images_verdict_full": f"""
            WITH t AS (SELECT *, CAST(substr(image_id, 5) AS BIGINT) AS i
                       FROM {_IMAGES})
            SELECT image_id,
                   ({pass_expr}
                    AND {_BYTES_CHECK_SQL}
                    AND COALESCE(image_id LIKE 'img-%', FALSE)
                    AND COALESCE(caption IS NOT NULL AND caption <> '', FALSE)
                    AND COALESCE(len(list_filter(string_split(caption, ' '),
                        x -> x NOT IN ({_VOCAB_SQL}))) = 0, FALSE)
                    AND i % 1000 <> 3 AND i % 1000 <> 5 AND i % 1000 <> 7
                    AND i % 20 <> 11) AS pass
            FROM t
        """,
        "images_caption_grammar": f"""
            SELECT image_id,
                   COALESCE(regexp_matches(caption, '^[a-z ]+$'), FALSE) AS pass
            FROM {_IMAGES}
        """,
        "images_check_failures": fail_counts,
        "images_pass_rate_by_fmt": f"""
            SELECT fmt,
                   CAST(SUM(CASE WHEN ({pass_expr}) THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pass,
                   COUNT(*) AS n_rows,
                   CAST(floor(1e6
                        * SUM(CASE WHEN ({pass_expr}) THEN 1 ELSE 0 END)
                        / COUNT(*)) AS BIGINT) AS pass_micro
            FROM {_IMAGES} GROUP BY fmt
        """,
        "images_caption_ref": _caption_ref_sql(),
        "docs_user_ref_bloom": """
            SELECT doc_id,
                   doc_id IN (SELECT user_id FROM events) AS ref_ok
            FROM documents
        """,
        "images_grammar_verdicts": f"""
            SELECT image_id,
                   (COALESCE(image_id LIKE 'img-%', FALSE)
                    AND COALESCE(w >= 1 AND w <= 16384, FALSE)
                    AND COALESCE(h >= 1 AND h <= 16384, FALSE)
                    AND COALESCE(fmt IN ('png', 'bmp', 'jpeg'), FALSE)
                    AND COALESCE(caption <> '', FALSE)
                    AND COALESCE(phash <> 0, FALSE)) AS pass
            FROM {_IMAGES}
        """,
        "images_bytes_grammar": f"""
            SELECT image_id, {_BYTES_CHECK_SQL} AS pass FROM {_IMAGES}
        """,
        "doc_quality_gopher": r"""
            WITH tok AS (
                SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                           x -> x <> '') AS t
                FROM documents),
            m AS (
                SELECT doc_id, len(t) AS n_tok,
                       len(list_distinct(t)) AS n_dist,
                       COALESCE(list_max(list_transform(list_distinct(t),
                           x -> len(list_filter(t, y -> y = x)))), 0) AS top_n,
                       greatest(len(t) - 1, 0) AS n_bg,
                       CASE WHEN len(t) < 2 THEN 0
                            ELSE len(list_distinct(list_transform(
                                generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]))) END AS n_dist_bg
                FROM tok),
            r AS (
                SELECT doc_id, n_tok,
                       CASE WHEN n_tok = 0 THEN 0 ELSE CAST(floor(1e6 *
                           (1 - CAST(n_dist AS DOUBLE) / n_tok)) AS BIGINT)
                       END AS dup_token_ratio_micro,
                       CASE WHEN n_tok = 0 THEN 0 ELSE CAST(floor(1e6 *
                           (CAST(top_n AS DOUBLE) / n_tok)) AS BIGINT)
                       END AS top_token_ratio_micro,
                       CASE WHEN n_bg = 0 THEN 0 ELSE CAST(floor(1e6 *
                           (1 - CAST(n_dist_bg AS DOUBLE) / n_bg)) AS BIGINT)
                       END AS dup_bigram_ratio_micro
                FROM m)
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
                   dup_token_ratio_micro, top_token_ratio_micro,
                   dup_bigram_ratio_micro,
                   (n_tok >= 5 AND dup_bigram_ratio_micro < 60000
                    AND top_token_ratio_micro < 140000
                    AND dup_token_ratio_micro < 680000) AS quality_pass
            FROM r
        """,
        "pii_scan_docs": _pii_scan_sql(),
        "images_resolution_hist": f"""
            SELECT fmt,
                   CAST((CAST(w AS BIGINT) * h) // 262144 AS BIGINT) AS px_bucket,
                   CAST(SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS sum_px,
                   COUNT(*) AS n_images
            FROM {_IMAGES} WHERE w IS NOT NULL AND h IS NOT NULL
            GROUP BY fmt, px_bucket
        """,
        "images_wh_corr": f"""
            WITH s AS (
                SELECT fmt, COUNT(*) AS n,
                       SUM(CAST(w AS BIGINT)) AS sum_w,
                       SUM(CAST(h AS BIGINT)) AS sum_h,
                       SUM(CAST(w AS BIGINT) * w) AS sum_ww,
                       SUM(CAST(h AS BIGINT) * h) AS sum_hh,
                       SUM(CAST(w AS BIGINT) * h) AS sum_wh
                FROM {_IMAGES} WHERE w IS NOT NULL AND h IS NOT NULL
                GROUP BY fmt)
            SELECT fmt, CAST(n AS BIGINT) AS n,
                   CASE WHEN (n * sum_ww - sum_w * sum_w) > 0
                         AND (n * sum_hh - sum_h * sum_h) > 0
                        THEN CAST(floor(1e6 * (
                            CAST(n * sum_wh - sum_w * sum_h AS DOUBLE)
                            / sqrt(CAST(n * sum_ww - sum_w * sum_w AS DOUBLE)
                                   * CAST(n * sum_hh - sum_h * sum_h AS DOUBLE))
                        )) AS BIGINT)
                        ELSE NULL END AS corr_micro
            FROM s
        """,
        "caption_dup_xphash": f"""
            SELECT caption, CAST(COUNT(DISTINCT phash) AS BIGINT) AS n_phash,
                   COUNT(*) AS n_rows
            FROM {_IMAGES} WHERE caption IS NOT NULL
            GROUP BY caption HAVING COUNT(DISTINCT phash) > 1
        """,
        "parts_semi_heavy": """
            SELECT p_partkey, p_name FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                                WHERE l_quantity > 49)
        """,
        "png_only_captions": f"""
            SELECT DISTINCT caption FROM {_IMAGES}
            WHERE fmt = 'png' AND caption IS NOT NULL
            EXCEPT
            SELECT DISTINCT caption FROM {_IMAGES}
            WHERE fmt = 'jpeg' AND caption IS NOT NULL
        """,
        "png_and_jpeg_captions": f"""
            SELECT DISTINCT caption FROM {_IMAGES}
            WHERE fmt = 'png' AND caption IS NOT NULL
            INTERSECT
            SELECT DISTINCT caption FROM {_IMAGES}
            WHERE fmt = 'jpeg' AND caption IS NOT NULL
        """,
        "events_gap_quantiles": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
                FROM events)
            SELECT user_id, CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS p50_gap_us
            FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
        """,
        "lang_top_docs_concat": """
            SELECT lang,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
                   COUNT(*) AS n
            FROM (SELECT lang, doc_id, row_number() OVER (
                      PARTITION BY lang ORDER BY doc_id) AS rn
                  FROM documents) t
            WHERE rn <= 5 GROUP BY lang
        """,
        "docs_percent_rank": """
            SELECT doc_id, lang,
                   CAST(floor(1e6 * percent_rank() OVER (
                       PARTITION BY lang ORDER BY n_chars)) AS BIGINT) AS pr_micro
            FROM documents
        """,
        "events_cumsum": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
            FROM events
        """,
        "lang_tfidf_terms": r"""
            WITH tok AS (
                SELECT lang, unnest(list_filter(
                    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS token
                FROM documents),
            tf AS (SELECT lang, token, COUNT(*) AS tf FROM tok
                   GROUP BY lang, token),
            df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
            scored AS (
                SELECT tf.lang, tf.token, CAST(tf.tf AS BIGINT) AS tf,
                       CAST(floor(1e6 * (CAST(tf.tf AS DOUBLE) / df.df))
                            AS BIGINT) AS score_micro,
                       row_number() OVER (PARTITION BY tf.lang
                           ORDER BY floor(1e6 * (CAST(tf.tf AS DOUBLE) / df.df))
                                    DESC, tf.token) AS rn
                FROM tf JOIN df USING (token))
            SELECT lang, token, tf, score_micro FROM scored WHERE rn <= 3
        """,
        "events_outliers": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(floor(value * 100) AS BIGINT) AS cents
                       FROM events),
            s AS (SELECT event_type, COUNT(*) AS n,
                         CAST(SUM(cents) AS BIGINT) AS sum_c,
                         CAST(SUM(cents * cents) AS BIGINT) AS sum_sq
                  FROM c GROUP BY event_type),
            b AS (SELECT event_type,
                         CAST(sum_c AS DOUBLE) / n AS mean,
                         sqrt((CAST(sum_sq AS DOUBLE)
                               - CAST(sum_c AS DOUBLE) * sum_c / n) / n) AS sd
                  FROM s)
            SELECT c.event_id, c.event_type, c.cents
            FROM c JOIN b USING (event_type)
            WHERE c.cents < b.mean - 3 * b.sd OR c.cents > b.mean + 3 * b.sd
        """,
        "building_urgent_outer": """
            WITH b AS (SELECT c_custkey, TRUE AS in_building FROM customer
                       WHERE c_mktsegment = 'BUILDING'),
            u AS (SELECT o_custkey AS c_custkey, COUNT(*) AS n_urgent
                  FROM orders WHERE o_orderpriority = '1-URGENT'
                  GROUP BY o_custkey)
            SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
                   COALESCE(b.in_building, FALSE) AS in_building,
                   CAST(COALESCE(u.n_urgent, 0) AS BIGINT) AS n_urgent
            FROM b FULL OUTER JOIN u ON b.c_custkey = u.c_custkey
        """,
        "events_trailing_1h": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS trail_cents
            FROM events
        """,
        "events_latest_per_user": """
            SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
            WHERE rn = 1
        """,
        "docs_cube": """
            SELECT lang, source,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY CUBE (lang, source)
        """,
        "user_monthly_retention": """
            WITH base AS (
                SELECT DISTINCT user_id, date_trunc('month', ts) AS m
                FROM events),
            am AS (
                SELECT user_id, m FROM base
                UNION
                SELECT user_id, m + INTERVAL 1 MONTH FROM base
                WHERE user_id % 3 = 0),
            r AS (
                SELECT a.user_id, a.m,
                       EXISTS (SELECT 1 FROM am b
                               WHERE b.user_id = a.user_id
                                 AND b.m = a.m + INTERVAL 1 MONTH)
                           AS retained
                FROM am a)
            SELECT strftime(m, '%Y-%m-%d') AS month,
                   COUNT(*) AS n_active,
                   CAST(SUM(CASE WHEN retained THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_retained
            FROM r GROUP BY 1
        """,
        "orders_monthly_revenue": """
            SELECT strftime(date_trunc('month', o_orderdate),
                            '%Y-%m-%d') AS month,
                   CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        """,
        "docs_grouping_sets": """
            SELECT lang, source,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY GROUPING SETS ((lang), (source))
        """,
        "docs_checksum_per_lang": """
            SELECT lang,
                   BIT_XOR(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
                       AS checksum,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "embedding_centroids": """
            SELECT label, dim,
                   CAST(SUM(m) AS BIGINT) AS sum_micro,
                   COUNT(*) AS n
            FROM (SELECT CAST(label AS BIGINT) AS label,
                         generate_subscripts(embedding, 1) AS dim,
                         CAST(floor(1e6 * CAST(unnest(embedding) AS DOUBLE))
                              AS BIGINT) AS m
                  FROM embeddings) t
            GROUP BY label, dim
        """,
        "props_filter_rows": """
            SELECT event_id FROM events
            WHERE COALESCE(CAST(json_extract(props, '$.k') AS BIGINT) >= 10
                   AND CAST(json_extract(props, '$.k') AS BIGINT) < 50,
                   FALSE)
        """,
        "events_prev_value": """
            SELECT event_id, user_id,
                   CAST(lag(CAST(floor(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                        AS BIGINT) AS prev_cents
            FROM events
        """,
        "events_value_mad": """
            WITH c AS (SELECT event_type,
                              CAST(floor(value * 100) AS BIGINT) AS cents
                       FROM events),
            m AS (SELECT event_type,
                         CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med_cents
                  FROM c GROUP BY event_type),
            d AS (SELECT c.event_type, abs(c.cents - m.med_cents) AS dev,
                         m.med_cents
                  FROM c JOIN m USING (event_type))
            SELECT event_type,
                   CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad_cents,
                   CAST(any_value(med_cents) AS BIGINT) AS med_cents
            FROM d GROUP BY event_type
        """,
        "events_user_asof": """
            SELECT e.event_id, e.user_id,
                   (SELECT MAX(CAST(epoch(o.o_orderdate) AS BIGINT))
                    FROM orders o
                    WHERE o.o_custkey = e.user_id
                      AND epoch(o.o_orderdate) <= epoch(e.ts))
                       AS last_user_order_s
            FROM events e
        """,
        "events_funnel": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
                   FROM events e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
                   GROUP BY e.user_id)
            SELECT u.user_id,
                   CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                             WHEN s2.user_id IS NOT NULL THEN 2
                             WHEN s1.user_id IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS steps_completed
            FROM u
            LEFT JOIN s1 ON u.user_id = s1.user_id
            LEFT JOIN s2 ON u.user_id = s2.user_id
            LEFT JOIN s3 ON u.user_id = s3.user_id
        """,
        "images_fmt_magic": f"""
            SELECT image_id,
                   COALESCE(CASE fmt
                       WHEN 'png' THEN
                           starts_with(hex(bytes), '89504E470D0A1A0A')
                       WHEN 'bmp' THEN starts_with(hex(bytes), '424D')
                       WHEN 'jpeg' THEN starts_with(hex(bytes), 'FFD8FF')
                       ELSE FALSE END, FALSE) AS magic_ok
            FROM {_IMAGES}
        """,
        "embedding_norms": """
            WITH q AS (
                SELECT vec_id,
                       CAST(floor(sqrt(CAST(list_sum(list_transform(
                            embedding,
                            x -> CAST(floor(1e6 * x) AS BIGINT)
                                 * CAST(floor(1e6 * x) AS BIGINT)))
                            AS DOUBLE))) AS BIGINT) AS norm_micro
                FROM embeddings),
            m AS (SELECT COUNT(*) AS n, SUM(norm_micro) AS s,
                         SUM(norm_micro * norm_micro) AS ss FROM q),
            b AS (SELECT CAST(s AS DOUBLE) / n AS mean,
                         sqrt((ss - CAST(s AS DOUBLE) * s / n) / n) AS sd
                  FROM m)
            SELECT q.vec_id, q.norm_micro,
                   (q.norm_micro < b.mean - 3 * b.sd
                    OR q.norm_micro > b.mean + 3 * b.sd) AS is_outlier
            FROM q, b
        """,
        "docs_contamination": r"""
            WITH tok AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS t
                FROM documents WHERE text IS NOT NULL),
            g AS (
                SELECT doc_id, unnest(
                    CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                         ELSE list_transform(
                             generate_series(1, len(t) - 4),
                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                  || ' ' || t[i+3] || ' ' || t[i+4])
                    END) AS gram
                FROM tok WHERE len(t) > 0),
            hits AS (
                SELECT DISTINCT doc_id FROM g
                WHERE doc_id % 97 <> 0
                  AND gram IN (SELECT gram FROM g WHERE doc_id % 97 = 0))
            SELECT d.doc_id,
                   d.doc_id IN (SELECT doc_id FROM hits) AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        """,
        "docs_pmi_bigrams": r"""
            WITH tok AS (
                SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                          x -> x <> '')) AS token
                FROM documents WHERE text IS NOT NULL),
            tc AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
            tt AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_tok FROM tc),
            bgl AS (
                SELECT list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS t
                FROM documents WHERE text IS NOT NULL),
            bg AS (
                SELECT unnest(list_transform(
                           generate_series(1, len(t) - 1), i -> t[i]))
                           AS first,
                       unnest(list_transform(
                           generate_series(1, len(t) - 1), i -> t[i+1]))
                           AS second
                FROM bgl WHERE len(t) >= 2),
            bc AS (SELECT first, second, COUNT(*) AS c_xy FROM bg
                   GROUP BY first, second),
            bt AS (SELECT CAST(SUM(c_xy) AS DOUBLE) AS n_bg FROM bc)
            SELECT first || ' ' || second AS bigram,
                   CAST(c_xy AS BIGINT) AS n,
                   CAST(floor(1e6 * ln((c_xy / bt.n_bg)
                        / ((x.c / tt.n_tok) * (y.c / tt.n_tok))))
                        AS BIGINT) AS pmi_micro
            FROM bc
            JOIN tc x ON bc.first = x.token
            JOIN tc y ON bc.second = y.token
            CROSS JOIN bt CROSS JOIN tt
            WHERE c_xy >= 5
            ORDER BY pmi_micro DESC, bigram ASC LIMIT 20
        """,
        "doc_char_entropy": """
            WITH ch AS (
                SELECT doc_id, unnest(string_split(text, '')) AS c
                FROM documents WHERE text IS NOT NULL),
            f AS (SELECT doc_id, c, COUNT(*) AS n FROM ch
                  GROUP BY doc_id, c),
            t AS (SELECT doc_id, CAST(SUM(n) AS DOUBLE) AS tot FROM f
                  GROUP BY doc_id)
            SELECT f.doc_id,
                   CAST(SUM(CAST(floor(1e6 * -((n / tot)
                        * ln(n / tot))) AS BIGINT)) AS BIGINT)
                       AS entropy_micro
            FROM f JOIN t ON f.doc_id = t.doc_id
            GROUP BY f.doc_id
        """,
        "events_user_rank": """
            SELECT event_id, user_id,
                   CAST(row_number() OVER (PARTITION BY user_id
                       ORDER BY floor(value * 100) DESC, event_id)
                       AS BIGINT) AS rn,
                   CAST(dense_rank() OVER (PARTITION BY user_id
                       ORDER BY floor(value * 100) DESC) AS BIGINT) AS dr,
                   CAST(ntile(4) OVER (PARTITION BY user_id
                       ORDER BY floor(value * 100) DESC, event_id)
                       AS BIGINT) AS tile
            FROM events
        """,
        "docs_split_assign": """
            SELECT CASE
                     WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 5
                       THEN 'test'
                     WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 15
                       THEN 'val'
                     ELSE 'train' END AS split,
                   lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1, 2
        """,
        "docs_pack_sequences": r"""
            WITH RECURSIVE ord AS (
                SELECT lang, doc_id,
                       CAST(len(list_filter(
                           regexp_split_to_array(COALESCE(text, ''), '\s+'),
                           x -> x <> '')) AS BIGINT) AS ntok,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY doc_id) AS rn
                FROM documents),
            pack AS (
                SELECT lang, rn, doc_id, ntok,
                       CAST(0 AS BIGINT) AS seq_id, ntok AS cum
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.lang, o.rn, o.doc_id, o.ntok,
                       CASE WHEN p.cum + o.ntok > 512 AND p.cum > 0
                            THEN p.seq_id + 1 ELSE p.seq_id END,
                       CASE WHEN p.cum + o.ntok > 512 AND p.cum > 0
                            THEN o.ntok ELSE p.cum + o.ntok END
                FROM pack p JOIN ord o
                  ON o.lang IS NOT DISTINCT FROM p.lang AND o.rn = p.rn + 1)
            SELECT doc_id, lang, ntok, seq_id FROM pack
        """,
        "images_exact_dupes": f"""
            WITH aug AS (
                SELECT image_id, bytes FROM {_IMAGES}
                UNION ALL
                SELECT image_id, bytes FROM {_IMAGES} WHERE w % 5 = 0),
            g AS (SELECT bytes, COUNT(*) AS n_copies FROM aug
                  GROUP BY bytes HAVING COUNT(*) > 1)
            SELECT a.image_id, CAST(g.n_copies AS BIGINT) AS n_copies
            FROM aug a JOIN g ON a.bytes = g.bytes
        """,
        "images_bytes_entropy": f"""
            WITH h AS (SELECT image_id, phash, hex(bytes) AS hx
                       FROM {_IMAGES}),
            b AS (SELECT image_id, phash,
                         unnest(list_transform(
                             generate_series(1, length(hx) // 2),
                             i -> substr(hx, 2 * i - 1, 2))) AS byte
                  FROM h WHERE length(hx) > 0),
            f AS (SELECT image_id, phash, byte, COUNT(*) AS n FROM b
                  GROUP BY 1, 2, 3),
            t AS (SELECT image_id, phash, CAST(SUM(n) AS DOUBLE) AS tot
                  FROM f GROUP BY 1, 2)
            SELECT f.image_id, f.phash,
                   CAST(SUM(CAST(floor(1e6 * -((n / tot) * ln(n / tot)))
                        AS BIGINT)) AS BIGINT) AS entropy_micro
            FROM f JOIN t ON f.image_id = t.image_id AND f.phash = t.phash
            GROUP BY f.image_id, f.phash
        """,
        "customer_rfm": """
            WITH a AS (
                SELECT o_custkey,
                       CAST(max(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE))) AS BIGINT) AS rec_day,
                       COUNT(*) AS freq,
                       CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                            AS BIGINT) AS mon_cents
                FROM orders GROUP BY 1),
            q AS (SELECT quantile_disc(rec_day, 0.25) AS r1,
                         quantile_disc(rec_day, 0.5) AS r2,
                         quantile_disc(rec_day, 0.75) AS r3,
                         quantile_disc(freq, 0.25) AS f1,
                         quantile_disc(freq, 0.5) AS f2,
                         quantile_disc(freq, 0.75) AS f3 FROM a)
            SELECT a.o_custkey,
                   CAST(1 + CASE WHEN rec_day > r1 THEN 1 ELSE 0 END
                          + CASE WHEN rec_day > r2 THEN 1 ELSE 0 END
                          + CASE WHEN rec_day > r3 THEN 1 ELSE 0 END
                        AS BIGINT) AS r_score,
                   CAST(1 + CASE WHEN freq > f1 THEN 1 ELSE 0 END
                          + CASE WHEN freq > f2 THEN 1 ELSE 0 END
                          + CASE WHEN freq > f3 THEN 1 ELSE 0 END
                        AS BIGINT) AS f_score,
                   CAST(floor(log10(CAST(mon_cents AS DOUBLE))) AS BIGINT)
                       AS m_band
            FROM a, q
        """,
        "docs_keyword_search": r"""
            WITH t AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(
                           COALESCE(text, ''), '\s+'), x -> x <> '') AS toks
                FROM documents),
            m AS (SELECT doc_id, lang,
                         CAST(list_contains(toks, 'hash') AS INT)
                       + CAST(list_contains(toks, 'join') AS INT)
                       + CAST(list_contains(toks, 'filter') AS INT) AS nm
                  FROM t)
            SELECT doc_id, lang, CAST(nm AS BIGINT) AS n_terms_matched,
                   nm = 3 AS all_matched
            FROM m WHERE nm > 0
        """,
        "docs_unigram_surprisal": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                          x -> x <> '')) AS term
                FROM documents WHERE text IS NOT NULL),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
                   GROUP BY 1, 2),
            tc AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1),
            n AS (SELECT CAST(SUM(c) AS DOUBLE) AS nt FROM tc)
            SELECT tf.doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                   CAST(SUM(tf * CAST(floor(1e6 * -ln(tc.c / n.nt))
                        AS BIGINT)) AS BIGINT) AS surprisal_micro
            FROM tf JOIN tc USING (term) CROSS JOIN n
            GROUP BY tf.doc_id
        """,
        "big_orders_customers": """
            WITH big AS (
                SELECT l_orderkey AS o_orderkey,
                       CAST(SUM(CAST(floor(l_quantity) AS BIGINT))
                            AS BIGINT) AS total_qty
                FROM lineitem GROUP BY 1
                HAVING SUM(CAST(floor(l_quantity) AS BIGINT)) > 150)
            SELECT o.o_custkey AS c_custkey, c.c_name, b.o_orderkey,
                   b.total_qty,
                   CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_cents
            FROM big b
            JOIN orders o ON b.o_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "q6_forecast_revenue": """
            SELECT CAST(COALESCE(SUM(CAST(floor(
                       l_extendedprice * l_discount * 100) AS BIGINT)), 0)
                       AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE date_part('year', l_shipdate) = 1996
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "promo_revenue_share": """
            WITH j AS (
                SELECT strftime(date_trunc('month', l_shipdate),
                                '%Y-%m-%d') AS month,
                       CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                            AS BIGINT) AS disc_cents,
                       (p_type = 'PROMO') AS is_promo
                FROM lineitem JOIN part ON l_partkey = p_partkey)
            SELECT month,
                   CAST(SUM(CASE WHEN is_promo THEN disc_cents ELSE 0 END)
                        AS BIGINT) AS promo_cents,
                   CAST(SUM(disc_cents) AS BIGINT) AS total_cents,
                   CAST(floor(1e6 *
                        SUM(CASE WHEN is_promo THEN disc_cents ELSE 0 END)
                        / SUM(disc_cents)) AS BIGINT) AS promo_share_micro
            FROM j GROUP BY month
        """,
        "docs_quality_deciles": """
            WITH s AS (
                SELECT doc_id, n_chars,
                       CAST(floor(1e6 * (length(regexp_replace(
                            COALESCE(text, ''), '[^A-Za-z]', '', 'g'))
                            / greatest(length(COALESCE(text, '')), 1)))
                            AS BIGINT) AS score
                FROM documents),
            q AS (SELECT quantile_disc(score, 0.1) AS t1,
                         quantile_disc(score, 0.2) AS t2,
                         quantile_disc(score, 0.3) AS t3,
                         quantile_disc(score, 0.4) AS t4,
                         quantile_disc(score, 0.5) AS t5,
                         quantile_disc(score, 0.6) AS t6,
                         quantile_disc(score, 0.7) AS t7,
                         quantile_disc(score, 0.8) AS t8,
                         quantile_disc(score, 0.9) AS t9 FROM s)
            SELECT CAST(1 + CASE WHEN score > t1 THEN 1 ELSE 0 END
                          + CASE WHEN score > t2 THEN 1 ELSE 0 END
                          + CASE WHEN score > t3 THEN 1 ELSE 0 END
                          + CASE WHEN score > t4 THEN 1 ELSE 0 END
                          + CASE WHEN score > t5 THEN 1 ELSE 0 END
                          + CASE WHEN score > t6 THEN 1 ELSE 0 END
                          + CASE WHEN score > t7 THEN 1 ELSE 0 END
                          + CASE WHEN score > t8 THEN 1 ELSE 0 END
                          + CASE WHEN score > t9 THEN 1 ELSE 0 END
                        AS BIGINT) AS decile,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM s, q GROUP BY 1
        """,
        "events_dow_hour_heatmap": """
            SELECT CAST(date_part('dow', ts) AS BIGINT) AS dow,
                   CAST(date_part('hour', ts) AS BIGINT) AS hour,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_debounce": """
            WITH RECURSIVE ord AS (
                SELECT event_id, user_id, event_type,
                       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS rn
                FROM events),
            scan AS (
                SELECT event_id, user_id, event_type, ts_us, rn,
                       TRUE AS kept, ts_us AS last_kept
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.event_id, o.user_id, o.event_type, o.ts_us, o.rn,
                       o.ts_us >= s.last_kept + 100000000000 AS kept,
                       CASE WHEN o.ts_us >= s.last_kept + 100000000000
                            THEN o.ts_us ELSE s.last_kept END
                FROM scan s JOIN ord o
                  ON o.user_id = s.user_id
                 AND o.event_type = s.event_type
                 AND o.rn = s.rn + 1)
            SELECT event_id, user_id, event_type, kept FROM scan
        """,
        "embedding_quantize_int8": """
            WITH e AS (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                                             x -> CAST(x AS DOUBLE))) AS x,
                       unnest(generate_series(1, len(embedding))) AS d
                FROM embeddings),
            r AS (SELECT d, min(x) AS lo, max(x) AS hi FROM e GROUP BY d),
            c AS (SELECT e.vec_id, e.x, r.lo, r.hi,
                         CASE WHEN r.hi = r.lo THEN 0
                              ELSE least(floor((e.x - r.lo)
                                   / (r.hi - r.lo) * 255), 255)
                         END AS code
                  FROM e JOIN r USING (d)),
            v AS (SELECT vec_id,
                         CASE WHEN hi = lo THEN 0
                              ELSE floor(1e6 * abs(x - (lo + (code + 0.5)
                                   * (hi - lo) / 255)))
                         END AS err,
                         code
                  FROM c)
            SELECT vec_id, CAST(max(err) AS BIGINT) AS max_err_micro,
                   CAST(SUM(CAST(code AS BIGINT)) AS BIGINT) AS sum_code
            FROM v GROUP BY vec_id
        """,
        "late_orders_by_priority": """
            WITH late AS (
                SELECT DISTINCT l.l_orderkey
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) > 90)
            SELECT o.o_orderpriority, COUNT(*) AS n
            FROM orders o JOIN late ON o.o_orderkey = late.l_orderkey
            GROUP BY 1
        """,
        "lang_len_regression": r"""
            WITH m AS (
                SELECT lang, COUNT(*) AS n,
                       CAST(SUM(x) AS DOUBLE) AS sx,
                       CAST(SUM(y) AS DOUBLE) AS sy,
                       CAST(SUM(x * y) AS DOUBLE) AS sxy,
                       CAST(SUM(x * x) AS DOUBLE) AS sxx
                FROM (SELECT lang,
                             CAST(len(list_filter(regexp_split_to_array(
                                 COALESCE(text, ''), '\s+'),
                                 e -> e <> '')) AS BIGINT) AS x,
                             n_chars AS y
                      FROM documents)
                GROUP BY lang)
            SELECT lang, CAST(n AS BIGINT) AS n_docs,
                   -- parenthesized num/den FIRST, then *1e6: the same
                   -- floor(1e6 * (num/den)) double the numpy side computes
                   CAST(floor(1e6 * ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx))) AS BIGINT)
                       AS slope_micro,
                   CAST(floor(1e6 * ((sy - ((CAST(n AS DOUBLE) * sxy
                        - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx))
                        * sx) / CAST(n AS DOUBLE))) AS BIGINT)
                       AS intercept_micro
            FROM m
        """,
        "docs_lang_source_chi2": """
            WITH obs AS (SELECT lang, source, COUNT(*) AS n
                         FROM documents GROUP BY 1, 2),
            r AS (SELECT lang, CAST(SUM(n) AS DOUBLE) AS rn FROM obs
                  GROUP BY 1),
            c AS (SELECT source, CAST(SUM(n) AS DOUBLE) AS cn FROM obs
                  GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tn FROM obs),
            e AS (SELECT CAST(obs.n AS DOUBLE) AS o, r.rn * c.cn / t.tn AS ex
                  -- NULL-safe joins: a NULL lang/source is its own category
                  -- on BOTH sides (engine groups with dropna=False); plain
                  -- USING would silently drop NULL-keyed cells here
                  FROM obs JOIN r ON obs.lang IS NOT DISTINCT FROM r.lang
                           JOIN c ON obs.source IS NOT DISTINCT FROM c.source
                  CROSS JOIN t)
            SELECT CAST(SUM(CAST(floor(1e6 * (o - ex) * (o - ex) / ex)
                        AS BIGINT)) AS BIGINT) AS chi2_micro,
                   CAST(((SELECT COUNT(*) FROM r) - 1)
                        * ((SELECT COUNT(*) FROM c) - 1) AS BIGINT) AS dof,
                   (SELECT COUNT(*) FROM obs) AS n_cells
            FROM e
        """,
        "docs_export_by_lang": """
            SELECT CAST(lang AS VARCHAR) AS lang, COUNT(*) AS n_rows
            FROM documents GROUP BY lang
        """,
        "images_phash_components": f"""
            WITH RECURSIVE fp AS (
                SELECT phash, COUNT(*) AS n FROM {_IMAGES} GROUP BY phash
            ), c AS (
                SELECT phash, j.c AS chunk,
                       (phash >> (16 * j.c)) & 65535 AS val
                FROM fp CROSS JOIN (VALUES (0),(1),(2),(3)) j(c)
            ), pairs AS (
                SELECT DISTINCT a.phash AS pa, b.phash AS pb
                FROM c a JOIN c b
                  ON a.chunk = b.chunk AND a.val = b.val
                 AND a.phash < b.phash
                WHERE bit_count(xor(a.phash, b.phash)) <= 3
            ), edges AS (
                SELECT pa, pb FROM pairs
                UNION ALL SELECT pb AS pa, pa AS pb FROM pairs
            ), walk (node, lab) AS (
                SELECT DISTINCT pa AS node, pa AS lab FROM edges
                UNION
                SELECT e.pb AS node, w.lab
                FROM walk w JOIN edges e ON e.pa = w.node
            ), comp AS (
                SELECT node, MIN(lab) AS comp_rep FROM walk GROUP BY node
            )
            SELECT comp.comp_rep, COUNT(*) AS n_fps,
                   CAST(SUM(fp.n) AS BIGINT) AS n_rows
            FROM comp JOIN fp ON comp.node = fp.phash
            GROUP BY comp.comp_rep
        """,
    }


def _pii_scan_sql() -> str:
    """PII-scan oracle built from the SAME pattern strings the Ray side
    compiles (functions/text.PII_PATTERNS) — single source of truth."""
    from katydid_haskell_ray.functions.text import PII_PATTERNS

    counts = ",\n                ".join(
        f"CAST(len(regexp_extract_all(text2, '{pat}')) AS BIGINT) AS {name}"
        for name, pat in PII_PATTERNS.items())
    return f"""
        WITH aug AS (
            SELECT doc_id, text ||
                CASE WHEN doc_id % 5 = 0 THEN ' contact user'
                     || CAST(doc_id AS VARCHAR) || '@example.com now'
                     ELSE '' END ||
                CASE WHEN doc_id % 7 = 0 THEN ' call 555-'
                     || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' today'
                     ELSE '' END ||
                CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ref'
                     ELSE '' END AS text2
            FROM documents),
        c AS (
            SELECT doc_id,
                {counts}
            FROM aug)
        SELECT * FROM c WHERE n_emails + n_phones + n_ssns > 0
    """


def _subword_stats_sql() -> str:
    from katydid_haskell_ray.functions.text import BPE_PRETOKEN_PATTERN

    pat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    return rf"""
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(
                   COALESCE(text, ''), '\s+'), x -> x <> '')) AS BIGINT)
                   AS n_tokens,
               CAST(len(regexp_extract_all(COALESCE(text, ''), '{pat}'))
                   AS BIGINT) AS n_subwords
        FROM documents
    """


def _caption_ref_sql() -> str:
    from katydid_haskell_ray.sources.synth_images import _VOCAB

    vocab = ", ".join(f"'{w}'" for w in _VOCAB)
    return f"""
        SELECT image_id,
               COALESCE(len(list_filter(string_split(caption, ' '),
                                        x -> x NOT IN ({vocab}))) = 0,
                        FALSE) AS ref_ok
        FROM {_IMAGES}
    """
