"""Local driver-gate rehearsal: run ``queries()`` entries against their
``ORACLE_SQL`` DuckDB twins on the sf0.001 tables, replicating the
driver's compare (sort columns by name, sort rows, exact value equality).
Covers the word-frequency analytics and the deterministic all-pairs
Jaccard added after round 1 — the queries whose SQL parity is subtlest
(string split semantics, list_intersect vs hash-set kernel)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ray_data_mplsh.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
CHECK = ["q_word_stats", "q_doc_freq", "q_allpair_jaccard",
         "q_heavy_hitters_exact", "q_kmv_doc_ids", "q_sessionize",
         "q_semi_join_customers", "q_anti_join_customers",
         "q_grouped_quantiles", "q_decontaminate", "q_top_terms",
         "q_bigram_counts", "q_repetition_scores", "q_pivot_events",
         "q_user_gaps", "q_cumulative_daily", "q_crossdoc_ngrams",
         "q_mixture_sample", "q_prefix_dup_groups",
         "q_rollup_lang_source", "q_distinct_users",
         "q_left_join_counts", "q_quantiles_cont", "q_curation_e2e",
         "q_full_outer_cust_supp", "q_grouped_quantiles_cont",
         "q_ntile_doc_len", "q_corr_len_tokens",
         "q_allpair_containment", "q_normalized_dedup",
         "q_regression_len_tokens", "q_events_hourly",
         "q_dup_cluster_sizes", "q_shingle_stats",
         "q_funnel_view_purchase", "q_events_distinct",
         "q_percent_rank_len", "q_cohort_retention",
         "q_cube_lang_source", "q_mad_len", "q_click_heavy_users",
         "q_mode_event_type", "q_user_days_purchase_no_error",
         "q_user_days_purchase_and_error", "q_len_histogram",
         "q_weighted_sample", "q_lang_sources_agg",
         "q_edit_distance_dups", "q_moving_sum_daily",
         "q_event_transitions", "q_first_event_per_user",
         "q_unpivot_event_metrics", "q_dup_rate_by_source", "q_tpch_q3",
         "q_late_shipments", "q_profile_events", "q_global_rank_len",
         "q_user_activity_histogram", "q_moving_sum_range",
         "q_pattern_counts", "q_embedding_near_dup", "q_sample",
         "q_stratified_sample", "q_ngram_jaccard", "q_kmv_distinct",
         "q_heavy_hitters", "q_simhash_pairs", "q_minhash_sigs",
         "q_band_keys", "q_fingerprints", "q_parts_by_brand",
         "q_promo_revenue", "q_top_parts_revenue", "q_canonical_urls",
         "q_tpch_q5", "q_url_dedup", "q_events_sliding",
         "q_lsh_verified_pairs", "q_lsh_clusters",
         "q_substring_candidates", "q_tpch_q10", "q_tpch_q18",
         "q_pack_sequences", "q_remove_dup_ngrams", "q_tpch_q6",
         "q_tpch_q15", "q_tpch_q13", "q_tpch_q4", "q_tpch_q17",
         "q_tpch_q19", "q_tpch_q22", "q_tpch_q7", "q_gopher_quality",
         "q_dedup_tiers", "q_tpch_q8", "q_tpch_q16", "q_tpch_q9",
         "q_dedup_tier_report", "q_knn_lsh", "q_tpch_q12", "q_tpch_q21",
         "q_tpch_q2", "q_tpch_q11", "q_tpch_q20", "q_pii_scrub",
         "q_chunk_tokens", "q_contam_overlap", "q_incremental_fold",
         "q_fold_provenance", "q_lm_score", "q_paragraph_dedup",
         "q_ppjoin_pairs", "q_dsir_weights", "q_token_budget_mixture",
         "q_ppjoin_clusters", "q_embedding_dedup_clusters",
         "q_lsh_recall", "q_curation_v2", "q_soft_dedup_weights",
         "q_train_split", "q_boilerplate_lines", "q_cdc_chunks",
         "q_oov_rate", "q_curation_v3", "q_bloom_dedup",
         "q_shard_assign", "q_dup_inflation", "q_dup_flow_matrix",
         "q_tier_token_report", "q_best_of_dup_group",
         "q_jaccard_histogram", "q_bow_dedup", "q_prefix_dup_flow",
         "q_split_leakage", "q_lang_confusion", "q_ccnet_pipeline",
         "q_within_doc_line_dedup", "q_best_of_near_cluster",
         "q_skyline_docs", "q_reservoir_sample", "q_hapax_rate"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for tbl in ("documents", "events", "customer", "orders", "supplier",
                "lineitem", "embeddings", "region", "nation", "part"):
        con.sql(f"CREATE VIEW {tbl} AS "
                f"SELECT * FROM '{SF_DIR}/{tbl}.parquet'")
    yield con
    con.close()


def _as_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def test_registry_lists_oracled_queries_first():
    """The driver signs correctness rows for a PREFIX of the registry:
    every oracle-bearing query must precede every rows-only one, every
    oracle key must have a query, and the first 50 slots (the driver's
    round-1/2 window) must all be oracle-checkable."""
    names = list(QUERIES)
    n_or = sum(1 for k in names if k in ORACLE_SQL)
    assert all(k in ORACLE_SQL for k in names[:n_or])
    assert not [k for k in ORACLE_SQL if k not in QUERIES]
    assert all(k in ORACLE_SQL for k in names[:min(50, n_or)])
    assert n_or >= 50


@pytest.mark.parametrize("name", CHECK)
def test_query_matches_oracle(ray_session, oracle_con, name):
    ray_df = _as_df(QUERIES[name](SF_DIR))
    sql_df = oracle_con.sql(ORACLE_SQL[name]).df()
    cols = sorted(ray_df.columns)
    assert cols == sorted(sql_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = sql_df[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes), name
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_moving_sum_frames_with_day_gaps(ray_session, tmp_path):
    """The sf corpora have contiguous days, where ROWS and RANGE frames
    coincide — fuzz both window queries on gappy per-type day sets so
    the frame semantics actually diverge, each vs its DuckDB oracle."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    rows = []
    base = pd.Timestamp("2024-03-01").value // 1000
    for ty in ("a", "b", "c"):
        days = np.unique(rng.choice(30, size=rng.integers(3, 12),
                                    replace=False))
        for d in days:  # gappy day grid per type
            for _ in range(int(rng.integers(1, 4))):
                rows.append((base + int(d) * 86_400_000_000
                             + int(rng.integers(0, 86_400_000_000)),
                             ty, round(float(rng.uniform(0, 99)), 2)))
    t = pa.table({
        "ts": pa.array([r[0] for r in rows],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array([r[2] for r in rows], pa.float64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    outs = {}
    for name in ("q_moving_sum_daily", "q_moving_sum_range"):
        got = _as_df(QUERIES[name](str(tmp_path)))
        want = con.sql(ORACLE_SQL[name]).df()
        cols = sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_exact=True)
        outs[name] = a
    # the gaps must make the two frame semantics actually differ
    assert not outs["q_moving_sum_daily"]["mov3"].equals(
        outs["q_moving_sum_range"]["mov3d"])


def test_mode_tie_break_tie_heavy(ray_session, tmp_path):
    """q_mode_event_type's lexicographic tie-break, fuzzed where ties are
    GUARANTEED (tiny per-user counts over few types) — the sf corpora
    rarely produce exact count ties."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    n = 300
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "event_type": pa.array(
            rng.choice(["z", "a", "m"], n).astype(object))})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = _as_df(QUERIES["q_mode_event_type"](str(tmp_path)))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    want = con.sql(ORACLE_SQL["q_mode_event_type"]).df()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_crossdoc_ngrams_hash_only_path_equal(ray_session):
    """Scale mode (128-bit gram keys, no gram strings shuffled) must
    produce the identical coverage table as the oracle string mode."""
    import ray.data

    from ray_data_mplsh.pipelines.queries import crossdoc_ngrams

    ds_a = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id", "text"])
    ds_b = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id", "text"])
    a = crossdoc_ngrams(ds_a, hash_only=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = crossdoc_ngrams(ds_b, hash_only=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_ntile_fill_rule_tiny_and_tied_groups(ray_session, tmp_path):
    """The sf corpora never produce a language group smaller than the
    tile count; fuzz the NTILE kernel where the fill rule actually
    bites — group sizes 1..9 (incl. < k), heavy n_chars ties — vs
    DuckDB NTILE on the same parquet."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(31)
    langs = np.repeat([f"g{i}" for i in range(12)],
                      rng.integers(1, 10, 12))
    n = len(langs)
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "lang": pa.array(langs),
        "n_chars": pa.array(rng.integers(0, 4, n).astype(np.int64)),
        "text": pa.array(["x"] * n)})
    import pyarrow.parquet as pq
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _as_df(QUERIES["q_ntile_doc_len"](str(tmp_path)))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = con.sql(ORACLE_SQL["q_ntile_doc_len"]).df()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    con.close()


def test_dup_cluster_sizes_with_planted_dups(ray_session, tmp_path):
    """The sf corpora contain no exact duplicates (histogram collapses
    to one size=1 row); plant multi-doc clusters and check the full
    histogram vs DuckDB."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(41)
    texts = [f"doc body {i % 37}" for i in range(200)]  # sizes 5 and 6
    t = pa.table({
        "doc_id": pa.array(rng.permutation(200).astype(np.int64)),
        "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _as_df(QUERIES["q_dup_cluster_sizes"](str(tmp_path)))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = con.sql(ORACLE_SQL["q_dup_cluster_sizes"]).df()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    con.close()


def test_percent_rank_tie_heavy(ray_session, tmp_path):
    """Tie groups must share the min rank: fuzz with n_chars drawn from
    only 3 values and tiny groups, vs DuckDB PERCENT_RANK."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(51)
    langs = np.repeat([f"g{i}" for i in range(9)],
                      rng.integers(1, 8, 9))
    n = len(langs)
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "lang": pa.array(langs),
        "n_chars": pa.array(rng.integers(0, 3, n).astype(np.int64)),
        "text": pa.array(["x"] * n)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _as_df(QUERIES["q_percent_rank_len"](str(tmp_path)))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = con.sql(ORACLE_SQL["q_percent_rank_len"]).df()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    con.close()


def test_fingerprints_oracle_boundary_cases(ray_session, tmp_path):
    """q_fingerprints edge regimes the sf corpora may not exercise: a doc
    with a REPEATED >= 30-char span (equal fingerprint values at
    different positions must collapse to ONE on both the kernel and the
    COUNT(DISTINCT window-min) oracle), short docs in the single-
    fingerprint regime (1 <= grams < 21), sub-30-char docs (zero
    fingerprints), and an empty string."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(97)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    # span >= winnow_k + winnow_w - 1 = 50 chars: repeated occurrences are
    # GUARANTEED to select at least one identical fingerprint value at
    # different positions, exercising the distinct-value collapse
    span = "".join(rng.choice(alpha, 64))
    filler = "".join(rng.choice(alpha, 120))
    texts = [
        span + filler + span + filler[::-1] + span,  # dup span, 3 copies
        "".join(rng.choice(alpha, 40)),              # 11 grams: m < w
        "".join(rng.choice(alpha, 30)),              # exactly 1 gram
        "tiny doc",                                  # n < k: 0
        "",                                          # empty: 0
        "".join(rng.choice(alpha, 400)),             # generic big doc
        span,                                        # doc == the span
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _as_df(QUERIES["q_fingerprints"](str(tmp_path)))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = con.sql(ORACLE_SQL["q_fingerprints"]).df()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # regime sanity: short docs got exactly 1, sub-k docs got 0
    byid = got.set_index("doc_id")["n_fingerprints"]
    assert byid[1] == 1 and byid[2] == 1
    assert byid[3] == 0 and byid[4] == 0
    assert byid[0] > 0 and byid[5] > 0 and byid[6] >= 1
    # the collapse must bite: doc 0 holds 3 copies of the span, so its
    # per-position selections exceed its distinct fingerprint count
    from ray_data_mplsh.config import MPLSHConfig
    from ray_data_mplsh.functions.hashing import winnow_fingerprints
    cfg = MPLSHConfig()
    n_positions = len(winnow_fingerprints(texts[0], cfg.winnow_k,
                                          cfg.winnow_w)[0])
    assert byid[0] < n_positions
    con.close()


def test_fingerprints_oracle_ascii_precondition_boundary(ray_session,
                                                         tmp_path):
    """_WINNOW_SQL folds codepoints while the kernel folds UTF-8 bytes —
    bit-equal only on ASCII text (the sf documents corpus by
    construction). Pin the divergence deterministically: 28 ASCII chars
    + one 2-byte char is 29 codepoints (below the 30-gram threshold, so
    the oracle counts 0) but 30 UTF-8 bytes (exactly one gram, so the
    kernel counts 1)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["a" * 28 + "é"])})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _as_df(QUERIES["q_fingerprints"](str(tmp_path)))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = con.sql(ORACLE_SQL["q_fingerprints"]).df()
    assert int(got.n_fingerprints.iloc[0]) == 1   # kernel: 30 bytes
    assert int(want.n_fingerprints.iloc[0]) == 0  # replay: 29 codepoints
    con.close()


def _check_vs_oracle(name, tmp_path):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    got = _as_df(QUERIES[name](str(tmp_path)))
    want = con.sql(ORACLE_SQL[name]).df()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols, name
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes), name
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    con.close()
    return a


def test_lsh_pairs_oracle_star_branch(ray_session, tmp_path):
    """The sf corpora never push a band bucket over bucket_cap (256), so
    the oracle's star-pairing branch is otherwise dead code: plant 300
    byte-identical docs (every band key bucket holds all 300 rows) and
    pin engine == oracle through the star path; the verified pair set
    must be exactly the star of the min doc."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    text = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array([text] * 300)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    a = _check_vs_oracle("q_lsh_verified_pairs", tmp_path)
    assert len(a) == 299 and (a.a == 0).all()  # star at the min doc
    assert (a.jaccard == 1.0).all()
    labels = _check_vs_oracle("q_lsh_clusters", tmp_path)
    assert len(labels) == 300 and labels.cluster_id.nunique() == 1


def test_substring_candidates_oracle_star_branch(ray_session, tmp_path):
    """Same for the substring pairing at substr_bucket_cap (16): 20 docs
    share a 64-char span (one fp bucket of 20 > 16 -> star) amid unique
    filler docs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(43)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    span = "".join(rng.choice(alpha, 64))
    texts = ["".join(rng.choice(alpha, 40)) + span
             + "".join(rng.choice(alpha, 40)) for _ in range(20)]
    texts += ["".join(rng.choice(alpha, 150)) for _ in range(10)]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    a = _check_vs_oracle("q_substring_candidates", tmp_path)
    # the 20 span-sharers must be connected through the pair set (star
    # or direct); no guarantee of all-pairs because the shared-span fp
    # bucket exceeds the cap
    import collections
    adj = collections.defaultdict(set)
    for x, y in zip(a.a, a.b):
        adj[x].add(y)
        adj[y].add(x)
    seen, stack = set(), [0]
    while stack:
        v = stack.pop()
        if v in seen:
            continue
        seen.add(v)
        stack.extend(adj[v])
    assert set(range(20)) <= seen


def test_lsh_clusters_oracle_chain_topology(ray_session, tmp_path):
    """Transitive clusters (A~B~C with A and C dissimilar) exercise the
    recursive label propagation beyond depth 1: docs built from sliding
    word blocks so adjacent docs overlap heavily and distant docs
    don't. Equality is deterministic; the meta-assert only requires
    that some multi-hop cluster actually formed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(47)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    blocks = [[("".join(rng.choice(alpha, 7))) for _ in range(10)]
              for _ in range(16)]
    texts = [" ".join(w for b in blocks[i:i + 9] for w in b)
             for i in range(8)]  # doc i spans blocks i..i+8
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    _check_vs_oracle("q_lsh_verified_pairs", tmp_path)
    labels = _check_vs_oracle("q_lsh_clusters", tmp_path)
    sizes = labels.groupby("cluster_id").size()
    assert len(labels) and sizes.max() >= 3  # a multi-hop chain formed


def test_remove_dup_ngrams_exchange_path_equals_broadcast(ray_session):
    """The scrub operator's exchange fallback (dup-gram set too big to
    broadcast, forced with broadcast_max_grams=0) must produce the exact
    broadcast-path result — same covered spans, same rebuilt text."""
    from ray_data_mplsh.pipelines.queries import _read, remove_dup_ngrams

    ds = _read(SF_DIR, "documents", ["doc_id", "text"])
    a = remove_dup_ngrams(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = remove_dup_ngrams(_read(SF_DIR, "documents", ["doc_id", "text"]),
                          broadcast_max_grams=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert int(a.n_removed.sum()) > 0  # the fixture must be non-vacuous


def test_pack_sequences_sparse_ids_and_block_invariance(ray_session,
                                                        tmp_path):
    """The distributed prefix scan must be independent of physical
    batching and robust to NON-DENSE doc_ids (negative, huge gaps,
    uneven range buckets) — fuzz vs a single-process numpy cumsum and
    vs the SQL window twin, at two different block counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ray_data_mplsh.pipelines.queries import q_pack_sequences

    rng = np.random.default_rng(31)
    ids = np.unique(np.concatenate([
        rng.integers(-5_000, 5_000, 200),
        rng.integers(10**9, 10**9 + 50, 20),  # a far-away range bucket
    ])).astype(np.int64)
    texts = [" ".join("w%d" % k for k in rng.integers(0, 9, rng.integers(1, 40)))
             for _ in ids]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    # numpy reference: exclusive cumsum of token counts in doc_id order
    nt = np.array([len(s.split(" ")) for s in texts], np.int64)
    cum = np.concatenate(([0], np.cumsum(nt)[:-1]))
    want = pd.DataFrame({"doc_id": ids, "n_tokens": nt,
                         "pack_id": cum // 2048, "pack_offset": cum % 2048})

    got = q_pack_sequences(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)

    # different physical batching must not change the layout: rewrite
    # the parquet with tiny row groups (more blocks) and re-run
    pq.write_table(t, str(tmp_path / "documents.parquet"),
                   row_group_size=13)
    got2 = q_pack_sequences(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want, check_exact=True)


def test_dedup_tiers_planted(ray_session, tmp_path):
    """dedup_tiers on a planted corpus exercising every tier (the sf
    documents corpus has no exact/normalized dups, so the driver gate
    only sees 'prefix'/'unique' — this pins the other branches): an
    exact dup, a case variant, a punctuation variant, a shared-40-prefix
    doc, and two uniques, checked against hand labels AND the DuckDB
    window replay."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ray_data_mplsh.pipelines.queries import ORACLE_SQL, q_dedup_tiers

    base = "alpha beta gamma delta " * 4  # 40-char norm prefixes collide
    texts = [
        base + "one two three",                      # 0: unique rep
        base + "one two three",                      # 1: exact dup of 0
        (base + "one two three").upper(),            # 2: case variant
        base + "one!! two,, three",                  # 3: punct variant
        base + "totally different tail words here",  # 4: prefix-only dup
        "no shared prefix at all in this document",  # 5: unique
    ]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = q_dedup_tiers(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["tier"]) == ["unique", "exact", "normalized",
                                 "normalized", "prefix", "unique"]

    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql(ORACLE_SQL["q_dedup_tiers"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    con.close()
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_dedup_tier_report_planted(ray_session, tmp_path):
    """q_dedup_tier_report on a planted corpus exercising every tier
    including 'near' (the sf corpus families are prefix-identical, so
    the driver gate never shows 'prefix' behind 'near'): an exact dup,
    a case variant, a prefix-only collision with an unrelated tail, and
    a high-Jaccard near pair perturbed INSIDE the first 40 chars (so
    prefix blocking does not catch it), checked against hand labels AND
    the full-chain DuckDB replay. All texts lowercase/ASCII/single-
    spaced where LSH parity requires it (the case variant is shielded:
    its 'normalized' tier fires before any signature divergence could
    matter)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ray_data_mplsh.pipelines.queries import (ORACLE_SQL,
                                                  q_dedup_tier_report)

    words = ["w%d" % (i * 7 % 97) for i in range(200)]
    base = " ".join(words)
    near = " ".join(["zz" if i == 2 else w
                     for i, w in enumerate(words)])  # differs at char ~8
    pfx_tail = " ".join(words[:14]) + " " + \
        " ".join("t%d" % (i * 13 % 89) for i in range(200))
    texts = [
        base,                    # 0: rep -> unique
        base,                    # 1: exact dup of 0
        base.upper(),            # 2: case variant -> normalized
        near,                    # 3: near-dup of 0, prefix differs
        pfx_tail,                # 4: shares 40-prefix with 0, tail alien
        "totally unrelated words only here once",  # 5: unique
    ]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = q_dedup_tier_report(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["tier"]) == ["unique", "exact", "normalized",
                                 "near", "prefix", "unique"]

    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql(ORACLE_SQL["q_dedup_tier_report"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    con.close()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
