"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB. Ray is initialised by the driver BEFORE this module is imported:
no ``ray.init()`` / ``ray.shutdown()`` here or anywhere in the library.

Query inventory (* = oracle, rest rows-only with pytest gates — see
SURVEY.md Appendix B).
The registry lists every oracle-bearing query FIRST (the driver signs a
prefix of it), rows-only entries last:
  dedup family: q_exact_dedup*, q_bloom_dedup* (counting-Bloom
    prefiltered exact dedup: mergeable two-bitplane Bloom from
    per-block partials lets corpus-unique docs skip the exchange;
    output exact at any FP rate -> plain GROUP BY oracle),
    q_shard_assign* (deterministic output-shard manifest: knuth-hash
    shard labels with per-shard counts/id-ranges from <=16-row batch
    partials — the resumable-output story as a signed query),
    q_dup_inflation* (per-source duplicated-token cost report over one
    slim hash exchange; NULL ratio for zero-kept sources),
    q_dup_flow_matrix* (cross-source NEAR-dup flow counts over the
    memoized LSH verified pair set; oracle splices the full chain
    replay + two documents joins), q_tier_token_report* (tokens per
    dedup tier: memoized tier labels fact-fact inner-joined to token
    counts), q_dedup_documents, q_minhash_pairs,
    q_incremental_fold* (driver-signed incremental dedup: base run +
    checkpointed fold of a new shard, joint clusters re-keyed to
    min-original-id labels, oracled by the reps-collapsed LSH chain
    replay + recursive CC), q_fold_provenance* (daily-crawl triage over
    the fold: per shard doc, exact-dup-of-archive / dup-of-archive /
    dup-within-shard via symmetric window counts on the same replay),
    q_simhash_pairs* (full SQL signature replay: poly word hashes +
    SplitMix64 CTEs + bit votes + bit_count(xor) pairing),
    q_ngram_jaccard* (candidates over original-id exact-text reps,
    recall 1.0 at theta -> brute-force list_intersect oracle),
    q_embedding_near_dup* (exact small-side path at a data-calibrated
    threshold -> list_cosine_similarity threshold join),
    q_allpair_jaccard* (deterministic pair set -> list_intersect
    oracle), q_allpair_containment* (asymmetric Broder containment,
    both directions, shared intersect kernel)
  similarity search: q_knn_bruteforce* (list_cosine_similarity oracle),
    q_knn_lsh* (multi-probe ANN — full SQL replay since r5: hyperplane
    double literals, mask-enumerated Algorithm-1 probe selection,
    candidate rank join), q_knn_ivf (IVF-flat) — both with the
    distributed query-keyed top-k merge
  multimodal: q_media_dedup (exact byte dedup over the synthetic media
    table), q_media_features (real BMP/PNG/JPEG/WAV/Y4M decode ->
    content features), q_media_near_dup, q_media_frames (real Y4M frame
    sampling); resize/codec stages are pytest-gated in test_multimodal
  text analysis: q_lang_id*, q_token_counts*, q_bpe_token_counts*,
    q_quality_scores*, q_fingerprints, q_word_stats* (per-doc word
    frequency / modal word), q_doc_freq* (corpus df table, combiner
    partials before the groupby), q_top_terms* (per-doc tf/df relevance
    via word-/doc-keyed exchanges), q_decontaminate* (benchmark
    decontamination: broadcast snippet index + rolling-hash scan vs SQL
    contains), q_bigram_counts* (corpus word-bigram top-50),
    q_repetition_scores* (per-doc duplicate-bigram quality ratio),
    q_crossdoc_ngrams* (cross-document duplicated 8-gram coverage —
    RefinedWeb-style dup signal via gram-hash exchange),
    q_remove_dup_ngrams* (C4-style duplicated-span scrubbing: rewrite
    docs dropping non-owner dup-8-gram spans, broadcast probe +
    exchange fallback),
    q_prefix_dup_groups* (exact-prefix dup blocking groups),
    q_mixture_sample* (per-source deterministic mixture downsampling),
    q_gopher_quality* (Gopher-rule quality gate, integer-decided
    ratios), q_pii_scrub* (PII redaction: email/phone/IPv4 RE2 scrub
    with per-doc counts over deterministically derived PII text),
    q_chunk_tokens* (fixed-window token chunking with stride overlap —
    the LM context-window prep op, row-expanding map),
    q_contam_overlap* (fuzzy decontamination: fraction of a doc's
    distinct 8-grams occurring in the derived benchmark set, broadcast
    gram index), q_dedup_tiers* (tier-dedup attribution: exact/
    normalized/prefix/unique via one nested-group exchange),
    q_dedup_tier_report*
    (THE theme report — full tier attribution incl. the 'near' tier
    from the production LSH chain, oracled by the widest SQL replay in
    the registry: signatures + banding + pairing + verify + recursive
    CC + three window partitions)
  relational/aggregates: q_lang_counts*, q_len_filter*, q_top_sources*,
    q_distinct_langs*, q_events_daily*, q_events_props*,
    q_join_ord_cust*, q_lineitem_agg*, q_region_nation*,
    q_sample* (multiplicative-hash deterministic sample),
    q_quantiles* (distributed exact percentiles vs quantile_disc),
    q_top_docs_per_lang* (grouped top-k vs ROW_NUMBER),
    q_stratified_sample* (per-group deterministic hash sample),
    q_semi_join_customers* / q_anti_join_customers* (distributed
    semi/anti join vs EXISTS / NOT EXISTS),
    q_grouped_quantiles* (per-group exact percentiles),
    q_grouped_quantiles_cont* (per-group continuous percentiles),
    q_ntile_doc_len* (NTILE(4) window ranking, DuckDB fill rule),
    q_corr_len_tokens* (exact distributed Pearson correlation via
    integer moment partials),
    q_regression_len_tokens* (per-lang least-squares fit, same exact
    integer partials), q_normalized_dedup* (case/punct-insensitive
    exact dedup, norm-hash exchange), q_events_hourly* (hour x isodow
    profile via Arrow temporal kernels),
    q_dup_cluster_sizes* (exact-dup cluster-size histogram),
    q_shingle_stats* (per-doc distinct shingle counts straight from the
    flagship set builder), q_funnel_view_purchase* (first-view-before-
    last-purchase funnel via sentinel min/max partials),
    q_events_distinct* (multi-key DISTINCT rows with combiner),
    q_percent_rank_len* (PERCENT_RANK with shared tie ranks),
    q_cohort_retention* (first-day cohort x activity-day matrix via
    distinct-pair groupby + broadcast cohort map),
    q_rollup_lang_source* (GROUP BY ROLLUP lattice),
    q_cube_lang_source* (GROUP BY CUBE lattice),
    q_mad_len* (median absolute deviation from one value-count CDF),
    q_click_heavy_users* (per-user behavioral count comparison),
    q_mode_event_type* (grouped mode, deterministic tie-break),
    q_user_days_purchase_no_error* / q_user_days_purchase_and_error*
    (distributed EXCEPT / INTERSECT as presence flags),
    q_len_histogram* (fixed-width histogram), q_weighted_sample*
    (deterministic weighted Bernoulli), q_lang_sources_agg*
    (ordered-set string aggregation), q_edit_distance_dups*
    (blocked all-pairs Levenshtein near-dup, vectorized DP kernel),
    q_moving_sum_daily* (bounded-frame ROWS window aggregate),
    q_event_transitions* (per-user LAG transition counts),
    q_first_event_per_user* (first-touch attribution),
    q_unpivot_event_metrics* (UNPIVOT/melt via Dataset.union),
    q_tpch_q3* (3-table zero-shuffle broadcast join, top-10 revenue),
    q_tpch_q10* (returned-item customer report, broadcast order map +
    dimension attach), q_tpch_q18* (large-volume orders, HAVING cutoff
    + broadcast key filter), q_tpch_q6* (predicate-pushdown scan, int
    partials), q_tpch_q15* (top supplier, |suppliers|-bounded groupby),
    q_tpch_q13* (customer order-count distribution via count-of-counts),
    q_tpch_q4* (order-priority EXISTS via broadcast order map),
    q_tpch_q17* (small-quantity revenue, integer 20%%-of-avg cutoff),
    q_tpch_q19* (disjunctive brand/size/qty branches, broadcast part
    sets), q_tpch_q22* (dormant rich customers via the distributed
    anti-join), q_tpch_q7* (two-nation volume, broadcast order map with
    keyed-exchange fallback), q_tpch_q8* (national market share, dual
    num/den integer partials per year), q_tpch_q9* (profit by supplier
    nation x year, exchange-first at scale), q_tpch_q16* (supplier
    count per part attrs via a packed-pair distinct combiner),
    q_pack_sequences* (sequence packing via a
    distributed exclusive prefix sum over token counts),
    q_late_shipments* (fact-fact keyed-exchange inner join, Q12 shape),
    q_profile_events* (one-pass per-column null/count profile),
    q_kmeans_embeddings (iterative distributed Lloyd's, rows-only;
    numpy-reference pinned in test_kmeans),
    q_global_rank_len* (global RANK via broadcast CDF, no global sort),
    q_user_activity_histogram* (key-skew count-of-counts profiler),
    q_moving_sum_range* (time-based RANGE window frame; gappy-day fuzz),
    q_pattern_counts* (actor-pool regex scan, Arrow RE2 kernel),
    q_dup_rate_by_source* (dedup attribution report),
    q_distinct_users* (exact per-group COUNT DISTINCT via user-keyed
    exchange), q_left_join_counts* (LEFT OUTER join, fact side
    pre-aggregated then broadcast), q_quantiles_cont* (continuous
    interpolated percentiles, DuckDB quantile_cont rank rule),
    q_full_outer_cust_supp* (distributed FULL OUTER m:n join:
    schema-padded union exchange + vectorized cross-product expansion)
  sketches with exactness proofs: q_heavy_hitters_exact* (Misra-Gries
    prune + exact candidate recount, provability gate vs full GROUP BY),
    q_kmv_doc_ids* (KMV whose SplitMix64 hash is replayed in SQL via
    HUGEINT split-multiplies — the ESTIMATE itself is bit-exact)
  custom operators: q_events_sliding* (sliding-window aggregate),
    q_asof_event_order* (distributed as-of join vs DuckDB ASOF),
    q_range_join_events* (temporal range join, trailing-window counts),
    q_sessionize* (gap-rule sessionization vs lag/window SQL),
    q_curation_e2e* (flagship curation chain: quality gate -> exact
    dedup -> mixture downsample -> token count, one exchange,
    bit-exact end-to-end vs a staged SQL CTE),
    q_pivot_events* (daily event-type pivot via bincount partials),
    q_user_gaps* (per-user LAG-gap stats, one vectorized diff),
    q_cumulative_daily* (running daily total; driver cumsum over the
    tiny |days|-row groupby result)

Rows-only rationale (driver contract permits omitting SQL for
non-expressible ops):
q_minhash_pairs / q_dedup_documents depend on url-hash doc ids
(SipHash) that SQL cannot replay — q_ngram_jaccard* now covers the same
band/probe candidate generation with original ids, and
q_allpair_jaccard* pins the exact-Jaccard scoring kernel; q_knn_ivf is
approximate by design (its candidate set depends on sampled centroids
of an iterative k-means — no SQL twin; q_knn_bruteforce* pins the
scoring + distributed merge and q_knn_lsh* replays the multi-probe
plan in full);
q_fingerprints is winnowing (rolling-hash rightmost-argmin windows);
q_kmeans_embeddings is iterative (numpy-reference pinned);
q_media_dedup has no sf media table (planted-dup pytest oracle). The
former no-oracle rows q_simhash_pairs, q_ngram_jaccard,
q_embedding_near_dup, q_kmv_distinct and q_heavy_hitters are now
bit-exact: the sketches via their provable-exactness regimes (20
distinct sources < counters/slots), the rest per above.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (SURVEY.md §3.2 S0-S10) on the driver testdata
    documents table at sf0.001 (no html column -> pipeline enters at S2,
    doc_id plays the url role; SURVEY.md §3.3). Also runs the THEME
    report — tier-dedup attribution (exact / normalized / near / prefix
    / unique, q_dedup_tier_report) — on the same corpus and emits its
    tier counters, so the driver smoke path exercises the full
    attribution chain, not only the query registry (VERDICT r4 #5)."""
    import json
    from collections import Counter

    import numpy as np

    from ray_data_mplsh.config import MPLSHConfig
    from ray_data_mplsh.pipelines.dedup import run_dedup
    from ray_data_mplsh.pipelines.queries import q_dedup_tier_report
    from ray_data_mplsh.sources import read_documents

    docs = read_documents("/root/testdata/sf0.001")
    cfg = MPLSHConfig(min_chars=10)
    res = run_dedup(docs, cfg, extract=False, url_col="doc_id",
                    text_col="text")

    tier_counts: Counter = Counter()
    for b in q_dedup_tier_report("/root/testdata/sf0.001").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        vals, counts = np.unique(
            b["tier"].to_numpy(zero_copy_only=False), return_counts=True)
        tier_counts.update(dict(zip(vals.tolist(), counts.tolist())))
    print("tier_counts: "
          + json.dumps(dict(sorted(tier_counts.items())), sort_keys=True))

    return res.dedup_out.select_columns(
        ["doc_id", "url", "cluster_id", "is_canonical", "n_chars"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from ray_data_mplsh.pipelines.queries import QUERIES

    out = dict(QUERIES)
    out["q_minhash_pairs"] = _q_minhash_pairs
    out["q_dedup_documents"] = _q_dedup_documents
    out["q_media_dedup"] = _q_media_dedup
    out["q_media_features"] = _q_media_features
    out["q_media_near_dup"] = _q_media_near_dup
    out["q_media_frames"] = _q_media_frames
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for the SQL-expressible queries. Non-expressible
    pipelines (MinHash LSH, clustering) get the driver's rows-only check
    and are instead gated by the oracle-equality pytest suite
    (SURVEY.md §5 item 1)."""
    from ray_data_mplsh.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)


def _q_minhash_pairs(sf_dir: str) -> Any:
    """MinHash-LSH candidate generation + Jaccard verification over the
    documents table (ops 10-18). Not SQL-expressible -> rows-only."""
    from ray_data_mplsh.config import MPLSHConfig
    from ray_data_mplsh.pipelines.dedup import run_dedup
    from ray_data_mplsh.sources import read_documents

    docs = read_documents(sf_dir)
    cfg = MPLSHConfig(min_chars=10)
    res = run_dedup(docs, cfg, extract=False, url_col="doc_id",
                    text_col="text", skip_substring=True)
    return res.verified


def _q_media_dedup(sf_dir: str) -> Any:
    """Multimodal plumbing surface: exact byte dedup over a deterministic
    synthetic media table (payload-hash exchange + exact in-partition
    grouping). No media tables ship in the sf dirs, so the input is the
    seeded synth fixture (same rows at any sf); rows-only by contract —
    gated by the planted-duplicate pytest oracles (test_multimodal)."""
    from ray_data_mplsh.stages.multimodal import (media_exact_dedup,
                                                  synth_media)

    return media_exact_dedup(synth_media(300, seed=13, n_distinct=100))


def _q_media_features(sf_dir: str) -> Any:
    """Real media decode surface (since r4): BMP/PNG/baseline-JPEG/WAV/
    Y4M payloads in the synth fixture decode to actual pixels/samples/
    frames via the pure-numpy codecs (functions/mediacodec.py +
    functions/jpegcodec.py) and featurize in the actor-pool decoder;
    opaque codec-format payloads take the deterministic stub. The feature
    column is flattened to per-dim scalars so the driver's rows-only
    hash is stable. Rows-only by contract (no media tables ship in the
    sf dirs) — gated by the round-trip + dispatch pytest oracles."""
    import numpy as np
    import pyarrow as pa

    from ray_data_mplsh.stages.multimodal import decode_media, synth_media

    feats = decode_media(synth_media(120, seed=21), batch_size=16)

    def flatten(t: pa.Table) -> pa.Table:
        col = t["feature"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # zero-copy: fixed-size-list values buffer viewed as (n, dim)
        f = col.flatten().to_numpy(zero_copy_only=False) \
            .reshape(t.num_rows, -1) if t.num_rows else \
            np.empty((0, 16), np.float32)
        cols = {"media_id": t["media_id"], "media_type": t["media_type"]}
        for d in range(f.shape[1]):
            cols[f"f{d:02d}"] = pa.array(f[:, d].astype(np.float32))
        return pa.table(cols)

    return feats.map_batches(flatten, batch_format="pyarrow")


def _q_media_near_dup(sf_dir: str) -> Any:
    """Feature-cosine media near-dup over planted byte-duplicates: decode
    (real kernels for BMP/PNG/JPEG/WAV/Y4M) -> embedding near-dup
    pipeline. Rows-only; the planted pairs are pinned in
    test_multimodal."""
    from ray_data_mplsh.stages.multimodal import media_near_dup, synth_media

    return media_near_dup(synth_media(120, seed=21, n_distinct=60),
                          threshold=0.999)


def _q_media_frames(sf_dir: str) -> Any:
    """Video frame-sampling surface (since r4 REAL for Y4M payloads: the
    frame count is parsed from the YUV4MPEG2 header, indices are every
    n-th actual frame). Rows-only by contract (no media tables ship in
    the sf dirs) — the expected index sets are pinned per-payload in
    test_multimodal's fixture-derived equality test."""
    from ray_data_mplsh.stages.multimodal import frame_sampler, synth_media

    return frame_sampler(synth_media(150, seed=21), every_n=2,
                         max_frames=4)


def _q_dedup_documents(sf_dir: str) -> Any:
    """Full flagship dedup over the documents table. Rows-only."""
    from ray_data_mplsh.config import MPLSHConfig
    from ray_data_mplsh.pipelines.dedup import run_dedup
    from ray_data_mplsh.sources import read_documents

    docs = read_documents(sf_dir)
    cfg = MPLSHConfig(min_chars=10)
    res = run_dedup(docs, cfg, extract=False, url_col="doc_id",
                    text_col="text")
    return res.dedup_out.select_columns(
        ["doc_id", "url", "cluster_id", "is_canonical"])
