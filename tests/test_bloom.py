"""Counting-Bloom prefiltered exact dedup (pipelines/bloom.py): the
output must be exact and plan-independent — identical rows with the
prefilter on, forced off, or saturated into all-false-positives — and
the two-bitplane partial merge must reproduce the global-count planes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray_data_mplsh.functions.hashing import hash_str_array
from ray_data_mplsh.pipelines.bloom import (_cells, _merged_planes,
                                            _plane_size, bloom_dedup)


def _docs_ds(n=400, n_distinct=120, seed=7):
    import ray.data

    rng = np.random.Generator(np.random.PCG64(seed))
    texts = [f"web page body {int(rng.integers(n_distinct))} words"
             for _ in range(n)]
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64), pa.int64()),
        "text": pa.array(texts),
    })
    return ray.data.from_arrow(
        [t.slice(0, n // 3), t.slice(n // 3, n // 3),
         t.slice(2 * (n // 3))])


def _norm(ds) -> pd.DataFrame:
    df = ds.to_pandas()[["doc_id", "n_copies", "text"]]
    return df.sort_values(["text"]).reset_index(drop=True) \
        .astype({"doc_id": np.int64, "n_copies": np.int64})


def _expected(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    g = df.groupby("text", as_index=False).agg(
        doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
    return g[["doc_id", "n_copies", "text"]].sort_values(["text"]) \
        .reset_index(drop=True).astype({"doc_id": np.int64,
                                        "n_copies": np.int64})


def test_bloom_dedup_exact_and_plan_independent(ray_session):
    want = _expected(_docs_ds())
    got = _norm(bloom_dedup(_docs_ds(), num_partitions=4))
    pd.testing.assert_frame_equal(got, want)
    # prefilter forced off: everything rides the exchange
    forced = _norm(bloom_dedup(_docs_ds(), num_partitions=4,
                               force_exchange=True))
    pd.testing.assert_frame_equal(forced, want)
    # saturated planes (8 cells): ~every probe is a false positive,
    # output must STILL be exact — FPs just ride the exchange
    saturated = _norm(bloom_dedup(_docs_ds(), num_partitions=4, m_cells=8))
    pd.testing.assert_frame_equal(saturated, want)


def test_bloom_dedup_all_unique_and_all_dup(ray_session):
    import ray.data

    uniq = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(64, dtype=np.int64)),
        "text": pa.array([f"one of a kind {i}" for i in range(64)])}))
    got = _norm(bloom_dedup(uniq, num_partitions=2))
    assert (got["n_copies"] == 1).all() and len(got) == 64
    dup = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(64, dtype=np.int64)),
        "text": pa.array(["same text"] * 64)}))
    got = _norm(bloom_dedup(dup, num_partitions=2))
    assert len(got) == 1
    assert got.loc[0, "doc_id"] == 0 and got.loc[0, "n_copies"] == 64


def test_partial_plane_merge_matches_global_counts(ray_session):
    """ge2 folded from per-block partials == ge2 from the global
    insertion counts, and the probe split is sound + effective: every
    true dup probes positive (no false negatives, ever) and on a
    mostly-unique corpus a decent share of uniques probes negative."""
    ds = _docs_ds(n=600, n_distinct=500, seed=11)
    tbl = pa.Table.from_pandas(ds.to_pandas())
    th = hash_str_array(tbl["text"])
    m = _plane_size(len(th), None)

    hashed = ds.map_batches(
        lambda b: b.append_column(
            "text_hash", pa.array(hash_str_array(b["text"]), pa.uint64())),
        batch_format="pyarrow").materialize()
    ge2 = _merged_planes(hashed, m)

    c1, c2 = _cells(th.astype(np.uint64), m)
    cnt = np.bincount(np.concatenate([c1, c2]).astype(np.int64),
                      minlength=m)
    ref = np.zeros(m // 8 + 1, np.uint8)
    hot = np.flatnonzero(cnt >= 2).astype(np.uint64)
    np.bitwise_or.at(ref, hot >> np.uint64(3),
                     np.uint8(1) << (hot & np.uint64(7)).astype(np.uint8))
    assert bytes(ge2) == bytes(ref)

    pot = (((ge2[c1 >> np.uint64(3)] >> (c1 & np.uint64(7)).astype(
        np.uint8)) & 1) & ((ge2[c2 >> np.uint64(3)] >> (c2 & np.uint64(
            7)).astype(np.uint8)) & 1)).astype(bool)
    texts = tbl["text"].to_pylist()
    seen: dict[str, int] = {}
    for t in texts:
        seen[t] = seen.get(t, 0) + 1
    is_dup = np.array([seen[t] >= 2 for t in texts])
    assert pot[is_dup].all()          # zero false negatives by algebra
    n_uniq = int((~is_dup).sum())
    pruned = int((~pot[~is_dup]).sum())
    assert pruned > 0.8 * n_uniq      # the prefilter actually prunes
