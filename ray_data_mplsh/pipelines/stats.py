"""Reporting aggregates (SURVEY.md §2.5 ops 26-28): bucket-size histogram
(skew diagnostics), cluster statistics, recall/precision vs planted ground
truth. All combiner-style: partial counts inside map_batches, tiny final
merge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bucket_histogram(band_keys) -> pd.DataFrame:
    """band key table -> (bucket_size, n_buckets) distribution (op 26).

    Partial per-batch bucket counts understate sizes for buckets that span
    batches; sizes are exact because counting groups by the 64-bit
    band_hash across the whole dataset via a value_counts merge — the
    per-batch partial is a (hash, count) table, merged driver-side
    (bounded: one row per distinct bucket, and diagnostics run on samples
    at web scale)."""

    def partial(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keys, counts = np.unique(bh, return_counts=True)
        return pa.table({"band_hash": pa.array(keys, pa.uint64()),
                         "cnt": pa.array(counts, pa.int64())})

    parts = band_keys.map_batches(partial, batch_format="pyarrow").to_pandas()
    sizes = parts.groupby("band_hash")["cnt"].sum()
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame({"bucket_size": hist.index.astype(int),
                         "n_buckets": hist.values.astype(int)})


def cluster_stats(labels, top_k: int = 10) -> dict:
    """labels (doc_id, cluster_id) -> counts + size distribution + top-k
    largest clusters (op 27)."""
    df = labels.to_pandas()
    if df.empty:
        return {"n_clustered_docs": 0, "n_clusters": 0,
                "max_cluster": 0, "top_clusters": []}
    sizes = df.groupby("cluster_id").size().sort_values(ascending=False)
    return {
        "n_clustered_docs": int(len(df)),
        "n_clusters": int(len(sizes)),
        "max_cluster": int(sizes.iloc[0]),
        "top_clusters": [(int(c), int(s))
                         for c, s in sizes.head(top_k).items()],
    }


def dup_pair_recall(verified, gt_pairs: pa.Table) -> dict:
    """op 29: |found ∩ planted| / |planted| plus precision proxy.

    ``gt_pairs`` columns: url_a, url_b OR a, b (uint64 ids)."""
    vdf = verified.to_pandas() if hasattr(verified, "to_pandas") else verified
    found = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(vdf["a"], vdf["b"])}
    g = gt_pairs.to_pydict()
    key_a = "a" if "a" in g else "url_a"
    key_b = "b" if "b" in g else "url_b"
    planted = {(min(int(a), int(b)), max(int(a), int(b)))
               for a, b in zip(g[key_a], g[key_b])}
    hit = len(found & planted)
    return {
        "recall": hit / len(planted) if planted else 1.0,
        "n_planted": len(planted),
        "n_found": len(found),
        "n_hit": hit,
    }
