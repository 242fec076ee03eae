"""Reporting aggregates (ops 26-28)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_bucket_histogram(ray_session):
    import ray.data

    from ray_data_mplsh.pipelines.stats import bucket_histogram

    # 3 buckets: sizes 1, 2, 3 — split across blocks to prove cross-batch
    # merge correctness
    bh = [10, 20, 20, 30, 30, 30]
    t = pa.table({"band_hash": pa.array(bh, pa.uint64())})
    ds = ray.data.from_arrow([t.slice(0, 3), t.slice(3, 3)])
    hist = bucket_histogram(ds)
    got = dict(zip(hist.bucket_size, hist.n_buckets))
    assert got == {1: 1, 2: 1, 3: 1}


def test_cluster_stats(ray_session):
    import ray.data

    from ray_data_mplsh.pipelines.stats import cluster_stats

    t = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.uint64), pa.uint64()),
        "cluster_id": pa.array([1, 1, 1, 2, 2, 9], pa.uint64()),
    })
    s = cluster_stats(ray.data.from_arrow(t))
    assert s["n_clusters"] == 3
    assert s["max_cluster"] == 3
    assert s["top_clusters"][0] == (1, 3)


def test_dup_pair_recall():
    import pandas as pd

    from ray_data_mplsh.pipelines.stats import dup_pair_recall

    found = pd.DataFrame({"a": [1, 3, 5], "b": [2, 4, 6]})
    gt = pa.table({"a": pa.array([2, 3], pa.int64()),
                   "b": pa.array([1, 4], pa.int64())})
    r = dup_pair_recall(found, gt)
    assert r["recall"] == 1.0 and r["n_planted"] == 2 and r["n_found"] == 3
