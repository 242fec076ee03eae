"""Distributed k-means vs a single-process numpy reference on the same
parquet: same deterministic init (k smallest ids), same iteration count
-> identical assignments and allclose centroids. Also pins empty-cluster
carry-over on an adversarial tiny input."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray_data_mplsh.pipelines.kmeans import _assign, kmeans

SF = "/root/testdata/sf0.001"


def _reference(tbl: pa.Table, k: int, iters: int):
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    C = m[np.argsort(ids, kind="stable")[:k]].copy()
    for _ in range(iters):
        a, _ = _assign(m, C)
        for j in range(k):
            if (a == j).any():
                C[j] = m[a == j].mean(axis=0)
    a, d2 = _assign(m, C)
    return C, a, float(d2.sum())


def test_kmeans_matches_reference(ray_session):
    import ray.data as rd

    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         override_num_blocks=4)
    C, out, inertia, counts = kmeans(ds, k=6, iters=5)
    rC, ra, rin = _reference(tbl, k=6, iters=5)
    np.testing.assert_allclose(C, rC, rtol=1e-9, atol=1e-12)
    got = out.to_pandas().sort_values("vec_id")
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    ref_order = np.argsort(ids, kind="stable")
    np.testing.assert_array_equal(got["cluster"].to_numpy(), ra[ref_order])
    assert abs(inertia - rin) / rin < 1e-9
    assert counts.sum() == tbl.num_rows


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray.data as rd

    # two far blobs + one far-away init point that captures nothing after
    # iteration 1: its centroid must carry over, not NaN out
    pts = np.vstack([np.full((5, 3), 0.0), np.full((5, 3), 10.0),
                     [[100.0, 100.0, 100.0]]])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(11, dtype=np.int64)),
        "embedding": pa.array([list(p) for p in pts],
                              pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl)
    C, out, inertia, counts = kmeans(ds, k=3, iters=4)
    assert not np.isnan(C).any()
    assert counts.sum() == 11

    with pytest.raises(ValueError, match="k="):
        kmeans(ds, k=50, iters=1)
