"""Distributed Lloyd's k-means over an embedding column.

The iterative-algorithm pattern on Ray Data: each iteration is ONE
streaming pass — the k x d centroid matrix is ``ray.put`` once, every
batch assigns its rows (argmin over one matmul) and emits k partial
(count, vector-sum) rows, and the driver folds the tiny k-row partials
and recomputes centroids. Data rows never leave their blocks; the only
driver state is k x d floats. Empty clusters keep their previous
centroid. Init is deterministic: the embeddings of the k smallest ids
(one pass with per-batch top-k trim, so the driver gather is k rows per
block, never the table).

Iterative refinement doesn't fit a SQL oracle — correctness is pinned by
tests/test_kmeans.py against a single-process numpy reference on the
same parquet (same init rule; identical assignments, centroids allclose).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.pipelines.similarity import _emb_matrix


def _assign(m: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster index, squared distance) per row — one matmul."""
    d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :]
    a = np.argmin(d2, axis=1)
    return a, d2[np.arange(len(a)), a]


def kmeans(embeddings, *, k: int = 8, iters: int = 10,
           col: str = "embedding", id_col: str = "vec_id"):
    """Returns (centroids k x d float64, assignments Dataset
    (id_col, cluster, dist2), inertia float)."""
    import ray

    # deterministic init: embeddings of the k smallest ids
    def trim(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.sort(np.argsort(ids, kind="stable")[:k])
        return t.select([id_col, col]).take(pa.array(keep))

    seed_parts = [b for b in embeddings.map_batches(
        trim, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")]
    seed = pa.concat_tables(seed_parts)
    sids = seed[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sids, kind="stable")[:k]
    C = _emb_matrix(seed, col).astype(np.float64)[order]
    if len(C) < k:
        raise ValueError(f"k={k} > {len(C)} rows")
    d = C.shape[1]

    for _ in range(iters):
        ref = ray.put(C)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _emb_matrix(t, col).astype(np.float64)
            a, _ = _assign(m, c)
            sums = np.zeros((k, d))
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            for j in np.flatnonzero(cnt):          # loop over CLUSTERS
                sums[j] = m[a == j].sum(axis=0)
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "vsum": pa.array(list(sums), pa.list_(pa.float64()))})

        tot_cnt = np.zeros(k, np.int64)
        tot_sum = np.zeros((k, d))
        for b in embeddings.map_batches(
                partial, batch_format="pyarrow").iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"):
            cid = b["cid"].to_numpy(zero_copy_only=False)
            np.add.at(tot_cnt, cid,
                      b["cnt"].to_numpy(zero_copy_only=False))
            np.add.at(tot_sum, cid, np.asarray(b["vsum"].to_pylist()))
        live = tot_cnt > 0
        C = np.where(live[:, None], tot_sum / np.maximum(tot_cnt, 1)[:, None],
                     C)

    ref = ray.put(C)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _emb_matrix(t, col).astype(np.float64)
        a, dist2 = _assign(m, c)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(a.astype(np.int64)),
                         "dist2": pa.array(dist2)})

    out = embeddings.map_batches(label, batch_format="pyarrow")
    inertia = 0.0
    counts = np.zeros(k, np.int64)
    for b in out.select_columns(["cluster", "dist2"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        inertia += float(np.sum(b["dist2"].to_numpy(zero_copy_only=False)))
        counts += np.bincount(
            b["cluster"].to_numpy(zero_copy_only=False), minlength=k)
    return C, out, inertia, counts
