"""Exact n-gram (k-word-shingle) Jaccard — the dedup-family member that
verifies candidate pairs against TRUE shingle sets instead of the MinHash
signature estimate (SURVEY.md §2.4 op 18 exact variant).

Shape: shingle sets are computed once per doc in a batch map, broadcast via
``ray.put`` when the doc count is small (the common case after exact dedup
collapses a partition's candidates), and each pair's Jaccard is an
``np.intersect1d`` over two sorted uint64 arrays. Above
``cfg.broadcast_max_docs`` the caller should fall back to the shuffle-join
verify path (stages/verify.py) — exact sets at that scale belong in a
pair-keyed shuffle, not a broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.functions.extract import tokenize_batch
from ray_data_mplsh.functions.hashing import (
    hash_str_array, rolling_shingle_hashes,
)


def shingle_sets_batch(batch: pa.Table, k: int) -> list[np.ndarray]:
    """Sorted unique shingle-hash array per doc in the batch."""
    words, offs = tokenize_batch(batch["text"])
    wh = hash_str_array(words) if len(words) else np.empty(0, np.uint64)
    sh, soffs = rolling_shingle_hashes(wh, offs, k)
    return [np.unique(sh[soffs[i]:soffs[i + 1]])
            for i in range(len(soffs) - 1)]


def exact_jaccard_pairs(pairs, docs, cfg: MPLSHConfig, *,
                        min_jaccard: float = 0.0):
    """(a, b) candidate pairs + docs (doc_id, text) -> (a, b, jaccard) with
    the exact shingle-set Jaccard, keeping pairs >= min_jaccard."""
    import ray

    def to_sets(batch: pa.Table) -> pa.Table:
        sets = shingle_sets_batch(batch, cfg.k_shingle)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        flat = (np.concatenate(sets) if sets
                else np.empty(0, np.uint64)).astype(np.uint64)
        offs = np.zeros(len(sets) + 1, np.int64)
        if sets:
            np.cumsum([len(s) for s in sets], out=offs[1:])
        return pa.table({
            "doc_id": pa.array(ids, pa.uint64()),
            "shingles": pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()).cast(pa.int32()),
                pa.array(flat, pa.uint64())),
        })

    sets_tbl = docs.select_columns(["doc_id", "text"]) \
        .map_batches(to_sets, batch_format="pyarrow").materialize()
    n_docs = sets_tbl.count()
    if n_docs > cfg.broadcast_max_docs:
        raise NotImplementedError(
            "exact_jaccard_pairs broadcast path is capped at "
            f"{cfg.broadcast_max_docs} docs; use the signature verify "
            "(stages/verify.py shuffle path) beyond that")

    # build the lookup driver-side (bounded by broadcast_max_docs)
    lookup: dict[int, np.ndarray] = {}
    for b in sets_tbl.iter_batches(batch_format="pyarrow"):
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sh = b["shingles"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        offs = sh.offsets.to_numpy(zero_copy_only=False)
        vals = sh.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        for i, did in enumerate(ids):
            lookup[int(did)] = vals[offs[i]:offs[i + 1]]
    ref = ray.put(lookup)

    class PairJaccard:
        def __init__(self):
            self.sets = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
            jac = np.empty(len(a), np.float64)
            for i in range(len(a)):
                sa = self.sets.get(int(a[i]))
                sb = self.sets.get(int(b[i]))
                if sa is None or sb is None or (len(sa) == 0 and
                                                len(sb) == 0):
                    jac[i] = 0.0
                    continue
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                jac[i] = inter / (len(sa) + len(sb) - inter)
            keep = jac >= min_jaccard
            return pa.table({"a": pa.array(a[keep], pa.uint64()),
                             "b": pa.array(b[keep], pa.uint64()),
                             "jaccard": pa.array(jac[keep])})

    return pairs.select_columns(["a", "b"]).map_batches(
        PairJaccard, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)
