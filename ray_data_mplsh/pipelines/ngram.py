"""Exact n-gram (k-word-shingle) Jaccard — the dedup-family member that
verifies candidate pairs against TRUE shingle sets instead of the MinHash
signature estimate (SURVEY.md §2.4 op 18 exact variant).

Two physical plans, gated on ``cfg.broadcast_max_docs`` like every other
small-side lookup in this engine:

* **broadcast** (n_docs <= threshold): the per-doc sorted shingle sets are
  shipped ONCE as three parallel arrays (sorted doc ids, offsets, flat
  values — zero-copy numpy out of the object store) and each pair batch
  resolves both sides with searchsorted.
* **shuffle** (scale path): variable-length shingle sets ride a pair-keyed
  two-hop exchange (doc-keyed attach, then exact-(a,b) combine with the
  pair hash as routing key only — same identity rule as
  stages/verify.py) with no driver materialization and no size cap.

Both paths share one vectorized Jaccard kernel: per batch of pairs, the
two sides' elements are tagged with their pair index and lexsorted once;
adjacent duplicates within a pair count the intersection (sets are unique
per doc), so there is NO per-pair Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.functions.extract import tokenize_batch
from ray_data_mplsh.functions.hashing import (
    hash_str_array, rolling_shingle_hashes,
)
from ray_data_mplsh.stages.shuffle import gather_slices as _gather_lists

PAIR_JACCARD_SCHEMA = pa.schema([
    ("a", pa.uint64()), ("b", pa.uint64()), ("jaccard", pa.float64())])


def shingle_sets_batch(batch: pa.Table, k: int) -> list[np.ndarray]:
    """Sorted unique shingle-hash array per doc in the batch."""
    words, offs = tokenize_batch(batch["text"])
    wh = hash_str_array(words) if len(words) else np.empty(0, np.uint64)
    sh, soffs = rolling_shingle_hashes(wh, offs, k)
    return [np.unique(sh[soffs[i]:soffs[i + 1]])
            for i in range(len(soffs) - 1)]


def pair_intersect_kernel(vals_a: np.ndarray, lens_a: np.ndarray,
                          vals_b: np.ndarray, lens_b: np.ndarray
                          ) -> np.ndarray:
    """Exact intersection SIZE for n pairs of UNIQUE-element sets, no
    Python loop: tag every element with its pair index, lexsort
    (pair, value) once, count adjacent equal (pair, value) rows — each is
    one intersection element (uniqueness within a side makes runs length
    <= 2)."""
    n = len(lens_a)
    if n == 0:
        return np.empty(0, np.int64)
    tag = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), lens_a),
                          np.repeat(np.arange(n, dtype=np.int64), lens_b)])
    v = np.concatenate([vals_a, vals_b])
    o = np.lexsort((v, tag))
    st, sv = tag[o], v[o]
    if len(st) == 0:
        return np.zeros(n, np.int64)
    dup = (st[1:] == st[:-1]) & (sv[1:] == sv[:-1])
    return np.bincount(st[1:][dup], minlength=n)


def pair_jaccard_kernel(vals_a: np.ndarray, lens_a: np.ndarray,
                        vals_b: np.ndarray, lens_b: np.ndarray
                        ) -> np.ndarray:
    """Exact Jaccard for n pairs of UNIQUE-element sets (see
    pair_intersect_kernel for the one-lexsort mechanics)."""
    if len(lens_a) == 0:
        return np.empty(0, np.float64)
    inter = pair_intersect_kernel(vals_a, lens_a, vals_b, lens_b)
    union = lens_a + lens_b - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _sets_stage(docs, cfg: MPLSHConfig):
    """docs (doc_id, text) -> Dataset (doc_id, shingles list<uint64>)."""

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

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(to_sets, batch_format="pyarrow")


def _list_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, values) of a list<uint64> column as numpy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros(1, np.int64), np.empty(0, np.uint64)
    return (col.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
            col.values.to_numpy(zero_copy_only=False).astype(np.uint64))


def _jaccard_broadcast(pairs, sets_tbl, min_jaccard: float):
    """Sets broadcast as (sorted ids, offs, flat) — resolved per batch with
    searchsorted, scored with the shared vectorized kernel."""
    import ray

    from ray_data_mplsh.stages.shuffle import cached_get

    ids_l, offs_l, vals_l = [], [], []
    for b in sets_tbl.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids_l.append(b["doc_id"].to_numpy(zero_copy_only=False)
                     .astype(np.uint64))
        o, v = _list_parts(b["shingles"])
        offs_l.append(np.diff(o))
        vals_l.append(v)
    if ids_l:
        ids = np.concatenate(ids_l)
        lens = np.concatenate(offs_l)
        vals = np.concatenate(vals_l)
        order = np.argsort(ids, kind="stable")
        # reorder the flat values to match sorted-id row order
        offs_un = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        svals, slens = _gather_lists(offs_un, vals, order)
        ids = ids[order]
        offs = np.concatenate(([0], np.cumsum(slens))).astype(np.int64)
        vals = svals
    else:
        ids = np.empty(0, np.uint64)
        offs = np.zeros(1, np.int64)
        vals = np.empty(0, np.uint64)
    ref = ray.put((ids, offs, vals))

    def score(batch: pa.Table) -> pa.Table:
        sids, soffs, svals = cached_get(ref)
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ia = np.clip(np.searchsorted(sids, a), 0, max(len(sids) - 1, 0))
        ib = np.clip(np.searchsorted(sids, b), 0, max(len(sids) - 1, 0))
        ok = np.zeros(len(a), bool) if not len(sids) else \
            (sids[ia] == a) & (sids[ib] == b)
        va, la = _gather_lists(soffs, svals, ia[ok])
        vb, lb = _gather_lists(soffs, svals, ib[ok])
        jac = pair_jaccard_kernel(va, la, vb, lb)
        keep = jac >= min_jaccard
        return pa.Table.from_arrays([
            pa.array(a[ok][keep], pa.uint64()),
            pa.array(b[ok][keep], pa.uint64()),
            pa.array(jac[keep], pa.float64()),
        ], schema=PAIR_JACCARD_SCHEMA)

    # Small batches on purpose: the pair-Jaccard kernel is O(E log E) in
    # flattened set elements, so one coalesced mega-batch serializes the
    # stage into a single task; 8k pairs x ~100 shingles keeps each task
    # ~1M elements and lets the pool run wide.
    return pairs.select_columns(["a", "b"]).map_batches(
        score, batch_format="pyarrow", batch_size=8192)


def _jaccard_shuffle(pairs, sets_tbl, min_jaccard: float,
                     num_partitions: int):
    """Scale path: shingle sets attached by a doc-keyed exchange, pairs
    combined by exact (a, b) under a hash-routed partition — the
    verify_stage_shuffle pattern with variable-length list payloads."""
    from ray_data_mplsh.functions.hashing import mix64
    from ray_data_mplsh.stages.shuffle import partition_apply

    empty_list = pa.list_(pa.uint64())

    def mk_requests(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(a)
        return pa.Table.from_arrays([
            pa.array(np.concatenate([a, b]), pa.uint64()),
            pa.array(np.concatenate([a, a]), pa.uint64()),
            pa.array(np.concatenate([b, b]), pa.uint64()),
            pa.array(np.concatenate([np.zeros(n, np.int8),
                                     np.ones(n, np.int8)]), pa.int8()),
            pa.nulls(2 * n, empty_list),
        ], names=["key", "a", "b", "side", "shingles"])

    def mk_set_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        z = pa.array(np.zeros(n, np.uint64), pa.uint64())
        sh = batch["shingles"].combine_chunks()
        if sh.type != empty_list:
            sh = sh.cast(empty_list)
        return pa.Table.from_arrays([
            pa.array(ids, pa.uint64()), z, z,
            pa.array(np.full(n, 2, np.int8), pa.int8()), sh,
        ], names=["key", "a", "b", "side", "shingles"])

    u = pairs.select_columns(["a", "b"]) \
        .map_batches(mk_requests, batch_format="pyarrow") \
        .union(sets_tbl.map_batches(mk_set_rows, batch_format="pyarrow"))

    def attach(part: pa.Table) -> pa.Table:
        side = part["side"].to_numpy(zero_copy_only=False)
        key = part["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        is_set = side == 2
        set_keys = key[is_set]
        order = np.argsort(set_keys, kind="stable")
        set_keys = set_keys[order]
        sets = part.filter(pa.array(is_set))["shingles"].combine_chunks() \
            .take(pa.array(order))
        reqs = part.filter(pa.array(~is_set))
        q = key[~is_set]
        i = np.clip(np.searchsorted(set_keys, q), 0,
                    max(len(set_keys) - 1, 0))
        hit = (set_keys[i] == q) if len(set_keys) \
            else np.zeros(len(q), bool)
        reqs = reqs.filter(pa.array(hit))
        a = reqs["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = reqs["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "pk": pa.array(mix64(a) ^ mix64(b), pa.uint64()),
            "a": reqs["a"], "b": reqs["b"], "side": reqs["side"],
            "shingles": sets.take(pa.array(i[hit])),
        })

    att = partition_apply(u, "key", attach, num_partitions)

    def combine(part: pa.Table) -> pa.Table:
        side = part["side"].to_numpy(zero_copy_only=False)
        a = part["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = part["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((side, b, a))
        sa, sb, ss = a[order], b[order], side[order]
        new = np.concatenate(([True], (sa[1:] != sa[:-1]) |
                              (sb[1:] != sb[:-1])))
        starts = np.flatnonzero(new)
        starts = np.concatenate([starts, [len(sa)]])
        full = starts[:-1][np.diff(starts) == 2]
        full = full[(ss[full] == 0) & (ss[full + 1] == 1)]
        i0, i1 = order[full], order[full + 1]
        offs, vals = _list_parts(part["shingles"])
        va, la = _gather_lists(offs, vals, i0)
        vb, lb = _gather_lists(offs, vals, i1)
        jac = pair_jaccard_kernel(va, la, vb, lb)
        keep = jac >= min_jaccard
        return pa.Table.from_arrays([
            pa.array(a[i0][keep], pa.uint64()),
            pa.array(b[i0][keep], pa.uint64()),
            pa.array(jac[keep], pa.float64()),
        ], schema=PAIR_JACCARD_SCHEMA)

    return partition_apply(att, "pk", combine, num_partitions)


def exact_jaccard_pairs(pairs, docs, cfg: MPLSHConfig, *,
                        min_jaccard: float = 0.0, num_partitions: int = 0,
                        force_shuffle: bool = False, sets_tbl=None):
    """(a, b) candidate pairs + docs (doc_id, text) -> (a, b, jaccard) with
    the exact shingle-set Jaccard, keeping pairs >= min_jaccard. No doc
    cap: above ``cfg.broadcast_max_docs`` (or with ``force_shuffle``) the
    sets ride the pair-keyed exchange instead of a broadcast. A caller
    that already materialized the per-doc sets (ppjoin's df/prefix
    phase) passes them via ``sets_tbl`` to skip the second shingle
    pass over the corpus."""
    from ray_data_mplsh.stages.shuffle import default_partitions

    P = default_partitions(num_partitions)
    if sets_tbl is None:
        sets_tbl = _sets_stage(docs, cfg).materialize()
    n_docs = sets_tbl.count()
    if force_shuffle or n_docs > cfg.broadcast_max_docs:
        return _jaccard_shuffle(pairs, sets_tbl, min_jaccard, P)
    return _jaccard_broadcast(pairs, sets_tbl, min_jaccard)
