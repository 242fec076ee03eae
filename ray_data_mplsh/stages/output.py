"""S8-S9: cluster assignment, canonical pick, suffix-array substring pass
(SURVEY.md ops 20-24).

Small-side lookups (component labels, canonical ids, span intervals) are
broadcast once via ``ray.put`` and resolved inside ``map_batches`` with
``np.searchsorted`` — they are orders of magnitude smaller than the corpus
(only docs participating in dup clusters appear). Pair-text attachment for
the substring pass follows the same broadcast-vs-join split as S6.

Substring semantics ([Lee22 §3], span removal): any span >= substr_len
bytes that also occurs in an earlier (smaller doc_id) canonical doc is cut
from the later doc's ``final_text``; the doc is dropped (is_canonical
False) only when >90% of its bytes were duplicated spans or the remainder
is shorter than min_chars. Candidates come from winnowing fingerprints
(guarantee: any shared span >= winnow_k + winnow_w - 1 = substr_len shares
a fingerprint), grouped by the same coarse-partitioned shuffle as S5.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.functions.hashing import winnow_fingerprints
from ray_data_mplsh.functions.suffix import (
    cross_match_intervals, merge_intervals, remove_intervals,
)
from ray_data_mplsh.stages.pairs import dedup_pairs, _pairs_of_runs
from ray_data_mplsh.stages.shuffle import cached_get, group_runs, \
    partition_apply, pool_size


from ray_data_mplsh.stages.shuffle import gather_kv, lookup_u64

_lookup_u64 = lookup_u64  # back-compat alias


def assign_and_mark(docs_with_rep, labels, cfg: MPLSHConfig):
    """Fused ops 19b+20: add ``cluster_id`` AND ``is_canonical`` in a SINGLE
    pass over the corpus.

    The per-cluster minimum doc_id is computed from the SLIM (doc_id,
    rep_id) projection only — per-batch partial minima (combiner pattern:
    pre-aggregate inside map_batches, SURVEY.md §4.3) merged driver-side —
    so the wide text columns move exactly once, in the final annotate pass.
    Partial-minima volume is bounded by the cluster count (itself bounded
    by the verified-pair doc count), the same small-side bound that gates
    every broadcast in this engine."""
    import ray

    lref = ray.put(gather_kv(labels, "doc_id", "cluster_id"))

    def partial_min(batch: pa.Table) -> pa.Table:
        keys, vals = cached_get(lref)
        rep = batch["rep_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        cid = _lookup_u64(keys, vals, rep, default=rep)
        order, starts = group_runs(cid)
        mins = np.minimum.reduceat(did[order], starts[:-1]) \
            if len(cid) else np.empty(0, np.uint64)
        return pa.Table.from_arrays([
            pa.array(cid[order][starts[:-1]] if len(cid) else cid,
                     pa.uint64()),
            pa.array(mins, pa.uint64()),
        ], names=["cluster_id", "canonical_id"])

    partial = docs_with_rep.select_columns(["doc_id", "rep_id"]) \
        .map_batches(partial_min, batch_format="pyarrow")
    ck, cv = [], []
    for b in partial.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ck.append(b["cluster_id"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64))
        cv.append(b["canonical_id"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64))
    if ck:
        k = np.concatenate(ck)
        v = np.concatenate(cv)
        o = np.lexsort((v, k))
        k, v = k[o], v[o]
        first = np.concatenate(([True], k[1:] != k[:-1]))
        k, v = k[first], v[first]  # per-cluster global min (sorted by k)
    else:
        k = v = np.empty(0, np.uint64)
    cref = ray.put((k, v))

    def annotate(batch: pa.Table) -> pa.Table:
        lk, lv = cached_get(lref)
        ck, cv = cached_get(cref)
        rep = batch["rep_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        cid = _lookup_u64(lk, lv, rep, default=rep)
        canon = _lookup_u64(ck, cv, cid, default=cid)
        out = batch.append_column("cluster_id", pa.array(cid, pa.uint64()))
        return out.append_column("is_canonical",
                                 pa.array(did == canon, pa.bool_()))

    return docs_with_rep.map_batches(annotate, batch_format="pyarrow")


# ------------------------- substring pass (op 24) -------------------------

def _fingerprint_emitter(cfg: MPLSHConfig):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        texts = batch["text"].to_pylist()
        out_fp, out_id = [], []
        for did, text in zip(ids, texts):
            fps, _ = winnow_fingerprints(text, cfg.winnow_k, cfg.winnow_w)
            fps = np.unique(fps)
            out_fp.append(fps)
            out_id.append(np.full(len(fps), did, dtype=np.uint64))
        fp = np.concatenate(out_fp) if out_fp else np.empty(0, np.uint64)
        di = np.concatenate(out_id) if out_id else np.empty(0, np.uint64)
        return pa.Table.from_arrays([pa.array(fp, pa.uint64()),
                                     pa.array(di, pa.uint64())],
                                    names=["fp", "doc_id"])
    return fn


def _fp_pairs_fn(cap: int):
    def fn(part: pa.Table) -> pa.Table:
        fp = part["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order, starts = group_runs(fp)
        a, b = _pairs_of_runs(ids[order], starts, cap)
        keep = a != b
        a, b = a[keep], b[keep]
        # combiner: docs sharing many k-grams repeat the same pair within
        # this partition — dedup locally before the global pair shuffle
        if len(a):
            o = np.lexsort((b, a))
            a, b = a[o], b[o]
            first = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[first], b[first]
        return pa.Table.from_arrays([pa.array(a, pa.uint64()),
                                     pa.array(b, pa.uint64())],
                                    names=["a", "b"])
    return fn


class _SpanExtractor:
    """Per candidate pair (x<y, texts attached): byte intervals of y covered
    by >= substr_len spans of x — suffix-array verification per pair."""

    def __init__(self, substr_len: int):
        self.L = substr_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        out_id, out_s, out_e = [], [], []
        for x, y, tx, ty in zip(a, b, ta, tb):
            # spans are always removed from the LARGER doc_id (deterministic)
            if x > y:
                x, y, tx, ty = y, x, ty, tx
            for s, e in cross_match_intervals(tx, ty, self.L):
                out_id.append(y)
                out_s.append(s)
                out_e.append(e)
        return pa.Table.from_arrays([
            pa.array(np.array(out_id, dtype=np.uint64), pa.uint64()),
            pa.array(out_s, pa.int64()),
            pa.array(out_e, pa.int64()),
        ], names=["doc_id", "start", "end"])


def substring_stage(dedup_out, cfg: MPLSHConfig, num_partitions: int):
    """canonical docs -> final_text rewrites (op 24). Returns dedup_out with
    ``final_text`` (null for non-canonical docs) and updated is_canonical."""
    import ray

    # dedup_out (the marked corpus) feeds three consumers: the fingerprint
    # pass, the pair-text broadcast and the final rewrite. Materialize once
    # so the upstream chain doesn't re-execute per consumer.
    dedup_out = dedup_out.materialize()
    canon = dedup_out.filter(expr="is_canonical == True") \
        .select_columns(["doc_id", "text"]).materialize()
    fps = canon.map_batches(_fingerprint_emitter(cfg), batch_format="pyarrow")
    pairs = partition_apply(fps, "fp", _fp_pairs_fn(cfg.substr_bucket_cap),
                            num_partitions)
    pairs = dedup_pairs(pairs, num_partitions,
                        local_max_rows=cfg.local_state_max_rows)

    # attach texts (broadcast path; join path kicks in above the threshold).
    # Texts are broadcast as a zero-copy Arrow table + sorted id index; the
    # per-actor __init__ deserializes ONCE (a plain fn would re-unpickle the
    # lookup on every batch).
    # broadcast payload: (sorted ids, permutation, table) — sorting the id
    # INDEX instead of .take()ing the table avoids a driver-side copy of
    # the full canonical text column
    canon_batches = list(canon.iter_batches(batch_size=65536,
                                            batch_format="pyarrow"))
    if not canon_batches:   # empty corpus: no canonical docs, no spans
        canon_batches = [pa.table({"doc_id": pa.array([], pa.uint64()),
                                   "text": pa.array([], pa.string())})]
    canon_tbl = pa.concat_tables(canon_batches)
    ids_un = canon_tbl["doc_id"].to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    perm = np.argsort(ids_un, kind="stable")
    tref = ray.put((ids_un[perm], perm.astype(np.int64),
                    canon_tbl["text"].combine_chunks()))

    extractor = _SpanExtractor(cfg.substr_len)

    def span_worker(batch: pa.Table) -> pa.Table:
        sorted_ids, perm, texts = cached_get(tref)

        def text_of(x):
            i = int(np.searchsorted(sorted_ids, x))
            if i < len(sorted_ids) and sorted_ids[i] == x:
                return texts[int(perm[i])].as_py()
            return ""

        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        withtexts = pa.Table.from_arrays([
            batch["a"], batch["b"],
            pa.array([text_of(x) for x in a], pa.string()),
            pa.array([text_of(x) for x in b], pa.string()),
        ], names=["a", "b", "text_a", "text_b"])
        return extractor(withtexts)

    spans = pairs.map_batches(span_worker, batch_format="pyarrow",
                              batch_size=512)

    # merge intervals per doc, collect to the driver (affected docs only) —
    # vectorized: one lexsort over all interval rows, per-doc slices merged
    dds, sss, ees = [], [], []
    for bt in spans.iter_batches(batch_size=65536, batch_format="pyarrow"):
        dds.append(bt["doc_id"].to_numpy(zero_copy_only=False)
                   .astype(np.uint64))
        sss.append(bt["start"].to_numpy(zero_copy_only=False))
        ees.append(bt["end"].to_numpy(zero_copy_only=False))
    span_map: dict[int, list[tuple[int, int]]] = {}
    if dds:
        d = np.concatenate(dds)
        s0 = np.concatenate(sss)
        e0 = np.concatenate(ees)
        o = np.lexsort((s0, d))
        d, s0, e0 = d[o], s0[o], e0[o]
        starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        bounds = np.concatenate([starts, [len(d)]])
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            span_map[int(d[lo])] = merge_intervals(
                list(zip(s0[lo:hi].tolist(), e0[lo:hi].tolist())))
    sref = ray.put(span_map)

    def rewriter(batch: pa.Table) -> pa.Table:
        return _rewrite_batch(batch, cached_get(sref), cfg)

    def _rewrite_batch(batch: pa.Table, sm, cfg) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        canon_f = batch["is_canonical"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        finals, keep_canon = [], []
        for i, (did, is_c, text) in enumerate(zip(ids, canon_f, texts)):
            if not is_c:
                finals.append(None)
                keep_canon.append(False)
                continue
            iv = sm.get(int(did))
            if not iv:
                finals.append(text)
                keep_canon.append(True)
                continue
            new_text = remove_intervals(text, iv)
            covered = sum(e - s for s, e in iv)
            if covered > 0.9 * len(text) or len(new_text) < cfg.min_chars:
                finals.append(None)
                keep_canon.append(False)
            else:
                finals.append(new_text)
                keep_canon.append(True)
        out = batch.drop_columns(["is_canonical"])
        out = out.append_column("is_canonical", pa.array(keep_canon, pa.bool_()))
        return out.append_column("final_text", pa.array(finals, pa.string()))

    return dedup_out.map_batches(rewriter, batch_format="pyarrow")
