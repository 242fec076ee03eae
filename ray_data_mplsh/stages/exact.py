"""S2: exact dedup — hash-partition + per-group min (SURVEY.md op 23).

Adds ``text_hash`` in a vectorized pass, then one coarse-partitioned
shuffle; inside each partition a NumPy sort groups equal hashes and the
min doc_id becomes the representative ([Lee22 §2] pre-pass; kills bucket
skew from identical pages before MinHash).

Output = input schema + ``rep_id``: representatives have
``rep_id == doc_id``; exact-dup members carry their representative's id
(consumed at S8 to give every member its cluster).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.functions.hashing import hash_str_array
from ray_data_mplsh.stages.shuffle import group_runs, partition_apply


def add_text_hash(batch: pa.Table) -> pa.Table:
    th = hash_str_array(batch["text"])
    return batch.append_column("text_hash", pa.array(th, pa.uint64()))


def _assign_reps(part: pa.Table) -> pa.Table:
    th = part["text_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order, starts = group_runs(th)
    sorted_ids = ids[order]
    rep = np.empty(len(ids), dtype=np.uint64)
    # per-run min via minimum.reduceat over the sorted view
    if len(ids):
        run_min = np.minimum.reduceat(sorted_ids, starts[:-1])
        sizes = np.diff(starts)
        rep[order] = np.repeat(run_min, sizes)
    return part.append_column("rep_id", pa.array(rep, pa.uint64()))


def _rep_member_pairs(part: pa.Table) -> pa.Table:
    """Per partition: (doc_id, rep_id) rows for DUP MEMBERS ONLY (rep !=
    doc) — the broadcast-side payload of the hybrid path."""
    th = part["text_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order, starts = group_runs(th)
    sorted_ids = ids[order]
    if len(ids) == 0:
        e = np.empty(0, np.uint64)
        return pa.Table.from_arrays([pa.array(e, pa.uint64()),
                                     pa.array(e, pa.uint64())],
                                    names=["doc_id", "rep_id"])
    run_min = np.minimum.reduceat(sorted_ids, starts[:-1])
    rep = np.repeat(run_min, np.diff(starts))
    member = sorted_ids != rep
    return pa.Table.from_arrays([
        pa.array(sorted_ids[member], pa.uint64()),
        pa.array(rep[member], pa.uint64()),
    ], names=["doc_id", "rep_id"])


def exact_dedup_stage(docs, cfg: MPLSHConfig, num_partitions: int):
    """docs -> docs + (text_hash, rep_id).

    Hybrid: the shuffle runs over the SLIM (doc_id, text_hash) projection
    only; when the dup-member map fits ``cfg.broadcast_max_docs`` it is
    broadcast and rep_id is annotated map-side, so the wide text column
    never crosses the wire. Above the threshold, the full sorted-shuffle
    path co-locates equal hashes (the 10^12-doc route, where the member
    map itself is too big for one node)."""
    import ray

    from ray_data_mplsh.stages.shuffle import cached_get, gather_kv, \
        lookup_u64

    from ray_data_mplsh.stages.shuffle import sized_partitions

    hashed = docs.map_batches(add_text_hash,
                              batch_format="pyarrow").materialize()
    # hashed is materialized, so count() is metadata — both the hybrid
    # split and the exchange width key off the real corpus size
    n_corpus = hashed.count()
    pe = sized_partitions(n_corpus, num_partitions)
    slim = hashed.select_columns(["doc_id", "text_hash"])

    def _annotate_ref(kv):
        ref = ray.put(kv)

        def annotate(batch: pa.Table) -> pa.Table:
            keys, vals = cached_get(ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            rep = lookup_u64(keys, vals, ids, default=ids)
            return batch.append_column("rep_id", pa.array(rep, pa.uint64()))

        return hashed.map_batches(annotate, batch_format="pyarrow")

    if n_corpus <= cfg.local_state_max_rows:
        # LOCAL HYBRID (the dedup_pairs pattern): a Ray sort-shuffle has
        # ~1s fixed latency; the slim (doc_id, text_hash) projection at
        # this size is a few MB, so the member map comes from one driver
        # numpy pass — same group_runs/reduceat kernel as the exchange's
        # per-partition fn, hence bit-equal. Web-scale corpora take the
        # exchange below.
        ths, idss = [], []
        for t in slim.iter_batches(batch_size=131072,
                                   batch_format="pyarrow"):
            ths.append(t["text_hash"].to_numpy(zero_copy_only=False)
                       .astype(np.uint64))
            idss.append(t["doc_id"].to_numpy(zero_copy_only=False)
                        .astype(np.uint64))
        th = np.concatenate(ths) if ths else np.empty(0, np.uint64)
        ids = np.concatenate(idss) if idss else np.empty(0, np.uint64)
        order, starts = group_runs(th)
        sorted_ids = ids[order]
        if len(ids):
            run_min = np.minimum.reduceat(sorted_ids, starts[:-1])
            rep = np.repeat(run_min, np.diff(starts))
            member = sorted_ids != rep
            mk, mv = sorted_ids[member], rep[member]
        else:
            mk = mv = np.empty(0, np.uint64)
        if len(mk) <= cfg.broadcast_max_docs:
            o = np.argsort(mk)
            return _annotate_ref((mk[o], mv[o]))
        # dup-member map too large to broadcast: full sorted shuffle
        return partition_apply(hashed, "text_hash", _assign_reps, pe)

    members = partition_apply(slim, "text_hash", _rep_member_pairs,
                              pe).materialize()
    if members.count() <= cfg.broadcast_max_docs:
        return _annotate_ref(gather_kv(members, "doc_id", "rep_id"))
    return partition_apply(hashed, "text_hash", _assign_reps, pe)
