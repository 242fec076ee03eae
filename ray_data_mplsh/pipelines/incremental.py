"""Incremental dedup: fold a NEW crawl shard into a previously
checkpointed run WITHOUT recomputing the base corpus's signatures
(SURVEY.md ops 3-4 extended; the "dedup tomorrow's crawl against
yesterday's state" entry point).

What is reused from the base run's checkpoints (``<ckpt_dir>/<base_run_id>``):

* ``docs``  — the hashed, rep-assigned base corpus (no re-extraction);
* ``sigs``  — the base MinHash signatures (the expensive stage, skipped);
* ``verified`` — base-internal verified pairs (no base-base re-verify).

What is recomputed: band keys for base signatures (pure hashing over the
(n, K) sig matrix — orders of magnitude cheaper than minhashing, and
recomputing beats checkpointing the x(bands*probes) key expansion), and
the candidate-pair shuffle over the joint key set, filtered to pairs
touching at least one new doc before verification.

Equivalence contract (tests/test_incremental.py): the incremental result
partitions the joint corpus into exactly the same duplicate clusters,
with the same canonical picks, as a from-scratch run over base + new.
Cluster LABELS can differ only in the adopted-rep case (a new doc whose
text byte-equals a base doc joins the BASE representative's group
regardless of id order, so the base signature is reused verbatim);
partitions and canonicals — both defined by member doc_id sets — are
identical, which is what the test asserts.

Scale notes: the adoption map (text-hash overlaps between shards) and the
new-rep id filter are broadcast small sides — both are bounded by the NEW
shard's size, never the base corpus's.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.pipelines.dedup import DedupResult, _only_reps
from ray_data_mplsh.stages.bands import band_stage
from ray_data_mplsh.stages.cc import connected_components
from ray_data_mplsh.stages.docs import docs_stage
from ray_data_mplsh.stages.exact import exact_dedup_stage
from ray_data_mplsh.stages.minhash import minhash_stage
from ray_data_mplsh.stages.output import assign_and_mark, substring_stage
from ray_data_mplsh.stages.pairs import pairs_stage
from ray_data_mplsh.stages.shuffle import (
    cached_get, default_partitions, group_runs, lookup_u64, partition_apply,
)
from ray_data_mplsh.stages.verify import verify_stage
from ray_data_mplsh.state.checkpoint import _stage_dir, manifest_valid


def _adoption_map(new_reps_slim, base_reps_slim, num_partitions: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(new_rep_id -> base_rep_id) for text hashes present in BOTH shards:
    one text_hash-keyed exchange; the result is bounded by the overlap."""

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "text_hash": t["text_hash"],
                "doc_id": t["doc_id"],
                "side": pa.array(
                    np.full(t.num_rows, side, np.int8), pa.int8()),
            })
        return fn

    u = new_reps_slim.map_batches(tag(0), batch_format="pyarrow") \
        .union(base_reps_slim.map_batches(tag(1), batch_format="pyarrow"))

    def emit(part: pa.Table) -> pa.Table:
        th = part["text_hash"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = part["side"].to_numpy(zero_copy_only=False)
        order, starts = group_runs(th)
        sid, sside = ids[order], side[order]
        out_n, out_b = [], []
        for gi in range(len(starts) - 1):
            s, e = starts[gi], starts[gi + 1]
            b_mask = sside[s:e] == 1
            if not b_mask.any() or b_mask.all():
                continue
            base_rep = sid[s:e][b_mask].min()
            for r in sid[s:e][~b_mask]:
                out_n.append(r)
                out_b.append(base_rep)
        return pa.table({
            "new_rep": pa.array(np.array(out_n, np.uint64), pa.uint64()),
            "base_rep": pa.array(np.array(out_b, np.uint64), pa.uint64()),
        })

    mapped = partition_apply(u, "text_hash", emit, num_partitions)
    ks, vs = [], []
    for b in mapped.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ks.append(b["new_rep"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64))
        vs.append(b["base_rep"].to_numpy(zero_copy_only=False)
                  .astype(np.uint64))
    if not ks:
        e = np.empty(0, np.uint64)
        return e, e
    k = np.concatenate(ks)
    v = np.concatenate(vs)
    o = np.argsort(k)
    return k[o], v[o]


def run_dedup_incremental(new_pages, cfg: MPLSHConfig, *, base_run_id: str,
                          extract: bool = True, url_col: str = "url",
                          text_col: str = "text", lang_col: str = "lang",
                          skip_substring: bool = False) -> DedupResult:
    """Dedup ``new_pages`` against the checkpointed state of
    ``base_run_id`` (same ``cfg.ckpt_dir``, same semantic config — the
    manifest digests are verified)."""
    import ray
    import ray.data as rd

    if not cfg.ckpt_dir:
        raise ValueError("incremental dedup requires cfg.ckpt_dir")
    base_cfg = dataclasses.replace(cfg, run_id=base_run_id)
    for st in ("docs", "sigs", "verified"):
        if not manifest_valid(base_cfg, st):
            raise ValueError(
                f"base run '{base_run_id}' has no valid '{st}' checkpoint "
                f"for config digest {cfg.digest()}")

    P = default_partitions(cfg.num_partitions)
    counters: dict = {"num_partitions": P, "base_run_id": base_run_id,
                      "base_resumed": True}
    t0 = time.monotonic()

    base_docs = rd.read_parquet(_stage_dir(base_cfg, "docs"))
    base_sigs = rd.read_parquet(_stage_dir(base_cfg, "sigs"))
    base_verified = rd.read_parquet(_stage_dir(base_cfg, "verified"))

    # S1-S2 on the new shard only
    new_docs = exact_dedup_stage(
        docs_stage(new_pages, cfg, extract=extract, url_col=url_col,
                   text_col=text_col, lang_col=lang_col), cfg, P)
    new_docs = new_docs.materialize()

    # exact-text adoption: a new doc whose text byte-equals a base doc
    # joins the base rep's group (so its signature is never recomputed)
    new_reps_slim = new_docs.map_batches(_only_reps, batch_format="pyarrow") \
        .select_columns(["doc_id", "text_hash"])
    base_reps_slim = base_docs.map_batches(_only_reps,
                                           batch_format="pyarrow") \
        .select_columns(["doc_id", "text_hash"])
    ak, av = _adoption_map(new_reps_slim, base_reps_slim, P)
    counters["n_adopted_reps"] = int(len(ak))
    aref = ray.put((ak, av))

    def adopt(batch: pa.Table) -> pa.Table:
        keys, vals = cached_get(aref)
        rep = batch["rep_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        rep2 = lookup_u64(keys, vals, rep, default=rep)
        return batch.drop_columns(["rep_id"]).append_column(
            "rep_id", pa.array(rep2, pa.uint64()))

    new_docs = new_docs.map_batches(adopt, batch_format="pyarrow") \
        .materialize()

    # S3 on NEW reps only (adopted groups have a base rep -> excluded)
    reps_new = new_docs.map_batches(_only_reps, batch_format="pyarrow")
    sigs_new = minhash_stage(reps_new, cfg).materialize()
    counters["n_new_sigs"] = sigs_new.count()
    sigs = base_sigs.union(sigs_new).materialize()
    n_docs = sigs.count()
    counters["n_docs_sig"] = n_docs

    # S4-S5 over the JOINT key set (base band keys are re-hashed from the
    # checkpointed sigs — cheap), then drop pairs not touching a new doc:
    # base-base pairs are already in the base 'verified' checkpoint
    new_ids_l = [b["doc_id"].to_numpy(zero_copy_only=False)
                 .astype(np.uint64)
                 for b in sigs_new.select_columns(["doc_id"])
                 .iter_batches(batch_size=65536, batch_format="pyarrow")]
    new_ids = np.sort(np.concatenate(new_ids_l)) if new_ids_l \
        else np.empty(0, np.uint64)
    nref = ray.put(new_ids)

    def keep_new(batch: pa.Table) -> pa.Table:
        nid = cached_get(nref)
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if not len(nid):
            return batch.slice(0, 0)
        ina = nid[np.clip(np.searchsorted(nid, a), 0, len(nid) - 1)] == a
        inb = nid[np.clip(np.searchsorted(nid, b), 0, len(nid) - 1)] == b
        return batch.filter(pa.array(ina | inb))

    pairs = pairs_stage(band_stage(sigs, cfg), cfg, P) \
        .map_batches(keep_new, batch_format="pyarrow")

    # S6 on the new-touching pairs only
    verified_new = verify_stage(pairs, sigs, cfg, P, n_docs).materialize()
    counters["n_verified_new"] = verified_new.count()
    verified = base_verified.union(verified_new).materialize()
    counters["n_verified"] = verified.count()

    # S7-S9 over the joint corpus
    docs_all = base_docs.union(new_docs)
    if counters["n_verified"] == 0:
        labels = rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], pa.uint64()), pa.array([], pa.uint64())],
            names=["doc_id", "cluster_id"]))
    else:
        labels = connected_components(verified, cfg, P,
                                      n_edges=counters["n_verified"])
    marked = assign_and_mark(docs_all, labels, cfg)
    if skip_substring:
        def add_final(batch: pa.Table) -> pa.Table:
            ft = pc.if_else(batch["is_canonical"], batch["text"],
                            pa.scalar(None, pa.string()))
            return batch.append_column("final_text", ft)
        out = marked.map_batches(add_final, batch_format="pyarrow")
    else:
        out = substring_stage(marked, cfg, P)

    counters["wall_s"] = time.monotonic() - t0
    return DedupResult(docs=docs_all, sigs=sigs, pairs=pairs,
                       verified=verified, labels=labels, dedup_out=out,
                       counters=counters)
