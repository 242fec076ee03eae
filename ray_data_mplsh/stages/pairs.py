"""S5: bucket grouping -> candidate pairs, with hot-bucket handling
(SURVEY.md ops 14-16; BASELINE.json:6 "groupby-aggregate shuffle keyed on
(band_id, band_hash) with explicit salting for hot-bucket skew").

One coarse-partitioned shuffle on ``band_hash`` (the hash already
namespaces band_id + probe mask, so it IS the (band_id, band_hash) key).
Inside a partition, a NumPy sort groups buckets:

* bucket size <= bucket_cap: all C(g,2) pairs (size-2 runs — the vast
  majority — fully vectorized; bigger runs via triu_indices);
* bucket size  > bucket_cap: STAR pairing (every member <-> min doc_id),
  which preserves union-find connectivity at O(g) pairs and bounds any
  single bucket's fan-out (SURVEY.md op 15 straggler bound);
* with cfg.salt_shards > 1 the shuffle key is salted by doc_id, splitting
  every bucket across shards; connectivity across shards is restored by
  star-linking the per-shard minima through a second, tiny shuffle keyed
  on the unsalted band_hash.

Recall caveat (documented bound, not a bug): star pairing (hot buckets
over ``bucket_cap``, and all cross-shard links when ``salt_shards > 1``)
preserves connectivity only THROUGH the anchor edges, and those edges
must still pass the est-Jaccard verification gate. An anchor that is not
similar enough to a member can split a component that member-member edges
would have held together. This matches the single-process oracle for the
unsalted case (the oracle stars identically), but salted cross-shard star
links have no oracle analogue: connectivity there is conditional on
anchor edges surviving verification. The alternative — exempting star
links from the Jaccard gate — would trade this recall loss for precision
loss (unverified transitive merges); the recall gate (§2.5 op 29, >=0.99
on the fixture) is the guard that the configured cap/salt settings keep
the loss negligible.

A second shuffle on the pair key then deduplicates pairs found via
multiple bands/probes (op 16) — same pair always lands in one partition,
so a per-partition unique is globally exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.functions.hashing import mix64
from ray_data_mplsh.stages.shuffle import group_runs, partition_apply

PAIRS_SCHEMA = pa.schema([("a", pa.uint64()), ("b", pa.uint64())])


def _pairs_of_runs(ids: np.ndarray, starts: np.ndarray, cap: int,
                   star_only: bool = False
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Pairs (a<b) for each run of a sorted-by-key id array."""
    sizes = np.diff(starts)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    # size-2 runs, vectorized in one shot
    two = np.flatnonzero(sizes == 2)
    if len(two):
        x = ids[starts[two]]
        y = ids[starts[two] + 1]
        out_a.append(np.minimum(x, y))
        out_b.append(np.maximum(x, y))
    # larger runs
    for ri in np.flatnonzero(sizes > 2):
        run = np.sort(ids[starts[ri]:starts[ri + 1]])
        g = len(run)
        if g <= cap and not star_only:
            i, j = np.triu_indices(g, k=1)
            out_a.append(run[i])
            out_b.append(run[j])
        else:  # star: anchor = min id
            out_a.append(np.full(g - 1, run[0], dtype=np.uint64))
            out_b.append(run[1:])
    if not out_a:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    return np.concatenate(out_a), np.concatenate(out_b)


def _emit_pairs_fn(cap: int):
    def fn(part: pa.Table) -> pa.Table:
        bh = part["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order, starts = group_runs(bh)
        a, b = _pairs_of_runs(ids[order], starts, cap)
        keep = a != b
        a, b = a[keep], b[keep]
        # local dedup (cheap; global dedup happens in dedup_pairs) —
        # exact lexsort, not a hashed key (a key collision would DROP a
        # distinct pair)
        if len(a):
            o = np.lexsort((b, a))
            a, b = a[o], b[o]
            first = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[first], b[first]
        return pa.Table.from_arrays([pa.array(a, pa.uint64()),
                                     pa.array(b, pa.uint64())],
                                    schema=PAIRS_SCHEMA)
    return fn


def _shard_minima_fn(part: pa.Table) -> pa.Table:
    """Per (band_hash) bucket: link all shard minima to the global minimum."""
    bh = part["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order, starts = group_runs(bh)
    a, b = _pairs_of_runs(ids[order], starts, cap=0, star_only=True)
    keep = a != b
    return pa.Table.from_arrays([pa.array(a[keep], pa.uint64()),
                                 pa.array(b[keep], pa.uint64())],
                                schema=PAIRS_SCHEMA)


def _add_salt(cfg: MPLSHConfig):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        salt = (ids % np.uint64(cfg.salt_shards)).astype(np.uint64)
        return batch.append_column("salt", pa.array(salt, pa.uint64()))
    return fn


def _shard_min_emit(part: pa.Table) -> pa.Table:
    """Within a salted partition: one row per (band_hash) run carrying the
    run's min doc_id — the shard's representative for cross-shard linking."""
    bh = part["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order, starts = group_runs(bh)
    sizes = np.diff(starts)
    sel = sizes >= 1
    run_min = np.minimum.reduceat(ids[order], starts[:-1]) if len(ids) else \
        np.empty(0, np.uint64)
    return pa.Table.from_arrays([
        pa.array(bh[order][starts[:-1]][sel], pa.uint64()),
        pa.array(run_min[sel], pa.uint64()),
    ], names=["band_hash", "doc_id"])


def pairs_stage(band_keys, cfg: MPLSHConfig, num_partitions: int):
    """band_keys (doc_id, band_id, band_hash, probe_rank) -> pairs (a, b)."""
    if cfg.salt_shards > 1:
        salted = band_keys.map_batches(_add_salt(cfg), batch_format="pyarrow")
        within = partition_apply(salted, "band_hash",
                                 _emit_pairs_fn(cfg.bucket_cap),
                                 num_partitions, salt_col="salt")
        minima = partition_apply(salted, "band_hash", _shard_min_emit,
                                 num_partitions, salt_col="salt")
        cross = partition_apply(minima, "band_hash", _shard_minima_fn,
                                num_partitions)
        pairs = within.union(cross)
    else:
        pairs = partition_apply(band_keys, "band_hash",
                                _emit_pairs_fn(cfg.bucket_cap),
                                num_partitions)
    return dedup_pairs(pairs, num_partitions,
                       local_max_rows=cfg.local_state_max_rows)


def _add_pair_key(batch: pa.Table) -> pa.Table:
    a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    return batch.append_column("pk", pa.array(mix64(a) ^ mix64(b), pa.uint64()))


def _unique_pairs(part: pa.Table) -> pa.Table:
    # exact (a, b) dedup — pk is only the shuffle key (collisions there
    # merely co-locate; deduping BY pk could drop a distinct pair)
    a = part["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = part["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    if len(a) == 0:
        return part.drop_columns(["pk"])
    o = np.lexsort((b, a))
    first = np.concatenate(
        ([True], (a[o][1:] != a[o][:-1]) | (b[o][1:] != b[o][:-1])))
    return part.take(np.sort(o[first])).drop_columns(["pk"])


def dedup_pairs(pairs, num_partitions: int, *, local_max_rows: int = 0):
    """Global pair dedup (op 16). With ``local_max_rows`` > 0 the pair set
    is materialized and, if it fits, deduped in one driver-side
    ``np.unique`` — a shuffle on a few-MB pair list costs more in fixed
    latency than it buys (hybrid split, cfg.local_state_max_rows). The
    shuffle path remains the route for web-scale pair volumes."""
    if local_max_rows > 0:
        import ray.data

        mat = pairs.materialize()
        if mat.count() <= local_max_rows:
            ak, bk = [], []
            for t in mat.select_columns(["a", "b"]).iter_batches(
                    batch_size=131072, batch_format="pyarrow"):
                ak.append(t["a"].to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
                bk.append(t["b"].to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
            a = np.concatenate(ak) if ak else np.empty(0, np.uint64)
            b = np.concatenate(bk) if bk else np.empty(0, np.uint64)
            if len(a):
                o = np.lexsort((b, a))
                a, b = a[o], b[o]
                first = np.concatenate(
                    ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
                a, b = a[first], b[first]
            from ray_data_mplsh.stages.shuffle import from_arrow_blocks

            return from_arrow_blocks(pa.Table.from_arrays(
                [pa.array(a, pa.uint64()), pa.array(b, pa.uint64())],
                schema=PAIRS_SCHEMA), target_rows=2048)
        pairs = mat
    keyed = pairs.map_batches(_add_pair_key, batch_format="pyarrow")
    return partition_apply(keyed, "pk", _unique_pairs, num_partitions)
