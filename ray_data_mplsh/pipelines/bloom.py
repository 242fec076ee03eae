"""Counting-Bloom prefiltered exact dedup (SURVEY op 23, scale variant).

The standing exact-dedup plan (stages/exact.py, q_exact_dedup) ships one
slim (doc_id, text_hash) row per doc through a keyed exchange. On web
corpora the large majority of docs are UNIQUE — their exchange rows are
pure overhead: they cross the wire only to discover they have no group.
This module adds the classic Bloom prefilter in its dedup-correct form,
a **two-bitplane counting Bloom** (a 2-bit saturating counter per cell,
stored as two bitmasks):

    ge1[c] = some row hashed into cell c
    ge2[c] = at least TWO row-insertions hashed into cell c

Both planes are mergeable with pure bitwise ops — for partials A and B::

    ge2' = A.ge2 | B.ge2 | (A.ge1 & B.ge1)
    ge1' = A.ge1 | B.ge1

(associative + commutative, so per-block partials combine in any order,
driver-side here, tree-merge at 10^12 docs). A doc probes its k=2 cells
against the merged ge2 plane: if EITHER cell is not ge2, no other row in
the corpus hashed there, hence no other row shares its text_hash, hence
its text is corpus-unique — it short-circuits the exchange and is
emitted map-side with ``n_copies = 1``. Only the potential-duplicate
remainder (true dups + Bloom false positives) rides the exchange, where
grouping is on the EXACT text string (the hash only routes), so a false
positive simply arrives as a singleton group and emits the identical
row it would have map-side. **The output is therefore exact and
plan-independent** — same rows at any m, any FP rate, either forced
path — which is what lets a plain GROUP BY text oracle sign it.

Scale accounting (100 TB): the bitplanes cost 2·m bits total with
m ≈ 8·n_docs cells — far beyond one node at 10^12 docs, so at that
scale the planes are built and probed PER INPUT SHARD (the false-
positive rate only rises, correctness is unaffected by construction);
here m is capped at 2^24 cells (4 MB of planes) and the per-block
partials are one 2·m/8-byte row each, merged in one bounded driver
pass. The win is the exchange: unique docs (60–90 % of a crawl) send
zero bytes instead of a row with its text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.functions.hashing import hash_str_array

_MIX = np.uint64(0x9E3779B97F4A7C15)   # splitmix64 increment, odd


def _cells(th: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """k=2 cell indices per row from the 64-bit text hash: the raw low
    bits and the high word of a splitmix-style remix — independent
    enough for a Bloom, exactly reproducible anywhere."""
    m64 = np.uint64(m)
    c1 = th % m64
    c2 = ((th * _MIX) >> np.uint64(32)) % m64
    return c1, c2


def _plane_size(n_docs: int, m_cells: int | None) -> int:
    """Cell count: ~8 cells/doc, power of two, clipped to [2^16, 2^24]
    (4 MB of bitplanes max) unless the caller pins ``m_cells``."""
    if m_cells is not None:
        return max(8, int(m_cells))
    target = max(1, 8 * n_docs)
    return 1 << int(np.clip(int(np.ceil(np.log2(target))), 16, 24))


def _partial_planes(batch: pa.Table, m: int) -> pa.Table:
    """One (ge1, ge2) bitplane row per input block."""
    th = batch["text_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c1, c2 = _cells(th, m)
    cells = np.concatenate([c1, c2])
    uniq, cnt = np.unique(cells, return_counts=True)
    ge1 = np.zeros(m // 8 + 1, np.uint8)
    ge2 = np.zeros(m // 8 + 1, np.uint8)
    np.bitwise_or.at(ge1, uniq >> 3, np.uint8(1) << (uniq & 7).astype(np.uint8))
    dup = uniq[cnt >= 2]
    np.bitwise_or.at(ge2, dup >> 3, np.uint8(1) << (dup & 7).astype(np.uint8))
    return pa.table({"ge1": pa.array([ge1.tobytes()], pa.large_binary()),
                     "ge2": pa.array([ge2.tobytes()], pa.large_binary())})


def _merged_planes(hashed, m: int) -> np.ndarray:
    """Fold the per-block partial planes into the global ge2 bitmask.

    Driver-side fold, bounded: one (2·m/8)-byte row per input block,
    a few hundred blocks at bench scale. At 10^12 docs the same
    associative merge runs as a tree over shard-local planes instead —
    the plane algebra in the module docstring is the whole contract."""
    ge1 = np.zeros(m // 8 + 1, np.uint8)
    ge2 = np.zeros(m // 8 + 1, np.uint8)
    parts = hashed.map_batches(lambda b: _partial_planes(b, m),
                               batch_format="pyarrow")
    for row in parts.iter_batches(batch_size=64, batch_format="pyarrow"):
        for g1b, g2b in zip(row["ge1"].to_pylist(), row["ge2"].to_pylist()):
            g1 = np.frombuffer(g1b, np.uint8)
            g2 = np.frombuffer(g2b, np.uint8)
            ge2 |= g2 | (ge1 & g1)
            ge1 |= g1
    return ge2


def bloom_dedup(docs, *, num_partitions: int = 0, m_cells: int | None = None,
                force_exchange: bool = False):
    """docs(doc_id, text) -> one row per distinct text:
    (doc_id = group-min doc_id, n_copies, text).

    Plan: text_hash map (materialized once — the hashed corpus feeds the
    plane build, the probe split and the exchange) -> counting-Bloom
    planes from per-block partials -> broadcast ge2 probe splits the
    corpus map-side into definite-uniques (emitted directly, zero
    exchange bytes) and potential dups (first-wins exchange, grouped on
    the exact text). ``force_exchange`` / tiny ``m_cells`` collapse the
    prefilter so tests can pin path equivalence."""
    import ray

    from ray_data_mplsh.stages.shuffle import (cached_get,
                                               default_partitions,
                                               partition_apply,
                                               sized_partitions)

    def add_hash(b: pa.Table) -> pa.Table:
        return b.append_column(
            "text_hash", pa.array(hash_str_array(b["text"]), pa.uint64()))

    hashed = docs.map_batches(add_hash, batch_format="pyarrow").materialize()
    n = hashed.count()
    m = _plane_size(n, m_cells)
    P = sized_partitions(n, default_partitions(num_partitions))

    if force_exchange:
        probable = hashed
        uniques = None
    else:
        ref = ray.put(_merged_planes(hashed, m))

        def probe(b: pa.Table, want_dup: bool) -> pa.Table:
            ge2 = cached_get(ref)
            th = b["text_hash"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            c1, c2 = _cells(th, m)
            pot = ((ge2[c1 >> 3] >> (c1 & 7).astype(np.uint8)) & 1).astype(
                bool) & ((ge2[c2 >> 3] >> (c2 & 7).astype(np.uint8)) & 1
                         ).astype(bool)
            return b.filter(pa.array(pot if want_dup else ~pot))

        probable = hashed.map_batches(lambda b: probe(b, True),
                                      batch_format="pyarrow")
        uniques = hashed.map_batches(lambda b: probe(b, False),
                                     batch_format="pyarrow")

    def first_wins(part: pa.Table) -> pa.Table:
        import pandas as pd

        ids = part["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, _ = pd.factorize(part["text"].to_pandas(), sort=False)
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_copies": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        ng = codes.max() + 1
        gmin = np.full(ng, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(gmin, codes, ids)
        cnt = np.bincount(codes, minlength=ng).astype(np.int64)
        keep = ids == gmin[codes]
        out = part.filter(pa.array(keep)).drop_columns(["text_hash"])
        return out.append_column(
            "n_copies", pa.array(cnt[codes[keep]], pa.int64())) \
            .select(["doc_id", "n_copies", "text"])

    grouped = partition_apply(probable, "text_hash", first_wins, P)
    if uniques is None:
        return grouped

    def tag_unique(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "n_copies": pa.array(np.ones(b.num_rows, np.int64)),
            "text": b["text"]})

    return grouped.union(uniques.map_batches(tag_unique,
                                             batch_format="pyarrow"))
