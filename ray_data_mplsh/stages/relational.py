"""Distributed semi- / anti-join on an integer key (SURVEY.md §2 op 21's
generic relational sibling; capability contract from the reference's
filter-by-membership pipelines — no reference source exists to cite, see
SURVEY.md §0).

Two physical plans, threshold-gated like every hybrid stage in this repo:

* **broadcast** (default when the right side's distinct-key count fits
  ``broadcast_max_keys``): distinct keys are reduced by a per-batch
  ``np.unique`` combiner + one tiny ``groupby``, gathered once on the
  driver, ``ray.put`` once, and every left batch does a vectorized
  ``searchsorted`` membership probe — the scale-correct plan when the
  right side is a dimension (delete lists, license blocklists, seen-URL
  sets up to ~10^7).
* **shuffle** (large right side): left rows and distinct right keys ride
  ONE coarse key-partitioned exchange (schema-padded union, per-partition
  vectorized membership) — no driver materialization of either side.

Membership is tested on the EXACT key values; the 64-bit hash is used
only to route partitions (the pairs.py collision rule)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.functions.hashing import mix64
from ray_data_mplsh.stages.shuffle import (cached_get, default_partitions,
                                           partition_apply)

_SIDE = "__sj_side"


def _distinct_keys(right, right_on: str):
    """Dataset of distinct right keys under column ``k`` (int64): per-batch
    unique combiner, then one small groupby — shuffle volume is
    O(distinct x partitions), independent of right's row count."""
    from ray.data.aggregate import Count

    def partial(t: pa.Table) -> pa.Table:
        v = np.unique(t[right_on].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"k": pa.array(v, pa.int64())})

    return right.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Count(alias_name="_c"))


def semi_anti_join(left, right, *, left_on: str, right_on: str,
                   anti: bool = False, broadcast_max_keys: int = 2_000_000,
                   num_partitions: int = 0):
    """Keep left rows whose ``left_on`` key does (semi) / does not (anti)
    appear in ``right[right_on]``. Returns a Dataset with left's schema."""
    import ray

    # one execution: the distinct-key set is combiner-reduced (bounded by
    # |distinct|, not |right|), so materializing it in the object store is
    # the cheap way to both count it and reuse it without re-running the
    # plan for the count + consume passes
    rkeys = _distinct_keys(right, right_on).materialize()
    n_keys = rkeys.count()
    if n_keys <= broadcast_max_keys:
        ks = np.sort(np.concatenate(
            [b["k"].to_numpy(zero_copy_only=False).astype(np.int64)
             for b in rkeys.iter_batches(batch_size=65536,
                                         batch_format="pyarrow")]
            or [np.empty(0, np.int64)]))
        ref = ray.put(ks)

        def probe(t: pa.Table) -> pa.Table:
            keys = cached_get(ref)
            q = t[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(keys) == 0:
                mem = np.zeros(len(q), dtype=bool)
            else:
                i = np.clip(np.searchsorted(keys, q), 0, len(keys) - 1)
                mem = keys[i] == q
            return t.filter(pa.array(~mem if anti else mem))

        return left.map_batches(probe, batch_format="pyarrow")

    # ---- shuffle path: schema-padded union, one key-routed exchange ----
    schema = left.schema().base_schema
    cols = [f.name for f in schema]

    def pad_left(t: pa.Table) -> pa.Table:
        return t.append_column(_SIDE, pa.array(
            np.zeros(t.num_rows, np.int8), pa.int8()))

    def pad_right(t: pa.Table) -> pa.Table:
        arrs = []
        for f in schema:
            if f.name == left_on:
                arrs.append(t["k"].cast(f.type))
            else:
                arrs.append(pa.nulls(t.num_rows, f.type))
        arrs.append(pa.array(np.ones(t.num_rows, np.int8), pa.int8()))
        return pa.table(dict(zip(cols + [_SIDE], arrs)))

    both = left.map_batches(pad_left, batch_format="pyarrow").union(
        rkeys.drop_columns(["_c"]).map_batches(
            pad_right, batch_format="pyarrow"))

    def per_part(t: pa.Table) -> pa.Table:
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        k = t[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        rset = np.unique(k[side == 1])
        keep = side == 0
        if len(rset):
            i = np.clip(np.searchsorted(rset, k), 0, len(rset) - 1)
            mem = rset[i] == k
        else:
            mem = np.zeros(len(k), dtype=bool)
        keep &= (~mem if anti else mem)
        return t.filter(pa.array(keep)).drop_columns([_SIDE])

    return partition_apply(both, left_on, per_part,
                           default_partitions(num_partitions))


def inner_join(left, right, *, left_on: str, right_on: str,
               num_partitions: int = 0, hot_key_threshold: int = 1 << 22,
               salt_shards: int = 16):
    """Distributed INNER equi-join for two LARGE sides (neither fits a
    broadcast): the full_outer_join exchange/expansion plan minus the
    unmatched-row padding. Use broadcast_join when one side is a
    dimension table; this is the honest all-to-all for fact-fact."""
    return full_outer_join(left, right, left_on=left_on,
                           right_on=right_on,
                           num_partitions=num_partitions,
                           hot_key_threshold=hot_key_threshold,
                           salt_shards=salt_shards,
                           _join_type="inner")


def _count_partial(key: str, min_batch_count: int = 1):
    """Per-batch (key, left-count, right-count) combiner over the padded
    union, pre-filtered to keys appearing >= ``min_batch_count`` times in
    the batch — the partial's size is bounded by batch_rows /
    min_batch_count regardless of global key cardinality."""

    def partial(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t[_SIDE].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        cl = np.bincount(inv, weights=(s == 0), minlength=len(uk))
        cr = np.bincount(inv, weights=(s == 1), minlength=len(uk))
        if min_batch_count > 1:
            keep = (cl + cr) >= min_batch_count
            uk, cl, cr = uk[keep], cl[keep], cr[keep]
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "_cl": pa.array(cl.astype(np.int64)),
                         "_cr": pa.array(cr.astype(np.int64))})

    return partial


def _hot_join_keys(base, key: str, threshold: int, *,
                   min_batch_count: int = 2,
                   driver_cap: int = 4_000_000):
    """(sorted hot key array, shard_left flag per key, base): keys whose
    m x n expansion exceeds ``threshold`` rows.

    STREAMING PRESCAN (default): per-batch (key, side) count partials,
    pre-filtered to keys seen >= ``min_batch_count`` times in their batch,
    are gathered driver-side and merged with one np pass — no materialize
    barrier, no exchange. A key with cl x cr > threshold carries
    > 2*sqrt(threshold) rows total (>= 4096 at the default 1<<22), so it
    surfaces in batch-local counts unless spread thinner than the floor
    across EVERY batch; a missed hot key costs load balance only (its
    unsalted partition runs long), never correctness — salting is a
    balance optimization and the join is exact either way. Conversely the
    floor makes the gathered partials small for well-distributed keys
    (an all-unique key column emits nothing).

    ESCALATION: if the gathered partials exceed ``driver_cap`` rows
    (web-scale medium-frequency keys), the prescan aborts the stream,
    materializes ``base`` once (so upstream plans don't run a third time)
    and re-counts EXACTLY via the coarse hash-partitioned exchange
    (partition_apply on the int32 ``_part`` key — Ray's sort-based
    groupby on a 10^5+-cardinality key column measured ~8x slower for
    the same reduce). The returned ``base`` is the materialized handle in
    that case so the salt pass reuses the pinned blocks.

    shard_left = the left side has more rows for that key (shard the
    larger side, replicate the smaller)."""
    u = base.map_batches(_count_partial(key, min_batch_count),
                         batch_format="pyarrow")
    ks, cls, crs, total = [], [], [], 0
    for b in u.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ks.append(b["k"].to_numpy(zero_copy_only=False).astype(np.int64))
        cls.append(b["_cl"].to_numpy(zero_copy_only=False).astype(np.int64))
        crs.append(b["_cr"].to_numpy(zero_copy_only=False).astype(np.int64))
        total += b.num_rows
        if total > driver_cap:
            base = base.materialize()
            hk, hl = _hot_join_keys_exchange(base, key, threshold)
            return hk, hl, base
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, bool), base
    k = np.concatenate(ks)
    uk, inv = np.unique(k, return_inverse=True)
    cl = np.zeros(len(uk), np.int64)
    cr = np.zeros(len(uk), np.int64)
    np.add.at(cl, inv, np.concatenate(cls))
    np.add.at(cr, inv, np.concatenate(crs))
    hot = cl * cr > threshold
    return uk[hot], (cl >= cr)[hot], base


def _hot_join_keys_exchange(base, key: str, threshold: int) \
        -> tuple[np.ndarray, np.ndarray]:
    """Exact hot-key count over a MATERIALIZED padded union: unfiltered
    per-batch combiners -> one coarse hash-partitioned exchange summed
    within each partition -> driver keeps ONLY the hot rows (few by
    definition). The driver_cap overflow path of ``_hot_join_keys``."""
    from ray_data_mplsh.stages.shuffle import (default_partitions,
                                               partition_apply)

    def sum_hot(part: pa.Table) -> pa.Table:
        k = part["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        cl = np.zeros(len(uk), np.int64)
        cr = np.zeros(len(uk), np.int64)
        np.add.at(cl, inv, part["_cl"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))
        np.add.at(cr, inv, part["_cr"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))
        hot = cl * cr > threshold
        return pa.table({"k": pa.array(uk[hot], pa.int64()),
                         "cl": pa.array(cl[hot]), "cr": pa.array(cr[hot])})

    u = base.map_batches(_count_partial(key), batch_format="pyarrow")
    agg = partition_apply(u, "k", sum_hot, default_partitions(0))

    rows = [b for b in agg.iter_batches(batch_size=65536,
                                        batch_format="pyarrow")]
    if not rows or sum(t.num_rows for t in rows) == 0:
        return np.empty(0, np.int64), np.empty(0, bool)
    hot = pa.concat_tables(rows)
    k = hot["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    cl = hot["cl"].to_numpy(zero_copy_only=False).astype(np.int64)
    cr = hot["cr"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(k)
    return k[o], (cl >= cr)[o]


_SALT = "__fj_salt"
_HOT = "__fj_hot"


def full_outer_join(left, right, *, left_on: str, right_on: str,
                    num_partitions: int = 0, hot_key_threshold: int = 1 << 22,
                    salt_shards: int = 16, _join_type: str = "full_outer"):
    """Distributed FULL OUTER equi-join on an integer key, m:n duplicate
    semantics (every left row x every right row per matched key;
    unmatched rows from either side padded with nulls).

    One coarse key-routed exchange carries BOTH inputs (schema-padded
    union tagged by side — the semi_anti_join shuffle plan); each
    partition then resolves its keys exactly with a fully vectorized
    expansion: both sides are key-sorted, matched keys emit their
    cross-product via repeat/arange gather indices, unmatched rows are
    appended with null columns from the other side. No driver
    materialization, no per-key Python loop. Key columns keep both names
    (SQL FULL JOIN shape); use ``pc.coalesce`` downstream for the merged
    key.

    HOT-KEY SALTING (SURVEY.md B.1, the pairs.py op-15 machinery applied
    to m:n joins): a key whose cl x cr expansion exceeds
    ``hot_key_threshold`` rows would serialize one partition, so a cheap
    streaming count pre-pass (batch-local floored combiners merged on the
    driver; exact-exchange escalation above a driver cap — see
    ``_hot_join_keys``) finds such keys. Their LARGER side is sharded across ``salt_shards`` salt values
    and their smaller side is replicated to every shard; the exchange
    routes on hash(key, salt), so each shard builds a disjoint slice of
    the cross-product and the union over shards is exactly the m:n
    expansion, each pair produced once. Hot keys have both sides
    non-empty, so unmatched-row padding (suppressed for hot rows) is
    unaffected. Cost: the count pre-pass STREAMS the padded union
    (driver-merged batch-local partials, see ``_hot_join_keys``) — no
    materialize barrier and no counting exchange; the union's upstream
    plans (column-pruned parquet reads + pad) execute a second time for
    the salt pass, which measures far cheaper than pinning the padded
    union as an extra stage boundary. Only when the gathered partials
    overflow the driver cap does the prescan materialize the union and
    escalate to the exact exchange-based count (reusing the pinned
    blocks for the salt pass). ``hot_key_threshold=0`` disables
    detection and restores the fully streaming single-pass plan."""
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [f.name for f in lschema]
    rcols = [f.name for f in rschema]
    if set(lcols) & set(rcols):
        raise ValueError("full_outer_join requires disjoint column names")
    allcols = lcols + rcols
    key = "__fj_key"
    S = max(int(salt_shards), 1)

    def pad(t: pa.Table, side: int) -> pa.Table:
        arrs, names = [], []
        for f in lschema:
            arrs.append(t[f.name] if side == 0
                        else pa.nulls(t.num_rows, f.type))
            names.append(f.name)
        for f in rschema:
            arrs.append(pa.nulls(t.num_rows, f.type) if side == 0
                        else t[f.name])
            names.append(f.name)
        kv = t[left_on if side == 0 else right_on].cast(pa.int64())
        arrs += [kv, pa.array(np.full(t.num_rows, side, np.int8),
                              pa.int8())]
        names += [key, _SIDE]
        return pa.table(dict(zip(names, arrs)))

    base = left.map_batches(lambda t: pad(t, 0),
                            batch_format="pyarrow").union(
        right.map_batches(lambda t: pad(t, 1), batch_format="pyarrow"))

    hot_ref = None
    if hot_key_threshold > 0:
        hot_keys, hot_shard_left, base = _hot_join_keys(
            base, key, hot_key_threshold)
        if len(hot_keys):
            import ray

            hot_ref = ray.put((hot_keys, hot_shard_left))

    def add_salt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if hot_ref is None:
            return t.append_column(
                _SALT, pa.array(np.zeros(n, np.int8), pa.int8())) \
                .append_column(
                    _HOT, pa.array(np.zeros(n, np.int8), pa.int8()))
        hk, hl = cached_get(hot_ref)
        k = t[key].to_numpy(zero_copy_only=False)
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        i = np.clip(np.searchsorted(hk, k), 0, len(hk) - 1)
        is_hot = hk[i] == k
        # shard this row iff its side is the hot key's larger side
        shard = is_hot & np.where(side == 0, hl[i], ~hl[i])
        repl = is_hot & ~shard
        salt = np.zeros(n, np.int8)
        # round-robin within the batch spreads a hot run evenly; the
        # starting offset is a content hash so batches don't all begin
        # at salt 0 (thinly-spread hot rows would overload low salts —
        # shard assignment need not be stable across runs, only disjoint)
        ns = int(shard.sum())
        if ns:
            si = np.flatnonzero(shard)
            off = int(mix64((int(k[si[0]]) & 0xFFFFFFFFFFFFFFFF)
                            ^ (ns << 32) ^ int(si[0])))
            salt[shard] = ((off + np.arange(ns)) % S).astype(np.int8)
        out = t.append_column(_SALT, pa.array(salt, pa.int8())) \
            .append_column(_HOT, pa.array(is_hot.astype(np.int8),
                                          pa.int8()))
        if not repl.any():
            return out
        # replicate the smaller side's hot rows to every salt shard
        ri = np.flatnonzero(repl)
        keep = out.filter(pa.array(~repl))
        reps = out.take(pa.array(np.tile(ri, S), pa.int64()))
        rs = np.repeat(np.arange(S, dtype=np.int8), len(ri))
        reps = reps.set_column(reps.schema.get_field_index(_SALT), _SALT,
                               pa.array(rs, pa.int8()))
        return pa.concat_tables([keep, reps])

    both = base.map_batches(add_salt, batch_format="pyarrow")

    def per_part(t: pa.Table) -> pa.Table:
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        k = t[key].to_numpy(zero_copy_only=False)
        salt = t[_SALT].to_numpy(zero_copy_only=False).astype(np.int64)
        hot = t[_HOT].to_numpy(zero_copy_only=False).astype(bool)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        # groups are (key, salt): non-hot rows all carry salt 0, hot keys
        # meet only shard-local counterparts (their replicas are routed to
        # every salt, their shards to exactly one)
        _, kc = np.unique(k, return_inverse=True)
        uk, codes = np.unique(kc * np.int64(S) + salt, return_inverse=True)
        nk = len(uk)
        lc, rc = codes[li], codes[ri]
        lo = li[np.argsort(lc, kind="stable")]
        ro = ri[np.argsort(rc, kind="stable")]
        cl = np.bincount(lc, minlength=nk)
        cr = np.bincount(rc, minlength=nk)
        # right-run start offset per group (into ro)
        rs = np.concatenate(([0], np.cumsum(cr)))[:-1]
        # matched cross-product: each left row repeats cr[its group] times
        lkey = codes[lo]
        rep = cr[lkey]
        out_l = np.repeat(lo, rep)
        csum = np.cumsum(rep)
        within = np.arange(int(csum[-1]) if len(csum) else 0,
                           dtype=np.int64) - np.repeat(csum - rep, rep)
        out_r = ro[rs[np.repeat(lkey, rep)] + within]
        # unmatched padding is suppressed for hot rows: a hot key has both
        # sides non-empty globally, even when one salt shard sees only the
        # replicated side
        lonly = lo[(cr[lkey] == 0) & ~hot[lo]]
        ronly = ro[(cl[codes[ro]] == 0) & ~hot[ro]]
        body = t.select(allcols)
        matched = body.take(pa.array(out_l, pa.int64()))
        # graft the right columns of matched pairs over the left rows' nulls
        rpart = body.take(pa.array(out_r, pa.int64()))
        matched = pa.table(
            {c: (matched[c] if c in lcols else rpart[c])
             for c in allcols})
        if _join_type == "inner":
            return matched
        return pa.concat_tables(
            [matched,
             body.take(pa.array(lonly, pa.int64())),
             body.take(pa.array(ronly, pa.int64()))])

    return partition_apply(both, key, per_part,
                           default_partitions(num_partitions),
                           salt_col=_SALT)
