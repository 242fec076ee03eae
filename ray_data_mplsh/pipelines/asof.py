"""Distributed as-of join — a custom operator Ray Data lacks natively
(SURVEY.md §2 custom-op path (a): composition of map_batches + one
key-co-locating shuffle).

``asof_join(left, right)``: for every left row, the right row with the
largest ``right_ts <= left_ts`` within the same key (a LEFT as-of join:
unmatched left rows carry a null value). Ties on equal ``right_ts`` are
broken deterministically by the maximum ``right_val`` — callers must
apply the same rule in any oracle.

Physical plan: both sides are tagged and unioned, one coarse shuffle
co-locates equal keys, and each partition resolves its keys with sorted
NumPy searchsorted runs — per-key work is vectorized, the Python loop is
one iteration per distinct key per partition (the same granularity bound
as every other partition_apply in this engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.stages.shuffle import group_runs, partition_apply


def asof_join(left, right, *, left_key: str, left_ts: str, left_id: str,
              right_key: str, right_ts: str, right_val: str,
              num_partitions: int):
    """Returns (left_id, value) where value is the as-of matched
    ``right_val`` (null when no right row precedes the left timestamp)."""

    def prep_left(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t[left_key].cast(pa.uint64()),
            "t": t[left_ts].cast(pa.timestamp("us")).cast(pa.int64()),
            "rid": t[left_id].cast(pa.int64()),
            "val": pa.nulls(t.num_rows, pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
        })

    def prep_right(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t[right_key].cast(pa.uint64()),
            "t": t[right_ts].cast(pa.timestamp("us")).cast(pa.int64()),
            "rid": pa.nulls(t.num_rows, pa.int64()),
            "val": t[right_val].cast(pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
        })

    unioned = left.map_batches(prep_left, batch_format="pyarrow") \
        .union(right.map_batches(prep_right, batch_format="pyarrow"))

    def resolve(part: pa.Table) -> pa.Table:
        k = part["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ts = part["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = part["side"].to_numpy(zero_copy_only=False)
        rid = part["rid"].to_numpy(zero_copy_only=False)
        val = part["val"].to_numpy(zero_copy_only=False)
        is_l = side == 0
        lk, lt, lrid = k[is_l], ts[is_l], rid[is_l]
        rk, rt, rv = k[~is_l], ts[~is_l], val[~is_l]
        out_val = np.full(len(lk), np.nan)
        if len(rk):
            # right side sorted by (key, ts, val): ties on ts resolve to
            # the max val (the last of the run)
            ro = np.lexsort((rv, rt, rk))
            rk, rt, rv = rk[ro], rt[ro], rv[ro]
            r_order, r_starts = group_runs(rk)
            # iterate distinct right keys; vectorized searchsorted per key
            lo = np.lexsort((lt, lk))
            slk, slt = lk[lo], lt[lo]
            for gi in range(len(r_starts) - 1):
                s, e = r_starts[gi], r_starts[gi + 1]
                key = rk[s]
                a = np.searchsorted(slk, key, side="left")
                b = np.searchsorted(slk, key, side="right")
                if a == b:
                    continue
                pos = np.searchsorted(rt[s:e], slt[a:b], side="right") - 1
                hit = pos >= 0
                idx = lo[a:b]
                out_val[idx[hit]] = rv[s:e][pos[hit]]
        return pa.table({
            "left_id": pa.array(lrid.astype(np.int64), pa.int64()),
            "value": pa.array([None if np.isnan(x) else int(x)
                               for x in out_val], pa.int64()),
        })

    return partition_apply(unioned, "k", resolve, num_partitions)


def range_join_count(left, right, *, left_key: str, left_ts: str,
                     left_id: str, right_key: str, right_ts: str,
                     window_us: int, num_partitions: int):
    """Temporal range join, aggregated: for every left row, COUNT of right
    rows with the same key and ``left_ts - window < right_ts <= left_ts``.
    Same physical plan as ``asof_join`` (tagged union, one key shuffle,
    sorted searchsorted runs); the count is two binary searches per row."""

    def prep_left(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t[left_key].cast(pa.uint64()),
            "t": t[left_ts].cast(pa.timestamp("us")).cast(pa.int64()),
            "rid": t[left_id].cast(pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
        })

    def prep_right(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t[right_key].cast(pa.uint64()),
            "t": t[right_ts].cast(pa.timestamp("us")).cast(pa.int64()),
            "rid": pa.nulls(t.num_rows, pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
        })

    unioned = left.map_batches(prep_left, batch_format="pyarrow") \
        .union(right.map_batches(prep_right, batch_format="pyarrow"))

    def resolve(part: pa.Table) -> pa.Table:
        k = part["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ts = part["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = part["side"].to_numpy(zero_copy_only=False)
        rid = part["rid"].to_numpy(zero_copy_only=False)
        is_l = side == 0
        lk, lt, lrid = k[is_l], ts[is_l], rid[is_l]
        rk, rt = k[~is_l], ts[~is_l]
        cnt = np.zeros(len(lk), np.int64)
        if len(rk):
            ro = np.lexsort((rt, rk))
            rk, rt = rk[ro], rt[ro]
            _, r_starts = group_runs(rk)
            lo = np.lexsort((lt, lk))
            slk, slt = lk[lo], lt[lo]
            for gi in range(len(r_starts) - 1):
                s, e = r_starts[gi], r_starts[gi + 1]
                a = np.searchsorted(slk, rk[s], side="left")
                b = np.searchsorted(slk, rk[s], side="right")
                if a == b:
                    continue
                hi = np.searchsorted(rt[s:e], slt[a:b], side="right")
                lo_i = np.searchsorted(rt[s:e], slt[a:b] - window_us,
                                       side="right")
                cnt[lo[a:b]] = hi - lo_i
        return pa.table({
            "left_id": pa.array(lrid.astype(np.int64), pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    return partition_apply(unioned, "k", resolve, num_partitions)