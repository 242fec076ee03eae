"""Distributed as-of join — a custom operator Ray Data lacks natively
(SURVEY.md §2 custom-op path (a): composition of map_batches + one
key-co-locating shuffle).

``asof_join(left, right)``: for every left row, the right row with the
largest ``right_ts <= left_ts`` within the same key (a LEFT as-of join:
unmatched left rows carry a null value). Ties on equal ``right_ts`` are
broken deterministically by the maximum ``right_val`` — callers must
apply the same rule in any oracle.

Physical plan: both sides are tagged and unioned, one coarse shuffle
co-locates equal keys, and each partition resolves ALL its keys in one
vectorized pass — a single lexsort of the tagged union on (key, ts, side)
followed by a segment-aware forward-fill (as-of) or cumulative-count
difference (range count). No per-key Python loop; per-partition cost is
O(n log n) C-level sort regardless of key cardinality.

Null/overflow safety: matches are tracked with a boolean hit mask plus an
int64 value array (Arrow null mask on output) — values never round-trip
through float64, so payload magnitudes above 2^53 stay exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray_data_mplsh.stages.shuffle import partition_apply


def _i64(col: pa.ChunkedArray) -> np.ndarray:
    """Nullable int64 column -> int64 numpy (nulls as 0) WITHOUT a float64
    round-trip (to_numpy on a nullable column converts via float64/NaN,
    silently rounding magnitudes above 2^53)."""
    return pc.fill_null(col, 0).combine_chunks() \
        .to_numpy(zero_copy_only=False).astype(np.int64)


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
        rid = _i64(part["rid"])
        val = _i64(part["val"])
        n = len(k)
        is_l = side == 0
        # one lexsort of the tagged union: (key, ts, right-before-left at
        # equal ts [rt <= lt includes equality], val ascending so among
        # equal (k, ts) right rows the LAST — i.e. max val — wins the fill)
        o = np.lexsort((val, is_l.astype(np.int8), ts, k))
        sk, s_isl, sval = k[o], is_l[o], val[o]
        idx = np.arange(n, dtype=np.int64)
        # forward-fill: index of the most recent right row at each position
        last_r = np.where(~s_isl, idx, np.int64(-1))
        np.maximum.accumulate(last_r, out=last_r)
        # segment reset: a fill is valid only within the same key run
        new = np.concatenate(([True], sk[1:] != sk[:-1])) if n else \
            np.empty(0, bool)
        run_start = idx[new][np.cumsum(new) - 1] if n else idx
        lpos = np.flatnonzero(s_isl)
        hit = last_r[lpos] >= run_start[lpos]
        out_val = np.zeros(len(lpos), np.int64)
        out_val[hit] = sval[last_r[lpos][hit]]
        lrid = rid[o][lpos]
        return pa.table({
            "left_id": pa.array(lrid, pa.int64()),
            "value": pa.array(out_val, pa.int64(), mask=~hit),
        })

    return partition_apply(unioned, "k", resolve, num_partitions)


def range_join_count(left, right, *, left_key: str, left_ts: str,
                     left_id: str, right_key: str, right_ts: str,
                     window_us: int, num_partitions: int):
    """Temporal range join, aggregated: for every left row, COUNT of right
    rows with the same key and ``left_ts - window < right_ts <= left_ts``.
    Same physical plan as ``asof_join`` (tagged union, one key shuffle);
    the count is the difference of two vectorized threshold passes:
    #{rt <= lt} - #{rt <= lt - window}, each one lexsort + cumsum."""

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

    def count_le(lk, lq, rk, rt):
        """Per left row: #right rows with the same key and rt <= lq.
        One lexsort of the tagged union (right sorts before left at equal
        timestamps, so equality counts) + running right-row count, with
        the per-key-run base subtracted."""
        nl = len(lq)
        kk = np.concatenate([lk, rk])
        tt = np.concatenate([lq, rt])
        ss = np.concatenate([np.ones(nl, np.int8),
                             np.zeros(len(rt), np.int8)])
        o = np.lexsort((ss, tt, kk))
        is_r = ss[o] == 0
        cum = np.cumsum(is_r)
        kk_s = kk[o]
        new = np.concatenate(([True], kk_s[1:] != kk_s[:-1]))
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        base = cum[starts] - is_r[starts]
        cnt_sorted = cum - base[run_id]
        out = np.zeros(nl, np.int64)
        lmask = ~is_r
        out[o[lmask]] = cnt_sorted[lmask]   # left indices precede right
        return out

    def resolve(part: pa.Table) -> pa.Table:
        k = part["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ts = part["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = part["side"].to_numpy(zero_copy_only=False)
        rid = _i64(part["rid"])
        is_l = side == 0
        lk, lt, lrid = k[is_l], ts[is_l], rid[is_l]
        rk, rt = k[~is_l], ts[~is_l]
        cnt = np.zeros(len(lk), np.int64)
        if len(rk) and len(lk):
            cnt = count_le(lk, lt, rk, rt) \
                - count_le(lk, lt - window_us, rk, rt)
        return pa.table({
            "left_id": pa.array(lrid, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    return partition_apply(unioned, "k", resolve, num_partitions)