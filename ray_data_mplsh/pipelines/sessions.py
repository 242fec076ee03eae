"""Sessionization: the gap-rule stateful-streaming operator every
web-scale event pipeline needs (SURVEY.md §2 custom-operator family; the
reference snapshot has no source to cite — capability contract per
SURVEY.md §0).

A session is a maximal run of one user's events where consecutive
timestamps are ``<= gap`` apart; a strictly-larger gap starts a new
session. Ray Data has no native sessionize, so it is composed exactly the
way SURVEY.md §4.3 prescribes for order-dependent per-key state: ONE
coarse key-partitioned exchange (all of a user's events co-locate), then a
fully vectorized per-partition kernel — one ``np.lexsort`` of
(key, ts, order), run-boundary detection, and ``np.add.reduceat`` per-run
sums. No per-user Python loop, no driver materialization; cost is the
same single shuffle an aggregate would pay, and skewed users are bounded
by the per-partition sort (a single user's events must fit one partition —
the documented partitioning assumption)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.stages.shuffle import default_partitions, partition_apply


def sessionize(ds, *, key_col: str, ts_col: str, order_col: str,
               cents_col: str | None = None,
               gap_us: int = 30 * 60 * 1_000_000,
               num_partitions: int = 0):
    """Collapse an event Dataset into per-session rows
    ``(key, session_start, n_events[, cents])``.

    ``session_start`` is the epoch-microsecond int64 of the session's first
    event; ordering within a key is (ts, order_col) so ties are
    deterministic. ``cents_col`` (optional int64) is summed per session.
    Bit-exact vs the SQL lag/window formulation (q_sessionize oracle)."""

    def per_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = (t[cents_col].to_numpy(zero_copy_only=False)
                 .astype(np.int64) if cents_col else None)
        order = np.lexsort((o, ts, k))
        k, ts = k[order], ts[order]
        if cents is not None:
            cents = cents[order]
        n = len(k)
        if n == 0:
            cols = {key_col: pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64())}
            if cents_col:
                cols["cents"] = pa.array([], pa.int64())
            return pa.table(cols)
        brk = np.concatenate((
            [True], (k[1:] != k[:-1]) | (ts[1:] - ts[:-1] > gap_us)))
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [n]))
        cols = {key_col: pa.array(k[starts], pa.int64()),
                "session_start": pa.array(ts[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64())}
        if cents is not None:
            cols["cents"] = pa.array(
                np.add.reduceat(cents, starts), pa.int64())
        return pa.table(cols)

    return partition_apply(ds, key_col, per_part,
                           default_partitions(num_partitions))
