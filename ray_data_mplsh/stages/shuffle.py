"""The engine's shuffle primitive: coarse key-partitioned apply.

Why not ``groupby(fine_key).map_groups(fn)`` directly?  At web scale the
band-key table has ~one group per row (most LSH buckets are singletons);
Ray invokes the ``map_groups`` callback once per group, so a 10^9-bucket
table would pay 10^9 Python calls. Instead we group by a COARSE partition
key — ``hash(fine_key) % P`` with P ≈ 2x cluster CPUs — which gives one
Python call per partition, and the callback does the fine-grained grouping
itself with C-level NumPy sorts (SURVEY.md §4.3 "partitioning").

This is still one genuine all-to-all exchange per call (Ray's sort-based
shuffle on the partition column), it just right-sizes the Python-boundary
granularity. Rows with equal fine keys always land in the same partition,
so per-partition dedup/grouping is globally correct.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ray_data_mplsh.functions.hashing import mix64


def default_partitions(requested: int = 0) -> int:
    if requested > 0:
        return requested
    try:
        import ray
        if ray.is_initialized():
            return max(2 * int(ray.cluster_resources().get("CPU", 8)), 16)
    except Exception:
        pass
    return 16


_GET_CACHE: dict = {}


def cached_get(ref):
    """Per-worker-process memoized ``ray.get``: broadcast payloads (numpy
    arrays / Arrow tables) deserialize zero-copy, and the cache makes the
    per-task cost of re-resolving a ref ~zero, so cheap broadcast-lookup
    stages can be plain TASK functions (reusing warm workers) instead of
    actor pools (which pay a fresh pool spin-up per stage). Actor pools
    stay reserved for genuinely expensive per-actor setup (SURVEY.md §2.3).
    """
    import ray

    try:
        return _GET_CACHE[ref]
    except KeyError:
        val = ray.get(ref)
        if len(_GET_CACHE) > 16:
            _GET_CACHE.clear()
        _GET_CACHE[ref] = val
        return val


def pool_size(cap: int = 0) -> int:
    """Actor-pool width for a stateful stage: cluster CPUs - 1 (leave one
    for the driver/executor), optionally capped."""
    n = 4
    try:
        import ray
        if ray.is_initialized():
            n = max(int(ray.cluster_resources().get("CPU", 4)) - 1, 2)
    except Exception:
        pass
    return min(n, cap) if cap > 0 else n


def partition_on(ds, key_col: str, num_partitions: int, *,
                 salt_col: str | None = None):
    """Add a ``_part`` column = hash(key) % P. With ``salt_col``, the salt is
    folded in, sharding hot keys across partitions (hot-bucket salting,
    SURVEY.md op 15); callers must then link shards explicitly."""

    def add_part(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = mix64(keys)
        if salt_col is not None:
            salt = batch[salt_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = mix64(h ^ mix64(salt))
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, pa.int32()))

    return ds.map_batches(add_part, batch_format="pyarrow")


def partition_apply(ds, key_col: str, fn: Callable[[pa.Table], pa.Table],
                    num_partitions: int, *, salt_col: str | None = None):
    """Shuffle ``ds`` so all rows with equal ``key_col`` are in one partition,
    then apply ``fn`` once per partition (fn sees a pa.Table WITHOUT the
    ``_part`` helper column and must do its own within-partition grouping)."""

    def per_part(part: pa.Table) -> pa.Table:
        return fn(part.drop_columns(["_part"]))

    parted = partition_on(ds, key_col, num_partitions, salt_col=salt_col)
    return parted.groupby("_part").map_groups(per_part, batch_format="pyarrow")


def lookup_u64(sorted_keys: np.ndarray, vals: np.ndarray, q: np.ndarray,
               default: np.ndarray) -> np.ndarray:
    """Vectorized sorted-array lookup with per-row default."""
    if len(sorted_keys) == 0:
        return default
    i = np.clip(np.searchsorted(sorted_keys, q), 0, len(sorted_keys) - 1)
    hit = sorted_keys[i] == q
    out = default.copy()
    out[hit] = vals[i[hit]]
    return out


def isin_sorted(sorted_arr: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Vectorized membership test against a sorted array."""
    if len(sorted_arr) == 0:
        return np.zeros(len(q), dtype=bool)
    i = np.clip(np.searchsorted(sorted_arr, q), 0, len(sorted_arr) - 1)
    return sorted_arr[i] == q


def sized_partitions(n_rows: int, num_partitions: int, *,
                     rows_per_part: int = 65536, floor: int = 8) -> int:
    """Adaptive exchange width for a KNOWN input size: a partition_apply
    costs one shuffle object per (block x partition), so a 64-wide
    exchange over a few thousand rows is almost pure overhead. Small
    inputs drop to ``floor`` partitions; the width grows with the data
    (one partition per ``rows_per_part`` rows) and caps at the
    configured ``num_partitions`` so web-scale inputs keep the full
    plan. The count stays a pure function of the data size — not the
    cluster — so the physical plan is identical across cluster sizes
    (the scaling-bench invariant)."""
    lo = max(1, min(floor, num_partitions))
    return int(min(num_partitions, max(lo, n_rows // rows_per_part)))


def gather_capped(ds, max_rows: int, schema: pa.Schema) -> pa.Table | None:
    """Stream a Dataset to ONE driver-side Arrow table, aborting as soon
    as more than ``max_rows`` rows have arrived — the broadcast-overflow
    gate: callers broadcast the table when it comes back, and flip to a
    keyed-exchange plan when it is ``None`` (the side was not
    driver-sized; the partial gather is discarded and the side's plan
    re-executes inside the exchange)."""
    parts, rows = [], 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        parts.append(b)
        rows += b.num_rows
        if rows > max_rows:
            return None
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts).cast(schema)


def gather_kv(ds, key_col: str, val_col: str) -> tuple:
    """Collect a (key, value) Dataset to sorted parallel uint64 arrays —
    the broadcast-side payload for map-side lookups."""
    ks, vs = [], []
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ks.append(b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        vs.append(b[val_col].to_numpy(zero_copy_only=False).astype(np.uint64))
    if not ks:
        e = np.empty(0, np.uint64)
        return e, e
    k = np.concatenate(ks)
    v = np.concatenate(vs)
    o = np.argsort(k)
    return k[o], v[o]


def broadcast_join(left, right: pa.Table, *, left_on: str, right_on: str,
                   join_type: str = "inner"):
    """Map-side join against a SMALL right table: ``ray.put`` once, every
    task reads the shared object-store copy zero-copy and runs a C++ hash
    join per batch (SURVEY.md §4.3 "broadcast small sides with ray.put").
    Use only when ``right`` fits comfortably in worker heaps; the shuffle
    path (``Dataset.join``) is the large-side fallback."""
    import ray

    ref = ray.put(right)

    def bj(batch: pa.Table) -> pa.Table:
        rt = ray.get(ref)
        return batch.join(rt, keys=[left_on], right_keys=[right_on],
                          join_type=join_type)

    return left.map_batches(bj, batch_format="pyarrow")


def from_arrow_blocks(table: pa.Table, target_rows: int = 4096):
    """``ray.data.from_arrow`` with the table pre-sliced into multiple
    blocks. A single-block Dataset executes downstream map_batches as ONE
    task regardless of batch_size — any driver-built table feeding a
    parallel stage must be split first."""
    import ray.data

    n = table.num_rows
    if n <= target_rows:
        return ray.data.from_arrow(table)
    slices = [table.slice(i, target_rows)
              for i in range(0, n, target_rows)]
    return ray.data.from_arrow(slices)


def gather_slices(offs: np.ndarray, vals: np.ndarray, rows: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized gather of list-array slices for the given rows:
    (flat values in row order, per-row lengths). No Python loop."""
    starts = offs[rows].astype(np.int64)
    lens = (offs[rows + 1].astype(np.int64) - starts)
    cum = np.concatenate(([0], np.cumsum(lens)))
    idx = np.arange(cum[-1], dtype=np.int64) \
        - np.repeat(cum[:-1], lens) + np.repeat(starts, lens)
    return vals[idx], lens


def group_runs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(order, run_starts) for grouping a partition by a uint64 key array:
    ``order`` sorts the rows; ``run_starts`` indexes group starts in the
    sorted view (terminated by len)."""
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    if len(sk) == 0:
        return order, np.zeros(1, dtype=np.int64)
    starts = np.flatnonzero(np.concatenate(([True], sk[1:] != sk[:-1])))
    return order, np.concatenate([starts, [len(sk)]]).astype(np.int64)
