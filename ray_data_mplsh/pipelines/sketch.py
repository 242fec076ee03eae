"""KMV (k-minimum-values) distinct-count sketch (SURVEY.md §2.5 noted
sketches as "available, not built" — built here as a training-data op).

The sketch IS this engine's MinHash machinery pointed at cardinality:
keep the k smallest 64-bit hashes of a column; the distinct count is
``(k - 1) / (max_kept / 2^64)`` (Bar-Yossef et al. 2002). Perfectly
mergeable — per-batch partial sketches are k-element arrays combined by a
k-smallest merge — so the whole aggregate is combiner-style: heavy work
in map_batches, a tiny driver-side merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.functions.hashing import hash_str_array


def _kmv_merge(parts: list[np.ndarray], k: int) -> np.ndarray:
    allv = np.concatenate(parts) if parts else np.empty(0, np.uint64)
    allv = np.unique(allv)          # sorted unique
    return allv[:k]


def kmv_estimate(kept: np.ndarray, k: int) -> float:
    """Distinct-count estimate from a merged sketch."""
    if len(kept) < k:               # saw fewer than k distinct values
        return float(len(kept))
    return (k - 1) / (float(kept[-1]) / 2.0**64)


def approx_distinct(ds, column: str, k: int = 1024) -> float:
    """Approximate COUNT(DISTINCT column) with ~1/sqrt(k) relative error.

    Per-batch partial sketches stream out as k-row tables; the driver
    merges a handful of tiny arrays. No shuffle, no full materialization —
    the scale-correct shape for cardinality over 10^12 rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        col = t[column]
        if pa.types.is_string(col.type):
            h = hash_str_array(col)
        else:
            h = hash_str_array(col.cast(pa.string()))
        kept = np.unique(h)[:k]
        return pa.table({"h": pa.array(kept, pa.uint64())})

    parts = [b["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
             for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=k, batch_format="pyarrow")]
    return kmv_estimate(_kmv_merge(parts, k), k)
