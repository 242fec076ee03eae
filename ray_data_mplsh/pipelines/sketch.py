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


def approx_distinct_u64(ds, column: str, k: int = 256) -> float:
    """KMV distinct-count over an integer column hashed with the SplitMix64
    finalizer (``mix64``) instead of the string hash. The mixer is pure
    64-bit arithmetic, so an external SQL engine can replay the ENTIRE
    sketch bit-exactly — see the q_kmv_doc_ids oracle, which re-derives
    mix64 with HUGEINT split-multiplies and matches the estimate to the
    last float bit. Same combiner shape as ``approx_distinct``."""
    from ray_data_mplsh.functions.hashing import mix64

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.uint64)
        kept = np.unique(mix64(v))[:k]
        return pa.table({"h": pa.array(kept, pa.uint64())})

    parts = [b["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
             for b in ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=k, batch_format="pyarrow")]
    return kmv_estimate(_kmv_merge(parts, k), k)


# ---------------- quantiles (the percentile-gating primitive) --------------

def exact_quantiles(ds, column: str, qs: list[float]) -> pa.Table:
    """EXACT distributed quantiles for a bounded-cardinality column
    (lengths, scores — the pretraining quality-gate case): per-batch
    value-count partials (combiner pattern) -> one small
    ``groupby(value).sum`` shuffle -> a tiny sorted CDF on the driver.

    The shuffle volume is O(distinct values x partitions), independent of
    row count, so this is the scale path whenever the domain is bounded.
    Rank rule matches DuckDB ``quantile_disc``: the value at sorted-multiset
    index ``ceil(q*n) - 1`` (clamped), computed with the same IEEE double
    multiply so oracle parity is exact.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals),
                         "c": pa.array(cnts, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c", alias_name="c"))
    vs, cs = [], []
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        vs.append(b["v"].to_numpy(zero_copy_only=False))
        cs.append(b["c"].to_numpy(zero_copy_only=False))
    if not vs:  # empty input: no values -> no quantile rows
        sch = ds.schema()
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array(
                             [], dict(zip(sch.names, sch.types))[column])})
    v = np.concatenate(vs)
    c = np.concatenate(cs).astype(np.int64)
    o = np.argsort(v, kind="stable")
    v, c = v[o], c[o]
    cum = np.cumsum(c)
    n = int(cum[-1])
    out_v = []
    for q in qs:
        r = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
        out_v.append(v[int(np.searchsorted(cum, r + 1))])
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(np.array(out_v))})


def exact_quantiles_cont(ds, column: str, qs: list[float]) -> pa.Table:
    """EXACT distributed CONTINUOUS (interpolated) quantiles: same
    value-count combiner + tiny CDF as ``exact_quantiles``, but the rank
    rule replays DuckDB ``quantile_cont``: RN = q*(n-1) in IEEE double,
    result = (ceil(RN)-RN)*v[floor(RN)] + (RN-floor(RN))*v[ceil(RN)] —
    the same two-weight formula (not a generic lerp), so oracle parity
    is bit-exact in float64."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            t[column].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": pa.array(vals),
                         "c": pa.array(cnts, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c", alias_name="c"))
    vs, cs = [], []
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        vs.append(b["v"].to_numpy(zero_copy_only=False))
        cs.append(b["c"].to_numpy(zero_copy_only=False))
    if not vs:  # empty input: no values -> no quantile rows
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    v = np.concatenate(vs).astype(np.float64)
    c = np.concatenate(cs).astype(np.int64)
    o = np.argsort(v, kind="stable")
    v, c = v[o], c[o]
    cum = np.cumsum(c)
    n = int(cum[-1])
    out = []
    for q in qs:
        rn = float(q) * (n - 1)
        lo, hi = int(np.floor(rn)), int(np.ceil(rn))
        vlo = float(v[int(np.searchsorted(cum, lo + 1))])
        vhi = float(v[int(np.searchsorted(cum, hi + 1))])
        out.append(vlo if hi == lo
                   else (hi - rn) * vlo + (rn - lo) * vhi)
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(out, pa.float64())})


def grouped_exact_quantiles(ds, group_col: str, value_col: str,
                            qs: list[float]) -> pa.Table:
    """Per-group EXACT quantiles (the grouped length/quality gate — e.g.
    p50/p90 document length PER LANGUAGE): same value-count combiner as
    ``exact_quantiles`` but keyed on (group, value); the post-shuffle
    table is O(groups x distinct values), so the driver-side CDF walk is
    tiny regardless of row count. Rank rule = DuckDB ``quantile_disc``
    (value at sorted index ceil(q*n)-1), computed with the identical IEEE
    double multiply — bit-exact oracle parity per group."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        small = pa.table({group_col: t[group_col], "v": t[value_col]})
        return small.group_by([group_col, "v"]).aggregate(
            [([], "count_all")]).rename_columns([group_col, "v", "c"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "v"]).aggregate(Sum("c", alias_name="c"))
    gs, vs, cs = [], [], []
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        gs.append(np.asarray(b[group_col].to_pylist(), dtype=object))
        vs.append(b["v"].to_numpy(zero_copy_only=False))
        cs.append(b["c"].to_numpy(zero_copy_only=False))
    if not gs:  # empty input: no groups -> no quantile rows
        sch = ds.schema()
        return pa.table({group_col: pa.array([], pa.string()),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array(
                             [], dict(zip(sch.names, sch.types))[value_col])})
    g = np.concatenate(gs)
    v = np.concatenate(vs)
    c = np.concatenate(cs).astype(np.int64)
    order = np.lexsort((v, g))
    g, v, c = g[order], v[order], c[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], g[1:] != g[:-1]))) if len(g) else np.empty(0, np.int64)
    ends = np.concatenate((starts[1:], [len(g)])) if len(g) else starts
    out_g, out_q, out_v = [], [], []
    for s, e in zip(starts, ends):
        cum = np.cumsum(c[s:e])
        n = int(cum[-1])
        for q in qs:
            r = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
            out_g.append(g[s])
            out_q.append(float(q))
            out_v.append(v[s + int(np.searchsorted(cum, r + 1))])
    return pa.table({group_col: pa.array([str(x) for x in out_g]),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(np.array(out_v))})


def grouped_exact_quantiles_cont(ds, group_col: str, value_col: str,
                                 qs: list[float]) -> pa.Table:
    """Per-group CONTINUOUS (interpolated) quantiles: the
    ``grouped_exact_quantiles`` combiner with the ``exact_quantiles_cont``
    two-weight DuckDB interpolation per group — bit-exact vs per-group
    ``quantile_cont``."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        small = pa.table({group_col: t[group_col], "v": t[value_col]})
        return small.group_by([group_col, "v"]).aggregate(
            [([], "count_all")]).rename_columns([group_col, "v", "c"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "v"]).aggregate(Sum("c", alias_name="c"))
    gs, vs, cs = [], [], []
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        gs.append(np.asarray(b[group_col].to_pylist(), dtype=object))
        vs.append(b["v"].to_numpy(zero_copy_only=False))
        cs.append(b["c"].to_numpy(zero_copy_only=False))
    if not gs:  # empty input: no groups -> no quantile rows
        return pa.table({group_col: pa.array([], pa.string()),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    g = np.concatenate(gs)
    v = np.concatenate(vs).astype(np.float64)
    c = np.concatenate(cs).astype(np.int64)
    order = np.lexsort((v, g))
    g, v, c = g[order], v[order], c[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], g[1:] != g[:-1]))) if len(g) else np.empty(0, np.int64)
    ends = np.concatenate((starts[1:], [len(g)])) if len(g) else starts
    out_g, out_q, out_v = [], [], []
    for s, e in zip(starts, ends):
        cum = np.cumsum(c[s:e])
        n = int(cum[-1])
        for q in qs:
            rn = float(q) * (n - 1)
            lo, hi = int(np.floor(rn)), int(np.ceil(rn))
            vlo = float(v[s + int(np.searchsorted(cum, lo + 1))])
            vhi = float(v[s + int(np.searchsorted(cum, hi + 1))])
            out_g.append(g[s])
            out_q.append(float(q))
            out_v.append(vlo if hi == lo
                         else (hi - rn) * vlo + (rn - lo) * vhi)
    return pa.table({group_col: pa.array([str(x) for x in out_g]),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


class QuantileSketch:
    """Mergeable KLL-lite quantile sketch for UNBOUNDED domains (continuous
    scores): level i holds items of weight 2^i; an over-full level sorts
    and keeps alternating elements (seeded offset), pushing them up one
    level. eps ~ O(log(n/k)/k) rank error; tested in tests/test_sketch.py.
    Per-batch partials serialize as (level, value) rows — a combiner-style
    aggregate like KMV, no shuffle of raw data."""

    def __init__(self, k: int = 256, seed: int = 0):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._rng = np.random.Generator(np.random.PCG64(seed))

    def add(self, arr: np.ndarray) -> "QuantileSketch":
        self.levels[0] = np.concatenate(
            [self.levels[0], np.asarray(arr, np.float64)])
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = np.sort(self.levels[i])
                off = int(self._rng.integers(0, 2))
                kept = buf[off::2]
                self.levels[i] = np.empty(0, np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], kept])
            i += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, buf in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, np.float64))
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self._compress()
        return self

    def to_table(self) -> pa.Table:
        lv = np.concatenate([np.full(len(b), i, np.int8)
                             for i, b in enumerate(self.levels)]) \
            if self.levels else np.empty(0, np.int8)
        vals = np.concatenate(self.levels) if self.levels \
            else np.empty(0, np.float64)
        return pa.table({"level": pa.array(lv, pa.int8()),
                         "value": pa.array(vals, pa.float64())})

    @classmethod
    def from_table(cls, t: pa.Table, k: int = 256,
                   seed: int = 0) -> "QuantileSketch":
        sk = cls(k=k, seed=seed)
        lv = t["level"].to_numpy(zero_copy_only=False)
        vals = t["value"].to_numpy(zero_copy_only=False)
        for i in range(int(lv.max()) + 1 if len(lv) else 1):
            sk._ensure(i)
            sk.levels[i] = vals[lv == i].astype(np.float64)
        return sk

    def _ensure(self, i: int) -> None:
        while len(self.levels) <= i:
            self.levels.append(np.empty(0, np.float64))

    def quantile(self, q: float) -> float:
        vals = np.concatenate(self.levels)
        w = np.concatenate([np.full(len(b), 1 << i, np.int64)
                            for i, b in enumerate(self.levels)])
        if not len(vals):
            return float("nan")
        o = np.argsort(vals, kind="stable")
        vals, w = vals[o], w[o]
        cum = np.cumsum(w)
        n = int(cum[-1])
        r = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
        return float(vals[int(np.searchsorted(cum, r + 1))])


def approx_quantiles(ds, column: str, qs: list[float], k: int = 256,
                     seed: int = 0) -> list[float]:
    """Distributed approximate quantiles over an unbounded column: one
    KLL-lite partial per batch streams out as (level, value) rows, the
    driver merges #batches tiny sketches. No shuffle of raw values."""

    def partial(t: pa.Table) -> pa.Table:
        sk = QuantileSketch(k=k, seed=seed)
        sk.add(t[column].to_numpy(zero_copy_only=False))
        return sk.to_table()

    merged = QuantileSketch(k=k, seed=seed)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        merged.merge(QuantileSketch.from_table(b, k=k, seed=seed))
    return [merged.quantile(q) for q in qs]


# ---------------- heavy hitters (Misra-Gries / space-saving) ---------------

def _mg_merge(keys_l: list[np.ndarray], cnts_l: list[np.ndarray],
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge Misra-Gries summaries: sum counts per key, then subtract the
    (k+1)-th largest count from all and keep the positive top k (the
    standard mergeable-MG reduction; error stays <= n/(k+1))."""
    keys = np.concatenate(keys_l) if keys_l else np.empty(0, object)
    cnts = np.concatenate(cnts_l) if cnts_l else np.empty(0, np.int64)
    if len(keys) == 0:
        return keys, cnts
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    new = np.concatenate(([True], keys[1:] != keys[:-1]))
    gid = np.cumsum(new) - 1
    summed = np.bincount(gid, weights=cnts).astype(np.int64)
    ukeys = keys[new]
    if len(ukeys) > k:
        kth = np.partition(summed, len(summed) - k - 1)[len(summed) - k - 1]
        summed = summed - kth
        keep = summed > 0
        ukeys, summed = ukeys[keep], summed[keep]
    return ukeys, summed


def _mg_pass(ds, column: str, counters: int
             ) -> tuple[np.ndarray, np.ndarray]:
    """One streaming Misra-Gries pass: per-batch summaries (``counters``
    cells) stream out as tiny (key, count) tables; the driver merges
    #batches summaries. Returns (keys object array, lower-bound counts)."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)            # C-level exact batch counts
        uk = np.asarray(vc.field("values").to_pylist(), dtype=object)
        uc = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uk2, uc2 = _mg_merge([uk], [uc], counters)
        return pa.table({"key": pa.array(uk2.astype(str)),
                         "cnt": pa.array(uc2, pa.int64())})

    keys_l, cnts_l = [], []
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys_l.append(np.asarray(b["key"].to_pylist(), dtype=object))
        cnts_l.append(b["cnt"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
    return _mg_merge(keys_l, cnts_l, counters)


def approx_top_k(ds, column: str, k: int = 10, counters: int = 256
                 ) -> pa.Table:
    """Approximate heavy hitters over an unbounded-cardinality column.
    Counts are LOWER bounds with error <= n/(counters+1); any item with
    true frequency above that bound is guaranteed present (tested on a
    Zipf stream). Exact top-k (q_top_sources) remains the bounded-domain
    path; this is the 10^12-distinct-URLs path.
    """
    uk, uc = _mg_pass(ds, column, counters)
    order = np.lexsort((uk, -uc))[:k]
    return pa.table({"key": pa.array(uk[order].astype(str)),
                     "cnt_lower_bound": pa.array(uc[order], pa.int64())})


def heavy_hitters_exact(ds, column: str, k: int = 5, counters: int = 256
                        ) -> pa.Table:
    """EXACT top-k heavy hitters at sketch cost: a Misra-Gries pass finds
    <= ``counters`` candidate keys, then a second streaming pass recounts
    ONLY the candidates exactly (plus the total row count n). Any key MG
    missed has true frequency <= n/(counters+1), so when the k-th
    candidate's exact count beats that bound the result is PROVABLY the
    true top-k — no shuffle, driver state O(counters), works at
    10^12-distinct-keys scale. On a skew-free corpus where the bound
    fails, falls back to the full exact groupby (still distributed).
    Output (key, cnt) sorted by cnt DESC then key ASC — bit-exact vs
    ``GROUP BY .. ORDER BY count(*) DESC, key LIMIT k``."""
    import pyarrow.compute as pc

    cand, _ = _mg_pass(ds, column, counters)
    cand_keys = pa.array(cand.astype(str))

    def recount(t: pa.Table) -> pa.Table:
        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col.filter(pc.is_in(col, value_set=cand_keys)))
        keys = vc.field("values").cast(pa.string())
        cnts = vc.field("counts").cast(pa.int64())
        return pa.table({
            "key": pa.concat_arrays([keys, pa.array([None], pa.string())]),
            "cnt": pa.concat_arrays(
                [cnts, pa.array([t.num_rows], pa.int64())])})

    keys_l, cnts_l, n = [], [], 0
    for b in ds.map_batches(recount, batch_format="pyarrow") \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        kk = b["key"]
        cc = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot_np = pc.is_null(kk).to_numpy(zero_copy_only=False) \
            .astype(bool)
        n += int(cc[tot_np].sum())
        keys_l.append(np.asarray(kk.to_pylist(), dtype=object)[~tot_np])
        cnts_l.append(cc[~tot_np])
    uk, uc = _mg_merge(keys_l, cnts_l, len(cand) + 1)  # no trim: exact sums
    order = np.lexsort((uk, -uc))
    uk, uc = uk[order], uc[order]
    bound = n / (counters + 1)
    if len(uk) < k or uc[min(k, len(uc)) - 1] <= bound:
        # provability gate failed -> exact distributed groupby fallback
        from ray.data.aggregate import Count

        agg = ds.groupby(column).aggregate(Count(alias_name="cnt")) \
            .sort(["cnt", column], descending=[True, False]).limit(k)
        t = agg.take_all()
        return pa.table({"key": pa.array([r[column] for r in t], pa.string()),
                         "cnt": pa.array([r["cnt"] for r in t], pa.int64())})
    return pa.table({"key": pa.array(uk[:k].astype(str)),
                     "cnt": pa.array(uc[:k], pa.int64())})
