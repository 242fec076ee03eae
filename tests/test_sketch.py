"""KMV distinct-count sketch: relative error within theory bounds, exact
below k, merge correctness across batchings."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds_of(vals, ray_session, n_blocks=4):
    import ray.data

    t = pa.table({"v": pa.array([str(x) for x in vals])})
    step = max(len(vals) // n_blocks, 1)
    return ray.data.from_arrow(
        [t.slice(i, step) for i in range(0, len(t), step)])


def test_exact_below_k(ray_session):
    from ray_data_mplsh.pipelines.sketch import approx_distinct

    ds = _ds_of([f"x{i % 50}" for i in range(1000)], ray_session)
    assert approx_distinct(ds, "v", k=256) == 50.0


def test_relative_error_above_k(ray_session):
    from ray_data_mplsh.pipelines.sketch import approx_distinct

    true_n = 20000
    ds = _ds_of([f"id{i}" for i in range(true_n)] * 2, ray_session)
    est = approx_distinct(ds, "v", k=1024)
    rel = abs(est - true_n) / true_n
    assert rel < 0.1, f"rel err {rel:.3f} (est {est:.0f} vs {true_n})"


def test_batching_invariant(ray_session):
    from ray_data_mplsh.pipelines.sketch import approx_distinct

    vals = [f"k{i % 3000}" for i in range(9000)]
    a = approx_distinct(_ds_of(vals, ray_session, n_blocks=2), "v", k=512)
    b = approx_distinct(_ds_of(vals, ray_session, n_blocks=9), "v", k=512)
    assert a == b  # sketch is a set function of the data, not the layout


# ---------------- quantiles ------------------------------------------------

def _int_ds(vals, ray_session, n_blocks=4):
    import ray.data

    t = pa.table({"n_chars": pa.array(list(vals), pa.int64())})
    step = max(len(vals) // n_blocks, 1)
    return ray.data.from_arrow(
        [t.slice(i, step) for i in range(0, len(t), step)])


def _disc_quantile(sorted_vals, q):
    n = len(sorted_vals)
    r = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
    return sorted_vals[r]


def test_exact_quantiles_match_rank_rule(ray_session):
    from ray_data_mplsh.pipelines.sketch import exact_quantiles

    rng = np.random.Generator(np.random.PCG64(5))
    vals = rng.integers(0, 500, size=10000)
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    out = exact_quantiles(_int_ds(vals, ray_session), "n_chars", qs)
    sv = np.sort(vals)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    for q in qs:
        assert got[q] == _disc_quantile(sv, q), q


def test_exact_quantiles_batching_invariant(ray_session):
    from ray_data_mplsh.pipelines.sketch import exact_quantiles

    rng = np.random.Generator(np.random.PCG64(6))
    vals = rng.integers(0, 100, size=5000)
    qs = [0.5, 0.9]
    a = exact_quantiles(_int_ds(vals, ray_session, 2), "n_chars", qs)
    b = exact_quantiles(_int_ds(vals, ray_session, 9), "n_chars", qs)
    assert a.equals(b)


def test_kll_error_bound():
    from ray_data_mplsh.pipelines.sketch import QuantileSketch

    rng = np.random.Generator(np.random.PCG64(7))
    n = 200_000
    vals = rng.standard_normal(n)
    sk = QuantileSketch(k=256, seed=1)
    for i in range(0, n, 4096):
        sk.add(vals[i:i + 4096])
    sv = np.sort(vals)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(q)
        # rank error bound: where does est land in the true sorted order?
        rank = np.searchsorted(sv, est) / n
        assert abs(rank - q) < 0.02, (q, rank)


def test_kll_merge_equals_single(ray_session):
    """Merging per-batch sketches lands within the same error bound as
    one big sketch (mergeability — the combiner property)."""
    from ray_data_mplsh.pipelines.sketch import QuantileSketch, \
        approx_quantiles

    rng = np.random.Generator(np.random.PCG64(8))
    vals = rng.uniform(0, 1000, size=60_000)
    ds = _int_ds(vals.astype(np.int64), ray_session, n_blocks=12)
    got = approx_quantiles(ds, "n_chars", [0.25, 0.5, 0.9], k=256, seed=2)
    sv = np.sort(vals.astype(np.int64))
    for q, est in zip([0.25, 0.5, 0.9], got):
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - q) < 0.03, (q, rank)
