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
