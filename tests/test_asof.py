"""Distributed as-of join vs pandas merge_asof on random keyed series."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.parametrize("seed", [1, 2])
def test_asof_join_matches_pandas(ray_session, seed):
    import ray.data

    from ray_data_mplsh.pipelines.asof import asof_join

    rng = np.random.Generator(np.random.PCG64(seed))
    n_l, n_r, n_keys = 500, 300, 20
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_l),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
        "lid": np.arange(n_l),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys + 5, n_r),   # some keys never match
        "ts": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
        "val": rng.integers(0, 10**6, n_r),
    })
    # deterministic ties: one row per (k, ts), keep max val — mirrors the
    # operator's documented tie rule
    right = right.groupby(["k", "ts"], as_index=False)["val"].max()

    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right))
    got = asof_join(lds, rds, left_key="k", left_ts="ts", left_id="lid",
                    right_key="k", right_ts="ts", right_val="val",
                    num_partitions=4).to_pandas() \
        .sort_values("left_id").reset_index(drop=True)

    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward") \
        .sort_values("lid").reset_index(drop=True)
    assert got.left_id.tolist() == want.lid.tolist()
    g = got.value.fillna(-1).astype(np.int64)
    w = want.val.fillna(-1).astype(np.int64)
    assert g.tolist() == w.tolist()
