"""Hybrid exact-dedup: broadcast-annotate path vs full-shuffle path must
produce identical (doc_id, rep_id) assignments."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.stages.exact import exact_dedup_stage


def _docs_ds():
    import ray.data

    rng = np.random.Generator(np.random.PCG64(2))
    texts = [f"doc body {int(rng.integers(30))}" for _ in range(200)]
    t = pa.table({
        "doc_id": pa.array(rng.permutation(200).astype(np.uint64),
                           pa.uint64()),
        "text": pa.array(texts),
    })
    return ray.data.from_arrow([t.slice(0, 100), t.slice(100, 100)])


def _reps(ds):
    df = ds.to_pandas()[["doc_id", "rep_id"]].astype(np.uint64)
    return dict(zip(df.doc_id, df.rep_id))


def test_broadcast_and_shuffle_paths_agree(ray_session):
    broadcast = _reps(exact_dedup_stage(
        _docs_ds(), MPLSHConfig(), num_partitions=4))
    shuffled = _reps(exact_dedup_stage(
        _docs_ds(), MPLSHConfig(broadcast_max_docs=0), num_partitions=4))
    assert broadcast == shuffled
    # reps really collapse identical texts to the min doc_id
    assert any(d != r for d, r in broadcast.items())
    for d, r in broadcast.items():
        assert r <= d
