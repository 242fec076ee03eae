"""Degenerate-input robustness: empty corpus, single doc."""

from __future__ import annotations

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.fixtures import gen_pages_table
from ray_data_mplsh.pipelines.dedup import run_dedup


def test_empty_corpus(ray_session):
    import ray.data

    empty = ray.data.from_arrow(gen_pages_table(1, seed=3).slice(0, 0))
    res = run_dedup(empty, MPLSHConfig(), extract=True)
    assert res.dedup_out.count() == 0


def test_single_doc(ray_session):
    import ray.data

    one = ray.data.from_arrow(gen_pages_table(1, seed=3))
    res = run_dedup(one, MPLSHConfig(), extract=True)
    df = res.dedup_out.to_pandas()
    assert len(df) == 1
    assert bool(df.is_canonical[0])
    assert int(df.cluster_id[0]) == int(df.doc_id[0])
