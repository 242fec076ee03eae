"""Empty-input hardening gate: every registry query must run (not
crash) on a corpus whose tables all have ZERO rows. At 100 TB an empty
slice is routine — a filter that matches nothing, a new partition, a
date range before the data starts — and the engine's driver-side gathers
(np.concatenate, pa.concat_tables, groupby schema loss) are exactly
where zero-row inputs historically exploded (18 of 105 queries crashed
when this gate was first written). Runs as ONE test so the ~105 query
invocations share the session fixture without per-test overhead."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            schema = pq.read_schema(f"{SRC}/{f}")
            pq.write_table(schema.empty_table(), str(d / f))
    return str(d)


def test_every_query_survives_empty_corpus(ray_session, empty_dir):
    from ray_data_mplsh.pipelines.queries import QUERIES

    failures = []
    for name, fn in QUERIES.items():
        try:
            res = fn(empty_dir)
            # force execution: Datasets are lazy until consumed
            res.count() if hasattr(res, "count") else len(res)
        except Exception as ex:  # noqa: BLE001 — collecting, not hiding
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)
