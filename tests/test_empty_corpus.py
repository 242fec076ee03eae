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


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_one")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            pq.write_table(pq.read_table(f"{SRC}/{f}").slice(0, 1),
                           str(d / f))
    return str(d)


def _run_all(sf_dir):
    from ray_data_mplsh.pipelines.queries import QUERIES

    failures = []
    for name, fn in QUERIES.items():
        try:
            res = fn(sf_dir)
            # force execution: Datasets are lazy until consumed
            res.count() if hasattr(res, "count") else len(res)
        except Exception as ex:  # noqa: BLE001 — collecting, not hiding
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    return failures


def test_every_query_survives_empty_corpus(ray_session, empty_dir):
    failures = _run_all(empty_dir)
    assert not failures, "\n".join(failures)


def test_every_query_survives_one_row_corpus(ray_session, one_row_dir):
    """n=1 exercises the off-by-one family the empty gate can't: n-1
    denominators (quantile_cont / percent_rank interpolation), zero
    variance (corr, regression slope), and k > n (k-means init)."""
    failures = _run_all(one_row_dir)
    assert not failures, "\n".join(failures)


# The statistics whose formulas involve n-1 / variance denominators must
# not merely survive n=1 — they must keep SQL semantics there (corr and
# a 0/0 slope are NULL, quantiles of one value are that value).
N_SENSITIVE = ["q_corr_len_tokens", "q_regression_len_tokens",
               "q_quantiles", "q_quantiles_cont",
               "q_grouped_quantiles_cont", "q_mad_len", "q_ntile_doc_len",
               "q_percent_rank_len", "q_moving_sum_daily"]


@pytest.mark.parametrize("name", N_SENSITIVE)
def test_n1_statistics_match_oracle(ray_session, one_row_dir, name):
    import duckdb
    import pandas as pd

    from ray_data_mplsh.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    try:
        for tbl in ("documents", "events", "customer", "orders",
                    "supplier", "lineitem", "embeddings", "region",
                    "nation", "part"):
            con.sql(f"CREATE VIEW {tbl} AS "
                    f"SELECT * FROM '{one_row_dir}/{tbl}.parquet'")
        res = QUERIES[name](one_row_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        sql_df = con.sql(ORACLE_SQL[name]).df()
        cols = sorted(df.columns)
        a = df[cols].sort_values(cols).reset_index(drop=True)
        b = sql_df[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_exact=True)
    finally:
        con.close()
