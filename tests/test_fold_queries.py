"""Planted-corpus pins for the driver-signed incremental-fold queries
(q_incremental_fold, q_fold_provenance): the sf corpora never place an
exact twin across the base/shard boundary (doc_id % 5), so the
exact_dup_of_archive flag and the adoption path would go untested by the
oracle harness alone. This corpus plants every provenance class — exact
twin across the boundary (both id orders), near twin across, exact and
near dups within the shard, within-base dups, and unique docs — and pins
both queries bit-exact against their DuckDB oracles."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray_data_mplsh.pipelines.queries import ORACLE_SQL, QUERIES

BASE_TXT = ("the quick brown fox jumps over the lazy dog again and "
            "again every single day without fail ")


def _corpus(tmp_path) -> str:
    rng = np.random.default_rng(7)
    words = BASE_TXT.split()

    def doc(seed: int, n: int = 40) -> str:
        r = np.random.default_rng(seed)
        return " ".join(words[int(j)] for j in r.integers(0, len(words), n))

    rows: dict[int, str] = {}
    # ids: % 5 == 4 -> shard, else base
    rows[10] = doc(1)            # base unique
    rows[11] = doc(2)            # base, exact twin of shard 14
    rows[14] = rows[11]          # shard exact dup of archive (base id < shard id)
    rows[24] = doc(3)            # shard, exact twin of base 30 (shard id < base id)
    rows[30] = rows[24]
    near = doc(4, 60)
    rows[12] = near              # base
    rows[19] = near[: near.rindex(" ")] + " changed"   # shard near-dup of base
    rows[34] = doc(5)            # shard, exact twin of shard 39
    rows[39] = rows[34]          # shard exact dup within shard
    s_near = doc(6, 60)
    rows[44] = s_near            # shard
    rows[49] = s_near[: s_near.rindex(" ")] + " tail"  # shard near-dup within shard
    rows[15] = doc(8)            # base, exact twin of base 20
    rows[20] = rows[15]
    rows[54] = doc(9)            # shard unique
    for i in range(60, 80):     # filler uniques, both sides
        rows[i] = doc(100 + i)

    ids = sorted(rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([rows[i] for i in ids], pa.string()),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["s0"] * len(ids)),
        "n_chars": pa.array([len(rows[i]) for i in ids], pa.int64())}),
        f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@pytest.mark.parametrize("name", ["q_incremental_fold",
                                  "q_fold_provenance"])
def test_fold_queries_planted_oracle(ray_session, tmp_path, name):
    d = _corpus(tmp_path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet'")
    got = QUERIES[name](d).to_pandas()
    want = con.sql(ORACLE_SQL[name]).df()
    con.close()
    cols = sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert list(a.dtypes) == list(b.dtypes), name
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    if name == "q_fold_provenance":
        byid = a.set_index("doc_id")
        # both id orders of the cross-boundary exact twin are archive dups
        assert bool(byid.loc[14, "exact_dup_of_archive"])
        assert bool(byid.loc[24, "exact_dup_of_archive"])
        assert bool(byid.loc[19, "dup_of_archive"])          # near twin
        assert not bool(byid.loc[19, "exact_dup_of_archive"])
        assert bool(byid.loc[34, "dup_within_shard"])        # shard exact
        assert bool(byid.loc[44, "dup_within_shard"])        # shard near
        assert not bool(byid.loc[44, "dup_of_archive"])
        assert not byid.loc[54].any()                        # shard unique
