"""Randomized-corpus fuzz for the round-5 adapted TPC-H shapes
(Q2/Q4/Q11/Q12/Q20/Q21): the sf corpora exercise only one data shape, so
generate small adversarial corpora — orphan order/supplier keys, orders
whose suppliers are ALL late / NONE late / several late, duplicate
(order, supplier) lineitems with mixed lateness, a third l_linestatus
value, empty filter windows — and pin every query bit-exact against its
DuckDB oracle on the same parquet files (the driver-compare semantics:
sorted columns, sorted rows, exact values)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray_data_mplsh.pipelines.queries import ORACLE_SQL, QUERIES

FUZZED = ["q_tpch_q2", "q_tpch_q4", "q_tpch_q11", "q_tpch_q12",
          "q_tpch_q20", "q_tpch_q21"]


def _write_corpus(d: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    n_nat, n_sup, n_part = 6, 14, 40
    n_ord, n_li = 300, 1200

    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(3), pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE", "AFRICA"])}),
        f"{d}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(n_nat), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(
            rng.integers(0, 3, n_nat, dtype=np.int32), pa.int32())}),
        f"{d}/nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(1, n_sup + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:05d}" for i in range(n_sup)]),
        "s_nationkey": pa.array(
            rng.integers(0, n_nat, n_sup, dtype=np.int32), pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-999, 9999, n_sup), 2), pa.float64())}),
        f"{d}/supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, n_part + 1), pa.int64()),
        "p_name": pa.array(rng.choice(
            ["small ring", "small bolt", "red gear", "hot gizmo"],
            n_part).astype(object)),
        "p_brand": pa.array(
            [f"Brand#{i % 5}" for i in range(n_part)]),
        "p_type": pa.array(rng.choice(
            ["LARGE", "SMALL", "PROMO"], n_part).astype(object)),
        "p_size": pa.array(
            rng.integers(1, 51, n_part, dtype=np.int32), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(100, 2000, n_part), 2), pa.float64())}),
        f"{d}/part.parquet")

    base = pd.Timestamp("1996-06-01").value // 1000
    span = int(2.5 * 365 * 86400 * 1_000_000)
    od = base + rng.integers(0, span, n_ord)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(1, 50, n_ord, dtype=np.int64), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(
            ["F", "O", "P"], n_ord, p=[0.6, 0.3, 0.1]).astype(object)),
        "o_totalprice": pa.array(
            np.round(rng.uniform(100, 9999, n_ord), 2), pa.float64()),
        "o_orderdate": pa.array(od, pa.int64()).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"],
            n_ord).astype(object))}),
        f"{d}/orders.parquet")

    # lineitems: orderkeys include ORPHANS (0 and n_ord+7, absent from
    # orders); suppkeys include an orphan (n_sup + 3); shipdates are the
    # order date plus a lag that lands on both sides of the 30-day
    # lateness grace, so single orders mix late and on-time suppliers,
    # and duplicate (order, supplier) rows disagree on lateness
    lok = rng.integers(0, n_ord + 8, n_li)
    lag = rng.integers(-5, 90, n_li) * 86400 * 1_000_000
    od_of = np.where((lok >= 1) & (lok <= n_ord), od[
        np.clip(lok - 1, 0, n_ord - 1)], base)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(
            rng.integers(1, n_part + 1, n_li, dtype=np.int64), pa.int64()),
        "l_suppkey": pa.array(
            rng.integers(1, n_sup + 4, n_li, dtype=np.int64), pa.int64()),
        "l_linenumber": pa.array(
            rng.integers(1, 7, n_li, dtype=np.int32), pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 50, n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(100, 99999, n_li), 2), pa.float64()),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n_li) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(
            np.round(rng.integers(0, 9, n_li) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array(rng.choice(
            ["R", "A", "N"], n_li).astype(object)),
        "l_linestatus": pa.array(rng.choice(
            ["F", "O", "X"], n_li).astype(object)),
        "l_shipdate": pa.array(od_of + lag, pa.int64())
        .cast(pa.timestamp("us"))}),
        f"{d}/lineitem.parquet")


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_adapted_tpch_match_oracle_on_fuzzed_corpus(ray_session, tmp_path,
                                                    seed):
    import duckdb

    d = str(tmp_path / f"fuzz{seed}")
    import os
    os.makedirs(d, exist_ok=True)
    _write_corpus(d, seed)
    con = duckdb.connect()
    for t in ("orders", "lineitem", "supplier", "nation", "region",
              "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    nonempty = 0
    for name in FUZZED:
        got = QUERIES[name](d)
        got = got.to_pandas() if hasattr(got, "to_pandas") \
            else pd.DataFrame(got)
        want = con.sql(ORACLE_SQL[name]).df()
        cols = sorted(want.columns)
        assert sorted(got.columns) == cols, name
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert list(a.dtypes) == list(b.dtypes), name
        pd.testing.assert_frame_equal(a, b, check_exact=True)
        nonempty += int(len(b) > 0)
    con.close()
    # the corpus must actually exercise the shapes, not vacuous empties
    assert nonempty >= 4
