"""Edit-distance kernel + blocked pair operator.

The vectorized pair kernel is fuzz-pinned to a reference scalar DP; the
distributed operator is checked against DuckDB's levenshtein() on every
pair it emits AND against the full blocked-join pair set (none missed)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ray_data_mplsh.functions.editdist import levenshtein_pairs


def _ref_dp(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _pack(texts):
    bs = [t.encode() for t in texts]
    offs = np.zeros(len(bs) + 1, np.int64)
    np.cumsum([len(x) for x in bs], out=offs[1:])
    data = np.frombuffer(b"".join(bs), np.uint8) if bs else \
        np.empty(0, np.uint8)
    return offs, data


def test_kernel_fuzz_vs_scalar_dp():
    rng = np.random.default_rng(7)
    alpha = list("abc x")
    texts = ["".join(rng.choice(alpha, size=rng.integers(0, 31)))
             for _ in range(60)] + ["", "", "a"]
    offs, data = _pack(texts)
    n = len(texts)
    ai = rng.integers(0, n, size=400)
    bi = rng.integers(0, n, size=400)
    got = levenshtein_pairs(offs, data, ai, bi, chunk=37)
    exp = np.array([_ref_dp(texts[a], texts[b]) for a, b in zip(ai, bi)])
    np.testing.assert_array_equal(got, exp)


def test_kernel_identity_and_empty():
    texts = ["", "hello", "hello", "helo", "xyz"]
    offs, data = _pack(texts)
    ai = np.array([0, 1, 1, 1, 0])
    bi = np.array([0, 1, 2, 3, 4])
    got = levenshtein_pairs(offs, data, ai, bi)
    np.testing.assert_array_equal(got, [0, 0, 0, 1, 3])


@pytest.fixture(scope="module")
def doc_table():
    rng = np.random.default_rng(21)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "omega"]
    rows = []
    doc_id = 1
    for k in range(40):
        base = " ".join(rng.choice(words, size=rng.integers(8, 30)))
        lang = ["en", "de", "fr"][k % 3]
        rows.append((doc_id, base, lang)); doc_id += 1
        if k % 3 == 0:  # planted near-dup: one word substituted
            mut = base.replace("alpha", "ALPHA", 1)
            rows.append((doc_id, mut, lang)); doc_id += 1
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})


def test_blocked_pairs_match_duckdb(ray_session, doc_table):
    import ray.data as rd

    from ray_data_mplsh.pipelines.editdist import edit_distance_pairs

    ds = rd.from_arrow(doc_table).repartition(4)
    got = edit_distance_pairs(ds, max_len=250, bucket=64, max_dist=60,
                              num_partitions=4).to_pandas()
    got = got.sort_values(["a_id", "b_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", doc_table)
    exp = con.sql(
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, "
        "CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist "
        "FROM documents a JOIN documents b ON a.lang = b.lang "
        "AND (a.n_chars // 64) = (b.n_chars // 64) AND a.doc_id < b.doc_id "
        "WHERE a.n_chars <= 250 AND b.n_chars <= 250 "
        "AND levenshtein(a.text, b.text) <= 60 "
        "ORDER BY a_id, b_id").df()
    assert len(got) > 0  # the planted dups land in-block
    assert got.equals(exp)
