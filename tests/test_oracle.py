"""Oracle semantics tests on micro-fixtures and the planted corpus
(SURVEY.md §5 items 1-2; FIXTURES.md §5)."""

import numpy as np
import pyarrow as pa
import pytest

from oracle.mplsh_oracle import canonicalize_url, run_oracle
from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.fixtures import gen_gt_tables


def _pages(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows]),
    })


MICRO_CFG = MPLSHConfig(num_perm=16, bands=4, rows_per_band=4, probes=4,
                        k_shingle=2, min_chars=5, theta=0.5, verify_margin=0.2)


def test_canonicalize_url():
    assert canonicalize_url("HTTPS://Site.Example/P/1#frag") == \
        "https://site.example/P/1"
    assert canonicalize_url("no-scheme#x") == "no-scheme"


def test_oracle_exact_dups_collapse():
    txt = "one two three four five six seven eight nine ten"
    res = run_oracle(_pages([("https://a/1", txt), ("https://a/2", txt),
                             ("https://a/3", "totally different words here "
                                             "unrelated content entirely")]),
                     MICRO_CFG)
    assert len(res.dup_map) == 1
    # both copies share a cluster
    ids = dict(zip(res.docs["url"].to_pylist(),
                   res.docs["doc_id"].to_pylist()))
    assert res.clusters[ids["https://a/1"]] == res.clusters[ids["https://a/2"]]
    assert res.clusters[ids["https://a/3"]] != res.clusters[ids["https://a/1"]]


def test_oracle_near_dups_cluster():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    res = run_oracle(_pages([("u/a", a), ("u/b", b)]), MICRO_CFG)
    ids = dict(zip(res.docs["url"].to_pylist(), res.docs["doc_id"].to_pylist()))
    assert res.clusters[ids["u/a"]] == res.clusters[ids["u/b"]]
    assert len(res.canonical) == 1


def test_oracle_filters():
    cfg = MPLSHConfig(min_chars=20, langs=("en",))
    res = run_oracle(_pages([
        ("u/1", "long enough text with many words to pass", "en"),
        ("u/2", "short", "en"),
        ("u/3", "long enough text but wrong language entirely", "fr"),
    ]), cfg)
    assert res.docs.num_rows == 1


def test_oracle_multiprobe_boosts_band_recall():
    """With probes, a pair agreeing on r-1 of r slots in some band still
    collides (SURVEY.md §A.2). Verified statistically on the fixture GT."""
    from ray_data_mplsh.fixtures import gen_pages_table

    n = 150
    pages = gen_pages_table(n, seed=11)
    pairs, _ = gen_gt_tables(n, seed=11)
    base = MPLSHConfig()
    with_probes = run_oracle(pages, base)
    no_probes = run_oracle(pages, MPLSHConfig(probes=0))
    assert len(with_probes.cand_pairs) >= len(no_probes.cand_pairs)
    # every no-probe candidate is also a with-probe candidate (exact keys kept)
    assert no_probes.cand_pairs <= with_probes.cand_pairs


def test_oracle_recall_gate_on_fixture(small_fixture, small_oracle):
    """Dup-pair recall >= 0.99 on pairs with true Jaccard >= theta
    (BASELINE.json:2) — the oracle itself must clear the gate."""
    import pyarrow.parquet as pq

    pairs = pq.read_table(f"{small_fixture}/gt_pairs.parquet")
    res = small_oracle
    url2id = dict(zip(res.docs["url"].to_pylist(),
                      res.docs["doc_id"].to_pylist()))
    found = missed = 0
    for ua, ub, j in zip(pairs["url_a"].to_pylist(),
                         pairs["url_b"].to_pylist(),
                         pairs["true_jaccard"].to_pylist()):
        if j < 0.8:
            continue
        ca = res.clusters.get(url2id.get(canonicalize_url(ua)))
        cb = res.clusters.get(url2id.get(canonicalize_url(ub)))
        if ca is not None and ca == cb:
            found += 1
        else:
            missed += 1
    assert found / max(found + missed, 1) >= 0.99


def test_oracle_substring_spans_removed(small_fixture, small_oracle):
    """After the substring pass no planted >=50-char span appears twice
    among canonical texts (Lee22-style span dedup)."""
    import pyarrow.parquet as pq

    pairs = pq.read_table(f"{small_fixture}/gt_pairs.parquet")
    pages = pq.read_table(f"{small_fixture}/pages.parquet")
    res = small_oracle
    url2id = dict(zip(res.docs["url"].to_pylist(),
                      res.docs["doc_id"].to_pylist()))
    url2text = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    final_texts = list(res.dedup_text.values())
    violations = 0
    checked = 0
    for ua, ub, kind in zip(pairs["url_a"].to_pylist(),
                            pairs["url_b"].to_pylist(),
                            pairs["kind"].to_pylist()):
        if kind != "substring":
            continue
        # recover the planted span: longest common substring of the pair
        from ray_data_mplsh.functions.suffix import cross_match_intervals
        ta, tb = url2text[ua], url2text[ub]
        iv = cross_match_intervals(ta, tb, 50)
        if not iv:
            continue
        s, e = max(iv, key=lambda x: x[1] - x[0])
        span = tb[s:e]
        checked += 1
        n_holders = sum(1 for t in final_texts if span in t)
        if n_holders > 1:
            violations += 1
    assert checked > 0
    assert violations == 0, f"{violations}/{checked} spans still duplicated"


def test_oracle_boilerplate_carriers_survive(small_oracle):
    """Boilerplate spans are cut, but carrier docs are NOT dropped."""
    res = small_oracle
    assert len(res.removed_substring) <= 2
    assert len(res.canonical) > 0
