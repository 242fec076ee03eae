"""The ``python -m ray_data_mplsh`` job surface (north-star "launched
via ray job submit"): argument plumbing, input-format sniffing, the
resumable write_corpus layout, and the CLI fold path — all in-process
via main(argv) under the session Ray fixture (the init guard makes the
CLI reuse it)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from ray_data_mplsh.__main__ import _sniff_format, main
from ray_data_mplsh.fixtures import write_fixture_dir


@pytest.fixture(scope="module")
def fix_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_fix"))
    write_fixture_dir(d, n=120, seed=13)
    return d


def test_cli_run_writes_resumable_corpus(ray_session, fix_dir, tmp_path):
    out = str(tmp_path / "out")
    s = main(["run", "--input", f"{fix_dir}/pages.parquet",
              "--output", out, "--num-shards", "4"])
    assert s["input_format"] == "pages" and s["shards_written"] == 4
    assert os.path.exists(f"{out}/counters.json")
    for i in range(4):
        assert os.path.exists(f"{out}/dedup_out/shard={i}/_SUCCESS")
    # round-trip: the sharded layout reads back whole with the dedup
    # schema; dedup_out carries every S1 survivor, so it is at least
    # as large as the signature (rep) set
    from ray_data_mplsh.sources import read_corpus
    got = read_corpus(f"{out}/dedup_out")
    assert got.count() >= s["n_docs_sig"] > 0
    assert "cluster_id" in got.schema().names
    # resume: a second invocation rewrites nothing
    s2 = main(["run", "--input", f"{fix_dir}/pages.parquet",
               "--output", out, "--num-shards", "4"])
    assert s2["shards_written"] == 0
    with open(f"{out}/counters.json") as fh:
        assert json.load(fh)["shards_written"] == 0   # refreshed


def test_cli_sniffs_documents_format(ray_session, tmp_path):
    out = str(tmp_path / "out")
    src = "/root/testdata/sf0.001/documents.parquet"
    assert _sniff_format(src) == "documents"
    s = main(["run", "--input", src, "--output", out,
              "--min-chars", "10", "--num-shards", "2",
              "--skip-substring"])
    assert s["input_format"] == "documents"
    assert s["n_docs_sig"] > 0


def test_cli_fold_delta(ray_session, fix_dir, tmp_path):
    t = pq.read_table(f"{fix_dir}/pages.parquet")
    pq.write_table(t.slice(0, 90), str(tmp_path / "day1.parquet"))
    pq.write_table(t.slice(90), str(tmp_path / "day2.parquet"))
    ck = str(tmp_path / "ck")
    main(["run", "--input", str(tmp_path / "day1.parquet"),
          "--output", str(tmp_path / "o1"), "--ckpt-dir", ck,
          "--run-id", "day1", "--num-shards", "2"])
    s = main(["fold", "--input", str(tmp_path / "day2.parquet"),
              "--output", str(tmp_path / "o2"), "--ckpt-dir", ck,
              "--base", "day1", "--delta", "--num-shards", "2"])
    assert s["cmd"] == "fold" and s["output_mode"] == "delta"
    assert s["base_resumed"] is True


def test_cli_rejects_unknown_schema(tmp_path):
    import pyarrow as pa
    p = str(tmp_path / "x.parquet")
    pq.write_table(pa.table({"a": [1]}), p)
    with pytest.raises(SystemExit):
        _sniff_format(p)


def test_cli_report_over_documents(ray_session, tmp_path):
    """`report` accepts both an sf dir and a bare parquet file (the
    symlink arm) and emits the three executive reports with rows."""
    out = str(tmp_path / "rep.json")
    s = main(["report", "--input", "/root/testdata/sf0.001",
              "--output", out])
    assert {r["tier"] for r in s["tier_tokens"]} >= {"unique"}
    assert len(s["dup_inflation"]) > 0
    with open(out) as fh:
        assert json.load(fh)["tier_tokens"] == s["tier_tokens"]
    # bare-file arm: copy documents.parquet under another name
    import shutil
    p = str(tmp_path / "corpus.parquet")
    shutil.copyfile("/root/testdata/sf0.001/documents.parquet", p)
    s2 = main(["report", "--input", p])
    assert s2["tier_tokens"] == s["tier_tokens"]
