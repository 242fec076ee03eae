"""Source-format readers: CSV (base64 html) and JSONL round-trip into the
pipeline's T0 shape."""

from __future__ import annotations

import base64
import csv
import json

import pyarrow as pa

from ray_data_mplsh.fixtures import gen_pages_table


def test_read_pages_csv_and_json(ray_session, tmp_path):
    from ray_data_mplsh.sources import read_pages_csv, read_pages_json

    pages = gen_pages_table(30, seed=5)
    rows = pages.to_pylist()

    csv_p = tmp_path / "pages.csv"
    with open(csv_p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "html", "text", "lang"])
        for r in rows:
            w.writerow([r["url"], base64.b64encode(r["html"]).decode(),
                        r["text"], r["lang"]])
    ds = read_pages_csv(str(csv_p))
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 30
    want = sorted(rows, key=lambda r: r["url"])
    assert got.html[0] == want[0]["html"]  # binary round-trip
    assert got.text.tolist() == [r["text"] for r in want]

    jl_p = tmp_path / "pages.jsonl"
    with open(jl_p, "w") as f:
        for r in rows:
            f.write(json.dumps({"url": r["url"], "text": r["text"],
                                "lang": r["lang"]}) + "\n")
    dj = read_pages_json(str(jl_p))
    gj = dj.to_pandas().sort_values("url").reset_index(drop=True)
    assert gj.text.tolist() == [r["text"] for r in want]


def test_csv_pages_run_through_dedup(ray_session, tmp_path):
    """A CSV-sourced corpus flows through the full pipeline."""
    from ray_data_mplsh.config import MPLSHConfig
    from ray_data_mplsh.pipelines.dedup import run_dedup
    from ray_data_mplsh.sources import read_pages_csv

    pages = gen_pages_table(60, seed=5)
    csv_p = tmp_path / "pages.csv"
    with open(csv_p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "html", "text", "lang"])
        for r in pages.to_pylist():
            w.writerow([r["url"], base64.b64encode(r["html"]).decode(),
                        r["text"], r["lang"]])
    ds = read_pages_csv(str(csv_p))
    res = run_dedup(ds, MPLSHConfig(), extract=True, skip_substring=True)
    out = res.dedup_out.to_pandas()
    assert len(out) > 0 and "cluster_id" in out.columns
