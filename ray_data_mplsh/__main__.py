"""Job entry point — the ``ray job submit`` surface (BASELINE.json
north_star: "launched via ray job submit on fixed-size clusters"):

    python -m ray_data_mplsh run  --input pages.parquet --output /out
    python -m ray_data_mplsh fold --input day2.parquet  --output /out2 \\
        --ckpt-dir /ckpt --base day1 [--delta] [--save-as day2]

``run`` executes the flagship S0-S10 dedup pipeline (pipelines/dedup)
over Parquet webtext and writes resumable hash-sharded Parquet
(sources.write_corpus: ``shard=<i>/`` dirs with ``_SUCCESS`` markers —
a re-run after a crash skips finished shards). ``fold`` runs the
incremental daily-crawl fold (pipelines/incremental) against a
checkpointed base run. Input schema is sniffed from the first file's
Parquet footer: an ``html`` column means crawl pages (S1 extract), a
``doc_id`` column means pre-extracted documents (pipeline enters at
S2, doc_id plays the url role — the __ray_entry__.entry() adaptation).

This module (and bench.py and the pytest session fixture) OWNS a Ray
session; library code never calls ray.init (the house rule). The init
is guarded so a driver that already initialised Ray can exec this
main() in-process.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ray_data_mplsh",
        description="Ray-Data-native web-scale near-dup detection")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(r):
        r.add_argument("--input", required=True, nargs="+",
                       help="Parquet file(s)/dir(s)/glob(s) of crawl "
                            "pages (url, html, lang) or documents "
                            "(doc_id, text, lang)")
        r.add_argument("--output", required=True,
                       help="output directory (created if missing)")
        r.add_argument("--input-format",
                       choices=["auto", "pages", "documents"],
                       default="auto")
        r.add_argument("--no-extract", action="store_true",
                       help="pages input: trust the stored text column "
                            "instead of extracting from html")
        r.add_argument("--skip-substring", action="store_true",
                       help="skip the S9 suffix/winnow substring pass")
        r.add_argument("--min-chars", type=int, default=None)
        r.add_argument("--langs", default=None,
                       help="comma-separated keep-list, e.g. en,de")
        r.add_argument("--num-partitions", type=int, default=0,
                       help="exchange width (0 = 2x cluster CPUs)")
        r.add_argument("--num-shards", type=int, default=64,
                       help="output shard count (write_corpus)")
        r.add_argument("--ckpt-dir", default="",
                       help="stage-checkpoint root (enables resume)")
        r.add_argument("--run-id", default="cli")

    r = sub.add_parser("run", help="from-scratch dedup of a crawl")
    common(r)

    f = sub.add_parser("fold",
                       help="incremental fold of a new shard onto a "
                            "checkpointed base run")
    common(f)
    f.add_argument("--base", required=True,
                   help="base run_id under --ckpt-dir to fold onto")
    f.add_argument("--delta", action="store_true",
                   help="emit only rows that can differ from the base "
                        "(archive output is never rewritten)")
    f.add_argument("--save-as", default=None,
                   help="persist the fold's joint state under this "
                        "run_id so a later shard can fold onto it")

    rp = sub.add_parser(
        "report",
        help="executive dedup reports over a documents table: tokens "
             "per dedup tier, per-source dup inflation, verified-pair "
             "similarity histogram")
    rp.add_argument("--input", required=True,
                    help="directory containing documents.parquet, or "
                         "a documents parquet file")
    rp.add_argument("--output", default=None,
                    help="optional path for the JSON report (also "
                         "printed)")
    return p


def _expand_inputs(paths: list[str]) -> list[str]:
    out: list[str] = []
    for p in paths:
        hits = sorted(glob.glob(p)) if any(c in p for c in "*?[") else [p]
        if not hits:
            raise SystemExit(f"input not found: {p}")
        out.extend(hits)
    return out


def _sniff_format(path: str) -> str:
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
        if not files:
            raise SystemExit(f"no parquet files under {path}")
        path = files[0]
    names = set(pq.read_schema(path).names)
    if "html" in names:
        return "pages"
    if "doc_id" in names:
        return "documents"
    raise SystemExit(
        "cannot sniff input format (no html or doc_id column); "
        "pass --input-format")


def _report_sf_dir(path: str) -> str:
    """The query registry reads ``<sf_dir>/documents.parquet``; accept
    either that directory or a direct parquet file (linked into a
    scratch dir when not already named documents.parquet)."""
    if os.path.isdir(path):
        if not os.path.exists(os.path.join(path, "documents.parquet")):
            raise SystemExit(f"{path} has no documents.parquet")
        return path
    if os.path.basename(path) == "documents.parquet":
        return os.path.dirname(path) or "."
    import tempfile

    d = tempfile.mkdtemp(prefix="mplsh_report_")
    os.symlink(os.path.abspath(path),
               os.path.join(d, "documents.parquet"))
    return d


def _run_report(args) -> dict:
    import pandas as pd

    from ray_data_mplsh.pipelines.queries import (
        q_dup_inflation, q_jaccard_histogram, q_tier_token_report)

    sf = _report_sf_dir(args.input)

    def rows(res) -> list[dict]:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        return df.sort_values(sorted(df.columns)) \
            .to_dict(orient="records")

    report = {
        "input": args.input,
        "tier_tokens": rows(q_tier_token_report(sf)),
        "dup_inflation": rows(q_dup_inflation(sf)),
        "jaccard_histogram": rows(q_jaccard_histogram(sf)),
    }
    out = json.dumps(report, sort_keys=True, default=str)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(out)
    print(out)
    return report


def main(argv: list[str] | None = None) -> dict:
    args = _build_parser().parse_args(argv)
    t0 = time.monotonic()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    if args.cmd == "report":
        return _run_report(args)

    from ray_data_mplsh.config import MPLSHConfig
    from ray_data_mplsh.sources import write_corpus

    inputs = _expand_inputs(args.input)
    fmt = args.input_format
    if fmt == "auto":
        fmt = _sniff_format(inputs[0])

    cfg_kw: dict = {}
    if args.min_chars is not None:
        cfg_kw["min_chars"] = args.min_chars
    if args.langs:
        cfg_kw["langs"] = tuple(args.langs.split(","))
    if args.num_partitions:
        cfg_kw["num_partitions"] = args.num_partitions
    cfg = MPLSHConfig(ckpt_dir=args.ckpt_dir, run_id=args.run_id,
                      **cfg_kw)

    import ray.data

    if fmt == "pages":
        extract = not args.no_extract
        cols = (["url", "html", "lang"] if extract
                else ["url", "text", "lang"])
        pages = ray.data.read_parquet(inputs, columns=cols)
        run_kw: dict = {"extract": extract}
    else:
        pages = ray.data.read_parquet(
            inputs, columns=["doc_id", "text", "lang"])
        run_kw = {"extract": False, "url_col": "doc_id"}

    if args.cmd == "run":
        from ray_data_mplsh.pipelines.dedup import run_dedup

        res = run_dedup(pages, cfg, skip_substring=args.skip_substring,
                        **run_kw)
    else:
        from ray_data_mplsh.pipelines.incremental import (
            run_dedup_incremental)

        if not args.ckpt_dir:
            raise SystemExit("fold requires --ckpt-dir")
        res = run_dedup_incremental(
            pages, cfg, base_run_id=args.base,
            skip_substring=args.skip_substring,
            output="delta" if args.delta else "joint",
            save_as=args.save_as, **run_kw)

    os.makedirs(args.output, exist_ok=True)
    n_out = write_corpus(res.dedup_out,
                         os.path.join(args.output, "dedup_out"),
                         num_shards=args.num_shards)
    n_lab = write_corpus(res.labels,
                         os.path.join(args.output, "clusters"),
                         num_shards=max(1, args.num_shards // 8))
    summary = {
        "cmd": args.cmd, "input_format": fmt,
        "output": args.output,
        "shards_written": n_out, "cluster_shards_written": n_lab,
        "wall_s": round(time.monotonic() - t0, 3),
        **{k: v for k, v in res.counters.items()
           if isinstance(v, (int, float, str))},
    }
    with open(os.path.join(args.output, "counters.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, sort_keys=True))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
