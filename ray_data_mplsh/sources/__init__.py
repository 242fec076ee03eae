"""Sources / sinks (SURVEY.md §2.1).

Readers prune columns at the read (only what the pipeline touches leaves
storage) and accept lists of paths so multiple crawl shards union for free
(op 22).
"""

from __future__ import annotations

PAGES_COLUMNS = ["url", "html", "text", "lang"]


def read_pages(paths, *, columns=None, extract: bool = False):
    """Read Parquet webtext shards (T0 schema, BASELINE.json:15).

    With ``extract=True`` only (url, html, lang) are read — the text column
    is produced by the extractor, so shipping the stored one would be
    wasted I/O.
    """
    import ray.data

    if columns is None:
        columns = (["url", "html", "lang"] if extract
                   else ["url", "text", "lang"])
    return ray.data.read_parquet(paths, columns=columns)


def read_documents(sf_dir: str, *, columns=None):
    """Adapter for the driver testdata ``documents`` table (TESTDATA.md):
    doc_id plays the url role, no html -> pipeline enters at S2."""
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns or ["doc_id", "text", "lang"])


def union_shards(*datasets):
    first, *rest = datasets
    return first.union(*rest) if rest else first


def read_pages_csv(paths, **kw):
    """CSV crawl exports (html column base64-encoded by convention)."""
    import base64

    import pyarrow as pa
    import ray.data

    ds = ray.data.read_csv(paths, **kw)

    def decode(batch: pa.Table) -> pa.Table:
        if "html" in batch.column_names and \
                pa.types.is_string(batch["html"].type):
            raw = [base64.b64decode(x) if x else b""
                   for x in batch["html"].to_pylist()]
            i = batch.schema.get_field_index("html")
            batch = batch.set_column(i, "html", pa.array(raw, pa.binary()))
        return batch

    return ds.map_batches(decode, batch_format="pyarrow")


def read_pages_json(paths, **kw):
    """JSONL crawl exports (one page object per line)."""
    import ray.data

    return ray.data.read_json(paths, **kw)


def write_corpus(ds, out_dir: str, *, key_col: str = "doc_id",
                 num_shards: int = 64) -> int:
    """Resumable partitioned Parquet sink (the "never one giant file"
    output contract): rows are hash-sharded on ``key_col`` into Hive-style
    ``shard=<i>/`` directories, each stamped with a ``_SUCCESS`` marker
    once fully written. On restart, incomplete (unmarked) shard dirs are
    dropped and ONLY the missing shards are rewritten — finished
    partitions are never redone and never re-read. Returns the number of
    shards written this invocation.

    Sharding is hash(key) so the layout is stable across retries and
    independent of input order/blocking; the write itself is one streaming
    pass filtered to the missing shards.
    """
    import os
    import shutil

    import numpy as np
    import pyarrow as pa

    from ray_data_mplsh.functions.hashing import mix64

    os.makedirs(out_dir, exist_ok=True)
    done = set()
    for name in os.listdir(out_dir):
        if not name.startswith("shard="):
            continue
        sid = int(name.split("=", 1)[1])
        if os.path.exists(os.path.join(out_dir, name, "_SUCCESS")):
            done.add(sid)
        else:           # partial write from a dead run: rewrite cleanly
            shutil.rmtree(os.path.join(out_dir, name))
    todo = np.array(sorted(set(range(num_shards)) - done), np.int32)
    if len(todo) == 0:
        return 0

    def shard_and_filter(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = (mix64(ids) % np.uint64(num_shards)).astype(np.int32)
        t = t.append_column("shard", pa.array(sh, pa.int32()))
        if len(todo) == num_shards:
            return t
        return t.filter(pa.array(np.isin(sh, todo)))

    ds.map_batches(shard_and_filter, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["shard"])
    for i in todo.tolist():
        d = os.path.join(out_dir, f"shard={i}")
        os.makedirs(d, exist_ok=True)       # empty shards are still marked
        open(os.path.join(d, "_SUCCESS"), "w").close()
    return len(todo)


def read_corpus(out_dir: str, *, columns=None):
    """Read a ``write_corpus`` layout back as one Dataset (the ``shard``
    partition value is dropped; ``_SUCCESS`` markers are ignored by the
    parquet discovery)."""
    import ray.data

    ds = ray.data.read_parquet(out_dir, columns=columns)

    def drop(t):
        return t.drop_columns(["shard"]) if "shard" in t.column_names else t

    import pyarrow as pa  # noqa: F401
    return ds.map_batches(drop, batch_format="pyarrow")
