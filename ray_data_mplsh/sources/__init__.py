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
