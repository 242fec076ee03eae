"""S1: pages -> docs. Extract, filter, canonicalize, assign ids
(SURVEY.md ops 5-9) — one stateless fused ``map_batches`` pass.

doc_id = hash64(canonical url): deterministic and order-free, so resume /
repartitioning can never change ids (SURVEY.md op 9, §2.9 — no
zip-with-index anywhere).

The whole pass runs on Arrow compute kernels (VERDICT r4 #3): the url /
text / lang columns never round-trip through pandas, so the headline S1
stage stays zero-copy from the object store to the filter mask. The one
exception is ``hash_str_array`` (the frozen doc-id function is
``pd.util.hash_array``) and the html extract path (its kernel operates
on decoded python strings by design — see functions/extract.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray_data_mplsh.config import MPLSHConfig
from ray_data_mplsh.functions.extract import extract_batch
from ray_data_mplsh.functions.hashing import hash_str_array

DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.uint64()),
    ("url", pa.string()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("n_chars", pa.int64()),
])

# split at the FIRST "://" (non-greedy prefix, (?s) so embedded newlines
# can't truncate a match the pandas split would have made); host is
# everything up to the first "/", tail (the "/"+path, case-preserved)
# is the rest. Rows with no "://" don't match and pass through unchanged.
_URL_RE = r"(?s)^(?P<pre>.*?)://(?P<host>[^/]*)(?P<tail>.*)$"


def _as_string_array(col) -> pa.Array:
    if isinstance(col, pd.Series):
        return pa.array(col.to_numpy(dtype=object), pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = col.cast(pa.string())
    return col


def canonicalize_urls(urls) -> pa.Array:
    """Lowercase scheme+host, preserve path case, strip fragment (op 8)
    — pure Arrow kernels (split_pattern / extract_regex / utf8_lower /
    binary_join_element_wise), no pandas round-trip. Accepts a pyarrow
    (Chunked)Array or a pandas Series (converted once); returns a
    pyarrow string Array."""
    urls = _as_string_array(urls)
    # strip fragment: everything after the first '#'
    s = pc.list_element(
        pc.split_pattern(urls, pattern="#", max_splits=1), 0)
    parts = pc.extract_regex(s, pattern=_URL_RE)
    if parts.null_count == len(parts):
        # scheme-less keys (e.g. doc_id used as url) pass through unchanged
        return s
    rebuilt = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(parts, "pre")),
        "://",
        pc.utf8_lower(pc.struct_field(parts, "host")),
        pc.struct_field(parts, "tail"),
        "")
    return pc.if_else(pc.is_valid(parts), rebuilt, s)


def make_docs_stage(cfg: MPLSHConfig, *, extract: bool,
                    url_col: str = "url", text_col: str = "text",
                    lang_col: str = "lang"):
    """Returns the fused map_batches fn for S1."""

    langs = pa.array(sorted(cfg.langs), pa.string()) if cfg.langs else None

    def docs_batch(batch: pa.Table) -> pa.Table:
        urls = pc.fill_null(_as_string_array(batch[url_col]), "")
        if extract:
            texts = _as_string_array(extract_batch(batch["html"]))
        else:
            texts = pc.fill_null(_as_string_array(batch[text_col]), "")
        if lang_col in batch.column_names:
            lang = pc.fill_null(_as_string_array(batch[lang_col]), "")
        else:
            lang = pa.array([""] * batch.num_rows, pa.string())

        keep = pc.greater_equal(pc.utf8_length(texts), cfg.min_chars)
        if langs is not None:
            keep = pc.and_(keep, pc.is_in(lang, value_set=langs))
        urls = urls.filter(keep)
        texts = texts.filter(keep)
        lang = lang.filter(keep)
        curls = canonicalize_urls(urls)
        doc_ids = hash_str_array(curls)
        return pa.Table.from_arrays([
            pa.array(doc_ids, pa.uint64()),
            curls,
            texts,
            lang,
            pc.cast(pc.utf8_length(texts), pa.int64()),
        ], schema=DOCS_SCHEMA)

    return docs_batch


def docs_stage(pages, cfg: MPLSHConfig, *, extract: bool = True, **cols):
    return pages.map_batches(make_docs_stage(cfg, extract=extract, **cols),
                             batch_format="pyarrow")
