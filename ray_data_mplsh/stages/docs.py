"""S1: pages -> docs. Extract, filter, canonicalize, assign ids
(SURVEY.md ops 5-9) — one stateless fused ``map_batches`` pass.

doc_id = hash64(canonical url): deterministic and order-free, so resume /
repartitioning can never change ids (SURVEY.md op 9, §2.9 — no
zip-with-index anywhere).
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


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """Lowercase scheme+host, strip fragment (op 8) — vectorized str kernels."""
    s = urls.str.split("#", n=1).str[0]
    has_scheme = s.str.contains("://", regex=False)
    if not bool(has_scheme.any()):
        # scheme-less keys (e.g. doc_id used as url) pass through unchanged;
        # also avoids .str on an all-NaN split result
        return s
    sp = s.str.split("://", n=1)
    pre = sp.str[0].str.lower()
    rest = sp.str[1].fillna("").astype(str)
    rsp = rest.str.split("/", n=1)
    host = rsp.str[0].str.lower()
    path = rsp.str[1]
    rebuilt = pre + "://" + host + np.where(path.isna(), "", "/" + path.fillna(""))
    return pd.Series(np.where(has_scheme, rebuilt, s), index=s.index)


def make_docs_stage(cfg: MPLSHConfig, *, extract: bool,
                    url_col: str = "url", text_col: str = "text",
                    lang_col: str = "lang"):
    """Returns the fused map_batches fn for S1."""

    langs = set(cfg.langs)

    def docs_batch(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pandas().astype(str)
        if extract:
            texts = extract_batch(batch["html"])
        else:
            texts = batch[text_col].to_pandas().astype(str)
        texts.index = urls.index
        if lang_col in batch.column_names:
            lang = batch[lang_col].to_pandas().astype(str)
        else:
            lang = pd.Series([""] * len(urls), index=urls.index)

        keep = texts.str.len() >= cfg.min_chars
        if langs:
            keep &= lang.isin(langs)
        urls, texts, lang = urls[keep], texts[keep], lang[keep]
        curls = canonicalize_urls(urls)
        doc_ids = hash_str_array(curls)
        return pa.Table.from_arrays([
            pa.array(doc_ids, pa.uint64()),
            pa.array(curls, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(lang, pa.string()),
            pa.array(texts.str.len().to_numpy(np.int64), pa.int64()),
        ], schema=DOCS_SCHEMA)

    return docs_batch


def docs_stage(pages, cfg: MPLSHConfig, *, extract: bool = True, **cols):
    return pages.map_batches(make_docs_stage(cfg, extract=extract, **cols),
                             batch_format="pyarrow")
