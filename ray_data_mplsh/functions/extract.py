"""Byte-exact HTML -> text extraction (SURVEY.md op 5; FIXTURES.md §3).

The per-url invariant (BASELINE.json:6,15): for every fixture page,
``extract_html(html) == text`` byte-for-byte. The spec is frozen and
deliberately heuristic-free:

  1. decode UTF-8 (errors=replace)
  2. remove <script>...</script>, <style>...</style>, <!-- ... --> blocks
  3. strip all remaining tags
  4. decode exactly these entities: &amp; &lt; &gt; &quot; &#39; &nbsp;
  5. collapse runs of [ \\t\\r\\n] to a single space; strip ends

Also hosts the shingling-view normalizer (op 10): lowercase + strip
punctuation + collapse whitespace — applied only for shingling; the
``text`` column itself stays byte-exact.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_SCRIPT_RE = re.compile(rb"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(rb"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n]+")

# Fixed entity table — applied in this exact order; &amp; last so that
# literal "&amp;lt;" round-trips as "&lt;" not "<".
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def extract_html(html: bytes) -> str:
    """Extract text from one page per the frozen spec above."""
    html = _SCRIPT_RE.sub(b" ", html)
    html = _STYLE_RE.sub(b" ", html)
    html = _COMMENT_RE.sub(b" ", html)
    s = html.decode("utf-8", errors="replace")
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def extract_batch(htmls) -> pd.Series:
    """Vector wrapper: pyarrow binary array / pandas Series -> text Series.

    The regex passes run per document (documents are independent), but the
    loop body is pure C-level regex work — no per-token Python.
    """
    import pyarrow as pa

    if isinstance(htmls, (pa.Array, pa.ChunkedArray)):
        htmls = htmls.to_pandas()
    return pd.Series([extract_html(h) for h in htmls], dtype="object")


# --- shingling-view normalization (op 10) -------------------------------

_PUNCT_RE = re.compile(r"[^\w\s]+", re.UNICODE)


def tokenize_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Normalize + tokenize a batch of texts for shingling.

    Returns ``(flat_words, doc_offsets)``: an object ndarray of all tokens
    (docs concatenated) and int64 start offsets (len = ndocs + 1).
    Normalization: casefold, strip punctuation, split on whitespace.
    Runs on pandas' C string kernels.
    """
    import pyarrow as pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pandas()
    s = pd.Series(texts, dtype="object").fillna("")
    s = s.str.casefold().str.replace(_PUNCT_RE, " ", regex=True)
    toks = s.str.split()
    counts = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    offsets = np.zeros(len(s) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = np.empty(int(offsets[-1]), dtype=object)
    pos = 0
    for t in toks:
        if t:
            flat[pos:pos + len(t)] = t
            pos += len(t)
    return flat, offsets
