"""Byte-identical extraction + fixture-generator tests (SURVEY.md §5 items 2-3)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ray_data_mplsh.fixtures import (
    Plan, gen_gt_tables, gen_pages_batch, gen_pages_table,
)
from ray_data_mplsh.functions.extract import extract_html, tokenize_batch


def test_extract_strips_script_style_comments_entities():
    html = (b"<html><head><script>var x='<p>junk</p>';</script>"
            b"<style>.a{color:red}</style></head>"
            b"<body><!-- hidden --><p>Hello &amp; goodbye &lt;world&gt;"
            b"  \t\n more</p></body></html>")
    assert extract_html(html) == "Hello & goodbye <world> more"


def test_extract_is_deterministic_and_idempotent_on_plain_text():
    assert extract_html(b"plain  text   here") == "plain text here"
    assert extract_html(b"") == ""


def test_fixture_extraction_byte_identical(small_fixture):
    """The per-url invariant (BASELINE.json:6): extract(html) == text for
    EVERY fixture page, byte for byte."""
    pages = pq.read_table(f"{small_fixture}/pages.parquet")
    for url, html, text in zip(pages["url"].to_pylist(),
                               pages["html"].to_pylist(),
                               pages["text"].to_pylist()):
        assert extract_html(html) == text, url


def test_fixture_deterministic_across_batchings():
    """Row i's bytes are identical whether generated alone or in bulk —
    the property that makes distributed generation and resume safe."""
    full = gen_pages_table(60, seed=7)
    for i in (0, 13, 37, 59):
        row = gen_pages_batch(np.array([i]), 60, 7)
        assert row.equals(full.slice(i, 1))


def test_fixture_plants_expected_structure():
    pairs, clusters = gen_gt_tables(300, seed=7)
    kinds = set(pairs["kind"].to_pylist())
    assert kinds == {"exact", "near_high", "near_band", "substring"}
    jj = np.array(pairs["true_jaccard"].to_pylist())
    kk = np.array(pairs["kind"].to_pylist())
    assert (jj[kk == "exact"] == 1.0).all()
    assert (jj[kk == "near_high"] >= 0.75).all()
    assert ((jj[kk == "near_band"] >= 0.6) & (jj[kk == "near_band"] <= 0.9)).all()
    assert (jj[kk == "substring"] < 0.5).all()
    # hot bases: several exact dups point at the same base
    plan = Plan(300)
    hot = [plan.base_of(i, 7) for i in range(plan.o_exact, plan.o_high)]
    counts = np.unique(hot, return_counts=True)[1]
    assert counts.max() >= 3


def test_tokenize_batch_normalizes():
    flat, offs = tokenize_batch(["Hello, World!", "a<b R&D"])
    assert list(offs) == [0, 2, 6]
    assert list(flat) == ["hello", "world", "a", "b", "r", "d"]
