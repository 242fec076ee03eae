"""Suffix-array kernel tests (SURVEY.md op 24)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ray_data_mplsh.functions.suffix import (
    cross_match_intervals, longest_cross_substring, merge_intervals,
    remove_intervals, suffix_array,
)


def _brute_sa(s):
    return sorted(range(len(s)), key=lambda i: s[i:])


@given(st.text(alphabet="abc", min_size=1, max_size=80))
@settings(max_examples=60, deadline=None)
def test_suffix_array_matches_bruteforce(s):
    arr = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
    assert suffix_array(arr).tolist() == _brute_sa(s)


def _brute_lcs(a, b):
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@given(st.text(alphabet="ab", min_size=1, max_size=40),
       st.text(alphabet="ab", min_size=1, max_size=40))
@settings(max_examples=40, deadline=None)
def test_lcs_matches_bruteforce(a, b):
    assert longest_cross_substring(a, b) == _brute_lcs(a, b)


def test_cross_match_intervals_exact_coverage():
    a = "xxxx SHARED-SPAN-ONE-IS-LONG-ENOUGH-TO-COUNT yyyy"
    b = "left pad SHARED-SPAN-ONE-IS-LONG-ENOUGH-TO-COUNT right pad"
    iv = cross_match_intervals(a, b, 30)
    assert len(iv) == 1
    s, e = iv[0]
    assert "SHARED-SPAN-ONE-IS-LONG-ENOUGH-TO-COUNT" in b[s:e]


@given(st.text(alphabet="abcd", min_size=5, max_size=60),
       st.text(alphabet="abcd", min_size=5, max_size=60),
       st.integers(min_value=3, max_value=8))
@settings(max_examples=40, deadline=None)
def test_cross_match_intervals_cover_all_long_matches(a, b, L):
    """Every position of b starting a >=L-char substring of a is covered."""
    iv = cross_match_intervals(a, b, L)
    covered = np.zeros(len(b), dtype=bool)
    for s, e in iv:
        covered[s:e] = True
    for p in range(len(b) - L + 1):
        if b[p:p + L] in a:
            assert covered[p:p + L].all(), (a, b, L, p, iv)


def test_merge_and_remove_intervals():
    assert merge_intervals([(5, 9), (1, 3), (2, 6)]) == [(1, 9), ]
    assert remove_intervals("hello cruel world", [(5, 11)]) == "hello world"


@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 40),
                          st.integers(0, 15)), max_size=120))
@settings(max_examples=60, deadline=None)
def test_merge_intervals_grouped_matches_scalar(rows):
    """The vectorized per-doc merge is bit-equal to merge_intervals run
    per doc — incl. touching intervals, duplicate starts, single-row
    docs, and empty input."""
    from ray_data_mplsh.functions.suffix import merge_intervals_grouped

    d = np.array([r[0] for r in rows], np.uint64)
    s = np.array([r[1] for r in rows], np.int64)
    e = s + np.array([r[2] for r in rows], np.int64)
    o = np.lexsort((s, d))
    rd_, rs, re_ = merge_intervals_grouped(d[o], s[o], e[o])
    want_d, want_s, want_e = [], [], []
    for doc in sorted(set(d.tolist())):
        m = d == doc
        merged = merge_intervals(list(zip(s[m].tolist(), e[m].tolist())))
        for a, b in merged:
            want_d.append(doc)
            want_s.append(a)
            want_e.append(b)
    assert rd_.tolist() == want_d
    assert rs.tolist() == want_s
    assert re_.tolist() == want_e
