"""Distributed pipeline stages (SURVEY.md §2-3).

Each stage is a pure function ``Dataset -> Dataset`` built from
``map_batches`` / ``groupby`` — never raw Ray tasks — and each is
deterministic and order-free so Ray's per-block retries and resumes are
safe (SURVEY.md §2.9, §4.2).
"""
