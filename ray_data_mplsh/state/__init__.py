"""Checkpoint + lineage state (SURVEY.md §2.1 ops 3-4, op 25)."""
