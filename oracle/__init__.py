"""Single-process oracle — the frozen reference stand-in (SURVEY.md §0 item 4).

The reference snapshot contains no runnable code (/root/reference/README.md:1
is its only line), so correctness of the distributed pipeline is gated
against this deterministic pure-Python+NumPy implementation of the exact
same shingle -> MinHash -> band/multi-probe -> pair -> Jaccard -> union-find
-> substring semantics, written first and frozen (SURVEY.md §5).
"""

from oracle.mplsh_oracle import OracleResult, run_oracle

__all__ = ["OracleResult", "run_oracle"]
