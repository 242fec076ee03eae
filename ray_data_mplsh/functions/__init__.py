"""Vectorized scalar-function surface (SURVEY.md §2.7).

All kernels are NumPy / pyarrow.compute / pandas-C-level; none iterate
Python rows. Shared by the distributed stages (``ray_data_mplsh.stages``)
and the single-process oracle (``oracle/``) so that oracle-equality tests
exercise the *distributed machinery* (shuffles, joins, partition
boundaries), while the kernels themselves are validated by hand-computed
micro-fixtures and property tests (SURVEY.md §5 item 4).
"""
