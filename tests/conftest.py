"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    """The 'small' fixture corpus (FIXTURES.md §1) written once per session."""
    from ray_data_mplsh.fixtures import write_fixture_dir

    d = tmp_path_factory.mktemp("fixture_small")
    write_fixture_dir(str(d), n=400, seed=7)
    return str(d)


@pytest.fixture(scope="session")
def small_oracle(small_fixture):
    """Oracle result on the small fixture, computed once per session."""
    import pyarrow.parquet as pq

    from oracle.mplsh_oracle import run_oracle
    from ray_data_mplsh.config import MPLSHConfig

    pages = pq.read_table(f"{small_fixture}/pages.parquet")
    return run_oracle(pages, MPLSHConfig())
