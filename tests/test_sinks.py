"""write_corpus partitioned sink: shard-granular resume, stable layout,
round-trip equality; approx_top_k heavy-hitters guarantees."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(ray_session, n=500, seed=4):
    from ray_data_mplsh.stages.shuffle import from_arrow_blocks

    rng = np.random.Generator(np.random.PCG64(seed))
    t = pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(1, n + 1))
                           .astype(np.uint64), pa.uint64()),
        "text": pa.array([f"doc number {i}" for i in range(n)]),
    })
    return from_arrow_blocks(t, target_rows=64), t


def test_write_read_roundtrip(ray_session, tmp_path):
    from ray_data_mplsh.sources import read_corpus, write_corpus

    ds, t = _docs_ds(ray_session)
    out = str(tmp_path / "corpus")
    n_written = write_corpus(ds, out, num_shards=8)
    assert n_written == 8
    back = read_corpus(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (back["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert list(back.columns) == ["doc_id", "text"]
    # every shard dir is marked complete
    for i in range(8):
        assert os.path.exists(os.path.join(out, f"shard={i}", "_SUCCESS"))


def test_resume_rewrites_only_missing_shards(ray_session, tmp_path):
    from ray_data_mplsh.sources import read_corpus, write_corpus

    ds, t = _docs_ds(ray_session)
    out = str(tmp_path / "corpus")
    write_corpus(ds, out, num_shards=8)
    # simulate a died-mid-write shard: drop its marker (partial files stay)
    victim = os.path.join(out, "shard=3")
    os.remove(os.path.join(victim, "_SUCCESS"))
    mtimes = {i: os.path.getmtime(os.path.join(out, f"shard={i}",
                                               "_SUCCESS"))
              for i in range(8) if i != 3}
    n_written = write_corpus(ds, out, num_shards=8)
    assert n_written == 1            # only the unmarked shard was redone
    for i, m in mtimes.items():      # finished shards untouched
        assert os.path.getmtime(
            os.path.join(out, f"shard={i}", "_SUCCESS")) == m
    back = read_corpus(out).to_pandas().sort_values("doc_id")
    assert (back["doc_id"].to_numpy()
            == np.sort(t["doc_id"].to_numpy(zero_copy_only=False))).all()
    # idempotent when complete
    assert write_corpus(ds, out, num_shards=8) == 0


def test_approx_top_k_guarantees(ray_session):
    from ray_data_mplsh.pipelines.sketch import approx_top_k
    from ray_data_mplsh.stages.shuffle import from_arrow_blocks

    rng = np.random.Generator(np.random.PCG64(13))
    n = 60_000
    zipf = np.minimum(rng.zipf(1.3, size=n), 5000)
    vals = np.array([f"host{z}" for z in zipf], dtype=object)
    t = pa.table({"source": pa.array(vals.astype(str))})
    ds = from_arrow_blocks(t, target_rows=4096)
    counters = 256
    out = approx_top_k(ds, "source", k=5, counters=counters).to_pandas()
    true_keys, true_counts = np.unique(vals.astype(str), return_counts=True)
    true = dict(zip(true_keys, true_counts))
    err = n / (counters + 1)
    for key, lb in zip(out["key"], out["cnt_lower_bound"]):
        # reported counts are lower bounds within the MG error
        assert lb <= true[key]
        assert true[key] - lb <= err * 20  # merged summaries: loose bound
    # the true #1 heavy hitter must be present and ranked first
    top_true = true_keys[np.argmax(true_counts)]
    assert out["key"][0] == top_true


def test_heavy_hitters_exact_zipf(ray_session):
    """Provable path: on a skewed stream the sketch-pruned recount equals
    the full exact GROUP BY top-k (counts and order), with no fallback."""
    from ray_data_mplsh.pipelines.sketch import heavy_hitters_exact
    from ray_data_mplsh.stages.shuffle import from_arrow_blocks

    rng = np.random.Generator(np.random.PCG64(13))
    n = 60_000
    zipf = np.minimum(rng.zipf(1.3, size=n), 5000)
    vals = np.array([f"host{z}" for z in zipf], dtype=object).astype(str)
    t = pa.table({"source": pa.array(vals)})
    ds = from_arrow_blocks(t, target_rows=4096)
    out = heavy_hitters_exact(ds, "source", k=5, counters=256).to_pandas()
    true_keys, true_counts = np.unique(vals, return_counts=True)
    order = np.lexsort((true_keys, -true_counts))[:5]
    assert list(out["key"]) == list(true_keys[order])
    assert list(out["cnt"]) == list(true_counts[order])


def test_heavy_hitters_exact_flat_fallback(ray_session):
    """Fallback path: a flat distribution with too few counters fails the
    provability gate; the exact groupby fallback still returns the true
    top-k (count ties broken by key ASC)."""
    from ray_data_mplsh.pipelines.sketch import heavy_hitters_exact
    from ray_data_mplsh.stages.shuffle import from_arrow_blocks

    # 400 keys, 15 rows each: kth count (15) <= n/(counters+1) = 666
    vals = np.repeat([f"k{i:03d}" for i in range(400)], 15).astype(str)
    rng = np.random.Generator(np.random.PCG64(7))
    rng.shuffle(vals)
    t = pa.table({"source": pa.array(vals)})
    ds = from_arrow_blocks(t, target_rows=1024)
    out = heavy_hitters_exact(ds, "source", k=5, counters=8).to_pandas()
    assert list(out["key"]) == [f"k{i:03d}" for i in range(5)]
    assert list(out["cnt"]) == [15] * 5


def test_approx_distinct_u64_matches_reference(ray_session):
    """KMV-over-ints: exact below k; above k equals the k-th-smallest
    mix64 estimator computed directly (any batching)."""
    from ray_data_mplsh.functions.hashing import mix64
    from ray_data_mplsh.pipelines.sketch import approx_distinct_u64
    from ray_data_mplsh.stages.shuffle import from_arrow_blocks

    ids = np.arange(5000, dtype=np.uint64) * 7
    t = pa.table({"doc_id": pa.array(ids, pa.uint64())})
    for target_rows in (512, 5000):
        ds = from_arrow_blocks(t, target_rows=target_rows)
        est = approx_distinct_u64(ds, "doc_id", k=256)
        kept = np.sort(np.unique(mix64(ids)))[:256]
        want = 255 / (float(kept[-1]) / 2.0**64)
        assert est == want
    small = from_arrow_blocks(t.slice(0, 100), target_rows=32)
    assert approx_distinct_u64(small, "doc_id", k=256) == 100.0
