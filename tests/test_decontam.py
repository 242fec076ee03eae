"""contains_any: brute-force substring oracle over random docs with
planted snippets, multi-length snippet sets, UTF-8 needles, invert."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.stages.shuffle import from_arrow_blocks


def _corpus(seed: int = 9, n: int = 800):
    rng = np.random.Generator(np.random.PCG64(seed))
    alpha = np.array(list("abcd "))
    docs = ["".join(rng.choice(alpha, rng.integers(20, 200)))
            for _ in range(n)]
    # plant snippets (two lengths + one UTF-8) into a known subset
    snips = ["zebra quagga xylophone", "qq", "émis–sión✓"]
    for i in range(0, n, 37):
        s = snips[i % len(snips)]
        d = docs[i]
        pos = int(rng.integers(0, max(len(d) - 1, 1)))
        docs[i] = d[:pos] + s + d[pos:]
    return docs, snips


def test_contains_any_matches_brute(ray_session):
    from ray_data_mplsh.pipelines.decontam import contains_any

    docs, snips = _corpus()
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    want_hit = sorted(i for i, d in enumerate(docs)
                      if any(s in d for s in snips))
    for target_rows in (64, 800):
        ds = from_arrow_blocks(t, target_rows=target_rows)
        got = sorted(contains_any(ds, snips).to_pandas()["doc_id"])
        assert got == want_hit
        clean = sorted(contains_any(
            from_arrow_blocks(t, target_rows=target_rows), snips,
            invert=True).to_pandas()["doc_id"])
        assert clean == sorted(set(range(len(docs))) - set(want_hit))


def test_contains_any_no_snippets(ray_session):
    from ray_data_mplsh.pipelines.decontam import contains_any

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["aa", "bb"])})
    assert contains_any(from_arrow_blocks(t), []).count() == 0
    assert contains_any(from_arrow_blocks(t), [], invert=True).count() == 2
