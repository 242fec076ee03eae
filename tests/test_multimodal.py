"""Multimodal plumbing tests: schema contract, deterministic stub decode
across batchings, frame sampling fan-out."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray_data_mplsh.stages.multimodal import (
    FEATURE_DIM, decode_media, frame_sampler, synth_media,
)


def test_decode_schema_and_determinism(ray_session):
    media = synth_media(60, seed=3)
    out = decode_media(media, batch_size=7).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert list(out.columns) == ["media_id", "media_type", "width",
                                 "height", "feature"]
    assert len(out) == 60
    assert all(len(f) == FEATURE_DIM for f in out.feature)
    # different batch size -> identical features (stub is content-derived)
    out2 = decode_media(synth_media(60, seed=3), batch_size=32).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for f1, f2 in zip(out.feature, out2.feature):
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_frame_sampler_video_only(ray_session):
    media = synth_media(30, seed=3)
    frames = frame_sampler(media, every_n=5, max_frames=4).to_pandas()
    n_video = sum(1 for i in range(30) if i % 3 == 2)
    assert len(frames) == n_video * 4
    assert sorted(frames.frame_idx.unique()) == [0, 5, 10, 15]
