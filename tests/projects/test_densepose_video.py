"""DensePose video bootstrapping machinery (reference
projects/DensePose/densepose/data/video/): frame selectors, keyframe helper
CSV, video lists, and VideoKeyframeDataset selection/transform logic via an
injected fake decoder (PyAV is optional and absent here; the decode path
degrades to empty results, which is also pinned)."""

import random

import numpy as np
import pytest

from detectron2_tpu.projects.densepose import (
    FirstKFramesSelector,
    FrameSelectionStrategy,
    LastKFramesSelector,
    RandomKFramesSelector,
    VideoKeyframeDataset,
    frame_selector_from_strategy,
    read_keyframe_helper_data,
    video_list_from_file,
)
from detectron2_tpu.projects.densepose.video import list_keyframes, read_keyframes


TS = [3, 14, 15, 92, 65, 35]


def test_first_last_random_selectors():
    assert FirstKFramesSelector(3)(TS) == [3, 14, 15]
    assert LastKFramesSelector(2)(TS) == [65, 35]
    # k larger than the list: everything is retained
    assert FirstKFramesSelector(100)(TS) == TS
    assert LastKFramesSelector(100)(TS) == TS
    random.seed(7)
    picked = RandomKFramesSelector(4)(TS)
    assert len(picked) == 4 and set(picked) <= set(TS)
    assert len(RandomKFramesSelector(100)(TS)) == len(TS)


def test_selector_from_strategy():
    assert isinstance(
        frame_selector_from_strategy(FrameSelectionStrategy.FIRST_K, 2), FirstKFramesSelector
    )
    assert frame_selector_from_strategy(FrameSelectionStrategy.ALL)(TS) == TS
    assert frame_selector_from_strategy(FrameSelectionStrategy.LAST_K, 1)(TS) == [35]


def test_video_list_from_file(tmp_path):
    f = tmp_path / "videos.txt"
    f.write_text("a.mp4\n/abs/b.mp4\n\nhttp://x/c.mp4\n")
    lst = video_list_from_file(str(f), base_path="/data")
    assert lst == ["/data/a.mp4", "/abs/b.mp4", "http://x/c.mp4"]


def test_keyframe_helper_csv(tmp_path):
    f = tmp_path / "kf.csv"
    f.write_text('video_id,keyframes\n2,"[1,11,21]"\n5,"[]"\n')
    data = read_keyframe_helper_data(str(f))
    assert data == {2: [1, 11, 21], 5: []}


def test_av_free_decode_degrades():
    # no PyAV in this environment: both entry points must degrade, not raise
    assert list_keyframes("/nonexistent.mp4") == []
    assert read_keyframes("/nonexistent.mp4", [1, 2]) is None


def _fake_reader(h=8, w=6):
    def read(fpath, keyframes):
        # frame value encodes (timestamp, channel) so selection order is checkable
        return np.stack(
            [np.full((h, w, 3), ts, np.uint8) * np.array([1, 2, 3], np.uint8) for ts in keyframes]
        )

    return read


def test_video_keyframe_dataset_selection_and_bgr():
    ds = VideoKeyframeDataset(
        video_list=["v0.mp4", "v1.mp4"],
        category_list=["cat", "dog"],
        frame_selector=FirstKFramesSelector(2),
        keyframe_lister=lambda fpath: [1, 5, 9],
        keyframe_reader=_fake_reader(),
    )
    assert len(ds) == 2
    out = ds[1]
    imgs = out["images"]
    assert imgs.shape == (2, 8, 6, 3) and imgs.dtype == np.float32
    # RGB->BGR flip: channel 0 now holds 3*ts, channel 2 holds ts
    assert imgs[0, 0, 0, 0] == 3 * 1 and imgs[0, 0, 0, 2] == 1
    assert imgs[1, 0, 0, 2] == 5  # second selected keyframe
    assert out["categories"] == ["dog"]


def test_video_keyframe_dataset_transform_and_helper(tmp_path):
    f = tmp_path / "kf.csv"
    f.write_text('video_id,keyframes\n0,"[2,4]"\n')
    calls = []

    def transform(frames):
        calls.append(frames.shape)
        return frames / 255.0

    ds = VideoKeyframeDataset(
        video_list=["v0.mp4"],
        keyframe_helper_fpath=str(f),
        # lister must NOT be consulted when helper data covers the video
        keyframe_lister=lambda fpath: pytest.fail("helper data should bypass the lister"),
        keyframe_reader=_fake_reader(),
        transform=transform,
    )
    out = ds[0]
    assert calls == [(2, 8, 6, 3)]
    assert out["images"].max() <= 1.0
    assert out["categories"] == [None]


def test_video_keyframe_dataset_empty_paths():
    ds = VideoKeyframeDataset(
        video_list=["v0.mp4"],
        keyframe_lister=lambda fpath: [],
        keyframe_reader=_fake_reader(),
    )
    out = ds[0]
    assert out["images"].shape[0] == 0 and out["categories"] == []
    ds2 = VideoKeyframeDataset(
        video_list=["v0.mp4"],
        keyframe_lister=lambda fpath: [1],
        keyframe_reader=lambda fpath, kf: None,
    )
    out2 = ds2[0]
    assert out2["images"].shape[0] == 0 and out2["categories"] == []
