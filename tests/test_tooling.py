import os

import numpy as np
import pytest
from PIL import Image

from onetrainer_tpu.tooling.caption_models import BaseImageCaptionModel
from onetrainer_tpu.tooling.mask_models import MaskByColor
from onetrainer_tpu.util.concept_stats import folder_scan
from tests.test_data import make_dataset


class DummyCaptioner(BaseImageCaptionModel):
    def generate_caption(self, image, initial_caption="", caption_prefix="",
                         caption_postfix=""):
        return f"{caption_prefix}dummy caption{caption_postfix}"


def test_caption_folder_modes(tmp_path):
    ds = make_dataset(str(tmp_path / "ds"), n=3)
    model = DummyCaptioner()
    # fill: existing captions untouched
    model.caption_folder(ds, mode="fill")
    with open(os.path.join(ds, "img0.txt")) as f:
        assert "a photo of thing 0" in f.read()
    # replace: overwritten
    model.caption_folder(ds, caption_prefix="p: ", mode="replace")
    with open(os.path.join(ds, "img0.txt")) as f:
        assert f.read() == "p: dummy caption"
    # add: appended
    model.caption_folder(ds, mode="add")
    with open(os.path.join(ds, "img0.txt")) as f:
        lines = f.read().splitlines()
    assert len(lines) == 2


def test_mask_by_color(tmp_path):
    path = str(tmp_path / "img.png")
    arr = np.zeros((64, 64, 3), np.uint8)
    arr[16:48, 16:48] = 255
    Image.fromarray(arr).save(path)
    model = MaskByColor(color=(255, 255, 255), distance=10)
    mask = model.mask_image(Image.open(path), smooth_pixels=0, expand_pixels=0)
    assert mask[32, 32] == 1.0
    assert mask[0, 0] == 0.0

    model.mask_folder(str(tmp_path), [], mode="replace",
                      smooth_pixels=0, expand_pixels=0)
    assert os.path.exists(str(tmp_path / "img-masklabel.png"))


def test_concept_stats(tmp_path):
    ds = make_dataset(str(tmp_path / "ds"), n=4)
    stats = folder_scan(ds, target_resolution=512)
    assert stats["image_count"] == 4
    assert stats["caption_count"] == 4
    assert stats["paired_captions"] == 4
    assert stats["mask_count"] == 1
    assert stats["paired_masks"] == 1
    assert stats["min_pixels"] is not None
    assert sum(stats["aspect_buckets"].values()) == 4


# -- video tools ----------------------------------------------------------------------

def _write_two_scene_video(path, size=64, fps=8.0, frames_per_scene=16):
    import cv2
    rng = np.random.default_rng(0)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (size, size))
    for scene in range(2):
        base = np.full((size, size, 3), 40 if scene == 0 else 200, np.uint8)
        for i in range(frames_per_scene):
            frame = base.copy()
            # moving sharp square so frames have texture + sharpness
            x = (i * 3) % (size - 16)
            frame[8:24, x:x + 16] = rng.integers(0, 255, (16, 16, 3),
                                                 dtype=np.uint8)
            writer.write(frame)
    writer.release()


def test_detect_scene_cuts_and_extract_clips(tmp_path):
    """Scene-cut splitting (reference: VideoToolUI.__extract_clips uses
    scenedetect AdaptiveDetector; ours is a self-contained equivalent)."""
    import cv2

    from onetrainer_tpu.tooling.video_tools import (
        detect_scene_cuts, extract_clips,
    )

    vid = str(tmp_path / "two_scenes.mp4")
    _write_two_scene_video(vid)
    cuts = detect_scene_cuts(vid)
    assert 16 in cuts                      # the hard cut between scenes

    out = extract_clips(vid, str(tmp_path / "clips"), max_length_sec=1.0)
    assert len(out) >= 3                   # 2 scenes, long one split again
    for clip in out:
        cap = cv2.VideoCapture(clip)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) <= 8  # 1s @ 8fps
        cap.release()


def test_extract_frames_blur_filter(tmp_path):
    from onetrainer_tpu.tooling.video_tools import extract_frames

    vid = str(tmp_path / "two_scenes.mp4")
    _write_two_scene_video(vid)
    out = extract_frames(vid, str(tmp_path / "frames"), capture_rate=2.0,
                         blur_threshold=0.25, seed=1)
    n_sampled = 32 // 4                    # every fps/rate = 4 frames
    assert 0 < len(out) <= n_sampled
    assert len(out) <= int(n_sampled * 0.75) + 1   # blurriest 25% dropped
    # deterministic
    out2 = extract_frames(vid, str(tmp_path / "frames2"), capture_rate=2.0,
                          blur_threshold=0.25, seed=1)
    assert [os.path.basename(p) for p in out] == \
        [os.path.basename(p) for p in out2]
