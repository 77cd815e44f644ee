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
