"""Concept folder statistics (reference: modules/util/concept_stats.py:13-85):
image/caption/mask counts and pairing, pixel ranges, aspect-bucket histogram."""

from __future__ import annotations

import os

from PIL import Image

from onetrainer_tpu.data.bucketing import assign_bucket, possible_resolutions
from onetrainer_tpu.data.concepts import SUPPORTED_IMAGE_EXTENSIONS


def folder_scan(path: str, include_subdirectories: bool = False,
                target_resolution: int = 512,
                quantization: int = 8) -> dict:
    stats = {
        "image_count": 0,
        "mask_count": 0,
        "caption_count": 0,
        "paired_masks": 0,
        "paired_captions": 0,
        "unpaired_masks": 0,
        "min_pixels": None,
        "max_pixels": None,
        "aspect_buckets": {},
    }
    if not os.path.isdir(path):
        return stats

    files: list[str] = []
    if include_subdirectories:
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, n) for n in names)
    else:
        files = [os.path.join(path, n) for n in os.listdir(path)]

    images, masks, captions = set(), set(), set()
    for f in files:
        stem, ext = os.path.splitext(f)
        if ext.lower() in SUPPORTED_IMAGE_EXTENSIONS:
            if stem.endswith("-masklabel"):
                masks.add(stem[:-len("-masklabel")])
            elif not stem.endswith("-condlabel"):
                images.add(stem)
        elif ext.lower() == ".txt":
            captions.add(stem)

    buckets = possible_resolutions(target_resolution, target_resolution,
                                   quantization)
    for stem in images:
        stats["image_count"] += 1
        if stem in masks:
            stats["paired_masks"] += 1
        if stem in captions:
            stats["paired_captions"] += 1
        for ext in SUPPORTED_IMAGE_EXTENSIONS:
            p = stem + ext
            if os.path.exists(p):
                try:
                    with Image.open(p) as img:
                        w, h = img.size
                    pixels = w * h
                    if stats["min_pixels"] is None or pixels < stats["min_pixels"]:
                        stats["min_pixels"] = pixels
                    if stats["max_pixels"] is None or pixels > stats["max_pixels"]:
                        stats["max_pixels"] = pixels
                    bucket = assign_bucket(h, w, buckets)
                    key = f"{bucket[0]}x{bucket[1]}"
                    stats["aspect_buckets"][key] = \
                        stats["aspect_buckets"].get(key, 0) + 1
                except OSError:
                    pass
                break
    stats["mask_count"] = len(masks)
    stats["caption_count"] = len(captions)
    stats["unpaired_masks"] = len(masks - images)
    return stats
