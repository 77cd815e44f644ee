"""Depth conditioning for SD-2.0-depth2img training.

The reference carries a DPT depth estimator on the model
(modules/model/StableDiffusionModel.py:50-51 `image_depth_processor` /
`depth_estimator`, loaded from the checkpoint's `depth_estimator/` +
`feature_extractor/` subfolders by
modules/modelLoader/stableDiffusion/StableDiffusionModelLoader.py) and
threads a `depth` image through the data pipeline to a latent-resolution
`latent_depth` (modules/dataLoader/StableDiffusionBaseDataLoader.py:74-106
ScaleImage factor 0.125; mixin/DataLoaderText2ImageMixin.py:180-200).

Here the depth map is produced at cache time: DPT runs on CPU torch once
per image (the TPU stays on the VAE encode), is resized to the latent
grid and min-max normalized to [-1, 1] — the same normalization the
diffusers depth2img pipeline applies. When the checkpoint has no
`depth_estimator/` subfolder a luminance proxy (documented deviation)
keeps the 5-channel UNet trainable end to end.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _normalize(depth: np.ndarray) -> np.ndarray:
    """Per-image min-max to [-1, 1] (diffusers depth2img convention)."""
    lo = depth.min(axis=(1, 2), keepdims=True)
    hi = depth.max(axis=(1, 2), keepdims=True)
    return 2.0 * (depth - lo) / np.maximum(hi - lo, 1e-6) - 1.0


def _resize_batch(maps: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((maps.shape[0], h, w), np.float32)
    for i, m in enumerate(maps):
        pil = Image.fromarray(m.astype(np.float32), mode="F")
        out[i] = np.asarray(pil.resize((w, h), Image.BICUBIC), np.float32)
    return out


def make_depth_fn(base_model_dir: str, latent_scale: float):
    """-> fn(images [B,H,W,3] in [-1,1]) -> latent_depth [B,h,w,1] in [-1,1].

    Uses the checkpoint's DPT depth estimator when present
    (`depth_estimator/` subfolder, as in stabilityai/stable-diffusion-2-depth),
    otherwise a luminance proxy."""
    dpt = None
    est_dir = os.path.join(base_model_dir or "", "depth_estimator")
    if os.path.isdir(est_dir):
        try:
            import torch
            from transformers import DPTForDepthEstimation
            dpt = DPTForDepthEstimation.from_pretrained(est_dir)
            dpt.eval()
            torch_mod = torch
        except Exception as e:
            print(f"depth estimator load failed ({e}); using luminance proxy")
            dpt = None

    def depth_fn(images: np.ndarray) -> np.ndarray:
        b, h, w, _ = images.shape
        lh, lw = int(round(h / latent_scale)), int(round(w / latent_scale))
        if dpt is not None:
            # DPT wants [B,3,384,384]-ish normalized input; the processor's
            # ensure_multiple_of=32 resize is replicated with PIL
            x01 = (images.astype(np.float32) + 1.0) / 2.0
            side = 384
            resized = np.stack([
                np.asarray(Image.fromarray(
                    (np.clip(im, 0, 1) * 255).astype(np.uint8)).resize(
                        (side, side), Image.BICUBIC), np.float32) / 255.0
                for im in x01])
            mean = np.asarray([0.5, 0.5, 0.5], np.float32)
            std = np.asarray([0.5, 0.5, 0.5], np.float32)
            inp = (resized - mean) / std
            with torch_mod.no_grad():
                pred = dpt(pixel_values=torch_mod.from_numpy(
                    inp.transpose(0, 3, 1, 2))).predicted_depth
            maps = pred.numpy()                       # [B, ph, pw]
        else:
            # luminance proxy (no DPT weights in the checkpoint)
            x01 = (images.astype(np.float32) + 1.0) / 2.0
            maps = (0.299 * x01[..., 0] + 0.587 * x01[..., 1]
                    + 0.114 * x01[..., 2])
        maps = _resize_batch(maps, lh, lw)
        return _normalize(maps)[..., None].astype(np.float32)

    return depth_fn
