"""Dataset masking models (reference: modules/module/ClipSegModel.py:12-41,
RembgModel.py, MaskByColor.py). Masks save as `<stem>-masklabel.png`."""

from __future__ import annotations

import os
from abc import ABC, abstractmethod

import numpy as np
from PIL import Image, ImageOps

from onetrainer_tpu.tooling.caption_models import BaseImageCaptionModel


def _smooth(mask: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 0:
        return mask
    from PIL import ImageFilter
    pil = Image.fromarray((mask * 255).astype(np.uint8))
    pil = pil.filter(ImageFilter.GaussianBlur(radius))
    return np.asarray(pil, np.float32) / 255.0


def _expand(mask: np.ndarray, pixels: int) -> np.ndarray:
    if pixels <= 0:
        return mask
    from PIL import ImageFilter
    pil = Image.fromarray((mask * 255).astype(np.uint8))
    pil = pil.filter(ImageFilter.MaxFilter(2 * pixels + 1))
    return np.asarray(pil, np.float32) / 255.0


class BaseImageMaskModel(ABC):
    @abstractmethod
    def mask_image(self, image: Image.Image, prompts: list[str],
                   mode: str = "fill", threshold: float = 0.3,
                   smooth_pixels: int = 5, expand_pixels: int = 10) -> np.ndarray:
        ...

    def mask_folder(self, sample_dir: str, prompts: list[str],
                    mode: str = "fill", threshold: float = 0.3,
                    smooth_pixels: int = 5, expand_pixels: int = 10,
                    alpha: float = 1.0,
                    progress_callback=None, error_callback=None,
                    include_subdirectories=False):
        filenames = BaseImageCaptionModel._get_sample_filenames(
            sample_dir, include_subdirectories)
        if progress_callback:
            progress_callback(0, len(filenames))
        for i, filename in enumerate(filenames):
            try:
                mask_path = os.path.splitext(filename)[0] + "-masklabel.png"
                if mode == "fill" and os.path.exists(mask_path):
                    continue
                image = ImageOps.exif_transpose(Image.open(filename)).convert("RGB")
                mask = self.mask_image(image, prompts, mode, threshold,
                                       smooth_pixels, expand_pixels)
                if mode == "add" and os.path.exists(mask_path):
                    old = np.asarray(Image.open(mask_path).convert("L"),
                                     np.float32) / 255.0
                    mask = np.maximum(mask, old)
                elif mode == "subtract" and os.path.exists(mask_path):
                    old = np.asarray(Image.open(mask_path).convert("L"),
                                     np.float32) / 255.0
                    mask = np.clip(old - mask, 0.0, 1.0)
                Image.fromarray((mask * 255 * alpha).astype(np.uint8)).save(mask_path)
            except Exception:
                if error_callback:
                    error_callback(filename)
            if progress_callback:
                progress_callback(i + 1, len(filenames))


class MaskByColor(BaseImageMaskModel):
    """Mask pixels close to a target color (reference: MaskByColor.py)."""

    def __init__(self, color: tuple[int, int, int] = (255, 255, 255),
                 distance: float = 30.0):
        self.color = np.asarray(color, np.float32)
        self.distance = distance

    def mask_image(self, image, prompts=None, mode="fill", threshold=0.3,
                   smooth_pixels=5, expand_pixels=10):
        arr = np.asarray(image, np.float32)
        dist = np.linalg.norm(arr - self.color[None, None], axis=-1)
        mask = (dist <= self.distance).astype(np.float32)
        mask = _expand(mask, expand_pixels)
        mask = _smooth(mask, smooth_pixels)
        return mask


class ClipSegModel(BaseImageMaskModel):
    """Prompt-driven segmentation (reference: ClipSegModel.py:12-41)."""

    def __init__(self, model_name: str = "CIDAS/clipseg-rd64-refined"):
        import torch
        from transformers import AutoProcessor, CLIPSegForImageSegmentation
        self.torch = torch
        self.processor = AutoProcessor.from_pretrained(model_name)
        self.model = CLIPSegForImageSegmentation.from_pretrained(model_name).eval()

    def mask_image(self, image, prompts, mode="fill", threshold=0.3,
                   smooth_pixels=5, expand_pixels=10):
        inputs = self.processor(
            text=prompts, images=[image] * len(prompts),
            padding=True, return_tensors="pt")
        with self.torch.no_grad():
            logits = self.model(**inputs).logits
        if logits.ndim == 2:
            logits = logits[None]
        probs = self.torch.sigmoid(logits).max(dim=0).values.numpy()
        pil = Image.fromarray((probs * 255).astype(np.uint8)).resize(
            image.size, Image.BILINEAR)
        mask = (np.asarray(pil, np.float32) / 255.0 >= threshold).astype(np.float32)
        mask = _expand(mask, expand_pixels)
        mask = _smooth(mask, smooth_pixels)
        return mask


class RembgModel(BaseImageMaskModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "rembg/onnxruntime are not available in this environment; "
            "use CLIPSEG or COLOR masking")

    def mask_image(self, *a, **k):  # pragma: no cover
        raise NotImplementedError


RembgHumanModel = RembgModel
