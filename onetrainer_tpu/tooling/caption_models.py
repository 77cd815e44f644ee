"""Dataset captioning models (reference: modules/module/BaseImageCaptionModel.py,
BlipModel.py:9-37, Blip2Model.py, WDModel.py).

BLIP/BLIP2 wrap the torch CPU implementations in transformers (captioning
is dataset tooling, not the training hot path, so torch-CPU inference is
the right cost/complexity tradeoff — the reference does the same through
the transformers wheels). WD14 needs onnxruntime which is not in this
image; it raises with guidance.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod

from PIL import Image, ImageOps

from onetrainer_tpu.data.concepts import SUPPORTED_IMAGE_EXTENSIONS


class BaseImageCaptionModel(ABC):
    @abstractmethod
    def generate_caption(self, image: Image.Image, initial_caption: str = "",
                         caption_prefix: str = "", caption_postfix: str = "") -> str:
        ...

    @staticmethod
    def _get_sample_filenames(sample_dir: str, include_subdirectories=False) -> list[str]:
        out = []
        if include_subdirectories:
            for root, _, files in os.walk(sample_dir):
                out.extend(os.path.join(root, f) for f in sorted(files))
        else:
            out = [os.path.join(sample_dir, f) for f in sorted(os.listdir(sample_dir))]
        return [f for f in out
                if os.path.splitext(f)[1].lower() in SUPPORTED_IMAGE_EXTENSIONS
                and not os.path.splitext(f)[0].endswith(("-masklabel", "-condlabel"))]

    def caption_image(self, filename: str, initial_caption: str = "",
                      caption_prefix: str = "", caption_postfix: str = "",
                      mode: str = "fill"):
        """mode: 'fill' (only if no caption), 'replace', 'add' (append line)
        (reference: BaseImageCaptionModel.caption_folder modes)."""
        caption_path = os.path.splitext(filename)[0] + ".txt"
        exists = os.path.exists(caption_path)
        if mode == "fill" and exists:
            with open(caption_path, encoding="utf-8") as f:
                if f.read().strip():
                    return
        image = ImageOps.exif_transpose(Image.open(filename)).convert("RGB")
        caption = self.generate_caption(image, initial_caption,
                                        caption_prefix, caption_postfix)
        if mode == "add" and exists:
            with open(caption_path, "a", encoding="utf-8") as f:
                f.write("\n" + caption)
        else:
            with open(caption_path, "w", encoding="utf-8") as f:
                f.write(caption)

    def caption_folder(self, sample_dir: str, initial_caption: str = "",
                       caption_prefix: str = "", caption_postfix: str = "",
                       mode: str = "fill", progress_callback=None,
                       error_callback=None, include_subdirectories=False):
        filenames = self._get_sample_filenames(sample_dir, include_subdirectories)
        if progress_callback:
            progress_callback(0, len(filenames))
        for i, filename in enumerate(filenames):
            try:
                self.caption_image(filename, initial_caption,
                                   caption_prefix, caption_postfix, mode)
            except Exception:
                if error_callback:
                    error_callback(filename)
            if progress_callback:
                progress_callback(i + 1, len(filenames))


class BlipModel(BaseImageCaptionModel):
    def __init__(self, model_name: str = "Salesforce/blip-image-captioning-large"):
        import torch
        from transformers import BlipForConditionalGeneration, BlipProcessor
        self.torch = torch
        self.processor = BlipProcessor.from_pretrained(model_name)
        self.model = BlipForConditionalGeneration.from_pretrained(model_name).eval()

    def generate_caption(self, image, initial_caption="", caption_prefix="",
                         caption_postfix=""):
        inputs = self.processor(image, initial_caption or None, return_tensors="pt")
        with self.torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=75)
        caption = self.processor.decode(out[0], skip_special_tokens=True).strip()
        return f"{caption_prefix}{caption}{caption_postfix}"


class Blip2Model(BaseImageCaptionModel):
    def __init__(self, model_name: str = "Salesforce/blip2-opt-2.7b"):
        import torch
        from transformers import AutoProcessor, Blip2ForConditionalGeneration
        self.torch = torch
        self.processor = AutoProcessor.from_pretrained(model_name)
        self.model = Blip2ForConditionalGeneration.from_pretrained(model_name).eval()

    def generate_caption(self, image, initial_caption="", caption_prefix="",
                         caption_postfix=""):
        inputs = self.processor(image, text=initial_caption or None,
                                return_tensors="pt")
        with self.torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=75)
        caption = self.processor.decode(out[0], skip_special_tokens=True).strip()
        return f"{caption_prefix}{caption}{caption_postfix}"


class WDModel(BaseImageCaptionModel):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "WD14 tagging needs onnxruntime, which is not available in this "
            "environment; use BLIP/BLIP2 or install onnxruntime")

    def generate_caption(self, *a, **k):  # pragma: no cover
        raise NotImplementedError
