"""Image scoring models for dataset filtering
(reference: modules/module/AestheticScoreModel.py, HPSv2ScoreModel.py —
used by the concept-stats tooling to rank images).

AestheticScoreModel: CLIP image embedding → small MLP regressor (the
LAION aesthetic predictor head; weights load from a local .safetensors/.pt
file since this environment has no network). HPSv2ScoreModel: CLIP
image–text similarity with the HPSv2-tuned CLIP. Both run on torch CPU
like the other dataset tooling."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from onetrainer_tpu.data.concepts import SUPPORTED_IMAGE_EXTENSIONS


class AestheticScoreModel:
    """score(image) ∈ [0, 10] via CLIP embed + MLP head
    (reference: AestheticScoreModel.py)."""

    def __init__(self, clip_model_name: str = "openai/clip-vit-large-patch14",
                 head_weights_path: str | None = None, device: str = "cpu"):
        import torch
        from transformers import CLIPModel, CLIPProcessor
        self.torch = torch
        self.device = device
        self.clip = CLIPModel.from_pretrained(clip_model_name).to(device).eval()
        self.processor = CLIPProcessor.from_pretrained(clip_model_name)
        self.head = self._build_head(self.clip.config.projection_dim)
        if head_weights_path and os.path.exists(head_weights_path):
            self._load_head(head_weights_path)
        self.head.to(device).eval()

    def _build_head(self, dim: int):
        import torch.nn as nn
        # the LAION aesthetic predictor MLP layout
        return nn.Sequential(
            nn.Linear(dim, 1024), nn.Dropout(0.2),
            nn.Linear(1024, 128), nn.Dropout(0.2),
            nn.Linear(128, 64), nn.Dropout(0.1),
            nn.Linear(64, 16), nn.Linear(16, 1))

    def _load_head(self, path: str):
        if path.endswith(".safetensors"):
            from safetensors.torch import load_file
            sd = load_file(path)
        else:
            sd = self.torch.load(path, map_location="cpu", weights_only=True)
        self.head.load_state_dict(sd)

    def score(self, image: Image.Image) -> float:
        torch = self.torch
        with torch.no_grad():
            inputs = self.processor(images=image, return_tensors="pt")
            embed = self.clip.get_image_features(
                inputs["pixel_values"].to(self.device))
            embed = embed / embed.norm(dim=-1, keepdim=True)
            return float(self.head(embed)[0, 0])


class HPSv2ScoreModel:
    """Human-preference score: CLIP image–text cosine similarity with an
    HPS-tuned CLIP checkpoint (reference: HPSv2ScoreModel.py)."""

    def __init__(self, clip_model_name: str = "openai/clip-vit-large-patch14",
                 device: str = "cpu"):
        import torch
        from transformers import CLIPModel, CLIPProcessor
        self.torch = torch
        self.device = device
        self.clip = CLIPModel.from_pretrained(clip_model_name).to(device).eval()
        self.processor = CLIPProcessor.from_pretrained(clip_model_name)

    def score(self, image: Image.Image, prompt: str) -> float:
        torch = self.torch
        with torch.no_grad():
            inputs = self.processor(text=[prompt], images=image,
                                    return_tensors="pt", padding=True,
                                    truncation=True)
            out = self.clip(**{k: v.to(self.device) for k, v in inputs.items()})
            img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
            txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
            return float((img * txt).sum())


def score_folder(model, sample_dir: str, prompt: str | None = None,
                 include_subdirectories: bool = False) -> dict[str, float]:
    """Score every image in a folder (ConceptWindow filtering support)."""
    scores: dict[str, float] = {}
    names = []
    if include_subdirectories:
        for root, _, files in os.walk(sample_dir):
            names.extend(os.path.join(root, f) for f in sorted(files))
    else:
        names = [os.path.join(sample_dir, f)
                 for f in sorted(os.listdir(sample_dir))]
    for name in names:
        if os.path.splitext(name)[1].lower() not in SUPPORTED_IMAGE_EXTENSIONS:
            continue
        if os.path.splitext(name)[0].endswith(("-masklabel", "-condlabel")):
            continue
        with Image.open(name) as img:
            image = img.convert("RGB")
        if prompt is not None:
            scores[name] = model.score(image, prompt)
        else:
            scores[name] = model.score(image)
    return scores
