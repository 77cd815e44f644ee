"""Debug-mode per-step dumps: decoded noise / noisy latent / prediction /
latent images written to config.debug_dir
(reference: modules/modelSetup/mixin/ModelSetupDebugMixin.py:11-69 —
same artifact names; DiT latents use a fixed random RGB projection).
"""

from __future__ import annotations

import os

import numpy as np


def _project_latent_to_image(latent: np.ndarray) -> np.ndarray:
    """[H, W, C] latent -> [H, W, 3] uint8 via a fixed channel projection
    (reference: ModelSetupDebugMixin._project_latent_to_image)."""
    latent = np.asarray(latent, np.float32)
    if latent.ndim == 4:          # video: first frame
        latent = latent[0]
    c = latent.shape[-1]
    rng = np.random.default_rng(42)
    proj = rng.standard_normal((c, 3)).astype(np.float32)
    proj /= np.linalg.norm(proj, axis=0, keepdims=True)
    img = latent @ proj
    lo, hi = img.min(), img.max()
    img = (img - lo) / max(hi - lo, 1e-6)
    return (img * 255).astype(np.uint8)


def dump_training_batch(data: dict, batch: dict, debug_dir: str,
                        global_step: int) -> None:
    """Write the reference's debug artifacts for sample 0 of the batch.

    `data` is the predict() output dict (predicted/target/noisy_latent_image
    etc. as host arrays)."""
    from PIL import Image

    out_dir = os.path.join(debug_dir, "training_batches")
    os.makedirs(out_dir, exist_ok=True)

    def save(name: str, latent):
        if latent is None:
            return
        arr = np.asarray(latent)
        if arr.ndim >= 4:
            arr = arr[0]
        Image.fromarray(_project_latent_to_image(arr)).save(
            os.path.join(out_dir, f"{name}-{global_step:07}.png"))

    save("1-noise", data.get("target"))
    save("2-noisy_image", data.get("noisy_latent_image"))
    save("3-predicted", data.get("predicted"))
    save("5-image", data.get("scaled_latent_image"))
    if "latent_mask" in batch:
        save("6-mask", batch["latent_mask"])
    tokens = batch.get("tokens", batch.get("tokens_1"))
    if tokens is not None:
        with open(os.path.join(out_dir, f"7-prompt-{global_step:07}.txt"),
                  "w") as f:
            f.write(" ".join(str(t) for t in np.asarray(tokens)[0].tolist()))
