"""Inpainting sampling inputs: base image + mask loading, mask erosion,
conditioning-image construction, and the FLUX-fill 8×8 mask channel
shuffle (reference: modules/modelSampler/FluxSampler.py:206-325,
modules/dataLoader/flux/ShuffleFluxFillMaskChannels.py:5-30)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def erode_mask(mask: np.ndarray, radius: int = 2) -> np.ndarray:
    """Box-filter the binary mask then threshold at 0.5 — shrinks the
    masked region so seams fall inside it
    (reference: FluxSampler.__create_erode_kernel + :280-281)."""
    size = radius * 2 + 1
    kernel = jnp.ones((size, size, 1, 1), jnp.float32) / (size * size)
    x = jnp.asarray(mask, jnp.float32)[None]          # [1, H, W, 1]
    blurred = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((radius, radius), (radius, radius)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return np.asarray((blurred[0] > 0.5).astype(np.float32))


def load_inpainting_inputs(sample_config, height: int, width: int):
    """-> (image [-1,1] [H,W,3], eroded pixel mask [H,W,1], conditioning
    image = image·(1-mask)). Zeros/ones when sample_inpainting is off
    (the reference feeds a black conditioning image + full mask)."""
    if not sample_config.sample_inpainting:
        image = np.zeros((height, width, 3), np.float32)
        mask = np.ones((height, width, 1), np.float32)
        return image, mask, image
    with Image.open(sample_config.base_image_path) as img:
        image = np.asarray(
            img.convert("RGB").resize((width, height), Image.BILINEAR),
            np.float32) / 255.0
    with Image.open(sample_config.mask_image_path) as img:
        mask = (np.asarray(
            img.convert("L").resize((width, height), Image.BILINEAR),
            np.float32) / 255.0)[..., None]
    mask = erode_mask(mask)
    image = image * 2.0 - 1.0
    conditioning = image * (1.0 - mask)
    return image, mask, conditioning


def downsample_mask(mask: np.ndarray, scale: int) -> np.ndarray:
    """Pixel mask [H,W,1] -> latent-resolution mask (nearest)."""
    h, w = mask.shape[:2]
    pil = Image.fromarray((mask[..., 0] * 255).astype(np.uint8))
    pil = pil.resize((w // scale, h // scale), Image.NEAREST)
    return (np.asarray(pil, np.float32) / 255.0)[..., None]


def flux_fill_mask_channels(mask: np.ndarray, scale: int = 8) -> np.ndarray:
    """Pixel mask [H,W,1] -> [H/8, W/8, 64]: each latent cell carries its
    8×8 pixel-mask patch as channels
    (reference: ShuffleFluxFillMaskChannels.py:5-30; FluxSampler.py:300-316)."""
    h, w = mask.shape[:2]
    gh, gw = h // scale, w // scale
    m = mask[..., 0].reshape(gh, scale, gw, scale)
    return m.transpose(0, 2, 1, 3).reshape(gh, gw, scale * scale)
