"""The training data loader: scan → bucket → (cache) → batch → prefetch.

Replaces the mgds graph + TrainDataLoader
(reference: modules/dataLoader/*, SURVEY.md §2.10). Differences by design:
- batches are static-shaped per bucket (one XLA program per resolution)
- cache fill is a jitted VAE/TE encode pass batched per bucket
- determinism: every random decision derives from
  (config seed, concept seed, image index, epoch, variation), so
  epoch/sample resume reproduces the reference's dataset-position resume
  (reference: DataLoaderMgdsMixin initial_epoch/initial_epoch_sample)
"""

from __future__ import annotations

import functools
import os
import queue
import threading
import time
import zlib
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
from PIL import Image, ImageOps

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.data.augments import augment_image, augment_text
from onetrainer_tpu.data.bucketing import (
    assign_bucket, parse_resolutions, possible_resolutions, scale_crop,
    sort_into_batches,
)
from onetrainer_tpu.data.cache import DiskCache
from onetrainer_tpu.data.concepts import (
    SUPPORTED_VIDEO_EXTENSIONS, SampleEntry, balance_entries, scan_concepts,
)
from onetrainer_tpu.util.enums import ConceptType


def load_image_rgb(path: str) -> np.ndarray:
    with Image.open(path) as img:
        # honor EXIF orientation like the reference's load_image
        # (modules/util/image_util.py:4-9 exif_transpose) -- phone/camera
        # photos otherwise train sideways
        img = ImageOps.exif_transpose(img)
        return np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0


def retry_transport(fn: Callable, attempts: int = 4,
                    base_delay: float = 5.0) -> Callable:
    """Retry a device call on transient remote-transport failures.

    Long cache-fill passes make thousands of small device calls; a single
    dropped connection to the remote execution service (surfacing as
    UNAVAILABLE / "Broken pipe" / network errors) would otherwise kill the
    whole training run at a point where a retry is cheap — the compile
    cache makes re-dispatch nearly free. Real device OOMs
    (RESOURCE_EXHAUSTED) are NOT retried; `_safe_encode` handles those by
    splitting the batch. The reference's torch loaders run the encoders
    in-process and have no equivalent failure mode."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        delay = base_delay
        for attempt in range(attempts):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — filtered by message below
                msg = str(e)
                transient = ("UNAVAILABLE" in msg or "Broken pipe" in msg
                             or "Network Error" in msg
                             or "Connection reset" in msg)
                if not transient or attempt == attempts - 1:
                    raise
                time.sleep(delay)
                delay *= 2
        raise AssertionError("unreachable")
    return wrapped


_EXIF_ORIENTATION = 0x0112
_EXIF_SWAPS_WH = {5, 6, 7, 8}


def probe_image_size(img: Image.Image) -> tuple[int, int]:
    """(w, h) after EXIF orientation, without decoding pixels -- the
    aspect-bucket probe must agree with load_image_rgb's transpose."""
    w, h = img.size
    try:
        if img.getexif().get(_EXIF_ORIENTATION, 1) in _EXIF_SWAPS_WH:
            w, h = h, w
    except Exception:
        pass
    return w, h


def load_video_frames(path: str, n_frames: int,
                      rng: np.random.Generator) -> np.ndarray:
    """Sample `n_frames` consecutive frames from a deterministic random
    start (reference: mgds LoadVideo target_frame_count semantics)."""
    import cv2
    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
    # always draw once so per-frame augmentation rngs stay aligned
    draw = int(rng.integers(0, 1 << 30))
    start = draw % (total - n_frames + 1) if total > n_frames else 0
    cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    frames = []
    for _ in range(n_frames):
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                      .astype(np.float32) / 255.0)
    cap.release()
    if not frames:
        raise OSError(f"could not read frames from {path}")
    while len(frames) < n_frames:
        frames.append(frames[-1])
    return np.stack(frames)


def load_mask(path: str) -> np.ndarray:
    with Image.open(path) as img:
        img = ImageOps.exif_transpose(img)
        return (np.asarray(img.convert("L"), dtype=np.float32) / 255.0)[..., None]


def resize_crop(image: np.ndarray, info) -> np.ndarray:
    sh, sw = info.scale
    pil = Image.fromarray((image * 255).astype(np.uint8).squeeze()
                          if image.shape[-1] == 1 else (image * 255).astype(np.uint8))
    pil = pil.resize((sw, sh), Image.BILINEAR)
    arr = np.asarray(pil, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    top, left = info.crop_offset
    bh, bw = info.bucket
    return arr[top:top + bh, left:left + bw]


@dataclass
class PreparedSample:
    entry_index: int
    image_variation: int
    text_variation: int
    bucket: tuple[int, int]
    frames: int = 1
    cache_key: str | None = None
    epoch: int = 0


class Text2ImageDataLoader:
    """Generic text→image loader; family loaders supply the encode fns.

    encode_images(images float32 NHWC [-1,1]) -> dict of numpy arrays
        (e.g. {'latent_image': mean, 'latent_logvar': logvar}); called in
        bucket-sized batches during cache fill (jitted VAE encode).
    encode_text(prompt str) -> dict of numpy arrays
        (e.g. {'tokens': ids} or {'text_encoder_hidden_state': ...}).
    """

    def __init__(
            self,
            config: TrainConfig,
            encode_images: Callable[[np.ndarray], dict],
            encode_text: Callable[[str], dict],
            quantization: int = 8,
            include_validation: bool = False,
            encode_batch_size: int = 8,
            model_tag: str = "sd",
            latent_scale: int = 8,
            conditioning_image: bool = False,
            fill_mask_channels: bool = False,
            video_mode: bool = False,
            cache_pixels: bool = False,
            depth_fn=None,
    ):
        self.latent_scale = latent_scale
        # inpainting models: generate a masked conditioning image per sample
        # (image with the masked region blanked; a -condlabel file wins —
        # reference: mgds GenerateMaskedConditioningImage + SelectFirstInput)
        self.conditioning_image = conditioning_image
        # FLUX-fill: the latent mask carries the 8x8 pixel-mask patch as 64
        # channels per latent cell instead of a downsampled single channel
        # (reference: modules/dataLoader/flux/ShuffleFluxFillMaskChannels.py)
        self.fill_mask_channels = fill_mask_channels
        # video families: sample config.frames consecutive frames per video
        # file; images stay 1-frame clips (reference: mgds LoadVideo +
        # ImageToVideo, HunyuanVideoBaseDataLoader)
        self.video_mode = video_mode
        self.frames = max(int(float(config.frames or 1)), 1) if video_mode else 1
        # VAE fine-tune: the step needs the original pixels as the target
        # (reference: StableDiffusionFineTuneVaeSetup.predict uses
        # batch['image'])
        self.cache_pixels = cache_pixels
        # SD-2.0-depth: cache-time depth maps -> latent_depth channel
        # (reference: StableDiffusionBaseDataLoader.py:74-106; data/depth.py)
        self.depth_fn = depth_fn
        self.config = config
        self.encode_images = retry_transport(encode_images)
        self.encode_text = retry_transport(encode_text)
        self.encode_batch_size = encode_batch_size

        concepts = config.concepts or []
        self.entries: list[SampleEntry] = scan_concepts(
            concepts,
            masked_training=config.masked_training or config.model_type.has_mask_input(),
            custom_conditioning_image=config.custom_conditioning_image,
            include_validation=include_validation,
            allow_videos=video_mode,
        )
        if not self.entries and not include_validation:
            # fail loudly: a loader with no samples would otherwise "train"
            # zero steps per epoch and silently save an untrained model
            paths = [c.path for c in concepts if getattr(c, "enabled", True)]
            raise ValueError(
                "no training samples found; check concept paths "
                f"(concepts={len(concepts)}, enabled paths={paths}). If the "
                "config JSON came from to_settings_dict, concepts live in "
                "the separate concept_file_name file.")

        self.resolutions = parse_resolutions(config.resolution)
        self.buckets: list[tuple[int, int]] = []
        for (th, tw) in self.resolutions:
            if config.aspect_ratio_bucketing:
                self.buckets.extend(possible_resolutions(th, tw, quantization))
            else:
                self.buckets.append((th, tw))
        self.buckets = sorted(set(self.buckets))

        # probe image sizes once (header read only)
        self._sizes: list[tuple[int, int]] = []
        for e in self.entries:
            try:
                if self._is_video(e.image_path):
                    import cv2
                    cap = cv2.VideoCapture(e.image_path)
                    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                    cap.release()
                    if not (w and h):
                        raise OSError(e.image_path)
                else:
                    with Image.open(e.image_path) as img:
                        w, h = probe_image_size(img)
            except OSError:
                w = h = max(self.resolutions[0]) if self.resolutions else 512
            self._sizes.append((h, w))

        self.cache = None
        if config.latent_caching:
            self.cache = DiskCache(config.cache_dir, model_tag)
            if config.clear_cache_before_training and os.path.isdir(config.cache_dir):
                # keys hash config so stale entries are unused anyway, but
                # honor the flag: reclaim the disk space
                # (reference: TrainConfig.clear_cache_before_training)
                self.cache.clear()

        self._threads = max(int(config.dataloader_threads or 1), 1)

        # RandomLatentMaskRemove: for mask-input model types, each sample
        # trains fully unmasked with probability config.unmasked_probability
        # — latent_mask becomes all-ones and the inpainting conditioning
        # latent becomes the encode of a fully-blanked image (reference:
        # DataLoaderText2ImageMixin.py:270-289 gates the mgds
        # RandomLatentMaskRemove module on model_type.has_mask_input()).
        self.mask_remove_probability = (
            float(config.unmasked_probability or 0.0)
            if config.model_type.has_mask_input() else 0.0)
        self._blank_cond_latents: dict[tuple, np.ndarray] = {}

    # -- epoch plan -------------------------------------------------------------

    def _epoch_rng(self, epoch: int) -> np.random.Generator:
        # stable across processes (python's str hash is salted per process;
        # crc32 is not) — deterministic resume depends on this
        return np.random.default_rng([zlib.crc32(b"epoch"), int(epoch)])

    def plan_epoch(self, epoch: int) -> list[PreparedSample]:
        rng = self._epoch_rng(epoch)
        index_list = balance_entries(self.entries, rng)

        samples = []
        for idx in index_list:
            e = self.entries[idx]
            image_variation = epoch % max(e.concept.image_variations, 1)
            text_variation = epoch % max(e.concept.text_variations, 1)
            h, w = self._sizes[idx]
            # per-concept resolution override
            if e.concept.image.enable_resolution_override:
                res = parse_resolutions(e.concept.image.resolution_override)
                buckets = []
                for (th, tw) in res:
                    if self.config.aspect_ratio_bucketing:
                        buckets.extend(possible_resolutions(th, tw, 8))
                    else:
                        buckets.append((th, tw))
            else:
                buckets = self.buckets
            bucket = assign_bucket(h, w, buckets)
            n_frames = self.frames if self._is_video(e.image_path) else 1
            samples.append(PreparedSample(
                entry_index=idx, image_variation=image_variation,
                text_variation=text_variation, bucket=bucket,
                frames=n_frames, epoch=epoch))
        return samples

    @staticmethod
    def _is_video(path: str) -> bool:
        return os.path.splitext(path)[1].lower() in SUPPORTED_VIDEO_EXTENSIONS

    def batches_for_epoch(self, epoch: int) -> list[list[PreparedSample]]:
        samples = self.plan_epoch(epoch)
        rng = self._epoch_rng(epoch * 2 + 1)
        batch_idx = sort_into_batches(
            [(s.bucket, s.frames) for s in samples],
            self.config.batch_size, rng)
        return [[samples[i] for i in batch] for batch in batch_idx]

    def __len__(self):
        # approximate steps per epoch (bucketing may drop incomplete batches)
        return max(len(self.plan_epoch(0)) // max(self.config.batch_size, 1), 1)

    # -- sample materialization ---------------------------------------------------

    def _sample_rng(self, entry: SampleEntry, variation: int) -> np.random.Generator:
        return np.random.default_rng(
            [entry.concept.seed % (2**31),
             zlib.crc32(entry.image_path.encode("utf-8")),
             variation])

    def _load_pixels(self, sample: PreparedSample):
        e = self.entries[sample.entry_index]
        rng = self._sample_rng(e, sample.image_variation)
        if sample.frames > 1 or (self.video_mode and self._is_video(e.image_path)):
            return self._load_video_pixels(sample, e, rng)
        image = load_image_rgb(e.image_path)
        mask = load_mask(e.mask_path) if e.mask_path else None
        image, mask = augment_image(image, e.concept, rng, mask)
        info = scale_crop(image.shape[0], image.shape[1], sample.bucket,
                          e.concept.image.enable_crop_jitter, rng)
        image = resize_crop(image, info)
        if mask is None:
            mask = np.ones(image.shape[:2] + (1,), np.float32)
        else:
            mask = resize_crop(mask, info)
        return image * 2.0 - 1.0, mask, info

    def _load_video_pixels(self, sample: PreparedSample, e, rng):
        """[F, H, W, 3] clip in [-1, 1]; identical augmentation/crop per
        frame (fresh identically-seeded rng per frame)."""
        video = load_video_frames(e.image_path, sample.frames, rng)
        out_frames = []
        info = None
        for frame in video:
            frng = self._sample_rng(e, sample.image_variation)
            frng.integers(0, 1 << 30)   # consume the start-frame draw
            img, _ = augment_image(frame, e.concept, frng, None)
            info = scale_crop(img.shape[0], img.shape[1], sample.bucket,
                              e.concept.image.enable_crop_jitter, frng)
            out_frames.append(resize_crop(img, info))
        clip = np.stack(out_frames)
        mask = np.ones(clip.shape[1:3] + (1,), np.float32)
        return clip * 2.0 - 1.0, mask, info

    def _conditioning_pixels(self, sample: PreparedSample,
                             image: np.ndarray, mask: np.ndarray,
                             info) -> np.ndarray | None:
        if not self.conditioning_image:
            return None
        e = self.entries[sample.entry_index]
        if e.cond_path:
            cond = load_image_rgb(e.cond_path)
            cond = resize_crop(cond, info)
            return cond * 2.0 - 1.0
        # image already in [-1,1]; blank the masked (to-inpaint) region
        return image * (1.0 - mask)

    def _prompt(self, sample: PreparedSample) -> str:
        e = self.entries[sample.entry_index]
        rng = self._sample_rng(e, 1000 + sample.text_variation)
        prompt = e.prompt(rng)
        return augment_text(prompt, e.concept, rng)

    def _cache_extra(self, sample: PreparedSample) -> dict:
        e = self.entries[sample.entry_index]
        return {
            "bucket": sample.bucket,
            "frames": sample.frames,
            "text_variation": sample.text_variation,
            "aug": e.concept.image.to_dict(),
            "text": e.concept.text.to_dict(),
            # cached TE states bake in the hidden-state layer skips —
            # changing a skip must invalidate the text cache
            "te_skips": [
                int(getattr(self.config, k, 0) or 0)
                for k in ("text_encoder_layer_skip",
                          "text_encoder_2_layer_skip",
                          "text_encoder_3_layer_skip",
                          "text_encoder_4_layer_skip")],
        }

    def _blank_cond_latent(self, bucket: tuple[int, int]) -> np.ndarray:
        """Encode-of-zeros conditioning latent for one bucket, memoized
        (RandomLatentMaskRemove replacement conditioning)."""
        blank = self._blank_cond_latents.get(bucket)
        if blank is None:
            h, w = bucket
            blank = np.asarray(self.encode_images(
                np.zeros((1, h, w, 3), np.float32))["latent_image"][0])
            self._blank_cond_latents[bucket] = blank
        return blank

    def _safe_encode(self, images: np.ndarray) -> dict:
        """encode_images with device-OOM fallback: halve the batch and
        concatenate. The resolution-scaled chunk in ensure_cached usually
        avoids this; the fallback keeps cache fill alive when the resident
        train model leaves less HBM headroom than the scaled chunk assumes.
        Per-image VAE encode has no cross-batch ops, so splitting is exact."""
        try:
            return self.encode_images(images)
        except Exception as e:   # device OOM surfaces as JaxRuntimeError
            msg = str(e)
            oom = ("RESOURCE_EXHAUSTED" in msg or "ResourceExhausted" in msg
                   or "Ran out of memory" in msg)
            if images.shape[0] <= 1 or not oom:
                raise
        half = images.shape[0] // 2
        a = self._safe_encode(images[:half])
        b = self._safe_encode(images[half:])
        return {k: np.concatenate([np.asarray(a[k]), np.asarray(b[k])])
                for k in a}

    def ensure_cached(self, batches: list[list[PreparedSample]],
                      on_progress: Callable[[int, int], None] | None = None):
        """Cache-fill pass: encode any missing samples, bucket-batched."""
        # precompute the mask-removal blank conditioning latents here, at
        # cache-fill time — computing them lazily inside the training
        # prefetch would stall the step loop on a fresh batch-1 VAE
        # compile the first time each bucket draws a removal
        if self.mask_remove_probability > 0 and self.conditioning_image:
            for bucket in {s.bucket for batch in batches for s in batch}:
                self._blank_cond_latent(bucket)
        if self.cache is None:
            return
        missing: list[PreparedSample] = []
        for batch in batches:
            for s in batch:
                e = self.entries[s.entry_index]
                key = self.cache.key(e.image_path, s.image_variation,
                                     self._cache_extra(s))
                s.cache_key = key
                if not self.cache.has(key):
                    missing.append(s)
        # group by (bucket, frames) for static-shape encode batches
        by_bucket: dict = {}
        for s in missing:
            by_bucket.setdefault((s.bucket, s.frames), []).append(s)
        done = 0
        total = len(missing)
        pool = ThreadPoolExecutor(self._threads) if self._threads > 1 else None
        for bucket, group in by_bucket.items():
            # encode_batch_size is a 512px-equivalent budget: VAE-encode
            # activations grow with pixel count, and the full train model
            # is already resident during cache fill, so a fixed chunk that
            # fits @512 OOMs a 16 GB chip @1024 (4x the pixels). Scale per
            # bucket; _safe_encode halves further on a real OOM.
            (bh, bw), bframes = bucket
            eff = max(1, (self.encode_batch_size * 512 * 512)
                      // (bh * bw * max(bframes, 1)))
            for i in range(0, len(group), eff):
                chunk = group[i:i + eff]
                # decode/augment in parallel (config.dataloader_threads);
                # PIL decode releases the GIL so threads scale
                if pool is not None:
                    loaded = list(pool.map(self._load_pixels, chunk))
                else:
                    loaded = [self._load_pixels(s) for s in chunk]
                pixels, masks, infos, conds = [], [], [], []
                for s, (img, mask, info) in zip(chunk, loaded):
                    pixels.append(img)
                    masks.append(mask)
                    infos.append(info)
                    conds.append(self._conditioning_pixels(s, img, mask, info))
                encoded = self._safe_encode(np.stack(pixels))
                encoded_cond = None
                if self.conditioning_image:
                    encoded_cond = self._safe_encode(np.stack(conds))
                depth = None
                if self.depth_fn is not None:
                    depth = self.depth_fn(np.stack(pixels))
                for j, s in enumerate(chunk):
                    tensors = {k: np.asarray(v[j]) for k, v in encoded.items()}
                    if self.cache_pixels:
                        tensors["image"] = np.asarray(pixels[j], np.float32)
                    tensors["latent_mask"] = self._latent_mask(masks[j])
                    if depth is not None:
                        tensors["latent_depth"] = np.asarray(depth[j])
                    tensors.update(self._crop_metadata(s, infos[j]))
                    if encoded_cond is not None:
                        tensors["latent_conditioning_image"] = \
                            np.asarray(encoded_cond["latent_image"][j])
                    text = self.encode_text(self._prompt(s))
                    tensors.update({k: np.asarray(v) for k, v in text.items()})
                    self.cache.save(s.cache_key, tensors)
                done += len(chunk)
                if on_progress:
                    on_progress(done, total)
        if pool is not None:
            pool.shutdown()

    def _crop_metadata(self, sample: PreparedSample, info) -> dict:
        """SDXL micro-conditioning inputs (original size, crop offset,
        target size — reference: BaseStableDiffusionXLSetup.py:241-267)."""
        h, w = self._sizes[sample.entry_index]
        return {
            "original_resolution": np.asarray([h, w], np.int32),
            "crop_offset": np.asarray(info.crop_offset, np.int32),
            "crop_resolution": np.asarray(info.bucket, np.int32),
        }

    def _latent_mask(self, mask: np.ndarray) -> np.ndarray:
        if self.fill_mask_channels:
            from onetrainer_tpu.sampling.inpaint import flux_fill_mask_channels
            return flux_fill_mask_channels(mask, int(self.latent_scale))
        h, w = mask.shape[:2]
        s = self.latent_scale   # may be fractional (Würstchen: 128/3)
        pil = Image.fromarray((mask[..., 0] * 255).astype(np.uint8))
        pil = pil.resize((int(round(w / s)), int(round(h / s))), Image.NEAREST)
        return (np.asarray(pil, np.float32) / 255.0)[..., None]

    # -- batch materialization ------------------------------------------------------

    def _maybe_remove_mask(self, sample: PreparedSample, row: dict) -> dict:
        """RandomLatentMaskRemove: with mask_remove_probability the sample
        trains fully unmasked — all-ones latent mask, blank conditioning
        latent (encode of image*(1-mask) with mask=1 → zeros image). Drawn
        deterministically per (epoch, image, variation) AFTER the disk
        cache, so the cached latents stay shared across the decision, like
        the reference's post-DiskCache pipeline placement
        (DataLoaderText2ImageMixin.py:270-289)."""
        p = self.mask_remove_probability
        if p <= 0 or "latent_mask" not in row:
            return row
        e = self.entries[sample.entry_index]
        rng = np.random.default_rng([
            zlib.crc32(b"mask_remove"),
            zlib.crc32(e.image_path.encode("utf-8")),
            int(sample.epoch), int(sample.image_variation)])
        if rng.random() >= p:
            return row
        h, w = sample.bucket
        row = dict(row)
        row["latent_mask"] = self._latent_mask(
            np.ones((h, w, 1), np.float32)).astype(row["latent_mask"].dtype)
        if "latent_conditioning_image" in row:
            row["latent_conditioning_image"] = self._blank_cond_latent(
                (h, w)).astype(row["latent_conditioning_image"].dtype)
        return row

    def materialize_batch(self, batch: list[PreparedSample]) -> dict:
        if self.cache is not None and self._threads > 1 and len(batch) > 1:
            # parallel cache reads (file IO releases the GIL)
            def load_row(s: PreparedSample):
                e = self.entries[s.entry_index]
                if s.cache_key is None:
                    s.cache_key = self.cache.key(
                        e.image_path, s.image_variation, self._cache_extra(s))
                return self.cache.load(s.cache_key)
            with ThreadPoolExecutor(self._threads) as pool:
                rows = list(pool.map(load_row, batch))
            rows = [self._maybe_remove_mask(s, r)
                    for s, r in zip(batch, rows)]
            for s, row in zip(batch, rows):
                e = self.entries[s.entry_index]
                row["loss_weight"] = np.asarray(e.concept.loss_weight, np.float32)
                row["prior_flag"] = np.asarray(
                    1.0 if e.concept.type == ConceptType.PRIOR_PREDICTION else 0.0,
                    np.float32)
            keys = rows[0].keys()
            return {k: np.stack([r[k] for r in rows]) for k in keys}

        rows = []
        for s in batch:
            e = self.entries[s.entry_index]
            if self.cache is not None:
                if s.cache_key is None:
                    s.cache_key = self.cache.key(
                        e.image_path, s.image_variation, self._cache_extra(s))
                row = self.cache.load(s.cache_key)
            else:
                img, mask, info = self._load_pixels(s)
                row = dict(self.encode_images(img[None]))
                row = {k: np.asarray(v[0]) for k, v in row.items()}
                row["latent_mask"] = self._latent_mask(mask)
                row.update(self._crop_metadata(s, info))
                cond = self._conditioning_pixels(s, img, mask, info)
                if cond is not None:
                    row["latent_conditioning_image"] = np.asarray(
                        self.encode_images(cond[None])["latent_image"][0])
                row.update({k: np.asarray(v)
                            for k, v in self.encode_text(self._prompt(s)).items()})
            row = self._maybe_remove_mask(s, row)
            row["loss_weight"] = np.asarray(e.concept.loss_weight, np.float32)
            row["prior_flag"] = np.asarray(
                1.0 if e.concept.type == ConceptType.PRIOR_PREDICTION else 0.0,
                np.float32)
            rows.append(row)

        keys = rows[0].keys()
        return {k: np.stack([r[k] for r in rows]) for k in keys}

    # -- epoch iteration --------------------------------------------------------------

    def iter_epoch(self, epoch: int, start_batch: int = 0,
                   prefetch: int = 2):
        """Yield materialized batches with background prefetch threads."""
        batches = self.batches_for_epoch(epoch)
        self.ensure_cached(batches)
        pending = batches[start_batch:]
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = object()

        def worker():
            try:
                for batch in pending:
                    q.put(self.materialize_batch(batch))
                q.put(stop)
            except BaseException as e:  # propagate to the consumer thread
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
