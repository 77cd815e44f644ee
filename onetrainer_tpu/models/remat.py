"""Shared gradient-checkpoint (remat) policies for the DiT families.

The reference exposes a per-block on/off switch
(modules/util/checkpointing_util.py enable_checkpointing_for_*); on TPU
the policy *inside* the remat is the lever that matters, because the
backward pass's recompute traffic competes with HBM bandwidth:

- "full": recompute everything (min HBM, max recompute FLOPs)
- "dots": save every matmul output (OOMs at SDXL@1024-class shapes)
- "dots_nb": save matmul outputs with no batch dims — weight-stationary
  contractions only; the big seq×seq buffers still recompute
- "attn": save only the flash-attention outputs (checkpoint_name
  "attn_out" in ops/attention.py) — the backward pass reuses the small
  [B,S,inner] outputs instead of re-running the kernel forward
- "dots_nb_attn": union of "dots_nb" and "attn"

Measured on the v5e (experiments/sweep_log.txt): SDXL's winner is
tx_only ("tx_attn" ties within noise, models/unet.py), SD3's is
dots_nb_attn (2.358 vs full's 2.263 imgs/sec @1024 bs2; plain dots_nb
was never successfully measured at this shape and OOMs — r3 correction).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax

# Production defaults per family: the measured winner on the v5e
# (BASELINE.md / experiments/sweep_log.txt). The io loaders consult this
# when building model configs, so CLI users get the benchmarked policy;
# OT_REMAT_POLICY overrides for experiments (trace-time switch, same
# pattern as OT_SCAN_LAYERS — set before the model loads).
_DEFAULTS = {
    "unet": "tx_only",     # SD1.5/2.x/SDXL: 3.33->3.45 imgs/sec over full
    "sd3": "dots_nb_attn",  # 2.358 vs full's 2.263 @1024 bs2 fp8
    # (r3 correction: "dots_nb" was recorded as 2.395 but that point
    # never actually ran — it OOMs at @1024 bs2 fp8; dots_nb_attn is
    # the measured winner, see sweep_log.txt)
}


def default_policy(family: str) -> str:
    env = os.environ.get("OT_REMAT_POLICY")
    if env:
        return env
    return _DEFAULTS.get(family, "full")


def checkpoint_policy(name: str):
    """Map a policy name to a jax.checkpoint policy (None = full remat)."""
    cp = jax.checkpoint_policies
    if name in ("full", "", None, "none"):
        return None
    if name == "dots":
        return cp.checkpoint_dots
    if name == "dots_nb":
        return cp.checkpoint_dots_with_no_batch_dims
    if name == "attn":
        return cp.save_only_these_names("attn_out")
    if name == "dots_nb_attn":
        return cp.save_from_both_policies(
            cp.checkpoint_dots_with_no_batch_dims,
            cp.save_only_these_names("attn_out"))
    raise ValueError(f"unknown remat policy: {name!r}")


def remat(cls, policy: str = "full", **kwargs):
    """nn.remat with a named checkpoint policy."""
    p = checkpoint_policy(policy)
    if p is None:
        return nn.remat(cls, **kwargs)
    return nn.remat(cls, policy=p, **kwargs)
