"""Attention dispatch: Pallas TPU flash attention for the hot path, XLA
`jax.nn.dot_product_attention` fallback everywhere else.

Replaces what torch SDP / flash-attn wheels provide in the reference
(reference: modules/modelSetup relies on torch sdp via diffusers).
Inputs are [batch, seq, heads*dim] packed; head split/merge happens here so
models stay layout-agnostic.

Dispatch history (measured on the v5e, experiments/exp_flash_d64.py):
- r2 benchmarked the stock kernel with default block sizes and head dims
  padded to 128; XLA's fused attention won 2-3x and flash was demoted to
  an opt-in. Both handicaps were artifacts.
- r3: with block_q=1024 / block_k=512 and padding only to the next
  multiple of 64, flash beats XLA at every self-attention shape that
  matters — SDXL 64x64 level (b2 h10 s4096 d64): fwd 2.9 vs 11.3 ms,
  grad 7.2 vs 19.6 ms (3.9x / 2.7x); SD1.5 (b4 h8 s4096 d40 -> pad 64):
  fwd 3.7 vs 7.4, grad 10.8 vs 21.1. It also never materializes the
  S x S score matrix, cutting the dominant slice of the step's HBM
  traffic (per-HLO attribution: attention was ~300 GB of the SDXL
  step's ~470 GB).
Flash is therefore the DEFAULT on TPU for mask-free self-attention with
seq >= 256 on both sides; OT_NO_FLASH=1 opts out (and OT_FORCE_FLASH=1
still forces it on, for A/B runs). Cross-attention (kv = 77 tokens) and
masked paths stay on XLA.

Zero padding on the head dim changes nothing mathematically (padded
components contribute 0 to q.k and the padded output columns are 0);
sm_scale uses the REAL head dim.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# trace-time dispatch counters (tests assert the flash path is taken for the
# SD hot shapes; incremented when the jitted program is built)
STATS = {"flash": 0, "fallback": 0, "folded": 0}
_WARNED = False

_MAX_FLASH_HEAD_DIM = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seq_pad(s: int) -> int:
    """Padded sequence length for the flash kernel.

    Blocks must divide the padded length, so the pad granularity sets the
    available block sizes. Padding long sequences only to 128 can strand
    them on 128-wide blocks (HunyuanVideo's 9293 -> 9344 divides by
    nothing larger), which measured ~2x slower than the tuned 512/1024
    blocks — so for long sequences pad to a 512 multiple and eat the <10%
    extra masked rows."""
    p = _round_up(s, 128)
    if p >= 2048 and p % 512:
        p = _round_up(s, 512)
    return p


def _can_use_flash(q_len: int, kv_len: int, head_dim: int) -> bool:
    if os.environ.get("OT_NO_FLASH") == "1":
        return False
    if os.environ.get("OT_FORCE_FLASH") == "1":
        pass  # force on (still requires the shape gates below)
    elif jax.default_backend() != "tpu":
        return False
    # ragged lengths (DiT joint sequences: image tokens + text tokens,
    # e.g. SD3's 4096+333) are padded to 128 with segment-id masking
    return (
        q_len >= 256 and kv_len >= 256
        and head_dim <= _MAX_FLASH_HEAD_DIM
    )


@functools.lru_cache(maxsize=8)
def _flash_fn(q_len: int, kv_len: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )
    # tuned on v5e (experiments/exp_flash_d64.py): large q blocks, 512-wide
    # k blocks; the kernel needs block | seq, so take the largest tuned
    # block that divides (aspect-bucketed seqs like 1920 land on 128/256)
    bq = next(b for b in (1024, 512, 256, 128) if q_len % b == 0)
    bk = next(b for b in (512, 256, 128) if kv_len % b == 0)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    return functools.partial(flash_attention, block_sizes=bs)


def dot_product_attention(
        q: jnp.ndarray,  # [B, Sq, H, D]
        k: jnp.ndarray,  # [B, Skv, H, D]
        v: jnp.ndarray,  # [B, Skv, H, D]
        mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-head attention over [B, S, H, D] tensors.

    mask: optional boolean mask. A kv-only keep mask (shape [B,1,1,Skv],
    the text-padding form HunyuanVideo/Sana pass) rides the flash path
    as segment ids; arbitrary [B,H,Sq,Skv] masks fall back to XLA."""
    global _WARNED
    b, sq, h, d = q.shape
    skv = k.shape[1]
    kv_keep = None
    if mask is not None and mask.ndim == 4 and mask.shape[1] == 1 \
            and mask.shape[2] == 1:
        kv_keep = mask[:, 0, 0, :].astype(bool)        # [B, Skv]
    dpad = _folded_pad_dim(d)
    if (mask is None or kv_keep is not None) and dpad is not None \
            and _use_folded(sq, skv, d, h, dpad):
        # fold back to packed [B, S, H*D]: when the caller produced q/k/v
        # by reshaping a packed projection output (every DiT family), the
        # reshape pairs cancel in XLA's algebraic simplifier and the
        # 64-lane-minor 4-D tensors never exist in HBM. Off-slot head
        # dims (SD1.5's 40/80) zero-pad each head to its 64/128 slot
        # first — exact: pad lanes of q/k are zero so scores are
        # unchanged, pad lanes of v/o are zero so the slice below drops
        # only zeros, and every pad-lane gradient is zero because its
        # dot partner (k, q, or the sliced-off do lanes) is zero.
        try:
            if dpad != d:
                pad4 = ((0, 0), (0, 0), (0, 0), (0, dpad - d))
                out = _attention_folded(
                    jnp.pad(q, pad4).reshape(b, sq, h * dpad),
                    jnp.pad(k, pad4).reshape(b, skv, h * dpad),
                    jnp.pad(v, pad4).reshape(b, skv, h * dpad),
                    h, kv_keep, sm_scale=1.0 / (d ** 0.5))
                return out.reshape(b, sq, h, dpad)[..., :d]
            out = _attention_folded(
                q.reshape(b, sq, h * d), k.reshape(b, skv, h * d),
                v.reshape(b, skv, h * d), h, kv_keep)
            return out.reshape(b, sq, h, d)
        except Exception as e:
            if not _WARNED:
                _WARNED = True
                print(f"folded flash fell back: {type(e).__name__}: {e}")
    if (mask is None or kv_keep is not None) and _can_use_flash(sq, skv, d):
        try:
            # pad only to the next multiple of 64 (the kernel handles
            # d=64 natively; the old pad-to-128 doubled the MXU work)
            dp = _round_up(d, 64)
            sqp = _seq_pad(sq)
            skvp = _seq_pad(skv)
            qp = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, 0), (0, dp - d)))
            kp = jnp.pad(k, ((0, 0), (0, skvp - skv), (0, 0), (0, dp - d)))
            vp = jnp.pad(v, ((0, 0), (0, skvp - skv), (0, 0), (0, dp - d)))
            segment_ids = None
            if sqp != sq or skvp != skv or kv_keep is not None:
                # segment 1 = excluded: the ragged-pad tail, plus any kv
                # the caller's keep mask drops (text padding). Real q rows
                # are segment 0 and only attend segment-0 kv; padded q
                # rows attend the pad segment and are sliced off below
                from jax.experimental.pallas.ops.tpu.flash_attention import (
                    SegmentIds,
                )
                q_seg = jnp.broadcast_to(
                    (jnp.arange(sqp) >= sq).astype(jnp.int32)[None], (b, sqp))
                kv_pad = jnp.broadcast_to(
                    (jnp.arange(skvp) >= skv)[None], (b, skvp))
                if kv_keep is not None:
                    kv_drop = jnp.pad(~kv_keep, ((0, 0), (0, skvp - skv)),
                                      constant_values=True) | kv_pad
                else:
                    kv_drop = kv_pad
                segment_ids = SegmentIds(q=q_seg,
                                         kv=kv_drop.astype(jnp.int32))
            out = _flash_fn(sqp, skvp)(
                qp.transpose(0, 2, 1, 3),
                kp.transpose(0, 2, 1, 3),
                vp.transpose(0, 2, 1, 3),
                causal=False,
                segment_ids=segment_ids,
                sm_scale=1.0 / (d ** 0.5),   # scale by the REAL head dim
            )
            out = out.transpose(0, 2, 1, 3)
            out = out[:, :sq, :, :d]
            # name the (small) attention output so remat policies can save
            # it and skip re-running the kernel in the backward pass
            # ("tx_attn" policy, models/unet.py:_remat)
            out = checkpoint_name(out, "attn_out")
            STATS["flash"] += 1
            return out
        except Exception as e:
            # NEVER silent: a trace-time failure here once disabled flash
            # for whole benchmark runs (jax.ad_checkpoint attr access,
            # r3) — warn once so dispatch regressions are visible
            if not _WARNED:
                _WARNED = True
                print(f"flash attention fell back to XLA: "
                      f"{type(e).__name__}: {e}")
    STATS["fallback"] += 1
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def _folded_pad_dim(head_dim: int) -> int | None:
    """The 64/128-lane slot a head dim folds into, or None if none fits.
    Exact slots (64/128) fold for free; off-slot dims <= 128 (SD1.5's
    40 and 80) zero-pad — the same MXU inflation the stock flash path
    already pays via its pad-to-64, but without its [B,H,S,dp] HBM
    layout."""
    if head_dim in (64, 128):
        return head_dim
    if head_dim <= 64:
        return 64
    if head_dim <= 128:
        return 128
    return None


# Folded sequence cap: the forward and dq kernels keep the FULL kv
# sequence resident in VMEM (k + v blocks: 2 * skv * 128 lanes * 2 B =
# skv * 512 B -> 8.4 MB at 16384 tokens, plus q/acc blocks), so beyond
# ~16k tokens they would need a kv-streaming forward that does not exist
# yet. The dk/dv backward auto-switches to the q-streaming kernel above
# _DKV_RESIDENT_MAX_SEQ (flash_folded.py), which removed the old 6144
# cap (r4's resident-dkv VMEM limit).
_FOLDED_MAX_SEQ = 16384


def _use_folded(sq: int, skv: int, head_dim: int,
                num_heads: int | None = None,
                pad_dim: int | None = None) -> bool:
    """Folded-layout kernel dispatch (ops/flash_folded.py): keeps q/k/v/o
    in [B, S, H*dp] HBM form so no 64-lane-minor tensor (2x tile padding
    + XLA remat-compression copies, BASELINE.md 2026-08-18) ever
    materializes.

    Measured r4 (experiments/exp_flash_folded.py + bench headline A/B):
    d=64 wins everywhere — SDXL step 4.548 -> 5.008 imgs/sec (+10%,
    -101 GB/step), SD3-shape grads -19% — so d=64 is the DEFAULT on TPU
    (OT_NO_FLASH_FOLDED=1 opts out). r5 flips exact d=128 to default ON
    too, on the late-r4 device micro A/Bs vs the stock per-head path
    (experiments/exp_flash_folded.py, 2026-08-20): HunyuanVideo shape
    b1 h24 s9728 d128 — folded grad 37.6 vs 41.8 ms (-10%), fwd 10.59
    vs 11.26, via the q-streaming dkv kernel that lifted the old
    s<=6144 resident-VMEM cap; FLUX shape b1 h24 s4608 d128 — grad
    10.80 vs 12.16 (-11%), fwd 3.51 vs 3.60. Off-slot dims padded to
    the 128 slot (d=80) remain opt-in (OT_FLASH_FOLDED=1) — the 60%
    MXU pad inflation there is unmeasured."""
    if os.environ.get("OT_NO_FLASH") == "1" \
            or os.environ.get("OT_NO_FLASH_FOLDED") == "1":
        return False
    slot = pad_dim if pad_dim is not None else head_dim
    if slot != head_dim:
        if os.environ.get("OT_NO_FLASH_FOLDED_PAD") == "1":
            return False   # opt-out for padded head dims (default ON for
            # the 64 slot after the device A/B: SD1.5 LoRA stage 32.25 ->
            # 34.58 imgs/sec (+7.2%) — the pad's extra MXU FLOPs cost
            # less than the stock path's [B,H,S,dp] HBM layout.
        if slot == 128 and os.environ.get("OT_FLASH_FOLDED") != "1":
            return False   # padded-to-128 (d=80): unmeasured, opt-in
    if slot not in (64, 128):
        return False
    if num_heads is not None and num_heads % (128 // slot):
        return False   # head groups must fill a 128-lane block
    if not (os.environ.get("OT_FORCE_FLASH") == "1"
            or jax.default_backend() == "tpu"):
        return False
    return 256 <= sq <= _FOLDED_MAX_SEQ and 256 <= skv <= _FOLDED_MAX_SEQ


def _attention_folded(q, k, v, num_heads, kv_keep, sm_scale=None):
    """Pad folded tensors along S only (no tile padding) and run the
    folded flash kernel. q pad rows are zeros and stay unmasked — see
    ops/flash_folded.py docstring for why that is safe. sm_scale
    defaults to 1/sqrt(inner/num_heads); padded-head callers pass the
    REAL head dim's scale."""
    from onetrainer_tpu.ops.flash_folded import flash_attention_folded

    b, sq, inner = q.shape
    skv = k.shape[1]
    head_dim = inner // num_heads
    sqp = _seq_pad(sq)
    skvp = _seq_pad(skv)
    qp = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, skvp - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skvp - skv), (0, 0)))
    keep = None
    if skvp != skv or kv_keep is not None:
        keep = jnp.broadcast_to((jnp.arange(skvp) < skv)[None], (b, skvp))
        if kv_keep is not None:
            keep = keep & jnp.pad(kv_keep, ((0, 0), (0, skvp - skv)))
    # r5 corrected-timer block sweep (exp_folded_blocks.py, sweep_log
    # 2026-08-21, 64-lane shapes): block_k=1024 wins at both measured
    # shapes (s=4096 grad 10.96 vs 11.52 ms, fwd 3.94 vs 4.52; s=1024
    # grad 2.53 vs 2.79) and block_q=512 wins for long sequences while
    # short ones keep the whole row in one block; 2048-wide q blocks
    # exceed VMEM. d=128 slots keep the conservative blocks (unswept —
    # the streaming-dkv VMEM budget is tighter).
    lanes = 64 if head_dim <= 64 else 128
    if lanes == 64 and sqp > 2048:
        bq = 512
    else:
        bq = next(x for x in (1024, 512, 256, 128) if sqp % x == 0)
    bk_pref = (1024, 512, 256, 128) if lanes == 64 else (512, 256, 128)
    bk = next(x for x in bk_pref if skvp % x == 0)
    out = flash_attention_folded(
        qp, kp, vp, num_heads,
        sm_scale=(1.0 / (head_dim ** 0.5)) if sm_scale is None else sm_scale,
        kv_keep=keep, block_q=bq, block_k=bk)
    out = out[:, :sq, :]
    STATS["folded"] += 1
    return checkpoint_name(out, "attn_out")


def attention(
        q: jnp.ndarray,  # [B, Sq, H*D]
        k: jnp.ndarray,  # [B, Skv, H*D_kv] (same inner dim)
        v: jnp.ndarray,
        num_heads: int,
        mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Packed multi-head attention: split heads, attend, merge heads.

    When the folded kernel applies (TPU, head_dim multiple of 64, long
    self-attention, mask absent or kv-keep-shaped), the head split never
    happens in HBM at all — the packed [B, S, H*D] tensors feed
    ops/flash_folded.py directly."""
    b, sq, inner = q.shape
    head_dim = inner // num_heads
    kv_keep = None
    if mask is not None and mask.ndim == 4 and mask.shape[1] == 1 \
            and mask.shape[2] == 1:
        kv_keep = mask[:, 0, 0, :].astype(bool)
    if (mask is None or kv_keep is not None) \
            and _use_folded(sq, k.shape[1], head_dim, num_heads):
        try:
            return _attention_folded(q, k, v, num_heads, kv_keep)
        except Exception as e:
            global _WARNED
            if not _WARNED:
                _WARNED = True
                print(f"folded flash fell back: {type(e).__name__}: {e}")
    q = q.reshape(b, sq, num_heads, head_dim)
    k = k.reshape(b, k.shape[1], num_heads, head_dim)
    v = v.reshape(b, v.shape[1], num_heads, head_dim)
    out = dot_product_attention(q, k, v, mask=mask)
    return out.reshape(b, sq, inner)
