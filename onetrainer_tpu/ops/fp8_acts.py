"""fp8 activations for the frozen-base matmuls (opt-in, OT_FP8_ACTS).

The post-flash per-HLO byte attribution (BASELINE.md 2026-08-18,
experiments/exp_byte_attr.py) showed the SDXL step is *activation*-
bandwidth-bound: QKV/proj + FF matmul activation edges carry ~350 GB of
the 558 GB step. The frozen base weights are already fp8
(ops/quant.py); this module additionally feeds those dots their
activation operand in fp8, so the HBM intermediate on the producer →
matmul edge is 1 byte/elem instead of 2 when XLA fuses the quantize
into the producer.

Numerics contract (Transformer-Engine-style, but simpler because the
quantized operand's weight is FROZEN — no dW is ever needed):
- forward: y = (x_q · W_q) * (s_x * s_w), e4m3 both operands, f32
  accumulation (`preferred_element_type`). s_x is a dynamic per-tensor
  absmax scale (mode "dynamic"/"1") or 1.0 with saturating cast (mode
  "static" — fuses into the producer with no extra amax pass).
- backward (custom VJP): dx = (g * s_w) @ W_qᵀ computed in f32 from the
  fp8 weight directly — the straight-through derivative of the
  quantizer. Without the custom VJP, JAX would type x_q's cotangent as
  float8_e4m3fn and silently round dL/dx to 4 mantissa bits.
- the LoRA low-rank term, biases, norms and attention stay bf16.

Only Dense layers whose frozen kernel is already a float8_e4m3fn
QuantizedArray take this path (peft/layers.py:_fp8_acts_dot); full
fine-tune (unquantized, trainable) bases are untouched.

reference: modules/module/quantized/LinearFp8.py quantizes WEIGHTS only
(absmax per tensor, dequantize per use) — activation fp8 has no
reference counterpart; it is a TPU bandwidth lever, opt-in and
measured, never default.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

_E4M3_MAX = 448.0

# trace-time dispatch counter (tests assert the fp8 path is taken)
STATS = {"fp8_dot": 0}


def mode() -> str:
    """'' (off), 'dynamic' (per-tensor absmax scale), or 'static'
    (scale 1, saturating cast). Trace-time switch — read when the step
    is traced, like OT_NO_FLASH (ops/attention.py)."""
    m = os.environ.get("OT_FP8_ACTS", "").strip().lower()
    if m in ("", "0", "off", "false", "no", "none"):
        return ""
    if m == "static":
        return "static"
    if m in ("1", "on", "true", "yes", "dynamic"):
        return "dynamic"
    raise ValueError(f"OT_FP8_ACTS={m!r}: use ''/0/off, 1/dynamic, or static")


def _quantize_x(x32: jnp.ndarray, dynamic: bool):
    if dynamic:
        sx = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12) / _E4M3_MAX
        xq = (x32 / sx).astype(jnp.float8_e4m3fn)
    else:
        sx = jnp.float32(1.0)
        xq = jnp.clip(x32, -_E4M3_MAX, _E4M3_MAX).astype(jnp.float8_e4m3fn)
    return xq, sx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fp8_dot(x: jnp.ndarray, wq: jnp.ndarray, wscale: jnp.ndarray,
            dynamic: bool = True) -> jnp.ndarray:
    """x [..., in] (any float dtype) · frozen fp8 kernel wq [in, out]
    (absmax-scaled by scalar wscale) → [..., out] in x.dtype."""
    y, _ = _fp8_dot_fwd(x, wq, wscale, dynamic)
    return y


def _fp8_dot_fwd(x, wq, wscale, dynamic):
    xq, sx = _quantize_x(x.astype(jnp.float32), dynamic)
    y = lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y * (sx * wscale)).astype(x.dtype)
    # residuals: the fp8 weight only — dx never needs x (W is frozen,
    # no dW), so the backward pass is weight-read cheap too
    return y, (wq, wscale, jnp.zeros((), x.dtype))


def _fp8_dot_bwd(dynamic, res, g):
    wq, wscale, xproto = res
    g32 = g.astype(jnp.float32) * wscale
    dx = lax.dot_general(
        g32, wq, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # frozen-base cotangents are zero (LoRA never differentiates the
    # base params; XLA dead-code-eliminates these)
    return (dx.astype(xproto.dtype), jnp.zeros_like(wq),
            jnp.zeros_like(wscale))


fp8_dot.defvjp(_fp8_dot_fwd, _fp8_dot_bwd)
