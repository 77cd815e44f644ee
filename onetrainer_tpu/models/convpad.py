"""Circular conv padding for tileable-texture training.

The reference patches ``padding_mode="circular"`` onto every spatially
padded ``nn.Conv2d`` when ``config.force_circular_padding`` is set
(reference: modules/util/conv_util.py:6-9, applied per family in
``setup_optimizations``, e.g. modules/modelSetup/BaseStableDiffusionSetup.py:51).

Here the equivalent is a process-wide padding-mode switch consulted at
trace time: model code writes ``padding=conv_padding(1)`` instead of
``padding=1``, and the family setup flips the switch from
``config.force_circular_padding`` before the first trace. Because the
switch is read while tracing (not inside compiled code), flipping it
after a step function has been compiled has no effect on that function —
mirroring the reference, which also patches conv modules once at setup.
"""

from __future__ import annotations

_CIRCULAR = False


def set_circular_padding(enabled: bool) -> None:
    """Globally route spatially padded convs to circular padding."""
    global _CIRCULAR
    _CIRCULAR = enabled


def circular_padding_enabled() -> bool:
    return _CIRCULAR


def conv_padding(padding):
    """Padding argument for an ``nn.Conv`` that honors the switch.

    ``padding`` is whatever the call site would pass for ordinary
    zero-padding (int or per-dimension tuples). Stride-2 downsamples keep
    their explicit edge padding even in circular mode only when the
    caller opts out by not using this helper (torch's circular padding
    applies to strided convs as well, so downsamples *do* go through it).
    """
    if _CIRCULAR:
        return "CIRCULAR"
    return padding
