"""Generate training masks for a folder (reference: scripts/generate_masks.py):

    python scripts/generate_masks.py --model CLIPSEG --sample-dir data/ \
        --prompts "a person" [--mode fill|replace|add|subtract]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onetrainer_tpu.util.platform import (
    enable_compile_cache, maybe_force_platform,
)
maybe_force_platform()
enable_compile_cache()


def main():
    p = argparse.ArgumentParser(description="Generate masks for a folder")
    p.add_argument("--model", default="CLIPSEG",
                   choices=["CLIPSEG", "REMBG", "REMBG_HUMAN", "COLOR"])
    p.add_argument("--sample-dir", required=True)
    p.add_argument("--prompts", nargs="*", default=[])
    p.add_argument("--mode", default="fill",
                   choices=["fill", "replace", "add", "subtract"])
    p.add_argument("--threshold", type=float, default=0.3)
    p.add_argument("--smooth-pixels", type=int, default=5)
    p.add_argument("--expand-pixels", type=int, default=10)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--color", default="255,255,255",
                   help="target color for COLOR model")
    p.add_argument("--include-subdirectories", action="store_true")
    # reference-CLI compatibility (GenerateCaptionsArgs.py:36-37):
    # tooling models run on CPU torch in this image regardless
    p.add_argument("--device", default="cpu")
    p.add_argument("--dtype", default="FLOAT_16")
    args = p.parse_args()

    from onetrainer_tpu.tooling.mask_models import (
        ClipSegModel, MaskByColor, RembgHumanModel, RembgModel,
    )
    if args.model == "COLOR":
        color = tuple(int(c) for c in args.color.split(","))
        model = MaskByColor(color=color)
    else:
        model = {"CLIPSEG": ClipSegModel, "REMBG": RembgModel,
                 "REMBG_HUMAN": RembgHumanModel}[args.model]()
    model.mask_folder(
        args.sample_dir, args.prompts, args.mode, args.threshold,
        args.smooth_pixels, args.expand_pixels, args.alpha,
        progress_callback=lambda i, n: print(f"\r{i}/{n}", end="", flush=True),
        error_callback=lambda f: print(f"\nfailed: {f}"),
        include_subdirectories=args.include_subdirectories)
    print()


if __name__ == "__main__":
    main()
