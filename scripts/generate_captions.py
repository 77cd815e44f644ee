"""Caption a dataset folder (reference: scripts/generate_captions.py):

    python scripts/generate_captions.py --model BLIP --sample-dir data/ \
        [--initial-caption ...] [--mode fill|replace|add]
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
    p = argparse.ArgumentParser(description="Generate captions for a folder")
    p.add_argument("--model", default="BLIP", choices=["BLIP", "BLIP2", "WD14_VIT_2"])
    p.add_argument("--model-name", default=None,
                   help="local path or HF id of the caption model weights")
    p.add_argument("--sample-dir", required=True)
    p.add_argument("--initial-caption", default="")
    p.add_argument("--caption-prefix", default="")
    p.add_argument("--caption-postfix", default="")
    p.add_argument("--mode", default="fill", choices=["fill", "replace", "add"])
    p.add_argument("--include-subdirectories", action="store_true")
    # reference-CLI compatibility (GenerateCaptionsArgs.py:36-37):
    # tooling models run on CPU torch in this image regardless
    p.add_argument("--device", default="cpu")
    p.add_argument("--dtype", default="FLOAT_16")
    args = p.parse_args()

    from onetrainer_tpu.tooling.caption_models import Blip2Model, BlipModel, WDModel
    cls = {"BLIP": BlipModel, "BLIP2": Blip2Model, "WD14_VIT_2": WDModel}[args.model]
    model = cls(args.model_name) if args.model_name else cls()
    model.caption_folder(
        args.sample_dir, args.initial_caption, args.caption_prefix,
        args.caption_postfix, args.mode,
        progress_callback=lambda i, n: print(f"\r{i}/{n}", end="", flush=True),
        error_callback=lambda f: print(f"\nfailed: {f}"),
        include_subdirectories=args.include_subdirectories)
    print()


if __name__ == "__main__":
    main()
