"""Standalone sampling (reference: scripts/sample.py):

    python scripts/sample.py --model-type STABLE_DIFFUSION_15 \
        --base-model-name <dir-or-file> --prompt "a cat" \
        --destination out.png [--steps 20 --cfg 7 --width 512 --height 512]
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


def parse_args():
    p = argparse.ArgumentParser(description="Sample from a model")
    p.add_argument("--model-type", required=True)
    p.add_argument("--base-model-name", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--negative-prompt", default="")
    p.add_argument("--destination", required=True)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg", type=float, default=7.0)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--scheduler", default="DDIM")
    p.add_argument("--decoder-model-name", default="",
                   help="Würstchen/Cascade stage-B decoder repo dir "
                        "(reference: ModelNames.decoder_model)")
    # reference SampleArgs parity (modules/util/args/SampleArgs.py:46-58)
    p.add_argument("--embedding-name", default="",
                   help="a trained embedding safetensors to apply")
    p.add_argument("--text-encoder-layer-skip", type=int, default=0)
    p.add_argument("--sample-inpainting", action="store_true", default=False)
    p.add_argument("--base-image-path", default="",
                   help="base image for inpainting sampling")
    p.add_argument("--mask-image-path", default="",
                   help="mask image for inpainting sampling")
    p.add_argument("--weight-dtype", default="",
                   help="weight dtype during sampling (e.g. BFLOAT_16)")
    return p.parse_args()


def main():
    args = parse_args()
    from PIL import Image

    from onetrainer_tpu.config.sample_config import SampleConfig
    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.setup.families import get_family
    from onetrainer_tpu.util.enums import ModelType, NoiseScheduler, TrainingMethod

    config = TrainConfig.default_values()
    config.model_type = ModelType[args.model_type]
    config.base_model_name = args.base_model_name
    config.training_method = TrainingMethod.FINE_TUNE
    config.unet.train = False
    config.text_encoder.train = False
    config.text_encoder_2.train = False
    if args.decoder_model_name:
        config.decoder.model_name = args.decoder_model_name
    if args.embedding_name:
        # apply a trained embedding during sampling (reference:
        # SampleArgs --embedding-name; the prompt must contain the
        # embedding's placeholder token)
        config.training_method = TrainingMethod.EMBEDDING
        config.embedding.model_name = args.embedding_name
    if args.weight_dtype:
        from onetrainer_tpu.util.enums import DataType
        config.weight_dtype = DataType[args.weight_dtype]

    family = get_family(config.model_type)
    model = family.load(args.base_model_name, config)
    setup = family.create_setup(model, config, 1)

    sample_config = SampleConfig.default_values()
    sample_config.prompt = args.prompt
    sample_config.negative_prompt = args.negative_prompt
    sample_config.width = args.width
    sample_config.height = args.height
    sample_config.diffusion_steps = args.steps
    sample_config.cfg_scale = args.cfg
    sample_config.seed = args.seed
    sample_config.noise_scheduler = NoiseScheduler[args.scheduler]
    sample_config.text_encoder_1_layer_skip = args.text_encoder_layer_skip
    sample_config.sample_inpainting = args.sample_inpainting
    sample_config.base_image_path = args.base_image_path
    sample_config.mask_image_path = args.mask_image_path

    out = family.sample(setup, sample_config,
                        lambda s, m: print(f"step {s}/{m}"))
    os.makedirs(os.path.dirname(os.path.abspath(args.destination)), exist_ok=True)
    Image.fromarray(out.image).save(args.destination)
    print(f"saved {args.destination}")


if __name__ == "__main__":
    main()
