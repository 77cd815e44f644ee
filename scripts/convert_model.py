"""Convert between model formats (reference: scripts/convert_model.py):
diffusers directory <-> LDM single-file safetensors, any dtype.

    python scripts/convert_model.py --model-type STABLE_DIFFUSION_15 \
        --input model_dir_or_file --output out.safetensors \
        --output-model-format SAFETENSORS --output-dtype FLOAT_16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onetrainer_tpu.util.platform import maybe_force_platform
maybe_force_platform()

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Convert models between formats")
    p.add_argument("--model-type", required=True)
    p.add_argument("--input", "--input-name", required=True,
                   dest="input_name")
    p.add_argument("--output", "--output-model-destination",
                   required=True, dest="output_name")
    # accepted for reference-CLI compatibility (loaders infer the
    # method from the checkpoint contents)
    p.add_argument("--training-method", default="FINE_TUNE")
    p.add_argument("--output-model-format", default="SAFETENSORS")
    p.add_argument("--output-dtype", default="FLOAT_16")
    return p.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp
    import ml_dtypes

    from onetrainer_tpu.io import sd_checkpoints as ckpt
    from onetrainer_tpu.models.sd import StableDiffusionModel
    from onetrainer_tpu.models.sdxl import StableDiffusionXLModel
    from onetrainer_tpu.util.enums import DataType, ModelFormat, ModelType

    model_type = ModelType[args.model_type]
    out_format = ModelFormat[args.output_model_format]
    out_dtype = {
        DataType.FLOAT_32: np.float32,
        DataType.FLOAT_16: np.float16,
        DataType.BFLOAT_16: ml_dtypes.bfloat16,
    }[DataType[args.output_dtype]]

    is_xl = model_type.is_stable_diffusion_xl()
    if os.path.isfile(args.input_name):
        loaded = (ckpt.load_sdxl_single_file if is_xl else ckpt.load_sd_single_file)(
            args.input_name, model_type, device=False)
    else:
        loaded = (ckpt.load_sdxl_diffusers if is_xl else ckpt.load_sd_diffusers)(
            args.input_name, device=False)

    if is_xl:
        model = StableDiffusionXLModel(
            model_type=model_type, unet_config=loaded["unet_config"],
            vae_config=loaded["vae_config"], te_config=loaded["te_config"],
            te2_config=loaded["te2_config"])
        if out_format.is_single_file():
            ckpt.save_sdxl_single_file(
                args.output_name, model, loaded["unet_params"],
                loaded["vae_params"], loaded["te_params"], loaded["te2_params"],
                save_dtype=out_dtype)
        else:
            ckpt.save_sdxl_diffusers(
                args.output_name, model, loaded["unet_params"],
                loaded["vae_params"], loaded["te_params"], loaded["te2_params"],
                save_dtype=out_dtype,
                source_dir=args.input_name if os.path.isdir(args.input_name) else None)
    else:
        model = StableDiffusionModel(
            model_type=model_type, unet_config=loaded["unet_config"],
            vae_config=loaded["vae_config"], te_config=loaded["te_config"])
        if out_format.is_single_file():
            ckpt.save_sd_single_file(
                args.output_name, model, loaded["unet_params"],
                loaded["vae_params"], loaded["te_params"], save_dtype=out_dtype)
        else:
            ckpt.save_sd_diffusers(
                args.output_name, model, loaded["unet_params"],
                loaded["vae_params"], loaded["te_params"], save_dtype=out_dtype,
                source_dir=args.input_name if os.path.isdir(args.input_name) else None)
    print(f"converted {args.input_name} -> {args.output_name}")


if __name__ == "__main__":
    main()
