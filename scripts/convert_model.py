"""Convert models between formats and dtypes (reference:
scripts/convert_model.py, modules/util/args/ConvertModelArgs.py).

All nine model families convert between diffusers directories and their
single-file layouts; LoRA and embedding safetensors convert dtype
(the reference loads them through the model loader and re-saves through
the saver with the requested dtype — the net effect is a cast).

    python scripts/convert_model.py --model-type STABLE_DIFFUSION_15 \
        --input model_dir_or_file --output out.safetensors \
        --output-model-format SAFETENSORS --output-dtype FLOAT_16

    python scripts/convert_model.py --model-type STABLE_DIFFUSION_XL_10_BASE \
        --training-method LORA --input lora.safetensors \
        --output lora_fp16.safetensors --output-dtype FLOAT_16
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
    p = argparse.ArgumentParser(description="Convert models between formats")
    p.add_argument("--model-type", required=True)
    p.add_argument("--input", "--input-name", required=True,
                   dest="input_name")
    p.add_argument("--output", "--output-model-destination",
                   required=True, dest="output_name")
    p.add_argument("--training-method", default="FINE_TUNE",
                   help="FINE_TUNE converts the base model; LORA/EMBEDDING "
                        "convert a trained adapter/embedding file")
    p.add_argument("--output-model-format", default="SAFETENSORS")
    p.add_argument("--output-dtype", default="FLOAT_16")
    return p.parse_args()


def _convert_adapter(input_name: str, output_name: str, save_dtype):
    """LoRA / embedding safetensors: cast every float tensor to the output
    dtype, keep keys and metadata (reference: LoRASaverMixin.save /
    EmbeddingSaverMixin both funnel through
    DtypeModelSaverMixin._convert_state_dict_dtype)."""
    from onetrainer_tpu.io.safetensors_io import (
        SafetensorsFile, save_safetensors,
    )
    from onetrainer_tpu.setup.families import cast_float_array
    with SafetensorsFile(input_name) as f:
        tensors = {k: cast_float_array(f.tensor(k), save_dtype)
                   for k in f.keys()}
        meta = dict(f.metadata)
    if not output_name.endswith(".safetensors"):
        output_name += ".safetensors"
    save_safetensors(output_name, tensors, metadata=meta)


def main():
    args = parse_args()
    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.setup.families import get_family, make_inference_setup
    from onetrainer_tpu.util.enums import (
        DataType, ModelFormat, ModelType, TrainingMethod,
    )

    model_type = ModelType[args.model_type]
    method = TrainingMethod[args.training_method]
    out_format = ModelFormat[args.output_model_format]
    save_dtype = DataType[args.output_dtype].to_save_dtype()

    if method in (TrainingMethod.LORA, TrainingMethod.EMBEDDING):
        _convert_adapter(args.input_name, args.output_name, save_dtype)
        print(f"converted {args.input_name} -> {args.output_name}")
        return

    config = TrainConfig.default_values()
    config.model_type = model_type
    config.base_model_name = args.input_name
    config.training_method = TrainingMethod.FINE_TUNE
    config.weight_dtype = DataType.FLOAT_32

    family = get_family(model_type)
    model = family.load(args.input_name, config)
    setup = make_inference_setup(model, config)

    if out_format.is_single_file():
        out = args.output_name
        if not out.endswith((".safetensors", ".ckpt")):
            out += out_format.file_extension()
        family.save_single_file(setup, out, save_dtype=save_dtype)
    else:
        source_dir = args.input_name if os.path.isdir(args.input_name) else None
        family.save_model(setup, args.output_name, source_dir,
                          save_dtype=save_dtype)
    print(f"converted {args.input_name} -> {args.output_name}")


if __name__ == "__main__":
    main()
