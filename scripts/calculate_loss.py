"""Per-file deterministic loss report (reference: scripts/calculate_loss.py):

    python scripts/calculate_loss.py --config-path config.json --output losses.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onetrainer_tpu.util.platform import (
    enable_compile_cache, maybe_force_platform,
)
maybe_force_platform()
enable_compile_cache()

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.util.generate_losses import GenerateLossesModel


def main():
    p = argparse.ArgumentParser(description="Calculate per-sample losses")
    p.add_argument("--config-path", required=True)
    p.add_argument("--output", "--output-path", default="losses.json",
                   dest="output")
    args = p.parse_args()

    config = TrainConfig.default_values()
    with open(args.config_path) as f:
        config.from_dict(json.load(f))
    if config.concepts is None and os.path.exists(config.concept_file_name):
        with open(config.concept_file_name) as f:
            config.concepts = [ConceptConfig.default_values().from_dict(c)
                               for c in json.load(f)]

    GenerateLossesModel(config, args.output).start()
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
