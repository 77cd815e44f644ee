"""Create template config/concept/sample files
(reference: scripts/create_train_files.py)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.config.train_config import TrainConfig


def main():
    p = argparse.ArgumentParser(description="Create training config templates")
    p.add_argument("--config-output-destination", default=None)
    p.add_argument("--concepts-output-destination", default=None)
    p.add_argument("--samples-output-destination", default=None)
    args = p.parse_args()

    def write(path, payload):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f, indent=4)
        print(f"wrote {path}")

    if args.config_output_destination:
        write(args.config_output_destination,
              TrainConfig.default_values().to_dict())
    if args.concepts_output_destination:
        write(args.concepts_output_destination,
              [ConceptConfig.default_values().to_dict()])
    if args.samples_output_destination:
        write(args.samples_output_destination,
              [SampleConfig.default_values().to_dict()])


if __name__ == "__main__":
    main()
