"""Evaluate on the RBOT dataset (redesign of M3T/examples/evaluate_rbot_dataset.cpp).

Usage: python examples/evaluate_rbot_dataset.py <dataset_dir> <external_dir>
       [--bodies ape bakingsoda ...] [--sequences a_regular ...] [--texture]
"""

import argparse
import sys

sys.path.insert(0, ".")

from m3t_tpu.eval.rbot_evaluator import RBOTEvaluator  # noqa: E402

ALL_BODIES = [
    "ape", "bakingsoda", "benchviseblue", "broccolisoup", "cam", "can", "cat",
    "clown", "cube", "driller", "duck", "eggbox", "glue", "iron", "koalacandy",
    "lamp", "lego", "phone", "squirrel",
]
ALL_SEQUENCES = ["a_regular", "b_dynamiclight", "c_noisy", "d_occlusion"]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_dir")
    parser.add_argument("external_dir")
    parser.add_argument("--bodies", nargs="+", default=ALL_BODIES)
    parser.add_argument("--sequences", nargs="+", default=ALL_SEQUENCES)
    parser.add_argument("--texture", action="store_true")
    parser.add_argument("--save", default=None)
    args = parser.parse_args()

    evaluator = RBOTEvaluator("rbot_evaluator", args.dataset_dir, args.external_dir,
                              body_names=args.bodies, sequence_names=args.sequences)
    evaluator.use_texture_modality = args.texture

    # Reference RBOT configuration (evaluate_rbot_dataset.cpp).
    def region_modality_setter(modality):
        modality.n_lines_max = 200

    evaluator.region_modality_setter = region_modality_setter
    results = evaluator.Evaluate()
    if args.save:
        evaluator.SaveResults(args.save)
    print(f"tracking success: {results['tracking_success']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
