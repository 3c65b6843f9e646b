#!/usr/bin/env python
"""Quickstart (the reference's demo notebook as a script).

Walks the full workflow on whatever data is available:
  1. build tokenizer + manifests,
  2. a few training steps,
  3. greedy decoding of a couple of utterances with WER.

With no LibriSpeech download present it generates a tiny synthetic corpus so
the script always runs end-to-end (useful as a living smoke test).

  python examples/quickstart.py [--data datasets/LibriSpeech/]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_dataset(root):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_e2e import make_dataset

    make_dataset(root)
    print(f"generated synthetic dataset under {root}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="LibriSpeech root (downloaded)")
    ap.add_argument("--config", default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import main as cli

    if args.data is None:
        tmp = tempfile.mkdtemp()
        root = os.path.join(tmp, "LibriSpeech")
        synthetic_dataset(root)
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from test_e2e import make_config

        config_path = make_config(root, tmp)
    else:
        root = args.data
        config_path = args.config

    cli.main([
        "--config_file", config_path, "--mode", "training",
        "--create_tokenizer", "--prepare_dataset",
        "--steps_per_epoch", str(args.steps),
        "--val_steps", "1", "--batch_size_eval", "2",
    ])
    print("\nquickstart complete — see the callback_path for checkpoints/logs")


if __name__ == "__main__":
    main()
