"""Export TPU-trained weights to the reference's ``best_model.pt`` format.

Takes an orbax best_model directory (train/checkpoint.py export) or a flax
msgpack file and writes a torchvision-named torch state_dict that the
reference's ``fcn_resnet50().load_state_dict`` (reference models.py:222)
accepts — so models trained on TPU can be deployed back into the original
PyTorch application.

Usage: python tools/export_torch_checkpoint.py CKPT_PATH OUT.pt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt", help="orbax dir or flax .msgpack")
    parser.add_argument("out", help="output .pt path")
    args = parser.parse_args()

    import torch

    from neuralbarkcalculator_tpu.models.convert import (
        variables_to_torch_state_dict)
    from neuralbarkcalculator_tpu.pipeline.predict import _load_variables

    variables = _load_variables(args.ckpt, "fcn_resnet50")
    state = {k: torch.from_numpy(v.copy()) for k, v in
             variables_to_torch_state_dict(variables).items()}
    torch.save(state, args.out)
    print(f"wrote {args.out} ({len(state)} tensors)")


if __name__ == "__main__":
    main()
