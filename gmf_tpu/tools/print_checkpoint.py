"""Checkpoint inspector.

Parity: GMF_DGR_fcgf/Test/Test.py (the reference's checkpoint-printing
scratch) — prints the tree structure, shapes and embedded config of a
gmf_tpu checkpoint or a torch state_dict.

Usage: python -m gmf_tpu.tools.print_checkpoint <path>
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--max-leaves", type=int, default=200)
    args = ap.parse_args()

    import numpy as np

    if os.path.isdir(args.path):
        from gmf_tpu.utils.checkpoint import load_checkpoint

        state, config = load_checkpoint(args.path)
        if config:
            print("config:", config)
        import jax

        leaves = jax.tree_util.tree_flatten_with_path(state)[0]
        total = 0
        for i, (k, v) in enumerate(leaves):
            v = np.asarray(v)
            total += v.size
            if i < args.max_leaves:
                name = "/".join(str(x) for x in k)
                print(f"{name}: {v.shape} {v.dtype}")
        print(f"{len(leaves)} leaves, {total / 1e6:.2f} M params")
    else:
        from gmf_tpu.utils.convert_torch import load_torch_state_dict

        sd = load_torch_state_dict(args.path)
        total = 0
        for i, (k, v) in enumerate(sd.items()):
            total += v.size
            if i < args.max_leaves:
                print(f"{k}: {v.shape} {v.dtype}")
        print(f"{len(sd)} tensors, {total / 1e6:.2f} M params")


if __name__ == "__main__":
    main()
