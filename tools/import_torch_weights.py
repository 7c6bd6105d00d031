"""Convert a reference-JMODT torch checkpoint (.pth) to a jmodt_tpu .ckpt.

The reference's released model (README.md:24-26) and any checkpoint written
by its tools/train.py (train_utils.py:26-28) load here without retraining:

    python tools/import_torch_weights.py --pth jmodt.pth --out out/imported

then train/evaluate with ``--ckpt out/imported`` as usual.  Lidar-only
(stage-1) checkpoints convert to the matching partial tree and restore
through the standard strict=False merge.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pth', type=str, required=True,
                    help='reference torch checkpoint (.pth)')
    ap.add_argument('--out', type=str, required=True,
                    help='output checkpoint stem (writes <out>.ckpt)')
    args = ap.parse_args()

    import jax

    from jmodt_tpu.train.checkpoint import save_checkpoint
    from jmodt_tpu.utils.torch_import import (convert_torch_checkpoint,
                                              load_reference_pth)

    state = convert_torch_checkpoint(load_reference_pth(args.pth))
    n = len(jax.tree_util.tree_leaves(state['model_state']))
    path = save_checkpoint(state, args.out)
    print(f'wrote {path}: {n} arrays '
          f'(epoch={state["epoch"]}, it={state["it"]})')


if __name__ == '__main__':
    main()
