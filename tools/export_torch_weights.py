"""Export a jmodt_tpu checkpoint to the reference's torch .pth format.

The inverse of tools/import_torch_weights.py: a detector trained in this
framework loads into the reference codebase (``load_state_dict`` on its
PointRCNN, strict=True for full-fusion checkpoints) for cross-validation:

    python tools/export_torch_weights.py --ckpt output/ckpt/best_model \
        --out jmodt_from_tpu.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', type=str, required=True,
                    help='jmodt_tpu checkpoint stem or .ckpt path')
    ap.add_argument('--out', type=str, required=True,
                    help='output torch checkpoint (.pth)')
    args = ap.parse_args()

    import numpy as np
    import torch

    from jmodt_tpu.train.checkpoint import read_checkpoint_state
    from jmodt_tpu.utils.torch_import import export_model_state

    # stem-aware resolution (.ckpt / .orbax, newest wins) — same rules as
    # load_checkpoint, so --async_ckpt runs export their current weights
    state = read_checkpoint_state(args.ckpt)
    # np.array(): msgpack-restored arrays are read-only; torch.from_numpy
    # warns on non-writable buffers
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_model_state(state['model_state']).items()}
    torch.save({'epoch': state.get('epoch'), 'it': state.get('it'),
                'model_state': sd, 'optimizer_state': None}, args.out)
    print(f'wrote {args.out}: {len(sd)} tensors '
          f'(epoch={state.get("epoch")}, it={state.get("it")})')


if __name__ == '__main__':
    main()
