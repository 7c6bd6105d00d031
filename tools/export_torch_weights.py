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

    import flax.serialization
    import torch

    from jmodt_tpu.utils.torch_import import export_model_state

    path = args.ckpt if args.ckpt.endswith('.ckpt') else args.ckpt + '.ckpt'
    with open(path, 'rb') as f:
        state = flax.serialization.msgpack_restore(f.read())
    sd = {k: torch.from_numpy(v)
          for k, v in export_model_state(state['model_state']).items()}
    torch.save({'epoch': state.get('epoch'), 'it': state.get('it'),
                'model_state': sd, 'optimizer_state': None}, args.out)
    print(f'wrote {args.out}: {len(sd)} tensors '
          f'(epoch={state.get("epoch")}, it={state.get("it")})')


if __name__ == '__main__':
    main()
