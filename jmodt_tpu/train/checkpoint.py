"""Checkpoint save/restore with partial (strict=False) semantics.

TPU equivalent of /root/reference/jmodt/utils/train_utils.py:13-66: a single
checkpoint file holds {epoch, it, model_state, optimizer_state}; restore
merges whatever subtrees match the model and reports missing/unexpected keys
— this is what lets a detection-only checkpoint bootstrap the link/se
finetune (reference load_checkpoint strict=False, train_utils.py:31-47).

Two serialization backends:
  * flax msgpack (default): single `.ckpt` file, framework-native, no
    torch — the parity path.
  * orbax (`AsyncCheckpointWriter`): a `.orbax` directory written by an
    `ocp.AsyncCheckpointer` — the save returns as soon as the device
    arrays are snapshotted and IO proceeds in the background, so a large
    checkpoint never stalls the train loop.  `load_checkpoint` dispatches
    on what exists on disk; both formats restore through the same
    strict=False merge.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

import flax.serialization
import jax
import numpy as np

logger = logging.getLogger(__name__)


def _to_pure_dict(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, flax.serialization.to_state_dict(tree))


def checkpoint_state(variables: Any, opt_state: Any = None,
                     epoch: Optional[int] = None,
                     it: Optional[int] = None) -> dict:
    """Reference checkpoint_state (train_utils.py:13-24)."""
    return {'epoch': epoch, 'it': it,
            'model_state': _to_pure_dict(variables),
            'optimizer_state': (_to_pure_dict(opt_state)
                                if opt_state is not None else None)}


def save_checkpoint(state: dict, filename: str, writer: Any = None) -> str:
    """Write `<filename>.ckpt` (reference save_checkpoint,
    train_utils.py:26-28), or — when an `AsyncCheckpointWriter` is given —
    `<filename>.orbax/` asynchronously."""
    if writer is not None:
        return writer.save(state, filename)
    path = filename + '.ckpt'
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as f:
        f.write(flax.serialization.msgpack_serialize(state))
    return path


class AsyncCheckpointWriter:
    """Orbax-backed async checkpoint writer.

    `save()` snapshots the arrays and returns; serialization + IO run on
    orbax's background thread.  Call `wait()` before reading the
    checkpoint back or exiting the process.  Repeated saves are serialized
    by orbax internally (a new save waits for the previous one).
    """

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, state: dict, filename: str) -> str:
        path = os.path.abspath(filename + '.orbax')
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        # None optimizer_state is dropped (orbax rejects None leaves) and
        # restored as absent.  Device arrays pass through UNTOUCHED —
        # orbax's async checkpointer snapshots and copies them to host on
        # its background thread; a tree_map(np.asarray, ...) here would
        # fetch every leaf synchronously and stall the train loop (the
        # exact thing this writer exists to avoid).  Only non-array python
        # scalars (epoch/it) are wrapped.
        payload = {k: v for k, v in state.items() if v is not None}
        payload = jax.tree_util.tree_map(
            lambda x: x if isinstance(x, (jax.Array, np.ndarray))
            else np.asarray(x), payload)
        self._ckptr.save(path, args=self._ocp.args.PyTreeSave(payload),
                         force=True)
        return path

    def wait(self):
        self._ckptr.wait_until_finished()

    def close(self):
        self._ckptr.wait_until_finished()
        self._ckptr.close()


def _orbax_restore(path: str) -> dict:
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path))
    return dict(state)


def _merge_into(template: Any, saved: Any, path: str,
                missing: list, loaded: list) -> Any:
    """Recursively overlay `saved` onto `template`, keeping template leaves
    with no saved counterpart (the strict=False restore)."""
    if isinstance(template, dict):
        out = {}
        for key, tval in template.items():
            p = f'{path}/{key}' if path else str(key)
            if isinstance(saved, dict) and key in saved:
                out[key] = _merge_into(tval, saved[key], p, missing, loaded)
            else:
                missing.append(p)
                out[key] = tval
        return out
    loaded.append(path)
    arr = np.asarray(saved)
    t_arr = np.asarray(template)
    if arr.shape != t_arr.shape:
        missing.append(path + f' (shape {arr.shape} != {t_arr.shape})')
        return template
    return arr.astype(t_arr.dtype)


def _unexpected_keys(template: Any, saved: Any, path: str = '') -> list:
    out = []
    if isinstance(saved, dict):
        for key, sval in saved.items():
            p = f'{path}/{key}' if path else str(key)
            if not isinstance(template, dict) or key not in template:
                out.append(p)
            else:
                out += _unexpected_keys(template[key], sval, p)
    return out


def read_checkpoint_state(filename: str,
                          log: Optional[logging.Logger] = None) -> dict:
    """Resolve + read a checkpoint into its raw state dict.

    Accepts a `.ckpt` (msgpack), `.orbax` directory, reference torch
    `.pth`, or a bare stem; stems probe all three and pick the newest by
    mtime when several exist (a stale msgpack must not shadow a fresher
    orbax after a run switched to --async_ckpt).
    """
    log = log or logger
    if filename.endswith(('.ckpt', '.orbax', '.pth')):
        path = filename
    else:
        cands = [p for p in (filename + '.ckpt', filename + '.pth')
                 if os.path.isfile(p)]
        if os.path.isdir(filename + '.orbax'):
            cands.append(filename + '.orbax')
        if not cands:
            raise FileNotFoundError(
                f'{filename}.ckpt / .orbax / .pth: no checkpoint found')
        if len(cands) > 1:
            cands.sort(key=os.path.getmtime, reverse=True)
            log.warning('multiple checkpoints for stem %s; loading the '
                        'newest: %s', filename, cands[0])
        path = cands[0]
    log.info("==> Loading from checkpoint '%s'", path)
    if path.endswith('.orbax'):
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        return _orbax_restore(path)
    if path.endswith('.pth'):
        # a reference torch checkpoint: convert in-memory so reference
        # users can pass their .pth straight to --ckpt (the explicit
        # tools/import_torch_weights.py CLI persists the conversion)
        from jmodt_tpu.utils.torch_import import (convert_torch_checkpoint,
                                                  load_reference_pth)
        return convert_torch_checkpoint(load_reference_pth(path))
    if not os.path.isfile(path):
        raise FileNotFoundError(path)
    with open(path, 'rb') as f:
        return flax.serialization.msgpack_restore(f.read())


def load_checkpoint(filename: str, variables_template: Any,
                    opt_state_template: Any = None,
                    log: Optional[logging.Logger] = None
                    ) -> Tuple[Any, Any, int, int]:
    """Restore with partial-match semantics (reference load_checkpoint,
    train_utils.py:31-47).

    :return: (variables, opt_state or None, it, epoch)
    """
    log = log or logger
    state = read_checkpoint_state(filename, log)
    path = filename

    template_dict = flax.serialization.to_state_dict(variables_template)
    missing, loaded = [], []
    merged = _merge_into(template_dict, state.get('model_state') or {},
                         '', missing, loaded)
    unexpected = _unexpected_keys(template_dict, state.get('model_state')
                                  or {})
    if missing:
        log.info('missing keys (%d): %s', len(missing), missing[:20])
    if unexpected:
        log.info('unexpected keys (%d): %s', len(unexpected),
                 unexpected[:20])
    if not loaded:
        raise RuntimeError(f'no keys restored from {path}')
    variables = flax.serialization.from_state_dict(variables_template,
                                                   merged)

    opt_state = None
    if opt_state_template is not None and state.get('optimizer_state'):
        opt_state = flax.serialization.from_state_dict(
            opt_state_template, state['optimizer_state'])
    epoch = int(state['epoch']) if state.get('epoch') is not None else -1
    it = int(state['it']) if state.get('it') is not None else 0
    log.info('==> Done')
    return variables, opt_state, it, epoch


def load_part_ckpt(filename: str, variables_template: Any,
                   log: Optional[logging.Logger] = None) -> Any:
    """Weights-only partial load (reference load_part_ckpt,
    train_utils.py:50-66): restore every matching subtree, keep the rest
    of the template, raise if nothing matched."""
    variables, _, _, _ = load_checkpoint(filename, variables_template,
                                         log=log)
    return variables
