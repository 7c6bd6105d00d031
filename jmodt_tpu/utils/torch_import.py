"""Import reference-JMODT torch checkpoints into the jmodt_tpu param tree.

The reference publishes trained weights as torch ``.pth`` files holding
``{'epoch', 'it', 'model_state', 'optimizer_state'}``
(/root/reference/jmodt/utils/train_utils.py:13-28).  This module maps that
``model_state`` (a flat ``nn.Module.state_dict()``) onto this repo's flax
variable tree ``{'params': ..., 'batch_stats': ...}`` so a user of the
reference can bring a trained detector across without retraining.

Layout translations (torch -> flax):
  * Conv2d kxk   weight (Cout, Cin, kH, kW) -> kernel (kH, kW, Cin, Cout)
  * Conv1d/2d 1x1 weight (Cout, Cin, 1[, 1]) -> Dense kernel (Cin, Cout)
  * Linear       weight (Cout, Cin)          -> Dense kernel (Cin, Cout)
  * ConvTranspose2d weight (Cin, Cout, k, k) -> NonOverlapDeconv kernel
    (k, k, Cin, Cout) with both spatial axes flipped (torch's transposed
    conv scatters the kernel un-flipped; flax/lax conv_transpose applies
    it mirrored — equality is pinned in tests/test_torch_import.py)
  * BatchNorm{1,2}d (weight, bias, running_mean, running_var) ->
    params.BatchNorm_0.{scale, bias} + batch_stats.BatchNorm_0.{mean, var}
    (same eps=1e-5).
  * pt_utils Conv+BN blocks where the torch conv carries a (redundant)
    bias but our Dense-before-BN has none (reference IA_Layer conv1,
    Fusion conv1 — backbone.py:42-49,74-77): the conv bias is absorbed
    into the BN running mean (``mean' = mean - b``), which is exact.

Module-name correspondence is documented inline in ``_RULES`` below; the
conversion is driven entirely by the torch key strings, so lidar-only
(stage-1) checkpoints — which simply lack the image/fusion keys — convert
to the matching partial tree and restore through the standard
strict=False merge (jmodt_tpu/train/checkpoint.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ['convert_model_state', 'convert_torch_checkpoint',
           'export_model_state', 'load_reference_pth']


def load_reference_pth(path: str) -> Dict[str, Any]:
    """``torch.load`` a reference checkpoint, safely by default.

    Everything the conversion consumes (tensor state_dict + int epoch/it)
    loads under ``weights_only=True`` — no arbitrary pickle execution from
    an untrusted 'pretrained model' download.  Checkpoints that stash
    non-tensor objects (e.g. a pickled numpy scalar in optimizer_state)
    fall back to the unsafe path with an explicit warning.
    """
    import logging

    import torch
    try:
        return torch.load(path, map_location='cpu', weights_only=True)
    except Exception as e:  # pickle-bearing legacy checkpoint
        logging.getLogger(__name__).warning(
            'weights_only load of %s failed (%s); falling back to full '
            'unpickling — only do this for checkpoints you trust', path, e)
        return torch.load(path, map_location='cpu', weights_only=False)


def _np(x) -> np.ndarray:
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _dense_kernel(w) -> np.ndarray:
    """Conv1d (Cout, Cin, 1) / Conv2d 1x1 (Cout, Cin, 1, 1) / Linear
    (Cout, Cin) -> Dense (Cin, Cout)."""
    w = _np(w)
    assert all(s == 1 for s in w.shape[2:]), w.shape
    return w.reshape(w.shape[0], w.shape[1]).T


def _conv_kernel(w) -> np.ndarray:
    """Conv2d (Cout, Cin, kH, kW) -> flax (kH, kW, Cin, Cout)."""
    return np.transpose(_np(w), (2, 3, 1, 0))


def _deconv_kernel(w) -> np.ndarray:
    """ConvTranspose2d (Cin, Cout, k, k) -> (k, k, Cin, Cout), mirrored."""
    return np.transpose(_np(w), (2, 3, 0, 1))[::-1, ::-1]


def _set(tree: dict, path: Tuple[str, ...], val: np.ndarray) -> None:
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    if path[-1] in d:
        raise ValueError(f'duplicate target leaf {path}')
    d[path[-1]] = val


# ---------------------------------------------------------------------------
# torch-prefix -> (our path template, unit kind) rules.
#
# kinds:
#   pw      conv(+bias)(+bn): PointwiseLayer {Dense_0 [+bias] | +BatchNorm_0}
#   dense   plain Linear / final 1x1 conv with bias -> {kernel, bias}
#   conv    3x3 conv, no bias -> {kernel}
#   deconv  ConvTranspose2d -> NonOverlapDeconv {kernel, bias}
#   bn      standalone BatchNorm -> BatchNorm_0
#
# {0}, {1}, ... substitute the regex groups.
_RULES = [
    # -- RPN backbone: PointNet++ MSG SA levels (backbone.py:100-128) --
    (r'rpn\.backbone_net\.SA_modules\.(\d+)\.mlps\.(\d+)\.layer(\d+)',
     ('rpn', 'backbone', 'sa_{0}', 'mlp_{1}', 'PointwiseLayer_{2}'), 'pw'),
    # -- FP levels --
    (r'rpn\.backbone_net\.FP_modules\.(\d+)\.mlp\.layer(\d+)',
     ('rpn', 'backbone', 'fp_{0}', 'PointwiseMLP_0', 'PointwiseLayer_{1}'),
     'pw'),
    # -- image CNN blocks (BasicBlock: conv1/bn1/conv2, backbone.py:15-30) --
    (r'rpn\.backbone_net\.Img_Block\.(\d+)\.conv1',
     ('rpn', 'backbone', 'img_block_{0}', 'Conv_0'), 'conv'),
    (r'rpn\.backbone_net\.Img_Block\.(\d+)\.bn1',
     ('rpn', 'backbone', 'img_block_{0}', 'BatchNorm_0'), 'bn'),
    (r'rpn\.backbone_net\.Img_Block\.(\d+)\.conv2',
     ('rpn', 'backbone', 'img_block_{0}', 'Conv_1'), 'conv'),
    # -- LI-Fusion blocks, per-level and final (backbone.py:33-89) --
    (r'rpn\.backbone_net\.Fusion_Conv\.(\d+)\.IA_Layer\.conv1',
     ('rpn', 'backbone', 'fusion_{0}', 'IALayer_0', 'PointwiseLayer_0'),
     'pw'),
    (r'rpn\.backbone_net\.Fusion_Conv\.(\d+)\.IA_Layer\.fc([123])',
     ('rpn', 'backbone', 'fusion_{0}', 'IALayer_0', 'Dense_{1-}'), 'dense'),
    (r'rpn\.backbone_net\.Fusion_Conv\.(\d+)',
     ('rpn', 'backbone', 'fusion_{0}', 'PointwiseLayer_0'), 'pw'),
    (r'rpn\.backbone_net\.final_fusion_img_point\.IA_Layer\.conv1',
     ('rpn', 'backbone', 'final_fusion', 'IALayer_0', 'PointwiseLayer_0'),
     'pw'),
    (r'rpn\.backbone_net\.final_fusion_img_point\.IA_Layer\.fc([123])',
     ('rpn', 'backbone', 'final_fusion', 'IALayer_0', 'Dense_{0-}'),
     'dense'),
    (r'rpn\.backbone_net\.final_fusion_img_point',
     ('rpn', 'backbone', 'final_fusion', 'PointwiseLayer_0'), 'pw'),
    # -- image deconv pyramid + 1x1 reduce (backbone.py:130-139) --
    (r'rpn\.backbone_net\.DeConv\.(\d+)',
     ('rpn', 'backbone', 'img_pyramid', 'NonOverlapDeconv_{0}'), 'deconv'),
    (r'rpn\.backbone_net\.image_fusion_conv',
     ('rpn', 'backbone', 'img_pyramid', 'Conv_0'), 'dense_conv'),
    (r'rpn\.backbone_net\.image_fusion_bn',
     ('rpn', 'backbone', 'img_pyramid', 'BatchNorm_0'), 'bn'),
    # -- RPN heads (rpn.py:21-47; Sequential index 1 is a dropout) --
    (r'rpn\.rpn_cls_layer\.0',
     ('rpn', 'cls_head', 'PointwiseLayer_0'), 'pw'),
    (r'rpn\.rpn_cls_layer\.2', ('rpn', 'cls_head', 'Dense_0'), 'dense'),
    (r'rpn\.rpn_reg_layer\.0',
     ('rpn', 'reg_head', 'PointwiseLayer_0'), 'pw'),
    (r'rpn\.rpn_reg_layer\.2', ('rpn', 'reg_head', 'Dense_0'), 'dense'),
    # -- RCNN (rcnn.py:17-76) --
    (r'rcnn_net\.SA_modules\.(\d+)\.mlps\.0\.layer(\d+)',
     ('rcnn', 'sa_{0}', 'mlp_0', 'PointwiseLayer_{1}'), 'pw'),
    (r'rcnn_net\.xyz_up_layer\.layer(\d+)',
     ('rcnn', 'xyz_up', 'PointwiseLayer_{0}'), 'pw'),
    (r'rcnn_net\.merge_down_layer\.layer0',
     ('rcnn', 'merge_down', 'PointwiseLayer_0'), 'pw'),
    (r'rcnn_net\.cls_layer\.0', ('rcnn', 'cls_head', 'PointwiseLayer_0'),
     'pw'),
    (r'rcnn_net\.cls_layer\.2', ('rcnn', 'cls_head', 'PointwiseLayer_1'),
     'pw'),
    (r'rcnn_net\.cls_layer\.3', ('rcnn', 'cls_head', 'Dense_0'), 'dense'),
    (r'rcnn_net\.reg_layer\.0', ('rcnn', 'reg_head', 'PointwiseLayer_0'),
     'pw'),
    (r'rcnn_net\.reg_layer\.2', ('rcnn', 'reg_head', 'PointwiseLayer_1'),
     'pw'),
    (r'rcnn_net\.reg_layer\.3', ('rcnn', 'reg_head', 'Dense_0'), 'dense'),
    (r'rcnn_net\.link_layer\.0',
     ('rcnn', 'link_layer', 'mlp', 'PointwiseLayer_0'), 'pw'),
    (r'rcnn_net\.link_layer\.2',
     ('rcnn', 'link_layer', 'mlp', 'PointwiseLayer_1'), 'pw'),
    (r'rcnn_net\.link_layer\.3',
     ('rcnn', 'link_layer', 'mlp', 'Dense_0'), 'dense'),
    (r'rcnn_net\.se_layer\.0',
     ('rcnn', 'se_layer', 'mlp', 'PointwiseLayer_0'), 'pw'),
    (r'rcnn_net\.se_layer\.2',
     ('rcnn', 'se_layer', 'mlp', 'PointwiseLayer_1'), 'pw'),
    (r'rcnn_net\.se_layer\.3',
     ('rcnn', 'se_layer', 'mlp', 'Dense_0'), 'dense'),
]


def _fill_path(tpl: Tuple[str, ...], groups: Tuple[str, ...]
               ) -> Tuple[str, ...]:
    out = []
    for part in tpl:
        m = re.search(r'\{(\d+)(-?)\}', part)
        if m:
            idx = int(m.group(1))
            val = groups[idx]
            if m.group(2):  # '{i-}': fc1/2/3 -> Dense_0/1/2
                val = str(int(val) - 1)
            part = part[:m.start()] + val + part[m.end():]
        out.append(part)
    return tuple(out)


def convert_model_state(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference ``model_state`` dict onto ``{'params', 'batch_stats'}``.

    Every key must be consumed (``num_batches_tracked`` aside) — an
    unrecognized key raises, so silent drift between the two models is
    impossible.
    """
    # group torch keys by (rule index, filled target path)
    units: Dict[Tuple[Tuple[str, ...], str], Dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        if key.endswith('num_batches_tracked'):
            continue
        for pat, tpl, kind in _RULES:
            m = re.match(pat + r'\.', key)
            if m:
                path = _fill_path(tpl, m.groups())
                role = key[m.end():]
                unit = units.setdefault((path, kind), {})
                if role in unit:
                    raise ValueError(f'duplicate role {role} for {path}')
                unit[role] = val
                break
        else:
            raise ValueError(f'unrecognized reference key: {key}')

    params: dict = {}
    stats: dict = {}
    for (path, kind), unit in units.items():
        if kind == 'pw':
            # Role spellings vary by module ('conv.weight' + 'bn.bn.*',
            # 'conv1.weight' + 'bn1.*', '0.weight' + '1.*'); resolve by
            # structure: the conv weight is the unique ndim>=2 array, its
            # sibling '.bias' is the conv bias, and the BN roles share a
            # prefix with 'running_mean'.
            (conv_role,) = [r for r in unit if _np(unit[r]).ndim >= 2]
            w = unit[conv_role]
            cpre = conv_role[:-len('weight')]  # includes trailing '.' or ''
            conv_b = unit.get(cpre + 'bias')
            bn_roles = [r for r in unit if r.endswith('running_mean')]
            _set(params, path + ('Dense_0', 'kernel'), _dense_kernel(w))
            if bn_roles:
                bpre = bn_roles[0][:-len('running_mean')]
                mean = _np(unit[bpre + 'running_mean'])
                if conv_b is not None:
                    mean = mean - _np(conv_b)
                _set(params, path + ('BatchNorm_0', 'scale'),
                     _np(unit[bpre + 'weight']))
                _set(params, path + ('BatchNorm_0', 'bias'),
                     _np(unit[bpre + 'bias']))
                _set(stats, path + ('BatchNorm_0', 'mean'), mean)
                _set(stats, path + ('BatchNorm_0', 'var'),
                     _np(unit[bpre + 'running_var']))
            else:
                _set(params, path + ('Dense_0', 'bias'), _np(conv_b))
        elif kind == 'dense':
            # 'weight'/'bias' (Linear) or 'conv.weight'/'conv.bias' (the
            # Sequential heads' final 1x1 conv)
            w = unit.get('weight', unit.get('conv.weight'))
            b = unit.get('bias', unit.get('conv.bias'))
            _set(params, path + ('kernel',), _dense_kernel(w))
            _set(params, path + ('bias',), _np(b))
        elif kind == 'dense_conv':  # 1x1 Conv module kept as flax Conv
            _set(params, path + ('kernel',), _conv_kernel(unit['weight']))
            _set(params, path + ('bias',), _np(unit['bias']))
        elif kind == 'conv':
            _set(params, path + ('kernel',), _conv_kernel(unit['weight']))
        elif kind == 'deconv':
            _set(params, path + ('kernel',), _deconv_kernel(unit['weight']))
            _set(params, path + ('bias',), _np(unit['bias']))
        elif kind == 'bn':
            _set(params, path + ('scale',), _np(unit['weight']))
            _set(params, path + ('bias',), _np(unit['bias']))
            _set(stats, path + ('mean',), _np(unit['running_mean']))
            _set(stats, path + ('var',), _np(unit['running_var']))
        else:  # pragma: no cover
            raise AssertionError(kind)

    out: dict = {'params': params}
    if stats:
        out['batch_stats'] = stats
    return out


def convert_torch_checkpoint(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``torch.load`` result -> this repo's checkpoint state dict
    (consumable by ``jmodt_tpu.train.checkpoint.load_checkpoint``)."""
    model_state = ckpt.get('model_state', ckpt)
    return {'epoch': ckpt.get('epoch'), 'it': ckpt.get('it'),
            'model_state': convert_model_state(model_state),
            'optimizer_state': None}


# ---------------------------------------------------------------------------
# Reverse direction: our flax tree -> a reference-loadable state_dict.
#
# Exact inverse of the import above; the conv-bias-before-BN units get a
# zero conv bias (the import absorbed it into the BN mean, so zero round-
# trips bit-identically and the torch forward is unchanged).  Keys include
# num_batches_tracked so ``load_state_dict(strict=True)`` succeeds.

def _unconv1d(k: np.ndarray) -> np.ndarray:      # Dense (Cin,Cout)->(Cout,Cin,1)
    return np.ascontiguousarray(k.T)[:, :, None]


def _unconv2d(k: np.ndarray) -> np.ndarray:      # (Cin,Cout)->(Cout,Cin,1,1)
    return np.ascontiguousarray(k.T)[:, :, None, None]


def _unlinear(k: np.ndarray) -> np.ndarray:      # (Cin,Cout)->(Cout,Cin)
    return np.ascontiguousarray(k.T)


def _unconv(k: np.ndarray) -> np.ndarray:        # (kH,kW,Cin,Cout) NCHW-back
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def _undeconv(k: np.ndarray) -> np.ndarray:      # inverse of _deconv_kernel
    return np.ascontiguousarray(
        np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1)))


def export_model_state(tree: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our ``{'params', 'batch_stats'}`` tree -> a reference state_dict.

    Emits only the units present in the tree (a lidar-only tree exports a
    lidar-only state_dict, loadable with strict=False).  Round-trip
    (``convert_model_state(export_model_state(t)) == t``) is exact and
    test-pinned.
    """
    params = tree['params']
    stats = tree.get('batch_stats', {})
    out: Dict[str, np.ndarray] = {}

    def get(d, path):
        for p in path:
            if d is None or p not in d:
                return None
            d = d[p]
        return d

    def bn(prefix, p_sub, s_sub):
        out[prefix + '.weight'] = _np(p_sub['scale'])
        out[prefix + '.bias'] = _np(p_sub['bias'])
        out[prefix + '.running_mean'] = _np(s_sub['mean'])
        out[prefix + '.running_var'] = _np(s_sub['var'])
        out[prefix + '.num_batches_tracked'] = np.asarray(0, np.int64)

    def pw(our_path, tprefix, rank, spell='pt'):
        """One PointwiseLayer unit (Dense [+ BatchNorm])."""
        sub = get(params, our_path)
        if sub is None:
            return
        k = _np(sub['Dense_0']['kernel'])
        w = _unconv2d(k) if rank == 4 else _unconv1d(k)
        s_sub = get(stats, our_path + ('BatchNorm_0',))
        if spell == 'pt':
            out[tprefix + '.conv.weight'] = w
            if s_sub is None:
                out[tprefix + '.conv.bias'] = _np(sub['Dense_0']['bias'])
            else:
                bn(tprefix + '.bn.bn', sub['BatchNorm_0'], s_sub)
        elif spell == 'flat1':   # Fusion conv1 + bn1 (bias absorbed -> 0)
            out[tprefix + '.conv1.weight'] = w
            out[tprefix + '.conv1.bias'] = np.zeros(k.shape[1], np.float32)
            bn(tprefix + '.bn1', sub['BatchNorm_0'], s_sub)
        elif spell == 'seq01':   # IA_Layer conv1 Sequential [Conv1d, BN]
            out[tprefix + '.0.weight'] = w
            out[tprefix + '.0.bias'] = np.zeros(k.shape[1], np.float32)
            bn(tprefix + '.1', sub['BatchNorm_0'], s_sub)
        else:  # pragma: no cover
            raise AssertionError(spell)

    def dense(our_path, tprefix, rank):
        sub = get(params, our_path)
        if sub is None:
            return
        k = _np(sub['kernel'])
        w = {2: _unlinear, 3: _unconv1d, 4: _unconv2d}[rank](k)
        pre = tprefix + ('' if rank == 2 else '.conv')
        out[pre + '.weight'] = w
        out[pre + '.bias'] = _np(sub['bias'])

    bb = ('rpn', 'backbone')
    for k in range(8):
        if get(params, bb + (f'sa_{k}',)) is None:
            break
        for i in range(8):
            mlp = get(params, bb + (f'sa_{k}', f'mlp_{i}'))
            if mlp is None:
                break
            for j in range(len(mlp)):
                pw(bb + (f'sa_{k}', f'mlp_{i}', f'PointwiseLayer_{j}'),
                   f'rpn.backbone_net.SA_modules.{k}.mlps.{i}.layer{j}', 4)
    for k in range(8):
        fp = get(params, bb + (f'fp_{k}', 'PointwiseMLP_0'))
        if fp is None:
            break
        for j in range(len(fp)):
            pw(bb + (f'fp_{k}', 'PointwiseMLP_0', f'PointwiseLayer_{j}'),
               f'rpn.backbone_net.FP_modules.{k}.mlp.layer{j}', 4)
    for k in range(8):
        blk = get(params, bb + (f'img_block_{k}',))
        if blk is None:
            break
        t = f'rpn.backbone_net.Img_Block.{k}'
        out[t + '.conv1.weight'] = _unconv(_np(blk['Conv_0']['kernel']))
        out[t + '.conv2.weight'] = _unconv(_np(blk['Conv_1']['kernel']))
        bn(t + '.bn1', blk['BatchNorm_0'],
           get(stats, bb + (f'img_block_{k}', 'BatchNorm_0')))
    for k in range(8):
        name, t = (f'fusion_{k}',
                   f'rpn.backbone_net.Fusion_Conv.{k}')
        if get(params, bb + (name,)) is None:
            break
        pw(bb + (name, 'IALayer_0', 'PointwiseLayer_0'),
           t + '.IA_Layer.conv1', 3, spell='seq01')
        for fi in range(3):
            dense(bb + (name, 'IALayer_0', f'Dense_{fi}'),
                  t + f'.IA_Layer.fc{fi + 1}', 2)
        pw(bb + (name, 'PointwiseLayer_0'), t, 3, spell='flat1')
    if get(params, bb + ('final_fusion',)) is not None:
        t = 'rpn.backbone_net.final_fusion_img_point'
        pw(bb + ('final_fusion', 'IALayer_0', 'PointwiseLayer_0'),
           t + '.IA_Layer.conv1', 3, spell='seq01')
        for fi in range(3):
            dense(bb + ('final_fusion', 'IALayer_0', f'Dense_{fi}'),
                  t + f'.IA_Layer.fc{fi + 1}', 2)
        pw(bb + ('final_fusion', 'PointwiseLayer_0'), t, 3, spell='flat1')
    pyr = get(params, bb + ('img_pyramid',))
    if pyr is not None:
        for k in range(8):
            dk = pyr.get(f'NonOverlapDeconv_{k}')
            if dk is None:
                break
            t = f'rpn.backbone_net.DeConv.{k}'
            out[t + '.weight'] = _undeconv(_np(dk['kernel']))
            out[t + '.bias'] = _np(dk['bias'])
        out['rpn.backbone_net.image_fusion_conv.weight'] = _unconv(
            _np(pyr['Conv_0']['kernel']))
        out['rpn.backbone_net.image_fusion_conv.bias'] = _np(
            pyr['Conv_0']['bias'])
        bn('rpn.backbone_net.image_fusion_bn', pyr['BatchNorm_0'],
           get(stats, bb + ('img_pyramid', 'BatchNorm_0')))
    for head, t in [('cls_head', 'rpn.rpn_cls_layer'),
                    ('reg_head', 'rpn.rpn_reg_layer')]:
        pw(('rpn', head, 'PointwiseLayer_0'), t + '.0', 3)
        dense(('rpn', head, 'Dense_0'), t + '.2', 3)
    for k in range(8):
        mlp = get(params, ('rcnn', f'sa_{k}', 'mlp_0'))
        if mlp is None:
            break
        for j in range(len(mlp)):
            pw(('rcnn', f'sa_{k}', 'mlp_0', f'PointwiseLayer_{j}'),
               f'rcnn_net.SA_modules.{k}.mlps.0.layer{j}', 4)
    for j in range(2):
        pw(('rcnn', 'xyz_up', f'PointwiseLayer_{j}'),
           f'rcnn_net.xyz_up_layer.layer{j}', 4)
    pw(('rcnn', 'merge_down', 'PointwiseLayer_0'),
       'rcnn_net.merge_down_layer.layer0', 4)
    for head, t in [(('rcnn', 'cls_head'), 'rcnn_net.cls_layer'),
                    (('rcnn', 'reg_head'), 'rcnn_net.reg_layer'),
                    (('rcnn', 'link_layer', 'mlp'), 'rcnn_net.link_layer'),
                    (('rcnn', 'se_layer', 'mlp'), 'rcnn_net.se_layer')]:
        pw(head + ('PointwiseLayer_0',), t + '.0', 3)
        pw(head + ('PointwiseLayer_1',), t + '.2', 3)
        dense(head + ('Dense_0',), t + '.3', 3)
    return out
