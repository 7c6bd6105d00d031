"""Config system tests: YAML merge with strict key/type checking, dotted
overrides, and the shipped config files (reference cfg_from_file /
cfg_from_list semantics, jmodt/config.py:220-276)."""

import os

import pytest

from jmodt_tpu.config import Config, config_from_overrides, config_from_yaml

CONFIGS = os.path.join(os.path.dirname(__file__), '..', 'configs')


def test_default_yaml_roundtrip():
    cfg = config_from_yaml(os.path.join(CONFIGS, 'default.yaml'))
    assert cfg.CLASSES == 'Car' and cfg.RPN.FIXED and cfg.TRAIN.FINETUNE
    assert cfg.RPN.NUM_POINTS == 16384


def test_lidar_only_yaml():
    cfg = config_from_yaml(os.path.join(CONFIGS, 'lidar_only.yaml'))
    assert not cfg.LI_FUSION.ENABLED
    assert not cfg.RPN.FIXED and not cfg.TRAIN.FINETUNE
    # untouched keys keep defaults
    assert cfg.RCNN.ROI_PER_IMAGE == 64


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / 'bad.yaml'
    bad.write_text('RPN:\n  NOT_A_KEY: 1\n')
    with pytest.raises(KeyError):
        config_from_yaml(str(bad))


def test_type_mismatch_rejected(tmp_path):
    bad = tmp_path / 'bad.yaml'
    bad.write_text('RPN:\n  NUM_POINTS: "many"\n')
    with pytest.raises(ValueError):
        config_from_yaml(str(bad))


def test_dotted_overrides():
    cfg = config_from_overrides(
        Config(), ['RPN.FIXED', 'False', 'TRAIN.LR', '0.001',
                   'RCNN.SA_CONFIG.NPOINTS', '(64, 16, -1)'])
    assert not cfg.RPN.FIXED
    assert cfg.TRAIN.LR == pytest.approx(0.001)
    assert cfg.RCNN.SA_CONFIG.NPOINTS == (64, 16, -1)
    # original untouched (immutability)
    assert Config().RPN.FIXED


def test_unimplemented_knobs_fail_loudly():
    import dataclasses
    import pytest
    from jmodt_tpu.config import Config
    base = Config()
    with pytest.raises(NotImplementedError):
        dataclasses.replace(base, GT_AUG_ENABLED=True)
    with pytest.raises(NotImplementedError):
        dataclasses.replace(
            base, RCNN=dataclasses.replace(base.RCNN, ROI_SAMPLE_JIT=False))
    with pytest.raises(NotImplementedError):
        dataclasses.replace(
            base, REID=dataclasses.replace(base.REID, LOSS_LINK='L2'))
    with pytest.raises(ValueError):
        dataclasses.replace(base, DTYPE='fp8')
