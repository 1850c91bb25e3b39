"""Config: yacs-compatible YAML merge semantics."""

import argparse

import pytest

from gaitlab import config as gconfig


def test_defaults_tree():
    cfg = gconfig.get_cfg_defaults()
    assert cfg.DATASET.SEQLEN == 100
    assert cfg.MODEL.FEAT_CORR.H_SIZE == 1024
    assert cfg.MODEL.FEAT_CORR.USE_JWFF is False
    # clone is independent
    c2 = cfg.clone()
    c2.DATASET.SEQLEN = 5
    assert cfg.DATASET.SEQLEN == 100


def test_reads_reference_yaml():
    cfg = gconfig.update_cfg("/root/reference/configs/config_grnet.yaml")
    assert cfg.EXP_NAME == "grnet"
    assert cfg.MODEL.FEAT_CORR.USE_JWFF is True  # overridden by the yaml
    assert cfg.MODEL.FEAT_CORR.AVG_DIM == 3
    assert cfg.DATASET.SEQLEN == 100


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        gconfig.update_cfg(str(p))


def test_parse_args_interface():
    ns = argparse.Namespace(cfg=None)
    cfg, cfg_file = gconfig.parse_args(ns)
    assert cfg_file is None and cfg.EXP_NAME == "default"
    ns = argparse.Namespace(cfg="/root/reference/configs/config_grnet.yaml")
    cfg, cfg_file = gconfig.parse_args(ns)
    assert cfg.EXP_NAME == "grnet"
