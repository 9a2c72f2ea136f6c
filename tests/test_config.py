"""Config-system tests: defaults merge semantics (helper/config.py parity)."""

import json

from heatnet_tpu.utils.config import DEFAULTS, load_config, load_config_dict


def test_user_keys_win():
    cfg = load_config_dict({"network": {"arch": "resnext50"}})
    assert cfg["network"]["arch"] == "resnext50"
    assert cfg["network"]["activation"] == "relu"  # filled from defaults
    assert cfg["optimizer"]["type"] == "SGD"


def test_nested_merge():
    cfg = load_config_dict({"optimizer": {"schedule": {"type": "step"}}})
    assert cfg["optimizer"]["schedule"]["type"] == "step"
    assert cfg["optimizer"]["schedule"]["mode"] == "epoch"


def test_defaults_not_mutated():
    before = json.dumps(DEFAULTS, sort_keys=True)
    cfg = load_config_dict({"network": {"arch": "x"}})
    cfg["optimizer"]["schedule"]["params"]["step_size"] = 30
    assert json.dumps(DEFAULTS, sort_keys=True) == before


def test_reference_experiment_config(tmp_path):
    # the shipped experiment config (experiments/heatnet_conf.json schema)
    conf = {
        "network": {"arch": "resnext50", "activation": "leaky_relu",
                    "leaky_relu_slope": 0.01, "input_3x3": True, "bn_mode": "standard"},
        "optimizer": {"batch_size": 30, "clip": 0, "learning_rate": 1e-05,
                      "nesterov": False,
                      "schedule": {"type": "step", "epochs": 130,
                                   "params": {"step_size": 30}}},
        "input": {"color_jitter_train": True, "lighting_train": True},
    }
    p = tmp_path / "conf.json"
    p.write_text(json.dumps(conf))
    cfg = load_config(str(p))
    assert cfg["network"]["classes"] == 13
    assert cfg["optimizer"]["batch_size"] == 30
    assert cfg["optimizer"]["schedule"]["params"]["step_size"] == 30
    assert cfg["tpu"]["compute_dtype"] == "bfloat16"
