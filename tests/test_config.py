import os

import pytest

from idgrec_tpu.config import Config, ConfigError, load_model_config, read_configuration


def test_parse_reference_syntax(tmp_path):
    p = tmp_path / "M.txt"
    p.write_text(
        "dataset_path = ./dataset/\n"
        "dataset = yelp2018\n"
        "top_K = [10, 20]\n"
        "embedding_size = 64\n"
        "learn_rate = 0.001\n"
        "mess_dropout = True\n"
        "mess_drop_prob = [0.1, 0.1, 0.1]\n"
        "badline_without_equals\n"
    )
    cfg = read_configuration(str(p))
    assert cfg.str("dataset") == "yelp2018"
    assert cfg.int("embedding_size") == 64
    assert cfg.float("learn_rate") == 0.001
    assert cfg.int_list("top_K") == [10, 20]
    assert cfg.bool("mess_dropout") is True
    assert cfg.float_list("mess_drop_prob") == [0.1, 0.1, 0.1]
    assert "badline_without_equals" not in cfg


def test_defaults_present():
    cfg = Config({"dataset": "x"})
    # keys the engine reads unconditionally must never KeyError
    assert cfg.int("interval") >= 1
    assert cfg.int("sparsity_test") == 0
    assert cfg.int_list("top_K")


def test_missing_key_raises():
    cfg = Config({})
    with pytest.raises(ConfigError):
        cfg.int("embedding_size")


def test_updated_does_not_mutate():
    cfg = Config({"a": "1"})
    cfg2 = cfg.updated(a=2, b=3)
    assert cfg.int("a") == 1
    assert cfg2.int("a") == 2
    assert cfg2.int("b") == 3


def test_all_shipped_model_configs_parse():
    from idgrec_tpu.models import registry

    for model in registry.available_models():
        cfg = load_model_config(model)
        assert cfg.str("dataset")
        assert cfg.int("embedding_size") > 0
        assert cfg.float("learn_rate") > 0
        assert cfg.int("interval") >= 1  # reference bug (DirectAU/MAWU) fixed
