"""Config system tests: presets, serialization, CLI overrides."""

import pytest

from poi_tpu.configs.presets import get_config, list_configs
from poi_tpu.utils.config import Config, parse_set_flags


def test_five_benchmark_presets_exist():
    names = list_configs()
    for required in (
        "gru_foursquare_nyc",
        "lstm_bpr_foursquare",
        "strnn_gowalla",
        "attention_gowalla",
        "multihost_1m",
    ):
        assert required in names


def test_preset_shapes_match_contract():
    # BASELINE.json:7-11 scales
    assert get_config("gru_foursquare_nyc").model.embed_dim == 64
    assert get_config("gru_foursquare_nyc").train.batch_size == 32
    assert get_config("lstm_bpr_foursquare").model.embed_dim == 128
    assert get_config("lstm_bpr_foursquare").loss.kind == "bpr"
    assert get_config("attention_gowalla").model.embed_dim == 256
    assert get_config("attention_gowalla").loss.kind == "sampled_softmax"
    assert get_config("multihost_1m").data.num_pois == 1_000_000
    assert get_config("multihost_1m").model.embed_dim == 512
    assert get_config("multihost_1m").mesh.embedding_mode == "a2a"


def test_json_roundtrip():
    cfg = get_config("smoke")
    back = Config.from_json(cfg.to_json())
    assert back == cfg


def test_overrides():
    cfg = get_config("smoke")
    out = cfg.with_overrides(parse_set_flags(["train.batch_size=128", "model.kind=lstm", "eval.recall_ks=1,20"]))
    assert out.train.batch_size == 128
    assert out.model.kind == "lstm"
    assert out.eval.recall_ks == (1, 20)
    # Original untouched (frozen dataclasses).
    assert cfg.train.batch_size == 16


def test_bad_override_raises():
    cfg = get_config("smoke")
    with pytest.raises(KeyError):
        cfg.with_overrides({"train.nope": "1"})


def test_lr_schedule_cosine():
    from poi_tpu.train.state import lr_schedule

    cfg = get_config("smoke").with_overrides(
        {
            "train.lr_schedule": "cosine",
            "train.num_steps": "100",
            "train.warmup_steps": "10",
            "train.learning_rate": "1e-3",
        }
    )
    s = lr_schedule(cfg.train)
    assert float(s(0)) == 0.0  # warmup starts at zero
    assert abs(float(s(10)) - 1e-3) < 1e-9  # peak at end of warmup
    assert 0.0 < float(s(50)) < 1e-3  # decaying
    assert float(s(100)) <= 1e-6  # decayed to lr_min_frac * lr == 0


def test_lr_schedule_unknown_raises():
    from poi_tpu.train.state import lr_schedule

    cfg = get_config("smoke").with_overrides({"train.lr_schedule": "nope"})
    with pytest.raises(ValueError):
        lr_schedule(cfg.train)
