"""Tests for the YAML composition config system (Hydra-equivalent)."""

from pathlib import Path

from camliflow_tpu.utils.config import Config, compose, deep_merge, parse_overrides

CONF_DIR = Path(__file__).resolve().parent.parent / "conf"


def test_attr_access_and_paths():
    cfg = Config({"a": {"b": {"c": 1}}, "lst": [{"x": 2}]})
    assert cfg.a.b.c == 1
    assert cfg.lst[0].x == 2
    assert cfg.get_path("a.b.c") == 1
    assert cfg.get_path("a.z", "default") == "default"
    cfg.set_path("a.b.d", 5)
    assert cfg.a.b.d == 5


def test_deep_merge():
    base = Config({"m": {"x": 1, "y": 2}, "k": 3})
    out = deep_merge(base, {"m": {"y": 20, "z": 30}})
    assert out.m.x == 1 and out.m.y == 20 and out.m.z == 30 and out.k == 3
    # base unchanged
    assert base.m.y == 2


def test_parse_overrides():
    cfg = Config({"model": {"batch_size": 8}})
    parse_overrides(cfg, ["model.batch_size=4", "training.lr=1e-3", "flag=true"])
    assert cfg.model.batch_size == 4
    assert cfg.training.lr == 1e-3
    assert cfg.flag is True


def test_compose_trainer_camliraft():
    cfg = compose(
        CONF_DIR,
        trainset="flyingthings3d_subset",
        valset="flyingthings3d_subset",
        model="camliraft",
    )
    assert cfg.model.name == "camliraft"
    assert cfg.model.batch_size == 8
    assert cfg.trainset.name == "flyingthings3d"
    assert cfg.training.epochs == 150
    assert cfg.training.lr_2d == 2e-4 and cfg.training.lr_3d == 2e-3


def test_compose_override_block_applied():
    """camliraft_l's training config drops images via its override block
    (reference training/flyingthings3d_subset/camliraft_l.yaml:19-23)."""
    cfg = compose(
        CONF_DIR,
        trainset="flyingthings3d_subset",
        valset="flyingthings3d_subset",
        model="camliraft_l",
    )
    assert cfg.trainset.with_image is False
    assert cfg.valset.with_image is False
    assert "override" not in cfg


def test_compose_cli_overrides_win():
    cfg = compose(
        CONF_DIR,
        trainset="flyingthings3d_subset",
        valset="flyingthings3d_subset",
        model="camliraft",
        overrides=["model.n_iters_train=4", "training.epochs=1"],
    )
    assert cfg.model.n_iters_train == 4
    assert cfg.training.epochs == 1


def test_all_model_configs_compose():
    for model in ["camliraft", "camliraft_l", "camlipwc", "camlipwc_l", "pwc", "raft"]:
        cfg = compose(
            CONF_DIR,
            trainset="flyingthings3d_subset",
            valset="flyingthings3d_subset",
            model=model,
        )
        assert cfg.model.name == model
        assert "epochs" in cfg.training
