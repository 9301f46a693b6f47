"""Config argparse overlay + metrics logger tests."""
import json

from ndtpu.train.config import TrainConfig
from ndtpu.train.metrics import MetricLogger


def test_config_defaults_match_reference():
    cfg = TrainConfig.from_args([])
    # tools/train.py:99-112 defaults
    assert cfg.task == "segmentation"
    assert cfg.n_desired_nds == 2080
    assert cfg.n_samples == 70000
    assert cfg.epochs == 200
    assert cfg.save_every == 2
    assert cfg.batch_size == 16
    assert cfg.learning_rate == 0.034
    assert cfg.n_classes == 28
    assert cfg.feature_dim == 768


def test_config_cli_overrides():
    cfg = TrainConfig.from_args(["--batch_size", "4", "--learning_rate", "0.5"])
    assert cfg.batch_size == 4 and cfg.learning_rate == 0.5


def test_config_default_overrides_stay_cli_overridable():
    cfg = TrainConfig.from_args(["--n_samples", "99"], n_samples=4160)
    assert cfg.n_samples == 99
    cfg = TrainConfig.from_args([], n_samples=4160)
    assert cfg.n_samples == 4160


def test_config_search_field():
    """The trainers default to the probe-seeded fused search (the r5
    benched configuration) and reject unknown modes."""
    import pytest

    assert TrainConfig.from_args([]).search == "probe"
    assert TrainConfig.from_args(["--search", "fast"]).search == "fast"
    assert TrainConfig.from_args(["--search", "reference"]).search == "reference"
    with pytest.raises(ValueError, match="fast|probe|reference|grid"):
        TrainConfig.from_args(["--search", "bogus"])


def test_metric_logger_stdout(capsys):
    logger = MetricLogger(use_wandb=False)
    logger.log({"loss": 1.5, "accuracy": 0.25}, step=3)
    logger.finish()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["loss"] == 1.5 and payload["step"] == 3
