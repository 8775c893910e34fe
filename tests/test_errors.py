"""Error paths: failures must be loud and informative, not silent."""

import numpy as np
import pytest

from srl_zoo_tpu.config import SRLConfig


def test_loader_propagates_decode_errors(synthetic_dataset, tmp_path):
    """An unreadable image raises in the consumer, not silently in the
    producer thread."""
    import dataclasses

    from srl_zoo_tpu.data.loader import DataLoader

    ds = dataclasses.replace(synthetic_dataset, frames=None,
                             images_path=np.asarray(
                                 ["missing/nope.png"]
                                 * synthetic_dataset.n_samples))
    cfg = SRLConfig(state_dim=2, img_height=32, img_width=32, batch_size=4,
                    losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),))
    loader = DataLoader(ds, ds.training_indices()[:4], cfg, shuffle=False,
                        seed=0)
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_device_cache_on_requires_frames(synthetic_dataset, tmp_path):
    import dataclasses

    from srl_zoo_tpu.training.learner import SRL4robotics

    ds = dataclasses.replace(synthetic_dataset, frames=None)
    cfg = SRLConfig(state_dim=2, img_height=32, img_width=32, batch_size=4,
                    epochs=1, losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    device_cache="on", log_folder=str(tmp_path / "x"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    with pytest.raises(ValueError, match="device-cache"):
        learner.learn(ds)


def test_state_encoder_rejects_wrong_geometry(trained_ae_cli_run):
    from srl_zoo_tpu.inference import StateEncoder

    enc = StateEncoder.load(trained_ae_cli_run)
    with pytest.raises(ValueError, match="expected uint8 observations"):
        enc.encode(np.zeros((64, 64, 3), np.uint8))


def test_preprocess_requires_records(tmp_path):
    from srl_zoo_tpu.preprocessing.preprocess import preprocess_folder
    with pytest.raises(FileNotFoundError):
        preprocess_folder(str(tmp_path))


def test_supervised_dim_mismatch_is_loud(synthetic_dataset, tmp_path):
    from srl_zoo_tpu.training.learner import SRL4robotics
    cfg = SRLConfig(state_dim=7, img_height=32, img_width=32, batch_size=8,
                    epochs=1, losses=(("supervised", 1.0),),
                    split_dims=(("supervised", -1),),
                    log_folder=str(tmp_path / "sup"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    with pytest.raises(ValueError, match="supervised"):
        learner.learn(synthetic_dataset)


def test_sharded_cache_requires_divisible_batch(synthetic_dataset, tmp_path):
    import pytest

    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.training.learner import SRL4robotics

    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32,
                    batch_size=12,  # not divisible by the 8-device mesh
                    losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    n_actions=ds.n_actions, device_cache="sharded",
                    log_folder=str(tmp_path / "x"))
    with pytest.raises(ValueError, match="divisible by the"):
        SRL4robotics(cfg, log_folder=cfg.log_folder)


def test_resume_requires_log_folder(synthetic_dataset, capsys):
    """--resume without --log-folder would 'resume' into a fresh timestamped
    folder, silently retraining from epoch 0 — reject it instead."""
    import pytest

    import train as train_cli

    with pytest.raises(SystemExit) as exc:
        train_cli.main(["--data-folder", synthetic_dataset.data_folder,
                        "--losses", "autoencoder", "--resume",
                        "--epochs", "1", "--no-display-plots"])
    assert exc.value.code == 1
    assert "--log-folder" in capsys.readouterr().out


def test_default_log_folder_stays_under_logs():
    """An absolute --data-folder must not hijack os.path.join and write run
    artifacts inside the dataset tree."""
    import train as train_cli

    import os

    folder = train_cli.default_log_folder("/mnt/datasets/kuka", "cnn", ["ae"])
    assert folder.split(os.sep)[0] == "logs"
    assert "/mnt/" not in folder and "kuka" in folder


def test_pipeline_loss_groups_normalized():
    """exp-config 'losses' accepts canonical, flat-string, and single-string
    spellings — and rejects garbage at config-load time, not after
    preprocessing has run."""
    import pytest

    from pipeline import _normalize_loss_groups

    assert _normalize_loss_groups([["autoencoder"], ["vae", "priors"]]) == \
        [["autoencoder"], ["vae", "priors"]]
    assert _normalize_loss_groups(["autoencoder", "vae priors"]) == \
        [["autoencoder"], ["vae", "priors"]]
    assert _normalize_loss_groups("autoencoder") == [["autoencoder"]]
    with pytest.raises(SystemExit):
        _normalize_loss_groups([])
    with pytest.raises(SystemExit):
        _normalize_loss_groups([42])
