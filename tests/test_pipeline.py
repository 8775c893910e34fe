"""Integration: CLIs end to end on the synthetic dataset (SURVEY.md §4.3)."""

import json
import os

import numpy as np
import pytest

from srl_zoo_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def ds_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("pipe") / "synth")
    generate_dataset(folder, n_episodes=3, episode_len=16, img_size=32,
                     seed=0)
    return folder


def test_train_cli_end_to_end(ds_folder, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train as train_cli
    log = str(tmp_path / "log_ae")
    train_cli.main(["--data-folder", ds_folder, "--losses", "autoencoder",
                    "--state-dim", "4", "-bs", "8", "--epochs", "1",
                    "--log-folder", log, "--seed", "1"])
    assert os.path.exists(os.path.join(log, "states_rewards.npz"))
    assert os.path.exists(os.path.join(log, "exp_config.json"))
    sr = np.load(os.path.join(log, "states_rewards.npz"))
    assert sr["states"].shape == (48, 4)
    assert len(sr["rewards"]) == 48

    from srl_zoo_tpu.evaluation import knn_images, predict_reward
    score = knn_images.main(["--log-folder", log, "--n-grids", "0"])
    assert np.isfinite(score)
    acc = predict_reward.main(["--log-folder", log])
    assert 0.0 <= acc <= 1.0

    from srl_zoo_tpu.evaluation import predict_dataset
    path = predict_dataset.main(["--log-folder", log, "-n", "10"])
    sr2 = np.load(path)
    assert sr2["states"].shape == (10, 4)


def test_pipeline_cli_grid(ds_folder, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import pipeline as pipeline_cli
    results = pipeline_cli.main(
        ["--data-folder", ds_folder, "--losses", "autoencoder",
         "--state-dims", "4", "--epochs", "1", "-bs", "8", "--no-grids"])
    assert len(results) == 1
    r = results[0]
    assert {"knn_mse", "gtc", "reward_accuracy"} <= set(r)
    report = tmp_path / "logs" / "synth" / "pipeline_report.json"
    assert report.exists()
    assert json.loads(report.read_text())[0]["losses"] == ["autoencoder"]


def test_losses_plot_cli(ds_folder, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train as train_cli
    log = str(tmp_path / "log_plot")
    train_cli.main(["--data-folder", ds_folder, "--losses", "vae",
                    "--state-dim", "4", "-bs", "8", "--epochs", "1",
                    "--log-folder", log, "--seed", "1"])
    from srl_zoo_tpu.plotting import losses_plot
    losses_plot.main(["--log-folder", log])
    assert os.path.exists(os.path.join(log, "losses.png"))


def test_preprocess_cli(tmp_path):
    """record_* episodes -> npz schema -> trainable dataset."""
    import cv2

    data = tmp_path / "raw"
    rng = np.random.RandomState(0)
    for ep in range(2):
        rec = data / f"record_{ep:03d}"
        rec.mkdir(parents=True)
        t = 6
        np.savez(rec / "episode_data.npz",
                 actions=rng.randint(0, 4, t),
                 rewards=rng.randint(-1, 2, t).astype(np.float32),
                 ground_truth_states=rng.randn(t, 2).astype(np.float32))
        for i in range(t):
            img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            cv2.imwrite(str(rec / f"frame{i:06d}.jpg"), img)

    from srl_zoo_tpu.preprocessing.preprocess import main as pp_main
    pp_main(["--data-folder", str(data), "--img-size", "32"])
    assert (data / "preprocessed_data.npz").exists()
    assert (data / "ground_truth.npz").exists()
    assert (data / "frames.npy").exists()

    from srl_zoo_tpu.data.schema import load_dataset
    ds = load_dataset(str(data))
    assert ds.n_samples == 12
    assert ds.frames.shape == (12, 32, 32, 3)
    assert ds.episode_starts.sum() == 2


def test_recorder_to_training_lifecycle(tmp_path, monkeypatch):
    """record -> preprocess -> load -> one training epoch: the full data
    lifecycle without the reference's companion recorder repo."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(0)

    from srl_zoo_tpu.data.record import DatasetRecorder
    folder = str(tmp_path / "recorded")
    rec = DatasetRecorder(folder)
    for ep in range(2):
        rec.new_episode()
        for t in range(8):
            obs = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            rec.record(obs, action=rng.randint(4), reward=float(t == 7),
                       ground_truth_state=rng.randn(2))
    rec.close()

    from srl_zoo_tpu.preprocessing.preprocess import main as pp_main
    pp_main(["--data-folder", folder, "--img-size", "32"])

    import train as train_cli
    log = str(tmp_path / "rec_log")
    train_cli.main(["--data-folder", folder, "--losses", "autoencoder",
                    "--state-dim", "2", "-bs", "8", "--epochs", "1",
                    "--log-folder", log, "--seed", "1"])
    sr = np.load(os.path.join(log, "states_rewards.npz"))
    assert sr["states"].shape == (16, 2)


def test_pipeline_exp_config(ds_folder, tmp_path, monkeypatch):
    """Every grid key is honored — 'seeds' and 'val-size' used to be read
    from the CLI defaults only, silently running the wrong experiment
    (review r2)."""
    monkeypatch.chdir(tmp_path)
    grid = {"data-folder": ds_folder, "losses": [["autoencoder"]],
            "state-dims": [4], "epochs": 1, "batch-size": 8,
            "seeds": [1, 2], "val-size": 0.25}
    cfg_path = tmp_path / "grid.json"
    cfg_path.write_text(json.dumps(grid))
    import pipeline as pipeline_cli
    results = pipeline_cli.main(["--exp-config", str(cfg_path), "--no-grids"])
    assert len(results) == 1 and np.isfinite(results[0]["knn_mse"])
    # the seeds key took effect: multi-seed aggregate with mean/std rows
    assert results[0]["seeds"] == [1, 2]
    assert "knn_mse_std" in results[0] and "images_per_sec_std" in results[0]
    assert os.path.exists(tmp_path / "logs" / os.path.basename(ds_folder)
                          / "pipeline_report.json")


def test_pipeline_report_survives_failed_cell(ds_folder, tmp_path,
                                              monkeypatch):
    """The report is rewritten after every grid cell, so a crash in a later
    cell keeps the completed cells' summary (review r2)."""
    monkeypatch.chdir(tmp_path)
    grid = {"data-folder": ds_folder,
            "losses": [["autoencoder"], ["not_a_loss"]],
            "state-dims": [4], "epochs": 1, "batch-size": 8}
    cfg_path = tmp_path / "grid.json"
    cfg_path.write_text(json.dumps(grid))
    import pipeline as pipeline_cli
    with pytest.raises(ValueError, match="Unknown loss"):
        pipeline_cli.main(["--exp-config", str(cfg_path), "--no-grids"])
    report = (tmp_path / "logs" / os.path.basename(ds_folder)
              / "pipeline_report.json")
    saved = json.loads(report.read_text())
    assert len(saved) == 1 and saved[0]["losses"] == ["autoencoder"]


def test_frames_cache_stale_tolerates_corrupt_file(tmp_path):
    """A truncated/corrupt frames.npy (pre-atomic-write crash) reads as
    STALE (rebuild) rather than aborting check_dataset (ADVICE r2)."""
    from srl_zoo_tpu.preprocessing.preprocess import frames_cache_stale

    p = tmp_path / "frames.npy"
    p.write_bytes(b"\x93NUMPY garbage that is not a valid header")
    assert frames_cache_stale(str(p), 32) is True


def test_synthetic_kuka_task(tmp_path):
    from srl_zoo_tpu.data.schema import load_dataset
    folder = str(tmp_path / "kuka")
    generate_dataset(folder, n_episodes=2, episode_len=12, img_size=32,
                     seed=0, task="kuka")
    ds = load_dataset(folder)
    assert ds.n_samples == 24
    assert ds.ground_truth_states.shape[1] == 2


def test_train_cli_resume(ds_folder, tmp_path, monkeypatch):
    """--resume continues from the full-state checkpoint (step count grows
    instead of restarting)."""
    monkeypatch.chdir(tmp_path)
    import train as train_cli
    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.training import checkpoint as ckpt
    from srl_zoo_tpu.training.state import create_train_state

    import jax

    log = str(tmp_path / "resume_log")
    base = ["--data-folder", ds_folder, "--losses", "autoencoder",
            "--state-dim", "4", "-bs", "8", "--seed", "1",
            "--log-folder", log]
    train_cli.main(base + ["--epochs", "1"])
    cfg = SRLConfig.load(log)
    _, template, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    step_after_1 = int(ckpt.restore_train_state(log,
                                                jax.device_get(template)).step)
    train_cli.main(base + ["--epochs", "3", "--resume"])
    step_after_3 = int(ckpt.restore_train_state(log,
                                                jax.device_get(template)).step)
    assert step_after_3 > step_after_1
    # resumed run did NOT redo epoch 1: exactly 2 more epochs of steps
    assert step_after_3 == 3 * step_after_1


def test_pipeline_multi_seed(ds_folder, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import pipeline as pipeline_cli
    results = pipeline_cli.main(
        ["--data-folder", ds_folder, "--losses", "autoencoder",
         "--state-dims", "4", "--epochs", "1", "-bs", "8", "--no-grids",
         "--seeds", "1", "2"])
    r = results[0]
    assert r["seeds"] == [1, 2]
    assert "knn_mse_std" in r and np.isfinite(r["knn_mse"])
    assert len(r["log_folders"]) == 2
    # sub-second cells must land in DISTINCT folders (VERDICT r2 weak #6:
    # the 1-second-resolution default folder silently merged two cells)
    assert len(set(r["log_folders"])) == 2


def test_cell_log_folders_never_collide(tmp_path, monkeypatch):
    """Same-second, same-coordinate cells get suffixed distinct folders."""
    monkeypatch.chdir(tmp_path)
    import pipeline as pipeline_cli

    a = pipeline_cli._cell_log_folder("ds", "custom_cnn", ["vae"], 8, 1)
    b = pipeline_cli._cell_log_folder("ds", "custom_cnn", ["vae"], 8, 2)
    assert a != b  # seed is encoded
    os.makedirs(a)
    c = pipeline_cli._cell_log_folder("ds", "custom_cnn", ["vae"], 8, 1)
    assert c != a  # existing folder -> numeric suffix


def test_exp_config_value_coercion():
    """Grid values are coerced/validated against the argparse option types at
    config-load time (ADVICE r2): strings for ints, scalars for lists, and
    bad choices fail fast naming the key."""
    import argparse

    import pipeline as pipeline_cli

    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int)
    p.add_argument("--state-dims", nargs="+", type=int)
    p.add_argument("--dtype", choices=["float32", "bfloat16"])
    p.add_argument("--multi-view", action="store_true")
    acts = {a.dest: a for a in p._actions}

    co = pipeline_cli._coerce_grid_value
    assert co(acts["epochs"], "50") == 50
    assert co(acts["state_dims"], 4) == [4]
    assert co(acts["state_dims"], ["4", 8]) == [4, 8]
    assert co(acts["dtype"], "bfloat16") == "bfloat16"
    assert co(acts["multi_view"], 1) is True
    with pytest.raises(ValueError):
        co(acts["epochs"], "many")
    with pytest.raises(ValueError):
        co(acts["epochs"], 1.5)
    with pytest.raises(ValueError):
        co(acts["dtype"], "float16")
    with pytest.raises(ValueError):
        co(acts["multi_view"], "yes")


def test_exp_config_bad_value_fails_fast(ds_folder, tmp_path, monkeypatch):
    """A mistyped grid value aborts at config load (SystemExit naming the
    key), before any preprocessing or training starts."""
    monkeypatch.chdir(tmp_path)
    grid = {"data-folder": ds_folder, "losses": [["autoencoder"]],
            "epochs": "not-a-number"}
    cfg_path = tmp_path / "bad.json"
    cfg_path.write_text(json.dumps(grid))
    import pipeline as pipeline_cli
    with pytest.raises(SystemExit):
        pipeline_cli.main(["--exp-config", str(cfg_path), "--no-grids"])


def test_balanced_sampling_and_l1_cli(ds_folder, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import train as train_cli
    log = str(tmp_path / "bal")
    train_cli.main(["--data-folder", ds_folder, "--losses", "reward",
                    "--state-dim", "4", "-bs", "8", "--epochs", "1",
                    "--seed", "1", "--log-folder", log,
                    "--balanced-sampling", "--l1-reg", "0.01"])
    hist = np.load(os.path.join(log, "loss_history.npz"))
    assert "train/l1_reg" in hist
    assert np.isfinite(hist["train/total"]).all()


def test_plot_every_live_view(tmp_path, monkeypatch):
    """--plot-every writes per-epoch plots plus the live view artifacts
    (latest.png + auto-refreshing live.html — the headless equivalent of the
    reference's interactive matplotlib mode)."""

    from srl_zoo_tpu.data.synthetic import generate_dataset
    from train import main as train_main

    data = str(tmp_path / "synth")
    generate_dataset(data, n_episodes=3, episode_len=20, img_size=32, seed=0)
    log = str(tmp_path / "run")
    monkeypatch.chdir(tmp_path)
    train_main(["--data-folder", data, "--losses", "autoencoder",
                "--state-dim", "4", "-bs", "16", "--epochs", "2",
                "--plot-every", "1", "--log-folder", log,
                "--no-display-plots"])
    plots = os.path.join(log, "plots")
    assert os.path.exists(os.path.join(plots, "epoch_1.png"))
    assert os.path.exists(os.path.join(plots, "epoch_2.png"))
    assert os.path.exists(os.path.join(plots, "latest.png"))
    html = open(os.path.join(plots, "live.html")).read()
    assert "latest.png" in html and "refresh" in html


def test_train_cli_no_validation_split(tmp_path, monkeypatch):
    """--val-size 0: no val loader; best-model selection falls back to train
    metrics and the export contract still holds."""

    from srl_zoo_tpu.data.synthetic import generate_dataset
    from train import main as train_main

    data = str(tmp_path / "synth")
    generate_dataset(data, n_episodes=3, episode_len=20, img_size=32, seed=0)
    monkeypatch.chdir(tmp_path)
    log = str(tmp_path / "novalrun")
    train_main(["--data-folder", data, "--losses", "autoencoder",
                "--state-dim", "4", "-bs", "16", "--epochs", "2",
                "--val-size", "0", "--log-folder", log,
                "--no-display-plots"])
    assert os.path.exists(os.path.join(log, "srl_model.msgpack"))
    hist = np.load(os.path.join(log, "loss_history.npz"))
    assert np.all(np.isfinite(hist["train/total"]))
