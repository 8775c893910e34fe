"""Test fixtures: CPU-only JAX with 8 virtual devices (SURVEY.md §4.4).

The multi-device tests replace the reference's (nonexistent) distributed
testing: the DP mesh path runs on 8 fake CPU devices and must agree with
single-device training on the same global batch.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
if jax.default_backend() != "cpu":  # axon plugin already initialized
    raise RuntimeError("tests must run on CPU (got "
                       f"{jax.default_backend()}); run pytest from a fresh "
                       "interpreter")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.data.synthetic import generate_dataset
    folder = str(tmp_path_factory.mktemp("data") / "synth")
    generate_dataset(folder, n_episodes=4, episode_len=24, img_size=32, seed=0)
    return load_dataset(folder)


@pytest.fixture(scope="session")
def synthetic_dataset_mv(tmp_path_factory):
    from srl_zoo_tpu.data.schema import load_dataset
    from srl_zoo_tpu.data.synthetic import generate_dataset
    folder = str(tmp_path_factory.mktemp("data") / "synth_mv")
    generate_dataset(folder, n_episodes=4, episode_len=24, img_size=32,
                     seed=0, multi_view=True)
    return load_dataset(folder)


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def trained_ae_cli_run(synthetic_dataset, tmp_path_factory):
    """One 1-epoch autoencoder run through the REAL train.py CLI, with every
    run artifact (srl_model.msgpack, exp_config.json, states_rewards.npz,
    loss_history.npz). Shared by READ-ONLY consumers (inference/eval/
    plotting CLIs) to keep the fast lane under budget — a test that writes
    into the run folder or resumes it must train its own."""
    import train as train_cli
    ds = synthetic_dataset
    log = str(tmp_path_factory.mktemp("shared") / "ae_cli_run")
    train_cli.main(["--data-folder", ds.data_folder, "--losses",
                    "autoencoder", "--epochs", "1", "--state-dim", "4",
                    "-bs", "16", "--log-folder", log, "--no-display-plots"])
    return log
