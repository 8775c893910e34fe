"""Config: loss-string parsing, split slices, exp_config round trip."""

import json

import pytest

from srl_zoo_tpu.config import (SRLConfig, compute_split_slices,
                                parse_loss_arguments)


def test_parse_simple():
    losses, splits = parse_loss_arguments(["autoencoder"], 8)
    assert losses == {"autoencoder": 1.0}
    assert splits == {"autoencoder": -1}


def test_parse_weights_and_splits():
    losses, splits = parse_loss_arguments(
        ["autoencoder:1:4", "inverse:10:2", "reward:5:2"], 8)
    assert losses == {"autoencoder": 1.0, "inverse": 10.0, "reward": 5.0}
    assert splits == {"autoencoder": 4, "inverse": 2, "reward": 2}


def test_parse_share_previous_slice():
    losses, splits = parse_loss_arguments(
        ["autoencoder:1:6", "reward:5:-1", "inverse:2:2"], 8)
    slices = compute_split_slices(losses, splits, 8)
    assert slices["autoencoder"] == (0, 6)
    assert slices["reward"] == (0, 6)  # -1 shares the previous slice
    assert slices["inverse"] == (6, 2)


def test_parse_no_splits_full_state():
    losses, splits = parse_loss_arguments(["vae", "priors"], 16)
    slices = compute_split_slices(losses, splits, 16)
    assert slices == {"vae": (0, 16), "priors": (0, 16)}


def test_parse_bad_sum():
    with pytest.raises(ValueError):
        parse_loss_arguments(["autoencoder:1:4", "inverse:1:2"], 8)


def test_parse_unknown_loss():
    with pytest.raises(ValueError):
        parse_loss_arguments(["notaloss"], 8)


def test_parse_duplicate():
    with pytest.raises(ValueError):
        parse_loss_arguments(["vae", "vae:2"], 8)


def test_exp_config_round_trip(tmp_path):
    cfg = SRLConfig(state_dim=16, model_type="resnet",
                    losses=(("vae", 0.5), ("inverse", 2.0)),
                    split_dims=(("vae", 8), ("inverse", 8)),
                    n_actions=6, beta=4.0, batch_size=64,
                    multi_view=False, compute_dtype="bfloat16")
    cfg.save(str(tmp_path))
    loaded = SRLConfig.load(str(tmp_path))
    assert loaded == cfg
    with open(tmp_path / "exp_config.json") as f:
        raw = json.load(f)
    assert raw["state-dim"] == 16 and raw["losses"] == {"vae": 0.5,
                                                        "inverse": 2.0}


def test_channels_multiview_vs_triplet():
    mv = SRLConfig(losses=(("autoencoder", 1.0),), multi_view=True)
    assert mv.n_channels == 6
    tr = SRLConfig(losses=(("triplet", 1.0),), multi_view=True)
    assert tr.n_channels == 3


def test_reconstruction_rejects_image_net_normalize():
    import pytest
    with pytest.raises(ValueError, match="normalize_mode='tf'"):
        SRLConfig(losses=(("autoencoder", 1.0),),
                  split_dims=(("autoencoder", -1),),
                  normalize_mode="image_net")
    # non-reconstruction losses may use image_net normalization
    SRLConfig(losses=(("priors", 1.0),), split_dims=(("priors", -1),),
              normalize_mode="image_net")


def test_unknown_model_type_rejected():
    import pytest
    with pytest.raises(ValueError, match="model type"):
        SRLConfig(model_type="transformer")
