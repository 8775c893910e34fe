"""Plotting: every branch renders and writes files headlessly."""

import os

import numpy as np


def test_plot_representation_dims(tmp_path, rng):
    from srl_zoo_tpu.plotting.representation_plot import plot_representation
    rewards = rng.randn(50)
    for d in (1, 2, 3, 10):  # 1D line, 2D scatter, 3D scatter, PCA path
        out = str(tmp_path / f"states_{d}d.png")
        plot_representation(rng.randn(50, d), rewards, out)
        assert os.path.exists(out)


def test_plot_correlation(tmp_path, rng):
    from srl_zoo_tpu.plotting.representation_plot import plot_correlation
    out = str(tmp_path / "corr.png")
    plot_correlation(rng.rand(8, 2) * 2 - 1, out)
    assert os.path.exists(out)


def test_plot_losses_from_history(tmp_path):
    from srl_zoo_tpu.plotting.losses_plot import plot_losses
    hist = str(tmp_path / "loss_history.npz")
    np.savez(hist, epoch=np.arange(5),
             **{"train/total": np.linspace(1, 0.1, 5),
                "val/total": np.linspace(1.2, 0.3, 5)})
    out = str(tmp_path / "losses.png")
    plot_losses(hist, out)
    assert os.path.exists(out)


def test_profile_summarizer(synthetic_dataset, tmp_path):
    """--profile trace -> readable category table (CPU trace)."""
    import pytest
    pytest.importorskip("tensorflow")

    from srl_zoo_tpu.config import SRLConfig
    from srl_zoo_tpu.training.learner import SRL4robotics
    from srl_zoo_tpu.utils.profiling import summarize_profile_dir

    ds = synthetic_dataset
    cfg = SRLConfig(state_dim=4, img_height=32, img_width=32, batch_size=16,
                    epochs=1, losses=(("autoencoder", 1.0),),
                    split_dims=(("autoencoder", -1),),
                    log_folder=str(tmp_path / "prof"))
    learner = SRL4robotics(cfg, log_folder=cfg.log_folder)
    learner.learn(ds, profile=True)
    rows = summarize_profile_dir(str(tmp_path / "prof" / "profile"))
    # CPU traces carry no op_profile categories (rows == []); on TPU this
    # yields the per-category table (verified manually, docs/PERF.md).
    assert isinstance(rows, list)
    assert all(len(r) == 3 for r in rows)


def test_live_view_headless_returns_none(monkeypatch):
    """On a host with no window server, LiveView.create() must return None
    (train.py then relies on the live.html auto-refresh view)."""
    from srl_zoo_tpu.plotting.representation_plot import LiveView

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    monkeypatch.setattr("sys.platform", "linux")
    assert LiveView.create() is None


def test_live_view_update_cycle(monkeypatch, rng):
    """With a (faked) display, the interactive window path runs: create ->
    update twice (2D and 3D-projected states) -> close, under the Agg
    backend (FigureManagerBase makes the GUI calls no-ops)."""
    import matplotlib.pyplot as plt

    from srl_zoo_tpu.plotting import representation_plot as rp

    monkeypatch.setenv("DISPLAY", ":0")
    orig_switch = plt.switch_backend
    # resolve Agg while pretending the TkAgg switch succeeded (a pure no-op
    # would leave pyplot's backend module unresolved under the patch)
    monkeypatch.setattr(plt, "switch_backend", lambda name: orig_switch("Agg"))
    monkeypatch.setattr(plt, "pause", lambda t: None)  # no GUI event loop
    view = rp.LiveView.create()
    assert view is not None
    view.update(rng.randn(40, 2), rng.rand(40), "epoch 1")
    view.update(rng.randn(40, 8), rng.rand(40), "epoch 2")  # PCA path
    view.close()


def test_live_view_dead_x_restores_backend(monkeypatch):
    """A TkAgg switch that succeeds but whose figure creation fails (dead X
    forward) must restore the prior backend — otherwise every later file
    plot inherits the broken GUI backend and kills the run (round-3
    review)."""
    import matplotlib
    import matplotlib.pyplot as plt

    from srl_zoo_tpu.plotting import representation_plot as rp

    before = matplotlib.get_backend()
    monkeypatch.setenv("DISPLAY", ":0")

    def fake_switch(name):
        # emulate: switch_backend succeeds (only imports tkinter)...
        matplotlib.rcParams["backend"] = name

    monkeypatch.setattr(plt, "switch_backend", fake_switch)
    monkeypatch.setattr(plt, "figure",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("couldn't connect to display")))
    assert rp.LiveView.create() is None
    assert matplotlib.rcParams["backend"] == before


def test_live_view_update_failure_goes_dark_not_fatal(monkeypatch, rng):
    """The user closing the window mid-run (draw raises) must disable the
    view, never abort training; close() is idempotent afterwards."""
    import matplotlib.pyplot as plt

    from srl_zoo_tpu.plotting import representation_plot as rp

    monkeypatch.setenv("DISPLAY", ":0")
    orig_switch = plt.switch_backend
    monkeypatch.setattr(plt, "switch_backend", lambda name: orig_switch("Agg"))
    monkeypatch.setattr(plt, "pause", lambda t: None)
    view = rp.LiveView.create()
    assert view is not None
    view.fig.clf = lambda: (_ for _ in ()).throw(
        RuntimeError("canvas destroyed"))
    view.update(rng.randn(10, 2), rng.rand(10), "epoch 1")  # must not raise
    assert view.fig is None  # went dark
    view.update(rng.randn(10, 2), rng.rand(10), "epoch 2")  # no-op
    view.close()  # idempotent
