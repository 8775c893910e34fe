#!/usr/bin/env python
"""Train an SRL model — the reference CLI surface, TPU-native engine.

Reference: train.py of araffin/srl-zoo — parses the ``--losses
name[:weight[:split_dim]]`` flags, loads the npz dataset, builds SRL4robotics,
runs .learn(), exports states_rewards.npz + exp_config.json + loss history.

Example:
  python train.py --data-folder data/mobile_robot --losses autoencoder \
      --state-dim 200 -bs 32 --epochs 30
  python train.py --data-folder data/kuka --losses autoencoder:1:100 \
      inverse:10:100 --state-dim 200 --model-type resnet
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import numpy as np

from srl_zoo_tpu.config import (SRLConfig, build_config,
                                parse_loss_arguments)
from srl_zoo_tpu.data.schema import load_dataset, save_states_rewards
from srl_zoo_tpu.evaluation.gtc import ground_truth_correlation
from srl_zoo_tpu.plotting.representation_plot import (plot_correlation,
                                                      plot_representation)
from srl_zoo_tpu.training.learner import SRL4robotics
from srl_zoo_tpu.utils import (createFolder, parseDataFolder, printGreen,
                               printYellow, set_global_seeds)


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="State Representation Learning with a zoo of objectives "
                    "(TPU-native rebuild of srl-zoo train.py)")
    parser.add_argument("--data-folder", type=str, required=True,
                        help="Dataset folder (data/<name> or <name>)")
    parser.add_argument("--losses", nargs="+", type=str,
                        default=["autoencoder"],
                        help="Losses as name[:weight[:split_dim]]")
    parser.add_argument("--model-type", type=str, default="custom_cnn",
                        choices=["custom_cnn", "resnet", "mlp", "linear"])
    parser.add_argument("--state-dim", type=int, default=2)
    parser.add_argument("-bs", "--batch-size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("-lr", "--learning-rate", type=float, default=5e-3)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--val-size", type=float, default=0.2)
    parser.add_argument("--training-set-size", type=int, default=-1,
                        help="Limit the number of training samples (-1 = all)")
    parser.add_argument("--l1-reg", type=float, default=0.0)
    parser.add_argument("--l2-reg", type=float, default=0.0)
    parser.add_argument("--beta", type=float, default=1.0,
                        help="beta for the beta-VAE KL term")
    parser.add_argument("--occlusion-percentage", type=float, default=0.5,
                        help="DAE occlusion fraction")
    parser.add_argument("--noise-type", type=str, default="occlusion",
                        choices=["occlusion", "gaussian"],
                        help="DAE corruption: occluded patch or additive "
                             "Gaussian noise (reference GaussianNoise layer)")
    parser.add_argument("--noise-std", type=float, default=0.2,
                        help="Gaussian DAE noise stddev (normalized units)")
    parser.add_argument("--multi-view", action="store_true",
                        help="Use two camera views (6-channel input / triplet)")
    parser.add_argument("--balanced-sampling", action="store_true",
                        help="Oversample rare reward classes")
    parser.add_argument("--inverse-model-type", type=str, default="linear",
                        choices=["linear", "mlp"])
    parser.add_argument("--bn-momentum", type=float, default=0.9,
                        help="BatchNorm running-average momentum, flax "
                             "convention ra = m*ra + (1-m)*batch. Default "
                             "0.9 = torch BatchNorm2d's default (the "
                             "reference's semantics); flax's own default "
                             "is 0.99 (design decision #23)")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Accumulate gradients over N minibatches per "
                             "optimizer update (effective batch = N*bs at "
                             "single-batch activation memory)")
    parser.add_argument("--episode-prior-optimizer", type=str,
                        default="shared", choices=["shared", "separate"],
                        help="Train the episode-prior discriminator through "
                             "the shared Adam step (default) or give it its "
                             "own independent Adam moments")
    parser.add_argument("--path-to-dae", type=str, default="",
                        help="Log folder of a pretrained DAE "
                             "(perceptual loss)")
    parser.add_argument("--pretrained-weights", type=str, default="",
                        help="torch resnet18 state_dict (.npz or .pth) to "
                             "port into the encoder (--model-type resnet)")
    parser.add_argument("--log-folder", type=str, default="",
                        help="Where to write the run (default: "
                             "logs/<dataset>/<timestamp>_<model>_<losses>)")
    parser.add_argument("--num-cpu", type=int, default=4,
                        help="Loader worker threads")
    parser.add_argument("--no-display-plots", action="store_true",
                        help="Kept for reference-CLI compatibility "
                             "(plots are always written to files)")
    parser.add_argument("--plot-every", type=int, default=0,
                        help="Write a live representation plot every N "
                             "epochs (reference: live plotting during "
                             "training; 0 = off)")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest full-state checkpoint "
                             "in --log-folder")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace of the first "
                             "epoch into <log-folder>/profile")
    parser.add_argument("--checkpoint-every", type=int, default=1,
                        help="Write the full resume checkpoint every N "
                             "epochs (best-model export is unaffected)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Compute dtype for conv/matmul (MXU)")
    parser.add_argument("--device-cache", type=str, default="auto",
                        choices=["auto", "on", "off", "hybrid", "sharded"],
                        help="Cache the dataset frames in device HBM and "
                             "ship only index arrays per step; 'auto' falls "
                             "back to a hybrid hot-prefix cache for "
                             "over-budget datasets (SRL_ZOO_CACHE_BUDGET_MB)")
    parser.add_argument("--stream-overlap", default=False,
                        action=argparse.BooleanOptionalAction,
                        help="Streaming mode: issue the next batch's "
                             "host->device transfer while the current step "
                             "computes (double buffering; numerically "
                             "identical). Throughput-neutral through a "
                             "serializing tunnel link (measured, PERF.md); "
                             "turn on for PCIe hosts with independent DMA "
                             "engines")
    parser.add_argument("--no-hybrid-rotation", action="store_true",
                        default=False,
                        help="Hybrid cache only: pin the HBM-resident hot "
                             "set to the static index prefix instead of "
                             "rotating residency across epochs "
                             "(data/hybrid.py; rotation is the default and "
                             "removes the prefix-local triplet-negative / "
                             "sample-order bias)")
    # ---- multi-host (DCN) attach: every host runs the same command with its
    # own --process-id; flags default from the SRL_ZOO_* env so pod launchers
    # can inject them without templating the command line
    parser.add_argument("--coordinator-address", type=str,
                        default=os.environ.get("SRL_ZOO_COORDINATOR", ""),
                        help="host:port of process 0 for "
                             "jax.distributed.initialize (multi-host)")
    parser.add_argument("--num-processes", type=int,
                        default=int(os.environ.get("SRL_ZOO_NUM_PROCESSES",
                                                   "1")),
                        help="Total number of hosts/processes (1 = single)")
    parser.add_argument("--process-id", type=int,
                        default=int(os.environ.get("SRL_ZOO_PROCESS_ID",
                                                   "0")),
                        help="This host's index in [0, num-processes)")
    return parser.parse_args(argv)


def default_log_folder(dataset_name: str, model_type: str,
                       loss_names) -> str:
    ts = datetime.datetime.now().strftime("%y-%m-%d_%Hh%M_%S")
    exp = f"{ts}_{model_type}_{'_'.join(loss_names)}"
    # basename: an absolute --data-folder must not make os.path.join discard
    # the 'logs' root and write run artifacts INSIDE the dataset tree
    # (pipeline._cell_log_folder applies the same guard)
    return os.path.join("logs", os.path.basename(dataset_name.rstrip("/")),
                        exp)


def main(argv=None):
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    from srl_zoo_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    args = parse_args(argv)
    set_global_seeds(args.seed)

    if args.num_processes > 1:
        # must run before any JAX backend use; after this, jax.devices() is
        # the GLOBAL device set and the mesh/shardings span all hosts
        from srl_zoo_tpu.parallel.mesh import initialize_distributed
        initialize_distributed(coordinator_address=args.coordinator_address,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    else:
        # bounded first backend touch: a wedged device transport fails in
        # minutes with a diagnosis instead of hanging the run forever
        from srl_zoo_tpu.utils.platform import require_backend_or_die
        require_backend_or_die()

    dataset_name = parseDataFolder(args.data_folder)
    data_folder = args.data_folder if os.path.isdir(args.data_folder) \
        else os.path.join("data", dataset_name)
    if not os.path.isdir(data_folder):
        printYellow(f"Dataset folder not found: {data_folder}")
        sys.exit(1)

    dataset = load_dataset(data_folder)
    losses, split_dims = parse_loss_arguments(args.losses, args.state_dim)

    if args.resume and not args.log_folder:
        # a fresh timestamped default folder has no checkpoints: the run
        # would silently retrain from epoch 0 while the user believes it
        # resumed
        printYellow("--resume needs --log-folder pointing at the previous "
                    "run (the default log folder is a fresh timestamp — "
                    "there is nothing to resume there)")
        sys.exit(1)
    log_folder = args.log_folder or default_log_folder(
        dataset_name, args.model_type, list(losses))
    if args.num_processes > 1 and args.process_id != 0:
        # only process 0 owns the run's artifacts; the others write their
        # (identical, all-reduced) logs to a scratch subfolder
        log_folder = os.path.join(log_folder, f".proc{args.process_id}")
    createFolder(log_folder, f"Log folder {log_folder} already exists")
    args.log_folder = log_folder
    args.data_folder = data_folder

    # image geometry from the dataset's fast path (falls back to 224x224)
    img_shape = None
    if dataset.frames is not None:
        img_shape = tuple(dataset.frames.shape[1:])
    if args.resume and os.path.exists(os.path.join(log_folder,
                                                   "exp_config.json")):
        # a resumed run must keep its TRAINING-TIME BatchNorm momentum: the
        # saved exp_config is authoritative (configs recorded before the
        # bn-momentum key existed trained at the then-default flax 0.99 —
        # config.from_exp_config encodes that). Rebuilding from argparse
        # defaults would silently flip a pre-r5 run to 0.9 mid-training AND
        # overwrite the record of what it trained at (design decision #23).
        saved = SRLConfig.load(log_folder)
        explicit = any(a.startswith("--bn-momentum")
                       for a in (argv if argv is not None else sys.argv[1:]))
        if not explicit:
            args.bn_momentum = saved.bn_momentum
    cfg = build_config(args, losses, split_dims,
                       n_actions=dataset.n_actions,
                       n_reward_classes=dataset.n_reward_classes,
                       img_shape=img_shape)
    cfg.save(log_folder)
    printGreen(f"Training {cfg.model_type} with losses "
               f"{dict(cfg.losses)} -> {log_folder}")

    learner = SRL4robotics(cfg, log_folder=log_folder)

    epoch_callback = None
    live_view = None
    if args.plot_every > 0:
        plot_idx = np.arange(0, dataset.n_samples,
                             max(dataset.n_samples // 2000, 1),
                             dtype=np.int32)

        plots_dir = os.path.join(log_folder, "plots")
        os.makedirs(plots_dir, exist_ok=True)
        with open(os.path.join(plots_dir, "live.html"), "w") as f:
            # the live representation view (reference: interactive matplotlib
            # during training) — headless-compatible: open this page in any
            # browser and it tracks the newest epoch plot
            f.write('<!doctype html><title>SRL live states</title>\n'
                    '<meta http-equiv="refresh" content="2">\n'
                    '<body style="background:#111;text-align:center">\n'
                    '<img src="latest.png" style="max-width:100%">\n')

        # true interactive window when a GUI backend exists (reference's
        # live matplotlib mode); None on headless hosts, where live.html is
        # the equivalent
        if not args.no_display_plots:
            from srl_zoo_tpu.plotting.representation_plot import LiveView
            live_view = LiveView.create()

        def epoch_callback(lrn, epoch, train_m, val_m):
            if (epoch + 1) % args.plot_every:
                return
            s = lrn.predict_states(dataset, plot_idx)
            title = f"States after epoch {epoch + 1}"
            path = os.path.join(plots_dir, f"epoch_{epoch + 1}.png")
            plot_representation(s, dataset.rewards[plot_idx], path,
                                title=title)
            import shutil
            shutil.copyfile(path, os.path.join(plots_dir, "latest.png"))
            if live_view is not None:
                live_view.update(s, dataset.rewards[plot_idx], title)

    try:
        learner.learn(dataset, epoch_callback=epoch_callback,
                      resume=args.resume, profile=args.profile,
                      checkpoint_every=args.checkpoint_every)
    finally:
        if live_view is not None:
            live_view.close()

    try:
        # ---- export: states for the WHOLE dataset + plots (reference contract)
        states = learner.predict_states(dataset)
        save_states_rewards(log_folder, states, dataset.rewards)
        printGreen(f"Saved states_rewards.npz ({states.shape})")

        plot_representation(states, dataset.rewards,
                            os.path.join(log_folder, "states.png"))
        gtc, corr = ground_truth_correlation(states,
                                             dataset.ground_truth_states)
        plot_correlation(corr, os.path.join(log_folder, "correlation.png"))
        printGreen(f"GTC score: {gtc:.4f}")
        with open(os.path.join(log_folder, "gtc.txt"), "w") as f:
            f.write(f"{gtc:.6f}\n")
    finally:
        if args.num_processes > 1:
            # Every host must finish its (host-side, unsynchronized) artifact
            # writing before ANY host enters the atexit jax.distributed
            # shutdown barrier: a host still rendering plots under load can
            # otherwise miss the barrier deadline and poison the cluster's
            # exit. In a finally so a host whose EXPORT fails still reaches
            # the barrier (the healthy hosts would otherwise hang in it).
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("srl_zoo_end_of_run")
    return log_folder


if __name__ == "__main__":
    main()
