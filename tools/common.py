"""Shared CLI plumbing for the tools (replaces the reference's per-tool duplicated
argparse blocks and the _init_paths sys.path hack — SURVEY.md §1 launch/bootstrap rows)."""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simt_tpu import config as config_lib  # noqa: E402


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--preset", type=str, default=None,
                        help="named preset: warmup_bapa, simt_bapa_lr25, simt_bapa_lr6, simt_sfda")
    parser.add_argument("--data-dir-target", type=str, default="",
                        help="Cityscapes root (images resolved against it)")
    parser.add_argument("--data-list-target", type=str, default=None,
                        help=".lst file with image\\tpseudo-label rows")
    parser.add_argument("--source-domain", type=str, default=None,
                        choices=["cityscapes_pseudo", "gta5"],
                        help="training source: cityscapes pseudo-label pairs (the "
                             "reference's trained config) or GTA5 name lists with id "
                             "remap (reference --data-dir/--data-list capability, "
                             "trainV1_warmup.py:83-85)")
    parser.add_argument("--gt-dir", type=str, default=None,
                        help="directory of *_gtFine_labelIds.png val ground truth")
    parser.add_argument("--val-list", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--iter-size", type=int, default=None,
                        help="accumulate gradients over N sub-batches per optimizer "
                             "step (reference ITER_SIZE, trainV2_simt.py:85-86)")
    parser.add_argument("--mesh-data", type=int, default=None,
                        help="data-parallel mesh degree (batch dim sharding)")
    parser.add_argument("--mesh-spatial", type=int, default=None,
                        help="spatial mesh degree (image-height sharding, the "
                             "context-parallel analog for CNNs)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host coordinator address host:port "
                             "(jax.distributed.initialize)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="multi-host process count")
    parser.add_argument("--process-id", type=int, default=None,
                        help="this process's index in the multi-host job")
    parser.add_argument("--input-size-target", type=str, default=None,
                        help="'W,H' crop size (reference format, e.g. '1024,512')")
    parser.add_argument("--learning-rate", type=float, default=None)
    parser.add_argument("--learning-rate-T", type=float, default=None)
    parser.add_argument("--num-classes", type=int, default=None)
    parser.add_argument("--open-classes", type=int, default=None)
    parser.add_argument("--num-steps", type=int, default=None)
    parser.add_argument("--num-steps-stop", type=int, default=None)
    parser.add_argument("--save-pred-every", type=int, default=None)
    parser.add_argument("--random-seed", type=int, default=None)
    parser.add_argument("--random-mirror", action="store_true")
    parser.add_argument("--restore-from", type=str, default=None,
                        help=".pth/.npz warm-start checkpoint")
    parser.add_argument("--snapshot-dir", type=str, default=None)
    parser.add_argument("--Threshold-high", type=float, default=None)
    parser.add_argument("--Threshold-low", type=float, default=None)
    parser.add_argument("--lambda-Place", type=float, default=None)
    parser.add_argument("--lambda-Convex", type=float, default=None)
    parser.add_argument("--lambda-Volume", type=float, default=None)
    parser.add_argument("--lambda-Anchor", type=float, default=None)
    parser.add_argument("--class-dist", type=str, default=None,
                        help="prior name (bapa/sfdaseg/...) or .npy path")
    parser.add_argument("--compute-dtype", type=str, default=None,
                        choices=["bfloat16", "float32"])
    parser.add_argument("--model", type=str, default=None,
                        choices=["deeplab_multi", "deeplab_single", "deeplab_vgg",
                                 "deeplabv3"],
                        help="model arch (reference MODEL choice, evaluate_cityscapes.py:38)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (SURVEY.md §5 sanitizer row)")
    parser.add_argument("--plot-ntm-every", type=int, default=0,
                        help="dump NTM heat-maps every N iters (reference plot_NTM, "
                             "trainV2_simt.py:187-200)")
    parser.add_argument("--plot-ntm-dir", type=str, default="ntm_vis")
    parser.add_argument("--crop-cache-dir", type=str, default=None,
                        help="opt-in on-disk decoded-crop cache dir (epochs >= 2 "
                             "become PNG-decode-free; data/pipeline.py CropCache)")
    parser.add_argument("--cache-teacher", action="store_true",
                        help="cache the frozen teacher's per-image posterior "
                             "(float16; skips the per-step teacher forward)")
    parser.add_argument("--synthetic", action="store_true",
                        help="run hermetically on a generated tiny dataset")
    parser.add_argument("--csv", type=str, default=None, help="metric CSV output path")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a JAX platform (e.g. 'cpu'); default: ambient (TPU)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace here (SURVEY.md §5 tracing row)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in --snapshot-dir "
                             "(full optimizer/step state; impossible in the reference)")


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (first compile over the tunnel is minutes)."""
    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache",
        jax.default_backend(),
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def apply_platform(args) -> None:
    """Must run before any JAX device use; the session env pins the axon TPU platform,
    so this goes through jax.config rather than JAX_PLATFORMS."""
    n_mesh = (getattr(args, "mesh_data", None) or 1) * (
        getattr(args, "mesh_spatial", None) or 1
    )
    if args.platform == "cpu" and n_mesh > 1:
        # Virtual host devices for a CPU mesh (must precede backend init). Strip any
        # pre-existing flag first — a leftover =1 from the environment would
        # otherwise win and the mesh build would fail downstream.
        flags = [
            f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(f"--xla_force_host_platform_device_count={n_mesh}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    if getattr(args, "coordinator", None):
        # Multi-host (DCN) bring-up before any backend touch; the (data, spatial)
        # mesh then spans jax.devices() across all processes (SURVEY.md §2.5).
        from simt_tpu.parallel import initialize_multihost

        initialize_multihost(args.coordinator, args.num_processes, args.process_id)
    enable_compilation_cache()


def build_config(args, stage: str) -> config_lib.TrainConfig:
    cfg = config_lib.preset(args.preset) if args.preset else config_lib.TrainConfig()
    cfg = cfg.replace(stage=stage)

    optim = cfg.optim
    if args.learning_rate is not None:
        optim = dataclasses.replace(optim, learning_rate=args.learning_rate)
    if args.learning_rate_T is not None:
        optim = dataclasses.replace(optim, learning_rate_t=args.learning_rate_T)
    if args.num_steps is not None:
        optim = dataclasses.replace(optim, num_steps=args.num_steps)
    if args.iter_size is not None:
        optim = dataclasses.replace(optim, iter_size=args.iter_size)

    simt = cfg.simt
    for cli, field in [
        ("Threshold_high", "threshold_high"), ("Threshold_low", "threshold_low"),
        ("lambda_Place", "lambda_place"), ("lambda_Convex", "lambda_convex"),
        ("lambda_Volume", "lambda_volume"), ("lambda_Anchor", "lambda_anchor"),
        ("class_dist", "class_dist"),
    ]:
        v = getattr(args, cli)
        if v is not None:
            simt = dataclasses.replace(simt, **{field: v})
    if getattr(args, "cache_teacher", False):
        simt = dataclasses.replace(simt, cache_teacher=True)

    model = cfg.model
    if args.num_classes is not None:
        model = dataclasses.replace(model, num_classes=args.num_classes)
    if args.open_classes is not None:
        model = dataclasses.replace(model, open_classes=args.open_classes)
    if args.compute_dtype is not None:
        model = dataclasses.replace(model, compute_dtype=args.compute_dtype)
    if args.model is not None:
        model = dataclasses.replace(model, arch=args.model)
    if model.arch == "deeplab_single":
        # Res_Deeplab's head sums all four ASPP branches (deeplab.py:112-116).
        model = dataclasses.replace(model, aspp_effective_branches=4)
    model = dataclasses.replace(model, openset=stage == "simt")

    data = cfg.data
    if args.data_dir_target:
        data = dataclasses.replace(data, root=args.data_dir_target)
    if args.data_list_target is not None:
        data = dataclasses.replace(data, list_path=args.data_list_target)
    if args.batch_size is not None:
        data = dataclasses.replace(data, batch_size=args.batch_size)
    if args.input_size_target is not None:
        w, h = map(int, args.input_size_target.split(","))
        data = dataclasses.replace(data, crop_size=(w, h))
    if args.random_mirror:
        data = dataclasses.replace(data, mirror=True)
    if getattr(args, "crop_cache_dir", None):
        data = dataclasses.replace(data, crop_cache_dir=args.crop_cache_dir)
    if getattr(args, "source_domain", None):
        data = dataclasses.replace(data, source=args.source_domain)

    mesh = cfg.mesh
    if args.mesh_data is not None:
        mesh = dataclasses.replace(mesh, data_axis=args.mesh_data)
    if args.mesh_spatial is not None:
        mesh = dataclasses.replace(mesh, spatial_axis=args.mesh_spatial)

    kw = {"mesh": mesh}
    if args.num_steps is not None:
        kw["num_steps"] = args.num_steps
    if args.num_steps_stop is not None:
        kw["num_steps_stop"] = args.num_steps_stop
    if args.save_pred_every is not None:
        kw["save_pred_every"] = args.save_pred_every
    if args.random_seed is not None:
        kw["random_seed"] = args.random_seed
    if args.restore_from is not None:
        kw["restore_from"] = args.restore_from
    if args.snapshot_dir is not None:
        kw["snapshot_dir"] = args.snapshot_dir

    return cfg.replace(model=model, data=data, optim=optim, simt=simt, **kw)


def setup_synthetic(cfg, tmp_root: str, image_wh=(128, 64)):
    """Generate a fixture and point the config at it. Returns (cfg, paths)."""
    import dataclasses as dc

    from simt_tpu.data import synthetic

    paths = synthetic.make_cityscapes_fixture(tmp_root, n_train=8, n_val=2,
                                              image_wh=image_wh)
    data = dc.replace(
        cfg.data, root=paths["root"], list_path=paths["pseudo_lst"],
        crop_size=image_wh, batch_size=max(1, cfg.data.batch_size),
    )
    return cfg.replace(data=data, snapshot_dir="", restore_from=""), paths
