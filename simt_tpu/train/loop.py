"""Training loop driver: wires config -> models -> data -> jitted step -> eval/ckpt.

Mirrors the reference's main() flow for both stages (tools/trainV1_warmup.py:156-256,
tools/trainV2_simt.py:232-464): poly-LR'd steps, loss prints every ``log_every``, full val
evaluation every ``save_pred_every`` with best-mIoU checkpoint keep/delete, early stop at
``num_steps_stop``. Unlike the reference, checkpoints carry optimizer + step state so runs
resume (SURVEY.md §5).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..data import Loader, SegDataset, device_prefetch
from ..models.resnet_multi import deeplab_multi
from ..utils import MetricWriter, StepTimer, format_simt_line, format_warmup_line
from . import checkpoint as ckpt_lib
from .simt import create_simt_state, make_simt_step
from .warmup import create_warmup_state, make_warmup_step


def _dtype(cfg: TrainConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.model.compute_dtype]


def build_models(cfg: TrainConfig):
    """Student (+ teacher for the simt stage), dispatched on ``ModelConfig.arch``.

    Archs mirror the reference model zoo (SURVEY.md §2.1): ``deeplab_multi`` (the
    trained flagship), ``deeplab_single`` (Res_Deeplab), ``deeplab_vgg``, ``deeplabv3``.
    Training stages drive the multi-head family; the others are primarily alternate
    eval models (as in the reference, evaluate_cityscapes.py:12-14).
    """
    from ..models import deeplab_vgg, deeplabv3, res_deeplab

    dtype = _dtype(cfg)
    eff = cfg.model.aspp_effective_branches
    arch = cfg.model.arch
    if arch == "deeplab_single":
        return res_deeplab(cfg.model.num_classes, dtype=dtype), None
    if arch == "deeplab_vgg":
        return deeplab_vgg(cfg.model.num_classes, dtype=dtype), None
    if arch == "deeplabv3":
        return (
            deeplabv3(cfg.model.num_classes, cfg.model.open_classes,
                      openset=cfg.model.openset, dtype=dtype),
            None,
        )
    if arch != "deeplab_multi":
        raise ValueError(f"unknown arch {arch!r}")
    if cfg.stage == "simt":
        student = deeplab_multi(
            cfg.model.num_classes, cfg.model.open_classes, openset=True,
            dtype=dtype, aspp_effective_branches=eff,
        )
        teacher = deeplab_multi(
            cfg.model.num_classes, dtype=dtype, aspp_effective_branches=eff
        )
        return student, teacher
    return deeplab_multi(cfg.model.num_classes, dtype=dtype, aspp_effective_branches=eff), None


def build_mesh(cfg: TrainConfig):
    """Build the (data, spatial) device mesh from ``cfg.mesh``, or None when both
    degrees are 1 (single-device, the reference's only mode — SURVEY.md §2.5).

    ``DataConfig.batch_size`` is per-data-shard: the loader's global batch is
    ``batch_size * data_axis``, so the reference's bs=1 configs scale to DP unchanged."""
    if cfg.mesh.data_axis * cfg.mesh.spatial_axis <= 1:
        return None
    from ..parallel import make_mesh

    return make_mesh(data=cfg.mesh.data_axis, spatial=cfg.mesh.spatial_axis)


def build_loader(cfg: TrainConfig, root: Optional[str] = None,
                 list_path: Optional[str] = None,
                 source: Optional[str] = None,
                 sharding=None, batch_size: Optional[int] = None,
                 process_shard=None) -> Iterator[Dict]:
    from ..data import pipeline as pipeline_lib

    pipeline_lib.USE_NATIVE = cfg.data.use_native_preproc
    factory = {
        "cityscapes_pseudo": SegDataset.cityscapes_pseudo,  # the trained configuration
        "gta5": SegDataset.gta5,  # source-domain capability (gta5_dataset.py; the
        # reference imports it in both trainers but never instantiates it)
    }[source or cfg.data.source]
    ds = factory(
        root or cfg.data.root,
        list_path or cfg.data.list_path,
        crop_wh=cfg.data.crop_size,
        mean_bgr=cfg.data.mean_bgr,
        mirror=cfg.data.mirror,
        cache_dir=cfg.data.crop_cache_dir,
    )
    loader = Loader(
        ds,
        batch_size or cfg.data.batch_size,
        shuffle=True,
        seed=cfg.random_seed,
        num_workers=cfg.data.num_workers,
        prefetch=cfg.data.prefetch,
        process_workers=cfg.data.process_workers,
        process_shard=process_shard,
    )
    return device_prefetch(iter(loader), size=cfg.data.prefetch, sharding=sharding)


def train(
    cfg: TrainConfig,
    *,
    batch_iter: Optional[Iterator[Dict]] = None,
    eval_fn: Optional[Callable[[object, Dict], float]] = None,
    print_fn: Callable[[str], None] = print,
    csv_path: Optional[str] = None,
    max_steps: Optional[int] = None,
    resume: bool = False,
    profile_dir: Optional[str] = None,
    plot_ntm_every: int = 0,
    plot_ntm_dir: str = "ntm_vis",
) -> Dict:
    """Run one stage. ``eval_fn(model, variables) -> mIoU`` is injected (the real
    Cityscapes evaluator or a synthetic one). Returns summary dict."""
    print_fn("Start: " + time.asctime(time.localtime(time.time())))
    if cfg.stage == "simt" and cfg.model.arch != "deeplab_multi":
        # The reference's SimT stage drives DeeplabMulti only (trainV2_simt.py:250).
        # Warmup-stage training is supported for every arch. deeplabv3's own SimT
        # lives in a different reference branch and is broken here (its sig_NTM loads
        # the nonexistent ClassDist_source.npy, deeplabv3.py:179), and the two-head
        # H/8-logit loss scan does not apply to single-output/full-res models.
        raise ValueError(
            f"simt-stage training requires arch 'deeplab_multi' (got "
            f"{cfg.model.arch!r}); the reference trains only DeeplabMulti in the "
            "SimT stage (trainV2_simt.py:250)"
        )
    student, teacher = build_models(cfg)
    hw = (cfg.data.crop_size[1], cfg.data.crop_size[0])  # (h, w) from (w, h)

    rng = jax.random.PRNGKey(cfg.random_seed)
    if cfg.stage == "simt":
        # Both student and teacher start from the warmup checkpoint
        # (trainV2_simt.py:250-267): key-intersection load.
        sv, report = ckpt_lib.load_warmstart_variables(student, cfg.restore_from, hw,
                                                       rng=rng)
        tv, _ = ckpt_lib.load_warmstart_variables(teacher, cfg.restore_from, hw, rng=rng)
        if cfg.restore_from:
            print_fn(f"warm-start: loaded {len(report['loaded'])} tensors from "
                     f"{cfg.restore_from} ({len(report['missing'])} missing)")
        state = create_simt_state(sv, tv, cfg, jax.random.fold_in(rng, 1))
        # The loop always reassigns `state`, so the old state is donated — except
        # under --cache-teacher, whose TeacherCache holds the INITIAL state's
        # teacher arrays across steps (donation would delete them at step 1).
        step_fn = make_simt_step(
            student, teacher, cfg, donate=not cfg.simt.cache_teacher
        )
        fmt = format_simt_line
    else:
        sv, report = ckpt_lib.load_warmstart_variables(
            student, cfg.restore_from, hw, strip_prefix=6, rng=rng
        )  # k[6:] prefix-strip flavour (trainV1_warmup.py:177)
        state = create_warmup_state(student, sv, cfg)
        step_fn = make_warmup_step(student, cfg, donate=True)
        fmt = format_warmup_line

    if resume and cfg.snapshot_dir and ckpt_lib.latest_step(cfg.snapshot_dir) is not None:
        # Full resume (params + opt states + step) — impossible in the reference,
        # whose checkpoints carry only the model state_dict (SURVEY.md §5).
        state = ckpt_lib.restore(state, cfg.snapshot_dir)
        print_fn(f"resumed from step {int(state.step)}")

    # Device mesh (cfg.mesh): replicate the train state, shard batches over
    # (data=batch, spatial=image height). Single-device when both degrees are 1.
    mesh = build_mesh(cfg)
    batch_shard = None
    if mesh is not None:
        from ..parallel import batch_sharding, replicate_state

        state = replicate_state(state, mesh)
        batch_shard = batch_sharding(mesh)
        print_fn(
            f"mesh: data={cfg.mesh.data_axis} spatial={cfg.mesh.spatial_axis} "
            f"over {mesh.devices.size} devices"
        )

    n_proc = jax.process_count()
    if batch_iter is None:
        global_bs = cfg.data.batch_size * cfg.mesh.data_axis
        if n_proc > 1:
            # Multi-process data parallelism: each process decodes only its
            # 1/n_proc block of the global batch (identical index streams keep
            # the global batch equal to the single-process run); the global
            # array is assembled by make_array_from_process_local_data inside
            # device_prefetch. Process boundaries must align with the data
            # axis (the loader cannot produce partial-height spatial shards).
            if global_bs % n_proc:
                raise ValueError(
                    f"global batch {global_bs} not divisible by "
                    f"{n_proc} processes"
                )
            if cfg.mesh.data_axis % n_proc:
                raise ValueError(
                    f"data_axis {cfg.mesh.data_axis} must be a multiple of "
                    f"process count {n_proc} (spatial shards cannot span "
                    "process boundaries in the input path)"
                )
            batch_iter = build_loader(
                cfg, sharding=batch_shard, batch_size=global_bs // n_proc,
                process_shard=(jax.process_index(), n_proc),
            )
        else:
            batch_iter = build_loader(
                cfg, sharding=batch_shard, batch_size=global_bs,
            )
    elif batch_shard is not None:
        # Injected iterators (tests, synthetic runs) get the same placement.
        def _sharded(it, sh):
            for b in it:
                yield {
                    k: jax.device_put(v, sh) if hasattr(v, "ndim") and v.ndim >= 2
                    else v
                    for k, v in b.items()
                }

        batch_iter = _sharded(batch_iter, batch_shard)

    if cfg.stage == "simt" and cfg.simt.cache_teacher:
        from .teacher_cache import TeacherCache

        cache = TeacherCache(teacher, state.teacher_params, state.teacher_batch_stats)
        batch_iter = cache.wrap(batch_iter)
        print_fn("teacher cache enabled (float16 posteriors, skips teacher forward)")

    # Per-process side effects: the CSV writer and best-snapshot deletion run on
    # process 0 only (orbax save/restore stay collective — every process must
    # participate for globally-sharded arrays).
    is_proc0 = jax.process_index() == 0
    writer = MetricWriter(csv_path if is_proc0 else None)
    timer = StepTimer()
    best_miou, best_step = 0.0, 0
    stop_at = min(cfg.num_steps_stop, max_steps or cfg.num_steps_stop)
    metrics = {}
    start_step = int(state.step)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    iter_size = cfg.optim.iter_size
    step_keys = ("image", "label", "teacher_prob8")
    for i_iter in range(start_step, stop_at):
        if iter_size == 1:
            batch = next(batch_iter)
            batch = {k: v for k, v in batch.items() if k in step_keys}
        else:
            # Gradient accumulation (trainV2_simt.py:345): iter_size loader batches
            # per optimizer step, stacked on a leading axis for the jitted sub-loop.
            subs = [next(batch_iter) for _ in range(iter_size)]
            batch = {
                k: jnp.stack([s[k] for s in subs])
                for k in subs[0] if k in step_keys
            }
            if mesh is not None and n_proc == 1:
                # Leading axis is the sub-batch index: shard (batch, height) on
                # dims 1/2 instead of 0/1. Multi-process runs skip the explicit
                # re-placement: the jnp.stack of already-global sub-batches is a
                # valid global array whose sharding GSPMD propagates from.
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel import DATA_AXIS, SPATIAL_AXIS

                sh = NamedSharding(
                    mesh, PartitionSpec(None, DATA_AXIS, SPATIAL_AXIS)
                )
                batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        timer.tick()

        if i_iter % cfg.log_every == 0:
            jax.block_until_ready(metrics["lr"])
            print_fn(fmt(i_iter, cfg.num_steps, metrics))
            writer.write(i_iter, metrics)

        if (
            plot_ntm_every
            and cfg.stage == "simt"
            and i_iter % plot_ntm_every == 0
        ):
            # NTM heat-map dump (reference plot_NTM, trainV2_simt.py:187-200, whose
            # invocation is commented out at :443-445 — here an opt-in flag).
            from ..models import ntm as ntm_lib
            from ..utils import plot_ntm

            cd = jnp.asarray(ntm_lib.load_class_dist(cfg.simt.class_dist))
            for tag, p in [("NTM1", state.t1.param), ("NTM2", state.t2.param)]:
                t = ntm_lib.ntm_forward(
                    p, cd, cfg.model.num_classes, cfg.model.open_classes
                )
                plot_ntm(
                    jax.device_get(t),
                    os.path.join(plot_ntm_dir, f"{tag}_{i_iter}.png"),
                    title=f"{tag}_{i_iter}",
                )

        if eval_fn is not None and i_iter % cfg.save_pred_every == 0 and i_iter != 0:
            now = datetime.datetime.now()
            print_fn(
                now.strftime("%Y-%m-%d %H:%M:%S")
                + "  Begin evaluation on iter {0:8d}/{1:8d}  ".format(i_iter, cfg.num_steps)
            )
            eval_vars = {
                "params": state.model.params,
                "batch_stats": state.model.batch_stats,
            }
            miou = eval_fn(student, eval_vars)
            print_fn("Finish Evaluation: " + time.asctime(time.localtime(time.time())))
            if miou > best_miou:
                if best_step and cfg.snapshot_dir:
                    # The previous best may still be async-committing.
                    ckpt_lib.wait_until_finished()
                    if is_proc0:
                        ckpt_lib.delete(cfg.snapshot_dir, best_step)
                print_fn(f"Saving model with mIoU:  {miou}")
                if cfg.snapshot_dir:
                    # Async: serialisation overlaps the next training steps.
                    ckpt_lib.save(state, cfg.snapshot_dir, i_iter, wait=False)
                best_miou, best_step = miou, i_iter

    if profile_dir:
        jax.profiler.stop_trace()
    if cfg.snapshot_dir:
        os.makedirs(cfg.snapshot_dir, exist_ok=True)
        ckpt_lib.save(state, cfg.snapshot_dir, stop_at)
    writer.close()
    return {
        "state": state,
        "best_miou": best_miou,
        "best_step": best_step,
        "steps_per_sec": timer.rate(),
        "final_metrics": {k: float(v) for k, v in metrics.items()},
        "student": student,
    }
