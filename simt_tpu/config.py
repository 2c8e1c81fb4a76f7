"""Configuration for the simt_tpu framework.

Replaces the reference's per-tool argparse blocks (the ~40 duplicated flags in
``tools/trainV2_simt.py:72-157`` / ``tools/trainV1_warmup.py``) and the hyperparameters of
record in ``sh_simt.sh:17`` / ``sh_warmup.sh:17`` with a single dataclass + named presets.

All defaults are documented against the reference file:line they reproduce.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

# BGR mean, matching IMG_MEAN in tools/trainV1_warmup.py:33 and trainV2_simt.py:34.
IMG_MEAN_BGR: Tuple[float, float, float] = (104.00698793, 116.66876762, 122.67891434)

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "data", "assets")


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline configuration (reference: dataset/*.py ctor args)."""

    # Root of the Cityscapes-layout dataset (images under <root>/<relative list paths>).
    root: str = ""
    # Path to a .lst file with "image\tlabel" rows (cityscapes_dataset.py:76) or a
    # plain name list (cityscapes_dataset.py:31).
    list_path: str = os.path.join(ASSETS_DIR, "cityscapes_list", "pseudo_bapa.lst")
    # (width, height), matching INPUT_SIZE_TARGET '1024,512' (trainV2_simt.py:46).
    crop_size: Tuple[int, int] = (1024, 512)
    mean_bgr: Tuple[float, float, float] = IMG_MEAN_BGR
    # Random horizontal mirror (cityscapes_dataset.py:111-114).
    mirror: bool = True
    ignore_label: int = 255
    num_workers: int = 4
    batch_size: int = 1
    # Host-side prefetch depth (device_put pipeline).
    prefetch: int = 2
    # Use the native C++ preprocessing extension when available.
    use_native_preproc: bool = True
    # Decode in spawned worker processes (the reference's torch-DataLoader model;
    # Pillow holds the GIL during PNG decode so THREAD workers scale negatively).
    process_workers: bool = True
    # Opt-in on-disk cache of decoded+resized crops (data/pipeline.py CropCache):
    # epochs >= 2 become PNG-decode-free (~1.6 MB/image at 1024x512). "" disables.
    crop_cache_dir: str = ""
    # Training source domain: "cityscapes_pseudo" (the reference's trained config,
    # image\tpseudo-label .lst rows) or "gta5" (name lists + GTA5 id remap — the
    # reference imports GTA5DataSet in both trainers but never instantiates it,
    # trainV1_warmup.py:20/83-85; capability kept, reachable via --source-domain).
    source: str = "cityscapes_pseudo"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model family + head configuration (reference: model/deeplab_multi.py)."""

    # One of: deeplab_multi, deeplab_single, deeplab_vgg, deeplabv3.
    arch: str = "deeplab_multi"
    num_classes: int = 19  # NUM_CLASSES, trainV2_simt.py:50
    open_classes: int = 15  # OPEN_CLASSES per sh_simt.sh:17 (module default 15, :51)
    openset: bool = False
    # bfloat16 activations/conv compute on the MXU; params are always float32.
    compute_dtype: str = "bfloat16"
    # Replicate the reference ASPP quirk where only dilation-6 and dilation-12
    # branches contribute (return inside loop, deeplab_multi.py:115-119). The
    # single-head model (deeplab.py:112-116) sums all four; configured per-arch.
    aspp_effective_branches: int = 2


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """SGD/Adam + poly schedule (trainV2_simt.py:174-185, 271-280, 296-297)."""

    learning_rate: float = 2.5e-4  # LEARNING_RATE trainV2_simt.py:47
    learning_rate_t: float = 2.5e-3  # sh_simt.sh:17 uses lr_T = 10x lr (logs lr25)
    momentum: float = 0.9  # MOMENTUM :49
    weight_decay: float = 5e-4  # WEIGHT_DECAY :59
    power: float = 0.9  # POWER :54
    num_steps: int = 250_000  # NUM_STEPS :52 (schedule horizon)
    # Gradient accumulation: sub-batches per optimizer step, each loss scaled by
    # 1/iter_size (ITER_SIZE trainV2_simt.py:38,85-86; sub-loop :345,:426-436).
    iter_size: int = 1


@dataclasses.dataclass(frozen=True)
class SimTConfig:
    """SimT loss hyper-parameters (canonical set: sh_simt.sh:17)."""

    threshold_high: float = 0.8  # --Threshold-high
    threshold_low: float = 0.2  # --Threshold-low
    lambda_seg: float = 0.1  # LAMBDA_SEG trainV2_simt.py:68
    lambda_place: float = 0.1  # --lambda-Place
    lambda_convex: float = 0.1  # --lambda-Convex
    lambda_volume: float = 1.0  # --lambda-Volume
    lambda_anchor: float = 1.0  # --lambda-Anchor
    inner_w_steps: int = 10  # inner W-optimisation loop count (trainV2_simt.py:327)
    # Class-distribution prior for sig_NTM (deeplab_multi.py:255).
    class_dist: str = "bapa"
    # Cache the frozen teacher's per-image posterior instead of recomputing it every
    # step like the reference (train/teacher_cache.py). Off by default: cached entries
    # are float16-rounded, so this is throughput-for-exactness opt-in.
    cache_teacher: bool = False
    # Output-row chunk of the streamed loss block (ops/fused_losses.py). Purely a
    # scheduling knob (the math is chunk-invariant). Measured on v5e at the 512x1024
    # reference geometry (full step, idle host): 64 -> 35.5 ms, 128 -> 36.2 ms,
    # 256 -> 38.3 ms — bigger chunks lose (larger live upsample buffers evict the
    # backward's working set), so the default stays 64.
    loss_chunk_rows: int = 64
    # Paper-faithful T-identification mode (default False = reference-verbatim).
    # The reference's inner W loop leaks 10 uncleared T-gradients of MSE(W@T, 0)
    # into every T update (trainV2_simt.py:337 backward vs :317 zero_grad /
    # :435 step). Measured (tests/test_planted_noise.py + docs/PARITY.md "NTM
    # identification"): that leak — like lambda_volume >= ~0.3 — makes T converge
    # to a class_dist-shaped smoothing attractor regardless of the actual noise;
    # clearing it (with lambda_volume at the reference's own code default, 0.1)
    # lets the anchor/fit/convex game identify a planted transition matrix.
    clear_inner_t_grads: bool = False


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit sharding (replaces the reference's ABSENT distribution)."""

    data_axis: int = 1  # data parallelism degree (batch dim)
    spatial_axis: int = 1  # spatial (H) sharding degree — the CP analog for CNNs


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Top-level training configuration."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    simt: SimTConfig = dataclasses.field(default_factory=SimTConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    num_steps: int = 250_000  # NUM_STEPS trainV2_simt.py:52
    num_steps_stop: int = 40_000  # NUM_STEPS_STOP :53 (warmup uses 150k, trainV1:52)
    save_pred_every: int = 1_000  # SAVE_PRED_EVERY :57
    log_every: int = 100  # print cadence trainV2_simt.py:438
    random_seed: int = 1234  # RANDOM_SEED :55 (actually *applied* here, unlike ref)
    snapshot_dir: str = "snapshots"
    restore_from: str = ""
    ignore_label: int = 255
    # Stage: "warmup" or "simt".
    stage: str = "simt"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def preset(name: str) -> TrainConfig:
    """Named presets mirroring the published run configurations.

    - ``warmup_bapa``: sh_warmup.sh stage-1 training (trainV1_warmup.py defaults).
    - ``simt_bapa_lr25``: logs/BAPA_SimT_lr25.out (lr 2.5e-4 / lr_T 2.5e-3) — best 59.18 mIoU.
    - ``simt_bapa_lr6``: sh_simt.sh:17 (lr 6e-4 / lr_T 6e-3) — 58.91 mIoU.
    - ``simt_sfda``: logs/SFDA_SimT.out (SFDASeg pseudo labels) — 54.38 mIoU.
    """
    base = TrainConfig()
    lists = os.path.join(ASSETS_DIR, "cityscapes_list")
    if name == "warmup_bapa":
        return base.replace(
            stage="warmup",
            num_steps_stop=150_000,
            model=ModelConfig(openset=False),
            data=dataclasses.replace(base.data, list_path=os.path.join(lists, "pseudo_bapa.lst")),
        )
    if name == "simt_bapa_lr25":
        return base.replace(
            stage="simt",
            model=ModelConfig(openset=True),
            optim=dataclasses.replace(base.optim, learning_rate=2.5e-4, learning_rate_t=2.5e-3),
            data=dataclasses.replace(base.data, list_path=os.path.join(lists, "pseudo_bapa.lst")),
        )
    if name == "simt_bapa_lr6":
        return base.replace(
            stage="simt",
            model=ModelConfig(openset=True),
            optim=dataclasses.replace(base.optim, learning_rate=6e-4, learning_rate_t=6e-3),
            data=dataclasses.replace(base.data, list_path=os.path.join(lists, "pseudo_bapa.lst")),
        )
    if name == "simt_sfda":
        return base.replace(
            stage="simt",
            model=ModelConfig(openset=True),
            optim=dataclasses.replace(base.optim, learning_rate=2.5e-4, learning_rate_t=2.5e-3),
            # sig_NTM hardcodes ClassDist_bapa.npy for ALL runs, including the
            # published SFDA log (deeplab_multi.py:255) — keep 'bapa' here too.
            simt=dataclasses.replace(base.simt, class_dist="bapa"),
            data=dataclasses.replace(
                base.data, list_path=os.path.join(lists, "pseudo_sfdaseg.lst")
            ),
        )
    raise ValueError(f"unknown preset: {name!r}")
