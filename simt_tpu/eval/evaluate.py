"""Cityscapes validation protocol — the parity target.

Re-implements ``evaluate_simt`` / ``evaluate_warmup`` (tools/evaluate_cityscapes.py:96-225)
TPU-first:

  - two input scales, 1024x512 and 1280x640 (:103-106);
  - head-2 logits (known-class slice ``[:, :19]`` in simt mode, :127-133) upsampled to
    1024x2048 with align-corners bilinear (:108) and summed across scales (simt mode);
    warmup mode uses the 1024x512 scale only (:196-197 — the reference builds the 640
    loader but never uses it; reproduced);
  - argmax + 19x19 confusion accumulation happen **on device** (the reference pulls full
    2048x1024x19 logit maps to host numpy per image, :128,137-148); only the final 19x19
    histogram is transferred;
  - batched inference (the reference is locked to batch 1).

Ground-truth ``*_gtFine_labelIds.png`` files are read host-side and remapped through
``info.json['label2train']`` exactly like :140-144.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IMG_MEAN_BGR
from ..data import Loader, SegDataset
from ..data.lists import load_info
from ..ops import fast_hist, label_mapping, mean_iou, per_class_iu
from ..ops.interp import upsample_bilinear_align_corners

EVAL_SCALES = ((1024, 512), (1280, 640))  # (w, h), evaluate_cityscapes.py:103-106
EVAL_OUT_HW = (1024, 2048)  # :108


def make_eval_fn(model, num_classes: int = 19, mode: str = "simt",
                 out_hw: Tuple[int, int] = EVAL_OUT_HW, mesh=None):
    """Eval functions (each a composition of jitted programs).

    ``predict``: (variables, image, image_640) -> (B, *out_hw) int32 prediction map
    (used when prediction PNGs must be saved).
    ``predict_hist``: (variables, image, image_640, gt) -> (C, C) histogram via the
    fused Pallas kernel (ops/pallas/eval_fused.py) — the fast path; full-resolution
    logit maps never touch HBM.
    ``hist_update``: running histogram accumulation.

    ``mesh``: optional (data, spatial) jax mesh — the spatially-sharded eval
    (SURVEY.md §2.5 SP/CP row): images arrive H-sharded over ``spatial`` (GSPMD
    partitions the dilated convs with automatic halo exchange, proven equal in
    tests/test_parallel.py), and the upsample+argmax+hist head runs the
    output-row-sharded Pallas kernel with a psum reduction
    (ops/pallas/eval_fused.py::multiscale_argmax_hist_spatial). The reference runs
    its 1000 eval forwards at 2048x1024 on one device, one at a time
    (tools/evaluate_cityscapes.py:103-148).

    Structure note: the per-scale model forwards are jitted SEPARATELY from the
    Pallas-hist / argmax programs. Composing the merged-N wide ASPP head with the
    fused Pallas kernel in ONE two-scale program reproducibly faults the v5e TPU
    worker (pinned: experiments/wide_aspp_eval_fault/repro.py `fused_wide`); the
    split composition is fault-free AND measured ~9% faster than the round-3
    workaround (wide heads cloned to per-tap, one fused program): 58.3 vs 53.6
    img/s on v5e (repro.py `split_wide` vs `fused_pertap`). The stride-8 logits
    crossing the jit boundary are <1 MB/scale.
    """

    def _head2(variables, image):
        """Head-2 logits; DeepLabv3 returns a single map (deeplabv3.py:129-138)."""
        from ..data.pipeline import normalize_image

        image = normalize_image(image, IMG_MEAN_BGR)
        out = model.apply(variables, image, False)
        return out[1] if isinstance(out, tuple) else out

    @jax.jit
    def fwd(variables, image):
        return _head2(variables, image)[..., :num_classes].astype(jnp.float32)

    def _scales(variables, image, image_640):
        a = fwd(variables, image)
        if mode == "simt":
            b = fwd(variables, image_640)
        else:
            # Warmup eval is single-scale (evaluate_cityscapes.py:196-197); a constant-0
            # second operand leaves the argmax unchanged.
            b = jnp.zeros((a.shape[0], 1, 1, num_classes), jnp.float32)
        return a, b

    @jax.jit
    def _argmax_sum(a, b):
        logits = upsample_bilinear_align_corners(a, out_hw)
        if mode == "simt":
            logits = logits + upsample_bilinear_align_corners(b, out_hw)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def predict(variables, image, image_640):
        return _argmax_sum(*_scales(variables, image, image_640))

    @jax.jit
    def _hist_only(a, b, gt):
        from ..ops.pallas import multiscale_argmax_hist

        def one(args):
            la, lb, g = args
            return multiscale_argmax_hist(
                la, lb, g, out_hw=out_hw, num_classes=num_classes
            )

        return jnp.sum(jax.lax.map(one, (a, b, gt)), axis=0)

    @jax.jit
    def _hist_only_spatial(la, lb, g):
        from ..ops.pallas import multiscale_argmax_hist_spatial

        return multiscale_argmax_hist_spatial(
            la, lb, g, mesh, out_hw=out_hw, num_classes=num_classes
        )

    def predict_hist(variables, image, image_640, gt):
        a, b = _scales(variables, image, image_640)
        if mesh is None:
            return _hist_only(a, b, gt)
        # Per-image row-sharded kernel + psum (batch is 1 in the reference protocol;
        # the stride-8 logits crossing shards are <1 MB/image).
        return sum(_hist_only_spatial(a[i], b[i], gt[i]) for i in range(a.shape[0]))

    @jax.jit
    def hist_update(hist, pred, gt):
        return hist + fast_hist(gt, pred, num_classes)

    return predict, predict_hist, hist_update


def evaluate(
    model,
    variables,
    *,
    data_root: str,
    val_list: str,
    gt_dir: str,
    mode: str = "simt",
    batch_size: int = 1,
    info: Optional[dict] = None,
    print_fn: Callable[[str], None] = print,
    save_dir: Optional[str] = None,
    scales: Tuple[Tuple[int, int], ...] = EVAL_SCALES,
    out_hw: Tuple[int, int] = EVAL_OUT_HW,
    shard: Optional[Tuple[int, int]] = None,
    return_hist: bool = False,
    process_workers: bool = False,
    mesh=None,
) -> float:
    """Run the full protocol; returns mIoU (percent, 2dp) like evaluate_cityscapes.py:162.

    ``shard=(index, count)`` evaluates every count-th image starting at ``index`` and
    sums the 19x19 histograms across processes before computing mIoU — the distributed
    eval reduction the reference never had (SURVEY.md §5). Defaults to this process's
    jax.process_index()/count when multiple processes are initialised.

    ``mesh``: optional (data, spatial) jax mesh — spatially-sharded eval (see
    make_eval_fn): each image's forward and its 2048x1024 upsample+argmax+hist are
    sharded over the ``spatial`` axis. Composable with ``shard`` (images across
    processes, rows across a process's devices). Input heights at both scales and
    ``out_hw[0]`` must divide the spatial axis size.
    """
    info = info or load_info()
    num_classes = int(info["classes"])
    names = info["label"]
    mapping = np.asarray(info["label2train"], np.int64)

    if shard is None and jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())

    loaders = []
    for crop_wh in scales:
        ds = SegDataset.cityscapes_eval(
            data_root, val_list, crop_wh=crop_wh, mean_bgr=IMG_MEAN_BGR, split="val"
        )
        if shard is not None:
            idx, count = shard
            ds.samples = ds.samples[idx::count]
        # ``process_workers`` mirrors DataConfig.process_workers: PNG decode of
        # 2048x1024 val images is GIL-bound under thread workers just like training
        # decode (see data/pipeline.py Loader docstring).
        loaders.append(
            Loader(ds, batch_size, shuffle=False, num_workers=4, drop_last=False,
                   loop=False, process_workers=process_workers)
        )

    predict, predict_hist, hist_update = make_eval_fn(
        model, num_classes, mode, out_hw, mesh=mesh
    )
    if mesh is not None:
        # H-shard the images over `spatial` (GSPMD halo-exchanges the convs) and
        # replicate the weights once; batch rides `data`.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, SPATIAL_AXIS, replicate_state

        img_sharding = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
        variables = replicate_state(variables, mesh)
    hist = jnp.zeros((num_classes, num_classes), jnp.int32)

    # Host-side gt decode overlaps with device compute (the 2048x1024 PNG decode would
    # otherwise serialize against the ~20ms/image TPU path).
    from concurrent.futures import ThreadPoolExecutor

    def load_gt(name: str) -> np.ndarray:
        from PIL import Image

        # Keep the full relative name (val lists carry 'frankfurt/...' city subdirs,
        # which the reference preserves — evaluate_cityscapes.py:141 — and the shipped
        # label.txt / tools/compute_iou.py expect too).
        gt_name = name.split("leftImg8bit")[0] + "gtFine_labelIds.png"
        gt = np.asarray(Image.open(os.path.join(gt_dir, gt_name)))
        return label_mapping(gt, mapping)

    pool = ThreadPoolExecutor(max_workers=4)

    def batches():
        for batch, batch_640 in zip(iter(loaders[0]), iter(loaders[1])):
            futures = [pool.submit(load_gt, n) for n in batch["name"]]
            yield batch, batch_640, futures

    import collections

    pending = collections.deque()
    stream = batches()

    def fill():
        try:
            pending.append(next(stream))
            return True
        except StopIteration:
            return False

    fill()
    while pending:
        fill()  # keep one batch of gt decodes in flight
        batch, batch_640, futures = pending.popleft()
        if mesh is not None:
            image = jax.device_put(np.asarray(batch["image"]), img_sharding)
            image_640 = jax.device_put(np.asarray(batch_640["image"]), img_sharding)
        else:
            image = jnp.asarray(batch["image"])
            image_640 = jnp.asarray(batch_640["image"])
        gt_arr = jnp.asarray(np.stack([f.result() for f in futures]).astype(np.int32))
        if gt_arr.shape[1:] != out_hw:
            print_fn(
                f"Skipping: gt {gt_arr.shape} vs pred {out_hw} for {batch['name']}"
            )
            continue

        if save_dir is None:
            # Fast path: fused Pallas upsample+argmax+histogram.
            hist = hist + predict_hist(variables, image, image_640, gt_arr)
        else:
            pred = predict(variables, image, image_640)
            hist = hist_update(hist, pred, gt_arr)
            os.makedirs(save_dir, exist_ok=True)
            for i, name in enumerate(batch["name"]):
                out_name = os.path.basename(name)
                save_pred_png(np.asarray(pred[i]), os.path.join(save_dir, out_name))

    if shard is not None and jax.process_count() > 1:
        # Sum per-process histograms over DCN; every host prints the global result.
        from jax.experimental import multihost_utils

        hist = jnp.sum(multihost_utils.process_allgather(hist), axis=0)

    hist_np = np.asarray(jax.device_get(hist), np.float64)
    ious = per_class_iu(hist_np)
    for i in range(num_classes):
        print_fn("===>" + names[i] + ":\t" + str(round(ious[i] * 100, 2)))
    miou = mean_iou(hist_np)
    print_fn("===> mIoU: " + str(miou))
    if return_hist:
        # Expose the (possibly per-shard) 19x19 histogram so callers/tests can verify
        # the distributed reduction: sum of shard histograms == full-set histogram.
        return miou, hist_np
    return miou


# Cityscapes palette (evaluate_cityscapes.py:40-45).
PALETTE = [
    128, 64, 128, 244, 35, 232, 70, 70, 70, 102, 102, 156, 190, 153, 153, 153, 153, 153,
    250, 170, 30, 220, 220, 0, 107, 142, 35, 152, 251, 152, 70, 130, 180, 220, 20, 60,
    255, 0, 0, 0, 0, 142, 0, 0, 70, 0, 60, 100, 0, 80, 100, 0, 0, 230, 119, 11, 32,
    255, 255, 255,
]


def colorize_mask(mask: np.ndarray):
    """Palette-PNG colorizer (evaluate_cityscapes.py:48-53)."""
    from PIL import Image

    img = Image.fromarray(mask.astype(np.uint8)).convert("P")
    img.putpalette(PALETTE + [0] * (768 - len(PALETTE)))
    return img


def save_pred_png(pred: np.ndarray, path: str, color: bool = False) -> None:
    from PIL import Image

    if color:
        colorize_mask(pred).save(path)
    else:
        Image.fromarray(pred.astype(np.uint8)).save(path)
