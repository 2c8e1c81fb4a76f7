#!/usr/bin/env python3
"""Standalone evaluation CLI (reference: tools/test.py:228-243 — build the open-set
model, load a checkpoint, run the evaluate_simt protocol once).

  python tools/test.py --restore-from ckpt.pth --data-dir-target /data/Cityscapes \
      --gt-dir /data/Cityscapes/label
  python tools/test.py --synthetic          # hermetic smoke run
"""

import argparse
import datetime
import tempfile
import time

from common import add_common_args, apply_platform, build_config, setup_synthetic


def main():
    parser = argparse.ArgumentParser(description="SimT evaluation (TPU-native)")
    add_common_args(parser)
    parser.add_argument("--mode", choices=["simt", "warmup"], default="simt")
    parser.add_argument("--save-dir", type=str, default=None,
                        help="optionally dump prediction PNGs here")
    args = parser.parse_args()
    apply_platform(args)
    cfg = build_config(args, stage="simt" if args.mode == "simt" else "warmup")

    import jax

    from simt_tpu.eval import evaluate
    from simt_tpu.train import checkpoint as ckpt_lib
    from simt_tpu.train.loop import build_mesh, build_models

    paths = None
    if args.synthetic:
        cfg, paths = setup_synthetic(cfg, tempfile.mkdtemp(prefix="simt_synth_"))

    model, _ = build_models(cfg)
    hw = (cfg.data.crop_size[1], cfg.data.crop_size[0])
    variables, report = ckpt_lib.load_warmstart_variables(
        model, cfg.restore_from, hw, rng=jax.random.PRNGKey(cfg.random_seed)
    )
    if cfg.restore_from:
        print(f"loaded {len(report['loaded'])} tensors from {cfg.restore_from}")

    val_list = paths["val_txt"] if paths else args.val_list
    gt_dir = paths["gt_dir"] if paths else args.gt_dir
    if not (val_list and gt_dir):
        parser.error("--val-list and --gt-dir are required (or use --synthetic)")

    h, w = hw
    eval_kw = dict(scales=((w, h), (w * 5 // 4, h * 5 // 4)), out_hw=(h, w)) if paths else {}

    print(datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"))
    miou = evaluate(
        model, variables,
        data_root=cfg.data.root if paths is None else paths["root"],
        val_list=val_list, gt_dir=gt_dir, mode=args.mode, process_workers=cfg.data.process_workers,
        batch_size=cfg.data.batch_size, save_dir=args.save_dir,
        # --mesh-spatial N: spatially-sharded eval (SURVEY.md §2.5 SP/CP row) —
        # H-sharded conv forward + output-row-sharded fused hist with psum.
        mesh=build_mesh(cfg), **eval_kw,
    )
    print("Finish Evaluation: " + time.asctime(time.localtime(time.time())))
    return miou


if __name__ == "__main__":
    main()
