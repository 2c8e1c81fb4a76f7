#!/usr/bin/env python3
"""Warmup-stage training CLI (reference: tools/trainV1_warmup.py + sh_warmup.sh:17).

Hermetic smoke run:
  python tools/train_warmup.py --synthetic --num-steps-stop 3 --save-pred-every 2
"""

import argparse
import tempfile

from common import add_common_args, apply_platform, build_config, setup_synthetic


def main():
    parser = argparse.ArgumentParser(description="Warmup stage trainer (TPU-native)")
    add_common_args(parser)
    args = parser.parse_args()
    apply_platform(args)
    cfg = build_config(args, stage="warmup")
    if args.num_steps_stop is None and args.preset is None:
        cfg = cfg.replace(num_steps_stop=150_000)  # NUM_STEPS_STOP trainV1_warmup.py:52

    from simt_tpu.eval import evaluate
    from simt_tpu.train.loop import train

    paths = None
    if args.synthetic:
        cfg, paths = setup_synthetic(cfg, tempfile.mkdtemp(prefix="simt_synth_"))

    eval_fn = None
    val_list = paths["val_txt"] if paths else args.val_list
    gt_dir = paths["gt_dir"] if paths else args.gt_dir
    if gt_dir and val_list:
        h, w = cfg.data.crop_size[1], cfg.data.crop_size[0]
        eval_kw = dict(scales=((w, h), (w * 5 // 4, h * 5 // 4)), out_hw=(h, w)) if paths else {}

        def eval_fn(model, variables):
            return evaluate(
                model, variables,
                data_root=cfg.data.root if paths is None else paths["root"],
                val_list=val_list, gt_dir=gt_dir, mode="warmup",
                batch_size=cfg.data.batch_size, **eval_kw,
            )

    summary = train(cfg, eval_fn=eval_fn, csv_path=args.csv,
                    resume=args.resume, profile_dir=args.profile_dir)
    print(f"done: {summary['steps_per_sec']:.3f} steps/s, best mIoU {summary['best_miou']}")


if __name__ == "__main__":
    main()
