#!/usr/bin/env python3
"""SimT-stage training CLI (reference: tools/trainV2_simt.py + sh_simt.sh:17).

Example (real data):
  python tools/train_simt.py --preset simt_bapa_lr25 \
      --data-dir-target /data/Cityscapes --gt-dir /data/Cityscapes/label \
      --restore-from warmup.pth

Hermetic smoke run:
  python tools/train_simt.py --synthetic --num-steps-stop 3 --save-pred-every 2
"""

import argparse
import tempfile

from common import add_common_args, apply_platform, build_config, setup_synthetic


def main():
    parser = argparse.ArgumentParser(description="SimT stage trainer (TPU-native)")
    add_common_args(parser)
    args = parser.parse_args()
    apply_platform(args)
    cfg = build_config(args, stage="simt")

    from simt_tpu.eval import evaluate
    from simt_tpu.train.loop import train

    paths = None
    if args.synthetic:
        tmp = tempfile.mkdtemp(prefix="simt_synth_")
        import dataclasses as dc
        import numpy as np
        import os

        cfg, paths = setup_synthetic(cfg, tmp)
        # Synthetic runs use a matching tiny class prior.
        cd_path = os.path.join(tmp, "class_dist.npy")
        np.save(cd_path, (np.ones(cfg.model.num_classes) / cfg.model.num_classes).astype(np.float32))
        cfg = cfg.replace(simt=dc.replace(cfg.simt, class_dist=cd_path))

    print("Leanring_rate: ", cfg.optim.learning_rate)
    print("Leanring_rate_T: ", cfg.optim.learning_rate_t)
    print("Open-set class: ", cfg.model.open_classes)
    print("Threshold_high: ", cfg.simt.threshold_high)
    print("Threshold_low: ", cfg.simt.threshold_low)
    print("lambda_Place: ", cfg.simt.lambda_place)
    print("lambda_Convex: ", cfg.simt.lambda_convex)
    print("lambda_Volume: ", cfg.simt.lambda_volume)
    print("lambda_Anchor: ", cfg.simt.lambda_anchor)
    print("restore_from: ", cfg.restore_from)

    eval_fn = None
    val_list = args.val_list
    gt_dir = args.gt_dir
    if paths is not None:
        val_list, gt_dir = paths["val_txt"], paths["gt_dir"]
    if gt_dir and val_list:
        h, w = cfg.data.crop_size[1], cfg.data.crop_size[0]
        eval_kw = {}
        if paths is not None:  # scaled-down protocol; fixture gt is (h, w)
            eval_kw = dict(scales=((w, h), (w * 5 // 4, h * 5 // 4)), out_hw=(h, w))

        def eval_fn(model, variables):
            return evaluate(
                model, variables,
                data_root=cfg.data.root if paths is None else paths["root"],
                val_list=val_list, gt_dir=gt_dir, mode="simt", process_workers=cfg.data.process_workers,
                batch_size=cfg.data.batch_size, **eval_kw,
            )

    summary = train(cfg, eval_fn=eval_fn, csv_path=args.csv,
                    resume=args.resume, profile_dir=args.profile_dir,
                    plot_ntm_every=args.plot_ntm_every, plot_ntm_dir=args.plot_ntm_dir)
    print(f"done: {summary['steps_per_sec']:.3f} steps/s, best mIoU {summary['best_miou']}")


if __name__ == "__main__":
    main()
