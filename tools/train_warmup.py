#!/usr/bin/env python3
"""Warmup-stage training CLI (reference: tools/trainV1_warmup.py + sh_warmup.sh:17).

Hermetic smoke run:
  python tools/train_warmup.py --synthetic --num-steps-stop 3 --save-pred-every 2
"""

import argparse
import tempfile

from common import add_common_args, apply_platform, build_config, setup_synthetic


def run_adversarial(cfg, args):
    """Adversarial-warmup loop: DeepLabv2 + FCDiscriminator (the reference ships the
    discriminator unused — model/discriminator.py, import commented at
    trainV2_simt.py:19; this implements the AdaptSegNet-style output-space loss it was
    built for — see train/adversarial.py, marked as an extension)."""
    import jax
    import jax.numpy as jnp

    from simt_tpu.models import FCDiscriminator
    from simt_tpu.train import create_warmup_state
    from simt_tpu.train.adversarial import (
        create_discriminator_state,
        make_adversarial_warmup_step,
    )
    from simt_tpu.train.loop import build_loader, build_models
    from simt_tpu.utils import format_warmup_line

    student, _ = build_models(cfg)
    hw = (cfg.data.crop_size[1], cfg.data.crop_size[0])
    rng = jax.random.PRNGKey(cfg.random_seed)
    variables = student.init(rng, jnp.zeros((1, *hw, 3), jnp.float32), False)
    state = create_warmup_state(student, variables, cfg)
    disc = FCDiscriminator(dtype=jnp.float32 if cfg.model.compute_dtype == "float32"
                           else jnp.bfloat16)
    d_state = create_discriminator_state(disc, cfg.model.num_classes, hw,
                                         jax.random.fold_in(rng, 1))
    step = make_adversarial_warmup_step(student, disc, cfg)
    batch_iter = build_loader(cfg)
    for i_iter in range(cfg.num_steps_stop):
        batch = next(batch_iter)
        batch = {k: v for k, v in batch.items() if k in ("image", "label")}
        state, d_state, m = step(state, d_state, batch)
        if i_iter % cfg.log_every == 0:
            line = format_warmup_line(i_iter, cfg.num_steps, m)
            print(f"{line} loss_adv = {float(m['loss_adv']):.3f}")
    print("done (adversarial warmup)")


def main():
    parser = argparse.ArgumentParser(description="Warmup stage trainer (TPU-native)")
    add_common_args(parser)
    parser.add_argument("--adversarial", action="store_true",
                        help="train with the FCDiscriminator output-space loss "
                             "(extension; the reference ships the discriminator unused)")
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

    if args.adversarial:
        run_adversarial(cfg, args)
        return

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
                val_list=val_list, gt_dir=gt_dir, mode="warmup", process_workers=cfg.data.process_workers,
                batch_size=cfg.data.batch_size, **eval_kw,
            )

    summary = train(cfg, eval_fn=eval_fn, csv_path=args.csv,
                    resume=args.resume, profile_dir=args.profile_dir)
    print(f"done: {summary['steps_per_sec']:.3f} steps/s, best mIoU {summary['best_miou']}")


if __name__ == "__main__":
    main()
