"""Export a simt_tpu checkpoint to the reference's torch state_dict layout.

The reverse of the warm-start import (models/import_torch.py): reads either an
orbax snapshot directory (full train state, --snapshot-dir) or a torch/.npz model
file (--restore-from), and writes the model weights as a torch-loadable ``.pth``
(or ``.npz`` when the output path ends in .npz) whose keys match the reference's
``state_dict`` naming (model/deeplab_multi.py module names) — so a TPU-trained
model can be taken back into the PyTorch reference codebase (its tools/test.py
partial-load, trainV2_simt.py:252-255).

Usage:
  python export_torch.py --stage simt --snapshot-dir snapshots/ --out model.pth
  python export_torch.py --stage warmup --restore-from warmup.pth --out back.npz
"""

import argparse

from common import add_common_args, apply_platform, build_config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--stage", choices=["warmup", "simt"], default="simt")
    parser.add_argument("--out", type=str, required=True,
                        help="output path (.pth for torch, .npz for numpy)")
    args = parser.parse_args()
    apply_platform(args)
    cfg = build_config(args, stage=args.stage)

    import jax
    import numpy as np

    from simt_tpu.models.import_torch import export_state_dict
    from simt_tpu.train import checkpoint as ckpt_lib
    from simt_tpu.train.loop import build_models

    student, teacher = build_models(cfg)
    hw = (cfg.data.crop_size[1], cfg.data.crop_size[0])
    rng = jax.random.PRNGKey(cfg.random_seed)
    variables, _ = ckpt_lib.load_warmstart_variables(
        student, cfg.restore_from, hw, rng=rng
    )

    if cfg.snapshot_dir and ckpt_lib.latest_step(cfg.snapshot_dir) is not None:
        # Full-state snapshot: rebuild the state template, restore, take the
        # (student) model collections.
        if cfg.stage == "simt":
            from simt_tpu.train import create_simt_state

            tv, _ = ckpt_lib.load_warmstart_variables(teacher, cfg.restore_from, hw,
                                                      rng=rng)
            state = create_simt_state(variables, tv, cfg, jax.random.fold_in(rng, 1))
        else:
            from simt_tpu.train import create_warmup_state

            state = create_warmup_state(student, variables, cfg)
        state = ckpt_lib.restore(state, cfg.snapshot_dir)
        variables = {"params": state.model.params,
                     "batch_stats": state.model.batch_stats}
        print(f"exporting snapshot step {int(state.step)} from {cfg.snapshot_dir}")
    elif not cfg.restore_from:
        parser.error("need --snapshot-dir with checkpoints or --restore-from")

    sd = export_state_dict(variables)
    if args.out.endswith(".npz"):
        np.savez(args.out, **sd)
    else:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            args.out,
        )
    print(f"wrote {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
