"""Cross-tool consistency: evaluate(save_dir=...) predictions re-scored by the offline
compute_iou CLI must reproduce the online mIoU (the reference's two scoring paths,
evaluate_cityscapes.py vs compute_iou.py, made mutually consistent)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from simt_tpu.data import synthetic
from simt_tpu.eval import evaluate
from simt_tpu.models.resnet_multi import ResNetMulti


def test_saved_predictions_rescore_to_same_miou(tmp_path):
    paths = synthetic.make_cityscapes_fixture(str(tmp_path / "cs"), n_train=2, n_val=3,
                                              image_wh=(64, 32))
    model = ResNetMulti(num_classes=19, layers=(1, 1, 1, 1), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), False)

    save_dir = str(tmp_path / "preds")
    online = evaluate(
        model, variables,
        data_root=paths["root"], val_list=paths["val_txt"], gt_dir=paths["gt_dir"],
        mode="simt", scales=((32, 16), (40, 20)), out_hw=(32, 64),
        print_fn=lambda s: None, save_dir=save_dir,
    )

    # Offline re-score with the compute_iou CLI logic over the saved PNGs.
    from compute_iou import compute_miou

    devkit = tmp_path / "devkit"
    devkit.mkdir()
    import shutil
    from simt_tpu.data.lists import ASSETS_DIR

    shutil.copy(os.path.join(ASSETS_DIR, "cityscapes_list", "info.json"),
                devkit / "info.json")
    names = [l.strip() for l in open(paths["val_txt"]) if l.strip()]
    with open(devkit / "val.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    with open(devkit / "label.txt", "w") as f:
        # Full relative gt paths incl. the city subdir, like the shipped label.txt
        # ('frankfurt/frankfurt_..._gtFine_labelIds.png').
        gt_names = [n.split("leftImg8bit")[0] + "gtFine_labelIds.png" for n in names]
        f.write("\n".join(gt_names) + "\n")

    ious = compute_miou(paths["gt_dir"], save_dir, str(devkit))
    offline = round(float(np.nanmean(ious)) * 100, 2)
    assert offline == online, (offline, online)
