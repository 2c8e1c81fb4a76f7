"""Sharded-evaluation equivalence: per-shard histograms sum to the full histogram,
and the mIoU of the summed histogram equals the full-pass mIoU — the single-process
proof of the cross-host reduction math in eval/evaluate.py (hist summation before
per_class_iu)."""

import jax
import jax.numpy as jnp
import numpy as np

from simt_tpu.data import synthetic
from simt_tpu.eval import evaluate
from simt_tpu.ops import mean_iou
from simt_tpu.models.resnet_multi import ResNetMulti

import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cs")
    paths = synthetic.make_cityscapes_fixture(str(root), n_train=2, n_val=4,
                                              image_wh=(64, 32))
    model = ResNetMulti(num_classes=19, layers=(1, 1, 1, 1), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), False)
    return paths, model, variables


def test_sharded_eval_composes(setup):
    paths, model, variables = setup
    kw = dict(
        data_root=paths["root"], val_list=paths["val_txt"], gt_dir=paths["gt_dir"],
        mode="simt", scales=((32, 16), (40, 20)), out_hw=(32, 64),
        print_fn=lambda s: None, return_hist=True,
    )
    full, hist_full = evaluate(model, variables, **kw)
    m0, hist0 = evaluate(model, variables, shard=(0, 2), **kw)
    m1, hist1 = evaluate(model, variables, shard=(1, 2), **kw)

    # The shards partition the val set, so their histograms must sum EXACTLY to the
    # full histogram (integer confusion counts)...
    np.testing.assert_array_equal(hist0 + hist1, hist_full)
    # ...and the reduction used across processes (sum hists, then IoU) reproduces the
    # single-pass mIoU exactly.
    assert mean_iou(hist0 + hist1) == full
    # Each shard saw a proper non-empty subset.
    assert hist0.sum() > 0 and hist1.sum() > 0
    assert hist0.sum() < hist_full.sum() and hist1.sum() < hist_full.sum()
    assert 0.0 <= m0 <= 100.0 and 0.0 <= m1 <= 100.0
