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


def test_spatially_sharded_eval_matches_single_device(setup):
    """The CP-analog flagship (SURVEY.md §2.5 SP/CP row): the two-scale eval forward
    sharded over `spatial` (GSPMD conv halo exchange) + the output-row-sharded Pallas
    hist with psum must reproduce the single-device histogram exactly."""
    from simt_tpu.parallel import make_mesh

    paths, model, variables = setup
    kw = dict(
        data_root=paths["root"], val_list=paths["val_txt"], gt_dir=paths["gt_dir"],
        mode="simt", scales=((32, 16), (40, 20)), out_hw=(32, 64),
        print_fn=lambda s: None, return_hist=True,
    )
    full, hist_full = evaluate(model, variables, **kw)

    # Pure spatial 1x4: image heights 16/20 and the 32 output rows split over H.
    m_sp, hist_sp = evaluate(model, variables, mesh=make_mesh(data=1, spatial=4), **kw)
    np.testing.assert_array_equal(hist_sp, hist_full)
    assert m_sp == full

    # Mixed DP+SP (2x4) at batch 2: images over `data`, rows over `spatial`.
    m_dp, hist_dp = evaluate(
        model, variables, batch_size=2, mesh=make_mesh(data=2, spatial=4), **kw
    )
    np.testing.assert_array_equal(hist_dp, hist_full)
    assert m_dp == full
