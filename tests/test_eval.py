"""End-to-end eval protocol test on the synthetic fixture (evaluate_cityscapes.py:96-162)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simt_tpu.data import synthetic
from simt_tpu.eval import evaluate
from simt_tpu.models.resnet_multi import ResNetMulti


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cs")
    paths = synthetic.make_cityscapes_fixture(str(root), n_train=2, n_val=3,
                                              image_wh=(64, 32))
    model = ResNetMulti(num_classes=19, layers=(1, 1, 1, 1), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), False)
    return paths, model, variables


def test_evaluate_simt_mode_runs(setup):
    paths, model, variables = setup
    lines = []
    miou = evaluate(
        model,
        variables,
        data_root=paths["root"],
        val_list=paths["val_txt"],
        gt_dir=paths["gt_dir"],
        mode="simt",
        scales=((32, 16), (40, 20)),
        out_hw=(32, 64),  # fixture gt size (h, w)
        print_fn=lines.append,
    )
    assert 0.0 <= miou <= 100.0
    # Reference output format: one '===>{class}:\t{iou}' line per class + mIoU line.
    assert len([l for l in lines if l.startswith("===>")]) == 20
    assert lines[-1].startswith("===> mIoU: ")


def test_evaluate_warmup_mode_single_scale(setup):
    paths, model, variables = setup
    miou = evaluate(
        model,
        variables,
        data_root=paths["root"],
        val_list=paths["val_txt"],
        gt_dir=paths["gt_dir"],
        mode="warmup",
        scales=((32, 16), (40, 20)),
        out_hw=(32, 64),
        print_fn=lambda s: None,
    )
    assert 0.0 <= miou <= 100.0


def test_evaluate_batched_matches_batch1(setup):
    paths, model, variables = setup
    kw = dict(
        data_root=paths["root"], val_list=paths["val_txt"], gt_dir=paths["gt_dir"],
        mode="simt", scales=((32, 16), (40, 20)), out_hw=(32, 64),
        print_fn=lambda s: None,
    )
    m1 = evaluate(model, variables, batch_size=1, **kw)
    m3 = evaluate(model, variables, batch_size=3, **kw)
    assert m1 == m3


def test_colorize_mask_roundtrip(tmp_path):
    from simt_tpu.eval import colorize_mask

    mask = np.arange(20, dtype=np.uint8).reshape(4, 5) % 19
    img = colorize_mask(mask)
    assert np.array_equal(np.asarray(img), mask)  # P-mode keeps indices
