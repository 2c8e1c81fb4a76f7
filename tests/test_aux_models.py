"""Aux model family tests (SURVEY.md §2.1 rows: deeplab.py, deeplab_vgg.py,
deeplabv3.py, discriminator.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from simt_tpu.models import (
    DeepLabv3,
    DeeplabSingle,
    DeeplabVGG,
    FCDiscriminator,
)


def test_deeplab_single_duplicated_outputs_and_4_branches():
    model = DeeplabSingle(num_classes=7, layers=(1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    o1, o2 = model.apply(variables, x, False)
    assert o1.shape == (1, 9, 9, 7)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))  # returns (x, x)
    # Single head named layer5, on layer4 features, all-4-branch sum: flipping branch 3
    # must change the output (unlike the 2-branch multi-head quirk).
    p = variables["params"]
    p2 = jax.tree.map(lambda a: a, p)
    import flax

    flat = flax.traverse_util.flatten_dict(p2)
    flat[("layer5", "branch3_kernel")] = flat[("layer5", "branch3_kernel")] + 1.0
    p2 = flax.traverse_util.unflatten_dict(flat)
    o1b, _ = model.apply({**variables, "params": p2}, x, False)
    assert not np.allclose(np.asarray(o1), np.asarray(o1b))


def test_deeplab_vgg_stride8_and_feature_names():
    model = DeeplabVGG(num_classes=5, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    o1, o2 = model.apply(variables, x, False)
    assert o1.shape == (1, 8, 12, 5)  # three /2 pools -> stride 8
    # Conv stack indices mirror the reference's trimmed Sequential (deeplab_vgg.py:34-43).
    names = set(variables["params"].keys())
    for idx in [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 23, 25, 27, 29, 31]:
        assert f"features_{idx}" in names, idx
    assert "classifier" in names


def test_deeplabv3_upsamples_to_input_size():
    model = DeepLabv3(num_classes=6, open_classes=2, openset=True, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 64, 64, 8)  # in-model upsample + open-set concat


def test_deeplabv3_batchnorm_stats_update():
    model = DeepLabv3(num_classes=3, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    _, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    assert not np.allclose(
        np.asarray(variables["batch_stats"]["bn1"]["mean"]),
        np.asarray(mutated["batch_stats"]["bn1"]["mean"]),
    )


def test_deeplabv3_param_partition():
    """The v3 LR groups mirror deeplabv3.py:140-166: layer3 at 1x, ASPP + classifier
    conv(s) at 10x (BN affine included — torchvision requires_grad defaults), stem and
    layers 1-2 in no group at all."""
    from simt_tpu.train.state import LABEL_1X, LABEL_10X, LABEL_FROZEN, param_label

    lbl = lambda *path: param_label(path, warmup=True, arch="deeplabv3")
    assert lbl("layer3_0", "conv2", "kernel") == LABEL_1X
    assert lbl("layer3_5", "bn2", "scale") == LABEL_1X  # BN affine trains in v3
    assert lbl("assp", "conv2", "kernel") == LABEL_10X
    assert lbl("assp", "bnf", "bias") == LABEL_10X
    assert lbl("conv", "kernel") == LABEL_10X
    assert lbl("conv_1", "bias") == LABEL_10X
    for frozen in [("conv1", "kernel"), ("bn1", "scale"),
                   ("layer1_0", "conv1", "kernel"), ("layer2_3", "bn3", "bias")]:
        assert param_label(frozen, warmup=True, arch="deeplabv3") == LABEL_FROZEN, frozen


def test_deeplabv3_warmup_training(tmp_path):
    """Warmup-stage training of the v3 arch: full-res single-output CE path, the v3
    optimizer partition, and BN running-stat updates, driven through train()."""
    import dataclasses

    from simt_tpu.train.loop import train
    from tests.test_train import tiny_cfg, batch, HW

    cfg = tiny_cfg(tmp_path, "warmup")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, arch="deeplabv3", open_classes=0,
                                  openset=False),
        data=dataclasses.replace(cfg.data, crop_size=(HW[1], HW[0])),  # (w, h)
        snapshot_dir="",
    )

    def batches():
        i = 0
        while True:
            yield batch(seed=i)
            i += 1

    out = train(cfg, batch_iter=batches(), eval_fn=None, max_steps=3,
                print_fn=lambda s: None)
    m = out["final_metrics"]
    assert np.isfinite(m["loss_seg1"]) and np.isfinite(m["loss_seg2"])
    st = out["state"]
    assert int(st.step) == 3
    p = st.model.params
    init_vars = out["student"].init(jax.random.PRNGKey(cfg.random_seed),
                                    jnp.zeros((1, *HW, 3)), False)
    # 1x (layer3) and 10x (assp/conv) groups moved; stem + layer1/2 frozen (v3 trains
    # from scratch here, so init params are reproducible from the same seed).
    p0 = init_vars["params"]
    assert not np.allclose(p0["conv"]["kernel"], p["conv"]["kernel"])
    assert not np.allclose(p0["assp"]["conv1"]["kernel"], p["assp"]["conv1"]["kernel"])
    assert not np.allclose(p0["layer3_0"]["conv2"]["kernel"],
                           p["layer3_0"]["conv2"]["kernel"])
    assert not np.allclose(p0["layer3_0"]["bn2"]["scale"],
                           p["layer3_0"]["bn2"]["scale"])  # BN affine trains in v3
    np.testing.assert_array_equal(p0["conv1"]["kernel"], p["conv1"]["kernel"])
    np.testing.assert_array_equal(p0["layer1_0"]["conv1"]["kernel"],
                                  p["layer1_0"]["conv1"]["kernel"])
    # Running stats updated (train-mode BN).
    assert not np.allclose(init_vars["batch_stats"]["bn1"]["mean"],
                           st.model.batch_stats["bn1"]["mean"])


def test_discriminator_patch_output():
    disc = FCDiscriminator(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 19))
    variables = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(variables, x)
    assert out.shape == (2, 2, 2, 1)  # five stride-2 convs: /32


def test_adversarial_warmup_step(tmp_path):
    from tests.test_train import tiny_cfg, tiny_model, batch, HW, C

    cfg = tiny_cfg(tmp_path, "warmup")
    model = tiny_model(False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)

    from simt_tpu.train import create_warmup_state
    from simt_tpu.train.adversarial import (
        create_discriminator_state,
        make_adversarial_warmup_step,
    )

    disc = FCDiscriminator(dtype=jnp.float32)
    state = create_warmup_state(model, variables, cfg)
    d_state = create_discriminator_state(disc, C, HW, jax.random.PRNGKey(1))
    step = make_adversarial_warmup_step(model, disc, cfg)
    new_state, new_d, metrics = step(state, d_state, batch())
    for k in ["loss_seg1", "loss_seg2", "loss_adv"]:
        assert np.isfinite(float(metrics[k])), k
    assert not jax.tree.all(
        jax.tree.map(np.array_equal, d_state.params, new_d.params)
    )


def test_offline_tools(tmp_path):
    """compute_class_distribution + compute_confusion_matrix over a fixture."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from compute_class_distribution import compute_class_distribution
    from compute_confusion_matrix import compute_confusion

    from PIL import Image

    rng = np.random.RandomState(0)
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir(), pred_dir.mkdir()
    names = []
    for i in range(3):
        name = f"img_{i}.png"
        Image.fromarray(rng.randint(0, 34, (16, 16)).astype(np.uint8)).save(gt_dir / name)
        Image.fromarray(rng.randint(0, 19, (16, 16)).astype(np.uint8)).save(pred_dir / name)
        names.append(name)

    dist = compute_class_distribution(str(pred_dir), names)
    assert dist.shape == (19,)
    np.testing.assert_allclose(dist.sum(), 1.0, atol=1e-6)

    cm = compute_confusion(str(gt_dir), str(pred_dir), names, names)
    assert cm.shape == (34, 19)
    assert cm.sum() == 3 * 16 * 16
