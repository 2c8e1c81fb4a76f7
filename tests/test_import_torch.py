"""Checkpoint import/export tests: torch state_dict <-> flax variables round trip and
the reference's three partial-load flavours (SURVEY.md §5 checkpoint row)."""

import jax
import jax.numpy as jnp
import numpy as np

from simt_tpu.models import deeplab_multi
from simt_tpu.models.import_torch import (
    export_state_dict,
    flax_path_to_torch_key,
    import_state_dict,
)


def _small_model_vars(openset=True, seed=0):
    from simt_tpu.models.resnet_multi import ResNetMulti

    model = ResNetMulti(num_classes=5, open_classes=3, openset=openset,
                        layers=(1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    return model, model.init(jax.random.PRNGKey(seed), x, False)


def test_key_mapping_examples():
    cases = {
        ("params", "conv1", "kernel"): ("conv1.weight", True),
        ("params", "bn1", "scale"): ("bn1.weight", False),
        ("batch_stats", "bn1", "mean"): ("bn1.running_mean", False),
        ("batch_stats", "layer1_0", "bn2", "var"): ("layer1.0.bn2.running_var", False),
        ("params", "layer1_0", "downsample_conv", "kernel"): ("layer1.0.downsample.0.weight", True),
        ("params", "layer1_0", "downsample_bn", "bias"): ("layer1.0.downsample.1.bias", False),
        ("params", "layer5", "branch2_kernel"): ("layer5.conv2d_list.2.weight", True),
        ("params", "layer5", "branch2_bias"): ("layer5.conv2d_list.2.bias", False),
        # Open-set heads are NOT sequential indices (deeplab_multi.py:141-142).
        ("params", "layer5_1", "branch0_kernel"): ("layer5_1.conv2d_list.0.weight", True),
        ("params", "layer6_1", "branch3_bias"): ("layer6_1.conv2d_list.3.bias", False),
        # VGG feature stack.
        ("params", "features_29", "kernel"): ("features.29.weight", True),
    }
    for path, want in cases.items():
        assert flax_path_to_torch_key(path) == want, path


def test_export_import_roundtrip():
    model, variables = _small_model_vars()
    sd = export_state_dict(variables)
    assert "layer5_1.conv2d_list.0.weight" in sd
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)  # OIHW

    # Perturb, then restore from the export: must get the originals back, everywhere.
    perturbed = jax.tree.map(lambda a: a + 1.0, variables)
    restored, report = import_state_dict(perturbed, sd)
    flat_orig = jax.tree.leaves(variables)
    flat_rest = jax.tree.leaves(restored)
    for a, b in zip(flat_orig, flat_rest):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert not report["missing"] and not report["unused"]


def test_import_changes_forward():
    model, variables = _small_model_vars()
    _, v2 = _small_model_vars(seed=1)
    sd = export_state_dict(v2)
    merged, _ = import_state_dict(variables, sd)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))
    a = model.apply(variables, x, False)[1]
    b = model.apply(merged, x, False)[1]
    c = model.apply(v2, x, False)[1]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-6)


def test_prefix_strip_flavour():
    """trainV1_warmup.py:177 strips a 6-char prefix and shape-filters."""
    _, variables = _small_model_vars()
    sd = export_state_dict(variables)
    prefixed = {"Scale." + k: v for k, v in sd.items()}
    restored, report = import_state_dict(
        jax.tree.map(lambda a: a * 0, variables), prefixed, strip_prefix=6,
        shape_filter=True,
    )
    np.testing.assert_allclose(
        np.asarray(restored["params"]["conv1"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    assert len(report["loaded"]) > 100


def test_key_intersection_flavour():
    """trainV2_simt.py:252-255: load a closed-set checkpoint into the open-set model;
    open-set head keys stay at init, everything else loads."""
    closed_model, closed_vars = _small_model_vars(openset=False)
    sd = export_state_dict(closed_vars)

    open_model, open_vars = _small_model_vars(openset=True)
    merged, report = import_state_dict(open_vars, sd, shape_filter=True)
    assert any("layer5_1" in k for k in map(str, report["missing"]))
    np.testing.assert_allclose(
        np.asarray(merged["params"]["layer6"]["branch0_kernel"]),
        np.transpose(sd["layer6.conv2d_list.0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(merged["params"]["layer5_1"]["branch0_kernel"]),
        np.asarray(open_vars["params"]["layer5_1"]["branch0_kernel"]),
    )


def test_exclude_flavour():
    """deeplab.py:230-235: caffe load that skips the classifier head."""
    _, variables = _small_model_vars()
    sd = export_state_dict(variables)
    zeroed = jax.tree.map(lambda a: a * 0, variables)
    restored, report = import_state_dict(zeroed, sd, exclude=("layer5", "layer6"))
    assert np.allclose(np.asarray(restored["params"]["layer5"]["branch0_kernel"]), 0)
    assert not np.allclose(np.asarray(restored["params"]["conv1"]["kernel"]), 0)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Full-resume checkpointing the reference never had (SURVEY.md §5)."""
    from tests.test_train import tiny_cfg, tiny_model, batch, HW

    from simt_tpu.train import checkpoint as ckpt_lib
    from simt_tpu.train import create_warmup_state, make_warmup_step

    cfg = tiny_cfg(tmp_path, "warmup")
    model = tiny_model(False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)
    state = create_warmup_state(model, variables, cfg)
    step = make_warmup_step(model, cfg)
    state, _ = step(state, batch())

    path = ckpt_lib.save(state, str(tmp_path / "snap"), int(state.step))
    assert ckpt_lib.latest_step(str(tmp_path / "snap")) == 1
    restored = ckpt_lib.restore(state, str(tmp_path / "snap"))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # Resume: one more step from the restored state matches continuing the original.
    s_cont, m_cont = step(state, batch(5))
    s_rest, m_rest = step(restored, batch(5))
    assert float(m_cont["loss_seg2"]) == float(m_rest["loss_seg2"])


def test_orbax_async_save_roundtrip(tmp_path):
    """wait=False saves commit in the background; wait_until_finished() is the
    read/delete barrier (the training loop's best-snapshot path)."""
    from tests.test_train import tiny_cfg, tiny_model, batch, HW

    from simt_tpu.train import checkpoint as ckpt_lib
    from simt_tpu.train import create_warmup_state, make_warmup_step

    cfg = tiny_cfg(tmp_path, "warmup")
    model = tiny_model(False)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, *HW, 3)), False)
    state = create_warmup_state(model, variables, cfg)
    step = make_warmup_step(model, cfg)
    state, _ = step(state, batch())

    ckpt_lib.save(state, str(tmp_path / "snap"), int(state.step), wait=False)
    ckpt_lib.wait_until_finished()
    restored = ckpt_lib.restore(state, str(tmp_path / "snap"))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_export_torch_cli_roundtrip(tmp_path, monkeypatch):
    """tools/export_torch.py: orbax snapshot -> reference-layout .pth whose tensors
    equal the snapshot's model params (the reverse of the warm-start import)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export_torch
    import torch

    from tests.test_train import tiny_cfg, tiny_model, batch
    import dataclasses

    from simt_tpu.train import loop as loop_lib

    cfg = tiny_cfg(tmp_path, "simt")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, crop_size=(64, 32)),
        snapshot_dir=str(tmp_path / "snap"),
        num_steps_stop=2, save_pred_every=100, log_every=1,
    )

    def tiny_models(c):
        return tiny_model(True), tiny_model(False)

    monkeypatch.setattr(loop_lib, "build_models", tiny_models)

    def batches():
        i = 0
        while True:
            yield batch(seed=i)
            i += 1

    out = loop_lib.train(cfg, batch_iter=batches(), eval_fn=None, max_steps=2,
                         print_fn=lambda s: None)
    want = out["state"].model.params

    out_pth = str(tmp_path / "exported.pth")
    monkeypatch.setattr(sys, "argv", [
        "export_torch.py", "--stage", "simt", "--platform", "cpu",
        "--compute-dtype", "float32", "--num-classes", "5", "--open-classes", "3",
        "--input-size-target", "64,32",
        "--snapshot-dir", str(tmp_path / "snap"), "--out", out_pth,
    ])
    export_torch.main()

    sd = torch.load(out_pth, map_location="cpu", weights_only=True)
    # Reference module naming (deeplab_multi.py): open-set heads are layer5_1/
    # layer6_1 module names, ASPP branches are conv2d_list.{i}.
    assert "layer5_1.conv2d_list.0.weight" in sd
    got = sd["layer6.conv2d_list.1.weight"].numpy()
    np.testing.assert_array_equal(
        got, np.transpose(np.asarray(want["layer6"]["branch1_kernel"]), (3, 2, 0, 1))
    )
    np.testing.assert_array_equal(
        sd["conv1.weight"].numpy(),
        np.transpose(np.asarray(want["conv1"]["kernel"]), (3, 2, 0, 1)),
    )


def test_export_import_identity_all_archs():
    """export_state_dict -> import_state_dict is the identity for every model
    family (multi already covered above; this pins VGG's features.{i}, the
    single-head 4-branch ASPP, and v3's assp/classifier naming)."""
    import pytest

    from simt_tpu.models import DeepLabv3, DeeplabSingle, DeeplabVGG

    builders = [
        lambda: DeeplabSingle(num_classes=5, layers=(1, 1, 1, 1), dtype=jnp.float32),
        lambda: DeeplabVGG(num_classes=5, dtype=jnp.float32),
        lambda: DeepLabv3(num_classes=5, open_classes=3, openset=True,
                          dtype=jnp.float32),
    ]
    for build in builders:
        model = build()
        variables = dict(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)),
                                    False))
        sd = export_state_dict(variables)
        assert sd, type(model).__name__
        zeroed = jax.tree.map(lambda a: a * 0, variables)
        restored, report = import_state_dict(zeroed, sd)
        assert not report["missing"], (type(model).__name__, report["missing"][:5])
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(variables)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(restored)[0],
                   key=lambda kv: str(kv[0])),
        ):
            assert str(pa) == str(pb)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{type(model).__name__} {pa}")
