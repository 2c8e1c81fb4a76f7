"""Full-model forward parity vs torch.

Builds a functional torch twin of the DeepLabv2 forward *from our exported state_dict*
(torch F.conv2d/F.batch_norm/F.max_pool2d driven by the checkpoint key layout), then
checks the jax forward matches to float tolerance at every head. This is the
activation-level parity check SURVEY.md §7 calls out as the mitigation for the
frozen-BN/ASPP-quirk silent-failure risk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from simt_tpu.models.import_torch import export_state_dict
from simt_tpu.models.resnet_multi import ResNetMulti


def _t(sd, key):
    v = sd[key]
    # Pass torch tensors through (the v3 SGD oracle feeds leaf Parameters so
    # autograd can flow); convert exported numpy otherwise.
    return v if isinstance(v, torch.Tensor) else torch.from_numpy(np.asarray(v))


def _conv(x, sd, prefix, stride=1, padding=0, dilation=1):
    bias = _t(sd, prefix + ".bias") if prefix + ".bias" in sd else None
    return F.conv2d(x, _t(sd, prefix + ".weight"), bias, stride=stride, padding=padding,
                    dilation=dilation)


def _bn(x, sd, prefix):
    return F.batch_norm(
        x, _t(sd, prefix + ".running_mean"), _t(sd, prefix + ".running_var"),
        _t(sd, prefix + ".weight"), _t(sd, prefix + ".bias"), training=False, eps=1e-5,
    )


def _bottleneck(x, sd, prefix, stride, dilation):
    out = F.relu(_bn(_conv(x, sd, prefix + ".conv1", stride=stride), sd, prefix + ".bn1"))
    out = F.relu(_bn(_conv(out, sd, prefix + ".conv2", padding=dilation, dilation=dilation),
                     sd, prefix + ".bn2"))
    out = _bn(_conv(out, sd, prefix + ".conv3"), sd, prefix + ".bn3")
    if prefix + ".downsample.0.weight" in sd:
        res = _bn(_conv(x, sd, prefix + ".downsample.0", stride=stride), sd,
                  prefix + ".downsample.1")
    else:
        res = x
    return F.relu(out + res)


def _aspp(x, sd, prefix, effective=2):
    out = None
    for i, d in enumerate([6, 12, 18, 24][:effective]):
        y = _conv(x, sd, f"{prefix}.conv2d_list.{i}", padding=d, dilation=d)
        out = y if out is None else out + y
    return out


def torch_twin_forward(sd, x_nchw, layers, openset, effective=2):
    x = F.relu(_bn(_conv(x_nchw, sd, "conv1", stride=2, padding=3), sd, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1, ceil_mode=True)
    for li, (blocks, stride, dilation) in enumerate(
        zip(layers, [1, 2, 1, 1], [1, 1, 2, 4]), start=1
    ):
        for b in range(blocks):
            x = _bottleneck(x, sd, f"layer{li}.{b}", stride if b == 0 else 1, dilation)
        if li == 3:
            x1 = _aspp(x, sd, "layer5", effective)
            if openset:
                x1 = torch.cat([x1, _aspp(x, sd, "layer5_1", effective)], 1)
    x2 = _aspp(x, sd, "layer6", effective)
    if openset:
        x2 = torch.cat([x2, _aspp(x, sd, "layer6_1", effective)], 1)
    return x1, x2


def test_full_forward_matches_torch_twin():
    layers = (1, 1, 2, 1)
    model = ResNetMulti(num_classes=5, open_classes=3, openset=True, layers=layers,
                        dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 65, 97, 3).astype(np.float32) * 50

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    # Randomise BN stats so eval-mode normalisation is non-trivial.
    bs = jax.tree.map(lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.3
                                            + (1.0 if a.ndim else 0.0)),
                      variables["batch_stats"])
    bs = jax.tree.map(lambda a: jnp.abs(a) + 0.1, bs)
    variables = {"params": variables["params"], "batch_stats": bs}

    got1, got2 = model.apply(variables, jnp.asarray(x), False)

    sd = export_state_dict(variables)
    want1, want2 = torch_twin_forward(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()), layers, openset=True
    )
    np.testing.assert_allclose(
        np.asarray(got1), want1.permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got2), want2.permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )


def test_closed_set_forward_matches_torch_twin():
    layers = (1, 1, 1, 1)
    model = ResNetMulti(num_classes=4, layers=layers, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 48, 64, 3).astype(np.float32) * 30
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x), False)
    got1, got2 = model.apply(variables, jnp.asarray(x), False)
    sd = export_state_dict(variables)
    want1, want2 = torch_twin_forward(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()), layers, openset=False
    )
    np.testing.assert_allclose(
        np.asarray(got2), want2.permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )


# ---------------------------------------------------------------------------
# DeepLabv3 (the TPAMI-variant eval/warmup model, model/deeplabv3.py)
# ---------------------------------------------------------------------------


def _bn_train(x, sd, prefix):
    """Train-mode BN: normalise by batch statistics (flax use_running_average=False).
    Running stats are irrelevant to the oracle's param comparison (no grad flows
    through them), so None is passed."""
    return F.batch_norm(x, None, None, _t(sd, prefix + ".weight"),
                        _t(sd, prefix + ".bias"), training=True, eps=1e-5)


def _v3_bottleneck(x, sd, prefix, stride, bn=_bn):
    """torchvision bottleneck: the stride sits on conv2 (ResNet V1.5)."""
    out = F.relu(bn(_conv(x, sd, prefix + ".conv1"), sd, prefix + ".bn1"))
    out = F.relu(bn(_conv(out, sd, prefix + ".conv2", stride=stride, padding=1),
                    sd, prefix + ".bn2"))
    out = bn(_conv(out, sd, prefix + ".conv3"), sd, prefix + ".bn3")
    if prefix + ".downsample.0.weight" in sd:
        res = bn(_conv(x, sd, prefix + ".downsample.0", stride=stride), sd,
                 prefix + ".downsample.1")
    else:
        res = x
    return F.relu(out + res)


def _v3_assp(x, sd, bn=_bn):
    """5-branch ASPP + concat + 1x1 fuse (deeplabv3.py:23-108)."""
    branches = []
    for suffix, d in [("1", 1), ("2", 6), ("3", 12), ("4", 18), ("5", 1)]:
        pad = d if suffix in ("2", "3", "4") else 0
        y = _conv(x, sd, f"assp.conv{suffix}", padding=pad, dilation=d)
        branches.append(F.relu(bn(y, sd, f"assp.bn{suffix}")))
    y = torch.cat(branches, 1)
    return F.relu(bn(_conv(y, sd, "assp.convf"), sd, "assp.bnf"))


def torch_twin_v3_forward(sd, x_nchw, openset, bn=_bn):
    h, w = x_nchw.shape[-2:]
    x = F.relu(bn(_conv(x_nchw, sd, "conv1", stride=2, padding=3), sd, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)  # torchvision floor mode
    for li, (blocks, stride) in enumerate([(3, 1), (4, 2), (6, 2)], start=1):
        for b in range(blocks):
            x = _v3_bottleneck(x, sd, f"layer{li}.{b}", stride if b == 0 else 1, bn)
    x = _v3_assp(x, sd, bn)
    out = _conv(x, sd, "conv")
    if openset:
        out = torch.cat([out, _conv(x, sd, "conv_1")], 1)
    # In-model upsample to the input size (deeplabv3.py:137, align_corners=False).
    return F.interpolate(out, size=(h, w), mode="bilinear", align_corners=False)


def test_deeplabv3_forward_matches_torch_twin():
    from simt_tpu.models import DeepLabv3

    model = DeepLabv3(num_classes=4, open_classes=2, openset=True, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 64, 96, 3).astype(np.float32) * 40
    variables = model.init(jax.random.PRNGKey(2), jnp.asarray(x), False)
    # Randomise BN stats so eval-mode normalisation is non-trivial.
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.3 + 1.0),
        variables["batch_stats"],
    )
    bs = jax.tree.map(lambda a: jnp.abs(a) + 0.1, bs)
    variables = {"params": variables["params"], "batch_stats": bs}

    got = model.apply(variables, jnp.asarray(x), False)
    sd = export_state_dict(variables)
    want = torch_twin_v3_forward(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()), openset=True
    )
    assert got.shape == (1, 64, 96, 6)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
    )


def test_deeplabv3_warmup_sgd_step_matches_torch():
    """One full v3 warmup SGD step vs torch: same forward (train-mode BN), same loss
    (1.1x masked CE on the full-res output), same partition (layer3@1x, assp/conv@10x,
    rest frozen), same SGD(momentum .9, wd 5e-4). Post-step params must match —
    the gradient-level oracle for the v3 training path (cf. test_reference_oracle.py
    for the flagship)."""
    import dataclasses

    from simt_tpu.models import DeepLabv3
    from simt_tpu.train import create_warmup_state, make_warmup_step
    from simt_tpu.train.state import LABEL_FROZEN, param_label
    from tests.test_train import tiny_cfg

    import tempfile
    import pathlib

    cfg = tiny_cfg(pathlib.Path(tempfile.mkdtemp()), "warmup")
    C = 5
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, arch="deeplabv3", num_classes=C,
                                       open_classes=0, openset=False),
    )
    model = DeepLabv3(num_classes=C, dtype=jnp.float32)
    rng = np.random.RandomState(7)
    x = rng.randn(1, 32, 64, 3).astype(np.float32) * 30
    label = rng.randint(0, C, (1, 32, 64)).astype(np.int32)
    label[rng.random((1, 32, 64)) < 0.1] = 255

    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x), False)
    state = create_warmup_state(model, variables, cfg)
    step = make_warmup_step(model, cfg)
    new_state, metrics = step(state, {"image": jnp.asarray(x),
                                      "label": jnp.asarray(label)})

    # --- torch twin ---
    sd_np = export_state_dict(variables)
    import flax

    # flax path -> torch key, with the v3 LR-group label attached.
    from simt_tpu.models.import_torch import flax_path_to_torch_key

    flat = flax.traverse_util.flatten_dict(variables["params"])
    groups = {"backbone_1x": [], "head_10x": []}
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    key_of = {}
    for path, _ in flat.items():
        tk, _tr = flax_path_to_torch_key(("params",) + path)
        lbl = param_label(path, warmup=True, arch="deeplabv3")
        key_of[path] = (tk, lbl)
        if lbl != LABEL_FROZEN:
            tsd[tk] = tsd[tk].clone().requires_grad_(True)
            groups[lbl].append(tsd[tk])

    out = torch_twin_v3_forward(
        tsd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()), openset=False,
        bn=_bn_train,
    )
    ce = F.cross_entropy(out, torch.from_numpy(label).long(), ignore_index=255)
    loss = (1.0 + cfg.simt.lambda_seg) * ce
    np.testing.assert_allclose(
        float(loss),
        float(metrics["loss_seg2"]) * (1.0 + cfg.simt.lambda_seg),
        rtol=1e-4,
    )

    lr = cfg.optim.learning_rate  # poly at step 0 == base
    opt = torch.optim.SGD(
        [{"params": groups["backbone_1x"], "lr": lr},
         {"params": groups["head_10x"], "lr": 10 * lr}],
        momentum=cfg.optim.momentum, weight_decay=cfg.optim.weight_decay,
    )
    loss.backward()
    opt.step()

    new_flat = flax.traverse_util.flatten_dict(new_state.model.params)
    checked = 0
    for path, (tk, lbl) in key_of.items():
        ours = np.asarray(new_flat[path])
        want = tsd[tk].detach().numpy()
        if tk.endswith(".weight") and ours.ndim == 4:
            want = np.transpose(want, (2, 3, 1, 0))  # OIHW -> HWIO
        if lbl == LABEL_FROZEN:
            np.testing.assert_array_equal(ours, np.asarray(sd_np[tk]).transpose(
                (2, 3, 1, 0)) if ours.ndim == 4 else np.asarray(sd_np[tk]))
        else:
            # atol covers conv-algorithm float noise on near-zero gradient
            # entries (XLA vs torch-CPU reduction order; the 10x-LR group
            # amplifies the same grad noise tenfold).
            np.testing.assert_allclose(ours, want, rtol=5e-3, atol=5e-5,
                                       err_msg=f"{path} ({lbl})")
            checked += 1
    assert checked > 50  # every trainable leaf compared
