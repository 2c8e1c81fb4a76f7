"""Optimizer parity vs torch (the reference's SGD/Adam semantics,
tools/trainV2_simt.py:270-280,296-297)."""

import jax.numpy as jnp
import numpy as np
import torch

from simt_tpu.ops.schedules import poly_lr
from simt_tpu.train import state as state_lib


def test_sgd_matches_torch_with_poly_lr():
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]
    base_lr, wd, mom, steps, power = 2.5e-4, 5e-4, 0.9, 100, 0.9

    # torch
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=base_lr, momentum=mom, weight_decay=wd)
    for i, g in enumerate(grads):
        opt.param_groups[0]["lr"] = base_lr * (1 - i / steps) ** power
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    direction = state_lib.sgd_direction(mom, wd)
    p = jnp.asarray(p0)
    st = direction.init(p)
    for i, g in enumerate(grads):
        lr = poly_lr(base_lr, i, steps, power)
        u, st = direction.update(jnp.asarray(g), st, p)
        p = p - lr * u

    np.testing.assert_allclose(np.asarray(p), tp.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_adam_matches_torch():
    rng = np.random.RandomState(1)
    p0 = rng.randn(6, 5).astype(np.float32)
    grads = [rng.randn(6, 5).astype(np.float32) for _ in range(7)]
    lr = 2.5e-3

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, weight_decay=0)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    init, update = state_lib.make_adam_tx()
    p = jnp.asarray(p0)
    st = init(p)
    for g in grads:
        u, st = update(jnp.asarray(g), st, p, jnp.asarray(lr))
        p = p + u

    np.testing.assert_allclose(np.asarray(p), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_poly_lr_matches_reference_formula():
    # lr_poly (trainV2_simt.py:174-175)
    for i in [0, 1, 999, 249999]:
        got = float(poly_lr(2.5e-4, i, 250000, 0.9))
        want = 2.5e-4 * ((1 - i / 250000) ** 0.9)
        assert abs(got - want) < 1e-9  # float32 schedule vs float64 formula


def test_param_labels():
    paths = {
        ("conv1", "kernel"): (state_lib.LABEL_1X, state_lib.LABEL_FROZEN),
        ("bn1", "scale"): (state_lib.LABEL_FROZEN, state_lib.LABEL_FROZEN),
        ("layer1_0", "conv2", "kernel"): (state_lib.LABEL_1X, state_lib.LABEL_FROZEN),
        ("layer3_5", "bn2", "bias"): (state_lib.LABEL_FROZEN, state_lib.LABEL_FROZEN),
        ("layer3_5", "conv2", "kernel"): (state_lib.LABEL_1X, state_lib.LABEL_1X),
        ("layer4_0", "downsample_conv", "kernel"): (state_lib.LABEL_1X, state_lib.LABEL_1X),
        ("layer4_0", "downsample_bn", "bias"): (state_lib.LABEL_FROZEN, state_lib.LABEL_FROZEN),
        ("layer5", "branch0_kernel"): (state_lib.LABEL_10X, state_lib.LABEL_10X),
        ("layer5", "branch1_bias"): (state_lib.LABEL_10X, state_lib.LABEL_10X),
        ("layer5", "branch2_kernel"): (state_lib.LABEL_FROZEN, state_lib.LABEL_FROZEN),
        ("layer6_1", "branch1_kernel"): (state_lib.LABEL_10X, state_lib.LABEL_10X),
    }
    for path, (want_warmup, want_simt) in paths.items():
        assert state_lib.param_label(path, warmup=True) == want_warmup, path
        assert state_lib.param_label(path, warmup=False) == want_simt, path
