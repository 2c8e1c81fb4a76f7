"""Model-layer semantics tests.

Layer-level parity is checked against *torch functional ops* (F.conv2d / F.batch_norm /
F.max_pool2d) configured exactly as the reference modules (model/deeplab_multi.py), so the
conv/BN/pool semantics are validated without reproducing the reference's module code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from simt_tpu.models import deeplab_multi
from simt_tpu.models.layers import ASPPHead, Bottleneck, max_pool_ceil


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def test_max_pool_ceil_matches_torch():
    for h, w in [(32, 32), (256, 512), (33, 65), (320, 640)]:
        x = np.random.RandomState(0).randn(1, h, w, 4).astype(np.float32)
        got = np.asarray(max_pool_ceil(jnp.asarray(x), window=3, stride=2, padding=1))
        want = _nhwc(
            F.max_pool2d(_nchw(x), kernel_size=3, stride=2, padding=1, ceil_mode=True)
        )
        assert got.shape == want.shape, (h, w, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_stem_wfold_matches_torch_conv7x7():
    """The W-folded stem (layers.py::stem_conv7x7_wfold) == torch's 7x7/2 pad-3 conv,
    bit-level on CPU f32, including odd geometries where the fold pads an extra
    zero column (deeplab_multi.py:127)."""
    import flax.linen as nn

    from simt_tpu.models.layers import stem_conv7x7_wfold

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            return stem_conv7x7_wfold(x, jnp.float32)

    rng = np.random.RandomState(7)
    for h, w in [(64, 128), (33, 65), (8, 9), (65, 129)]:
        x = rng.randn(2, h, w, 3).astype(np.float32)
        variables = Stem().init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(Stem().apply(variables, jnp.asarray(x)))
        k = np.asarray(variables["params"]["conv1"]["kernel"])  # HWIO
        want = _nhwc(
            F.conv2d(_nchw(x), torch.from_numpy(np.transpose(k, (3, 2, 0, 1))),
                     stride=2, padding=3)
        )
        assert got.shape == want.shape, (h, w, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_bottleneck_matches_torch_functional():
    """One dilated bottleneck (stride 1, dilation 2, with projection) vs torch ops."""
    rng = np.random.RandomState(1)
    cin, planes, d = 8, 4, 2
    x = rng.randn(2, 9, 11, cin).astype(np.float32)

    block = Bottleneck(planes, stride=1, dilation=d, has_downsample=True, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    # Randomise BN stats/affine so the test is not trivially identity.
    def randomize(tree, rng):
        return jax.tree.map(lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype) * 0.5
                            if a.ndim >= 1 else a, tree)

    params = randomize(variables["params"], rng)
    stats = jax.tree.map(lambda a: jnp.abs(jnp.asarray(rng.randn(*a.shape))) + 0.5,
                         variables["batch_stats"])
    got = np.asarray(block.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False))

    def tconv(t, kern, stride=1, padding=0, dilation=1):
        w = torch.from_numpy(np.transpose(np.asarray(kern), (3, 2, 0, 1)).copy())
        return F.conv2d(t, w, stride=stride, padding=padding, dilation=dilation)

    def tbn(t, scope_p, scope_s):
        return F.batch_norm(
            t,
            torch.from_numpy(np.asarray(scope_s["mean"])),
            torch.from_numpy(np.asarray(scope_s["var"])),
            torch.from_numpy(np.asarray(scope_p["scale"])),
            torch.from_numpy(np.asarray(scope_p["bias"])),
            training=False,
            eps=1e-5,
        )

    t = _nchw(x)
    out = tconv(t, params["conv1"]["kernel"])
    out = F.relu(tbn(out, params["bn1"], stats["bn1"]))
    out = tconv(out, params["conv2"]["kernel"], padding=d, dilation=d)
    out = F.relu(tbn(out, params["bn2"], stats["bn2"]))
    out = tconv(out, params["conv3"]["kernel"])
    out = tbn(out, params["bn3"], stats["bn3"])
    res = tbn(tconv(t, params["downsample_conv"]["kernel"]), params["downsample_bn"],
              stats["downsample_bn"])
    want = _nhwc(F.relu(out + res))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_aspp_two_branch_quirk():
    """The head must sum ONLY dilation-6 and dilation-12 branches (deeplab_multi.py:115-119)."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 7, 7, 6).astype(np.float32)
    head = ASPPHead(num_classes=3, effective_branches=2, dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(1), jnp.asarray(x))
    p = variables["params"]
    # All four branches' params exist (checkpoint compatibility)...
    assert set(p.keys()) == {
        f"branch{i}_{s}" for i in range(4) for s in ("kernel", "bias")
    }
    got = np.asarray(head.apply(variables, jnp.asarray(x)))

    t = _nchw(x)
    want = np.zeros_like(got)
    for i, d in [(0, 6), (1, 12)]:  # ...but only the first two contribute
        w = torch.from_numpy(np.transpose(np.asarray(p[f"branch{i}_kernel"]), (3, 2, 0, 1)).copy())
        b = torch.from_numpy(np.asarray(p[f"branch{i}_bias"]))
        want += _nhwc(F.conv2d(t, w, b, padding=d, dilation=d))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_aspp_four_branch_mode():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 7, 7, 6).astype(np.float32)
    head2 = ASPPHead(num_classes=3, effective_branches=2, dtype=jnp.float32)
    head4 = ASPPHead(num_classes=3, effective_branches=4, dtype=jnp.float32)
    v = head2.init(jax.random.PRNGKey(2), jnp.asarray(x))
    out2 = head2.apply(v, jnp.asarray(x))
    out4 = head4.apply(v, jnp.asarray(x))
    assert not np.allclose(np.asarray(out2), np.asarray(out4))


def test_deeplab_multi_shapes_closed_set():
    model = deeplab_multi(num_classes=19, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    x1, x2 = model.apply(variables, x, False)
    # 64 -> conv1(32) -> ceil-pool(17) -> layer2(9): stride-8 with ceil quirks.
    assert x1.shape == (1, 9, 17, 19)
    assert x2.shape == (1, 9, 17, 19)
    assert x1.dtype == jnp.float32


def test_deeplab_multi_openset_concat():
    model = deeplab_multi(num_classes=19, open_classes=15, openset=True, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    x1, x2 = model.apply(variables, x, False)
    assert x1.shape[-1] == 34 and x2.shape[-1] == 34


def test_train_mode_updates_batch_stats():
    model = deeplab_multi(num_classes=5, dtype=jnp.float32, aspp_effective_branches=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    _, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_feature_geometry_matches_torch_conv_arithmetic():
    """Stride-8 output geometry for the real training/eval input sizes."""
    model = deeplab_multi(num_classes=2, dtype=jnp.float32)

    def out_hw(h, w):
        # conv1 s2 p3 k7 -> ceil-pool k3 s2 p1 -> layer2 s2 (1x1 conv, floor)
        import math

        h1 = (h + 6 - 7) // 2 + 1
        w1 = (w + 6 - 7) // 2 + 1
        h2 = math.ceil((h1 + 2 - 3) / 2) + 1
        w2 = math.ceil((w1 + 2 - 3) / 2) + 1
        return (h2 - 1) // 2 + 1, (w2 - 1) // 2 + 1

    for h, w in [(64, 128), (96, 160)]:
        x = jnp.zeros((1, h, w, 3))
        variables = model.init(jax.random.PRNGKey(0), x, False)
        _, x2 = model.apply(variables, x, False)
        assert x2.shape[1:3] == out_hw(h, w), (h, w, x2.shape)
