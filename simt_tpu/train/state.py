"""Train state containers and the reference's optimizer families, in optax.

Reference optimizer structure (SURVEY.md §3.2):
  - model: SGD(momentum .9, wd 5e-4) over two poly-decayed LR groups — backbone at 1x,
    classifier heads at 10x (model/deeplab_multi.py:235-237, trainV2_simt.py:296-297).
    In warmup the 1x group additionally includes conv1/bn1/layer1/layer2
    (deeplab_multi.py:203-208); in the SimT stage those are effectively frozen.
    BN affine params are requires_grad=False in the reference, and unused ASPP branches
    (the 2-branch quirk) receive no gradient, so both are 'frozen' here.
  - NTM T1/T2 and W1/W2: four Adam(lr_T, wd 0) optimizers (trainV2_simt.py:270-280).

The torch-vs-optax matching notes:
  - torch SGD: d = g + wd*p; buf = m*buf + d; p -= lr*buf  ==  optax
    chain(add_decayed_weights(wd), trace(m)) then scale by -lr.
  - torch Adam(b1=.9, b2=.999, eps=1e-8) == optax.scale_by_adam(eps_root=0) then -lr.
  - The poly LR uses the *outer* iteration (trainV2_simt.py:315,321-324) even though W's
    Adam steps 10x per iteration — so the LR is injected explicitly per step rather than
    derived from optax's internal count.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

# ---------------------------------------------------------------------------
# Parameter partitioning
# ---------------------------------------------------------------------------

LABEL_1X = "backbone_1x"
LABEL_10X = "head_10x"
LABEL_FROZEN = "frozen"

_HEAD_PREFIXES = ("layer5", "layer6", "layer5_1", "layer6_1")
_WARMUP_ONLY_PREFIXES = ("conv1", "bn1", "layer1_", "layer2_")


def param_label_v3(path: Tuple[str, ...]) -> str:
    """LR-group label for the DeepLabv3 variant (deeplabv3.py:140-166).

    The reference's 1x group yields trunk params whose name contains
    ``resnet_50.layer3`` (``layer4``/``fc`` are dead modules of the torchvision
    resnet the truncated forward never uses); the 10x group is ASPP + the 1x1
    classifier(s). The stem and layers 1-2 appear in NO optimizer group — frozen.
    Unlike the v2 family, torchvision BN affine params default to
    requires_grad=True, so BN scale/bias inside the grouped modules train.
    """
    top = path[0]
    if top == "assp" or top in ("conv", "conv_1"):
        return LABEL_10X
    if top.startswith("layer3_"):
        return LABEL_1X
    return LABEL_FROZEN


def param_label(path: Tuple[str, ...], *, warmup: bool, aspp_effective_branches: int = 2,
                arch: str = "deeplab_multi") -> str:
    """LR-group label for one parameter path (keys into the flax params tree)."""
    if arch == "deeplabv3":
        return param_label_v3(path)
    top = path[0]
    leaf = path[-1]
    # BN affine params are frozen everywhere (requires_grad=False in the reference).
    if leaf in ("scale",) or (leaf == "bias" and any(p.startswith("bn") or p.endswith("_bn") for p in path[:-1])):
        return LABEL_FROZEN
    # Unused ASPP branches never receive grads in torch (so no wd either) -> frozen,
    # wherever the head lives (layer5/layer6 or the VGG 'classifier').
    if leaf.startswith("branch"):
        branch = int(leaf.split("_")[0][len("branch"):])
        if branch >= aspp_effective_branches:
            return LABEL_FROZEN
    if top in _HEAD_PREFIXES:
        return LABEL_10X
    if top == "classifier":
        # DeeplabVGG trains everything in one base-LR group (deeplab_vgg.py:53-54).
        return LABEL_1X
    if any(top.startswith(p) for p in _WARMUP_ONLY_PREFIXES):
        return LABEL_1X if warmup else LABEL_FROZEN
    return LABEL_1X  # layer3 / layer4 backbone (and VGG features)


def partition_params(params, *, warmup: bool, aspp_effective_branches: int = 2,
                     arch: str = "deeplab_multi"):
    """Pytree of LR-group labels matching ``params``' structure."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        k: param_label(k, warmup=warmup, aspp_effective_branches=aspp_effective_branches,
                       arch=arch)
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(labels)


# ---------------------------------------------------------------------------
# Optimizer directions (LR applied explicitly per step from the outer iteration)
# ---------------------------------------------------------------------------


def sgd_direction(momentum: float, weight_decay: float) -> optax.GradientTransformation:
    """torch-SGD direction (before the -lr scale)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
    )


def adam_direction() -> optax.GradientTransformation:
    """torch-Adam direction (before the -lr scale)."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)


def make_model_tx(
    momentum: float, weight_decay: float, *, warmup: bool,
    aspp_effective_branches: int = 2, arch: str = "deeplab_multi"
) -> Callable:
    """Returns (init_fn, update_fn) for the partitioned model optimizer.

    ``update_fn(grads, opt_state, params, lr) -> (new_params, opt_state)`` applies the
    1x/10x split with the given base LR (poly-decayed by the caller from the outer
    step) and passes frozen leaves through by reference.

    The frozen/1x/10x split is STATIC at trace time, so it partitions the trees
    instead of masking them: the momentum state exists only for trainable leaves, wd/
    momentum/update math touches only trainable leaves, and frozen parameters incur
    zero HBM traffic per step (the round-2 masked-multiply formulation spent ~2 ms/
    step re-reading and re-writing ~110 MB of frozen f32 stem/BN params).

    ``grads`` may be the full tree or any tree containing at least the trainable
    leaves (e.g. the trainable-only grad tree ``train/simt.py`` differentiates).

    Deliberately per-leaf: a raveled-per-group variant (one concatenated vector per LR
    group) measured 1.7 ms FASTER in isolation (3.1 vs 4.8 ms on v5e) but ~2 ms SLOWER
    in the full step — the concat barrier must wait for every gradient before any
    update math starts, whereas per-leaf updates overlap with the still-running
    backward. Scheduling beats op-count here.
    """
    direction = sgd_direction(momentum, weight_decay)

    def label_of(path):
        return param_label(
            path, warmup=warmup, aspp_effective_branches=aspp_effective_branches,
            arch=arch,
        )

    def init(params):
        flat = flax.traverse_util.flatten_dict(params)
        train = {k: v for k, v in flat.items() if label_of(k) != LABEL_FROZEN}
        return direction.init(train)

    def update(grads, dir_state, params, lr):
        # Labels derive from the pytree *structure* (static at trace time), so they
        # are recomputed here rather than stored in the (jitted) optimizer state.
        pflat = flax.traverse_util.flatten_dict(params)
        gflat = flax.traverse_util.flatten_dict(grads)
        labels = {k: label_of(k) for k in pflat}
        train_keys = [k for k in pflat if labels[k] != LABEL_FROZEN]
        g_train = {k: gflat[k] for k in train_keys}
        p_train = {k: pflat[k] for k in train_keys}
        updates, dir_state = direction.update(g_train, dir_state, p_train)
        new_flat = dict(pflat)  # frozen leaves pass through untouched
        for k in train_keys:
            mult = 10.0 if labels[k] == LABEL_10X else 1.0
            new_flat[k] = pflat[k] - (lr * mult) * updates[k]
        return flax.traverse_util.unflatten_dict(new_flat), dir_state

    return init, update


def make_adam_tx() -> Tuple[Callable, Callable]:
    """(init, update) for a single-tensor Adam with explicit LR."""
    direction = adam_direction()

    def init(param):
        return direction.init(param)

    def update(grad, state, param, lr):
        upd, state = direction.update(grad, state, param)
        return jax.tree.map(lambda u: -lr * u, upd), state

    return init, update


# ---------------------------------------------------------------------------
# State containers
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class ModelState:
    params: Any
    batch_stats: Any
    opt_state: Any


@flax.struct.dataclass
class WarmupState:
    model: ModelState
    step: jnp.ndarray  # scalar int32


@flax.struct.dataclass
class NTMState:
    """One NTM/W parameter + its Adam state."""

    param: jnp.ndarray
    opt_state: Any


@flax.struct.dataclass
class SimTState:
    model: ModelState
    teacher_params: Any  # frozen warmup weights (trainV2_simt.py:260-267)
    teacher_batch_stats: Any
    t1: NTMState
    t2: NTMState
    w1: NTMState
    w2: NTMState
    step: jnp.ndarray
