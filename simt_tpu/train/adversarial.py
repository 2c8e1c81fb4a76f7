"""Optional adversarial warmup (extension beyond reference parity).

The reference ships ``FCDiscriminator`` but never wires it into a loss (the import at
tools/trainV2_simt.py:19 is commented out); its checkpoint URLs point at AdaptSegNet,
whose output-space adaptation scheme this implements: the discriminator distinguishes
segmentation softmax maps from (source-like) one-hot label maps, and the segmenter earns
an adversarial bonus for fooling it. BASELINE.json lists "DeepLabv2 + discriminator
adversarial training" as a warmup config, so the capability is provided here, clearly
marked as an extension.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import cross_entropy_2d, upsample_bilinear_align_corners
from ..data.pipeline import normalize_image, normalize_label
from ..ops.schedules import poly_lr
from . import state as state_lib
from .state import ModelState


def _bce_with_logits(logits: jax.Array, target: float) -> jax.Array:
    t = jnp.full_like(logits, target)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, t))


def make_adversarial_warmup_step(model, discriminator, cfg, *, lambda_adv: float = 1e-3,
                                 d_lr: float = 1e-4):
    """(state, d_state, batch) -> (state, d_state, metrics).

    Segmenter: CE + lambda_adv * BCE(D(softmax(pred)), real). Discriminator:
    BCE(D(onehot(label)), real) + BCE(D(softmax(pred)), fake). Adam(b1=0.9, b2=0.99)
    for D, matching AdaptSegNet convention.
    """
    _, model_update = state_lib.make_model_tx(
        cfg.optim.momentum, cfg.optim.weight_decay, warmup=True,
        aspp_effective_branches=cfg.model.aspp_effective_branches,
        arch=cfg.model.arch,
    )
    d_tx = optax.adam(d_lr, b1=0.9, b2=0.99)
    lambda_seg = cfg.simt.lambda_seg
    ignore = cfg.ignore_label
    nc = cfg.model.num_classes

    @jax.jit
    def train_step(st, d_state: ModelState, batch) -> Tuple[object, ModelState, Dict]:
        image = normalize_image(batch["image"], cfg.data.mean_bgr)
        label = normalize_label(batch["label"])
        hw = image.shape[1:3]
        lr = poly_lr(cfg.optim.learning_rate, st.step, cfg.optim.num_steps, cfg.optim.power)

        onehot = jax.nn.one_hot(jnp.where(label == ignore, 0, label), nc)

        def seg_loss_fn(params):
            (x1, x2), mutated = model.apply(
                {"params": params, "batch_stats": st.model.batch_stats}, image, True,
                mutable=["batch_stats"],
            )
            p1 = upsample_bilinear_align_corners(x1, hw)
            p2 = upsample_bilinear_align_corners(x2, hw)
            l1 = cross_entropy_2d(p1, label, ignore_label=ignore)
            l2 = cross_entropy_2d(p2, label, ignore_label=ignore)
            prob2 = jax.nn.softmax(p2, axis=-1)
            d_out = discriminator.apply({"params": d_state.params}, prob2)
            adv = _bce_with_logits(d_out, 1.0)  # fool D into "real"
            loss = l2 + lambda_seg * l1 + lambda_adv * adv
            return loss, (l1, l2, adv, prob2, mutated["batch_stats"])

        grads, (l1, l2, adv, prob2, new_stats) = jax.grad(seg_loss_fn, has_aux=True)(
            st.model.params
        )
        params, opt_state = model_update(grads, st.model.opt_state, st.model.params, lr)

        def d_loss_fn(d_params):
            real = discriminator.apply({"params": d_params}, onehot)
            fake = discriminator.apply({"params": d_params}, jax.lax.stop_gradient(prob2))
            return _bce_with_logits(real, 1.0) + _bce_with_logits(fake, 0.0)

        d_grads = jax.grad(d_loss_fn)(d_state.params)
        d_upd, d_opt = d_tx.update(d_grads, d_state.opt_state, d_state.params)
        d_params = optax.apply_updates(d_state.params, d_upd)

        new_state = st.replace(
            model=ModelState(params=params, batch_stats=new_stats, opt_state=opt_state),
            step=st.step + 1,
        )
        new_d = ModelState(params=d_params, batch_stats=d_state.batch_stats, opt_state=d_opt)
        metrics = {"loss_seg1": l1, "loss_seg2": l2, "loss_adv": adv, "lr": lr}
        return new_state, new_d, metrics

    return train_step


def create_discriminator_state(discriminator, num_classes: int, hw, rng, d_lr: float = 1e-4):
    variables = discriminator.init(rng, jnp.zeros((1, *hw, num_classes), jnp.float32))
    tx = optax.adam(d_lr, b1=0.9, b2=0.99)
    return ModelState(params=variables["params"], batch_stats={},
                      opt_state=tx.init(variables["params"]))
