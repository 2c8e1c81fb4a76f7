"""Warmup-stage trainer (stage 1): plain CE on pseudo-labels.

Reference: tools/trainV1_warmup.py:204-232. One jitted ``train_step`` contains the whole
per-iteration computation: forward (both heads), align-corners upsample to the input size,
masked CE per head, ``loss = seg2 + lambda_seg * seg1`` (:222-224), SGD with poly LR and
the warmup 1x/10x split, and ``iter_size`` gradient accumulation (:212,:226-232: loss /
iter_size per sub-batch, one optimizer step after the sub-loop).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.pipeline import normalize_image, normalize_label
from ..ops.fused_losses import upsample_ce
from ..ops.schedules import poly_lr
from . import state as state_lib


def create_warmup_state(model, variables, cfg) -> state_lib.WarmupState:
    init_fn, _ = state_lib.make_model_tx(
        cfg.optim.momentum,
        cfg.optim.weight_decay,
        warmup=True,
        aspp_effective_branches=cfg.model.aspp_effective_branches,
        arch=cfg.model.arch,
    )
    return state_lib.WarmupState(
        model=state_lib.ModelState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=init_fn(variables["params"]),
        ),
        step=jnp.zeros((), jnp.int32),
    )


def make_warmup_step(model, cfg, donate: bool = False):
    """Build the jitted warmup train step: (state, batch) -> (state, metrics)."""
    _, update_fn = state_lib.make_model_tx(
        cfg.optim.momentum,
        cfg.optim.weight_decay,
        warmup=True,
        aspp_effective_branches=cfg.model.aspp_effective_branches,
        arch=cfg.model.arch,
    )
    lambda_seg = cfg.simt.lambda_seg
    ignore = cfg.ignore_label
    iter_size = cfg.optim.iter_size

    # Opt-in old-state donation (see train/simt.py note).
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(
        st: state_lib.WarmupState, batch: Dict[str, jax.Array]
    ) -> Tuple[state_lib.WarmupState, Dict[str, jax.Array]]:
        def one_subbatch(sub, batch_stats):
            image = normalize_image(sub["image"], cfg.data.mean_bgr)
            label = normalize_label(sub["label"])

            def loss_fn(params):
                ys, mutated = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    image,
                    True,
                    mutable=["batch_stats"],
                )
                # Two-head models yield (x1, x2); DeepLabv3 yields one tensor
                # (deeplabv3.py:128-137) — treated as both heads, matching the
                # Res_Deeplab convention of duplicated outputs (deeplab.py:166-177).
                x1, x2 = ys if isinstance(ys, tuple) else (ys, ys)
                if x1.shape[1:3] == label.shape[1:]:
                    # In-model upsampled logits (DeepLabv3's F.interpolate to the
                    # input size, deeplabv3.py:137): plain masked CE, no interp.
                    from ..ops.losses import cross_entropy_2d

                    l1 = cross_entropy_2d(x1, label, ignore_label=ignore)
                    l2 = cross_entropy_2d(x2, label, ignore_label=ignore)
                else:
                    # Streamed upsample+CE (trainV1_warmup.py:219-224, flash-style);
                    # loss / iter_size before backward (:226-227).
                    l1 = upsample_ce(x1, label, ignore_label=ignore,
                                     chunk_rows=cfg.simt.loss_chunk_rows)
                    l2 = upsample_ce(x2, label, ignore_label=ignore,
                                     chunk_rows=cfg.simt.loss_chunk_rows)
                return (l2 + lambda_seg * l1) / iter_size, (
                    l1, l2, mutated.get("batch_stats", {})
                )

            return jax.grad(loss_fn, has_aux=True)(st.model.params)

        if iter_size == 1:
            grads, (l1, l2, new_stats) = one_subbatch(batch, st.model.batch_stats)
        else:
            # Leading (iter_size,) axis on the batch arrays (train/loop.py stacks).
            grads = jax.tree.map(jnp.zeros_like, st.model.params)
            l1 = l2 = jnp.zeros((), jnp.float32)
            new_stats = st.model.batch_stats
            for i in range(iter_size):
                sub = jax.tree.map(lambda a: a[i], batch)
                g, (sl1, sl2, new_stats) = one_subbatch(sub, new_stats)
                grads = jax.tree.map(jnp.add, grads, g)
                # Metric accumulation scale matches :229-230.
                l1, l2 = l1 + sl1 / iter_size, l2 + sl2 / iter_size

        # Data-parallel gradient sync happens automatically under pjit sharding; no
        # explicit collective needed here.
        lr = poly_lr(cfg.optim.learning_rate, st.step, cfg.optim.num_steps, cfg.optim.power)
        # Statically-partitioned update: frozen leaves (BN affine, unused ASPP
        # branches) pass through untouched; their grads are dead values XLA removes.
        params, opt_state = update_fn(grads, st.model.opt_state, st.model.params, lr)
        new_state = state_lib.WarmupState(
            model=state_lib.ModelState(
                params=params, batch_stats=new_stats, opt_state=opt_state
            ),
            step=st.step + 1,
        )
        metrics = {"loss_seg1": l1, "loss_seg2": l2, "lr": lr}
        return new_state, metrics

    return train_step
