"""Segmentation / SimT loss functions.

Re-implements, TPU-natively (pure jnp inside the jitted train step):
  - masked 2-D cross entropy (reference utils/loss.py:6-40, both the logits path and the
    ``is_softmax=False`` "already a probability" path used for the noisy-posterior loss);
  - entropy loss (utils/loss.py:42-49);
  - the open-set placeholder loss (tools/trainV2_simt.py:202-230);
  - the NTM volume regulariser log sqrt |det(T^T T)| with the inf/nan->0 guard
    (tools/trainV2_simt.py:417-421), always computed in float32 for stability.

Layout convention: logits are NHWC (TPU-friendly); labels are NHW int32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of ``values`` over ``mask`` (float). Returns 0 when mask is empty.

    The reference's ``nn.CrossEntropyLoss(ignore_index=255)`` returns NaN on an all-ignored
    batch; we return 0 instead (documented deviation — NaN would poison the jitted step).
    """
    count = jnp.sum(mask)
    total = jnp.sum(values * mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def cross_entropy_2d(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_label: int = 255,
    class_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked softmax cross entropy, mean over valid pixels.

    Matches ``torch.nn.CrossEntropyLoss(ignore_index=255)`` (tools/trainV2_simt.py:303) and
    ``utils/loss.py:6-36`` (is_softmax=True). logits: (..., C) float; labels: (...) int.
    """
    logits = logits.astype(jnp.float32)
    valid = jnp.logical_and(labels >= 0, labels != ignore_label)
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = logz - label_logit
    if class_weight is not None:
        w = class_weight[safe_labels]
        nll = nll * w
        # torch's weighted CE normalises by the sum of weights of valid targets.
        return _masked_mean(nll, valid.astype(nll.dtype)) * jnp.sum(
            valid
        ) / jnp.maximum(jnp.sum(w * valid), 1.0)
    return _masked_mean(nll, valid.astype(nll.dtype))


def nll_from_probs_2d(
    probs: jax.Array,
    labels: jax.Array,
    *,
    ignore_label: int = 255,
    eps: float = 0.0,
) -> jax.Array:
    """``log`` + NLL on already-normalised probabilities, mean over valid pixels.

    The reference's ``CrossEntropy2d(is_softmax=False)`` path (utils/loss.py:38-39), used at
    tools/trainV2_simt.py:304,408-409 for the noisy-posterior loss l(softmax(f(x)) @ T, y).
    Computed in float32 (probabilities near 0 under bf16 would overflow the log).
    """
    probs = probs.astype(jnp.float32)
    valid = jnp.logical_and(labels >= 0, labels != ignore_label)
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    p = jnp.take_along_axis(probs, safe_labels[..., None], axis=-1)[..., 0]
    nll = -jnp.log(p + eps)
    return _masked_mean(nll, valid.astype(nll.dtype))


def entropy_loss(logits: jax.Array) -> jax.Array:
    """Mean per-pixel Shannon entropy of the channel softmax (utils/loss.py:42-49)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(p * logp, axis=-1)
    return jnp.mean(ent)


def placeholder_loss(
    logits: jax.Array,
    *,
    num_classes: int,
    open_classes: int,
    lambda_place: float,
    threshold: Optional[float] = None,
    ignore_label: int = 255,
    suppress_value: float = 0.0,
) -> jax.Array:
    """Open-set placeholder supervision (tools/trainV2_simt.py:202-230).

    logits: (B, H, W, C+O).

    known part: CE against the per-pixel argmax, kept only where the argmax is a known
    class and (optionally) the softmax max exceeds ``threshold``; unknown part: the argmax
    channel is suppressed to ``suppress_value``, the label is the argmax over a tensor that
    zeros all known channels (so negative open logits lose to known-channel zeros — a
    faithful reproduction of the reference's ``torch.zeros_like`` initialisation at :220),
    ignored wherever the known label was valid.

    NOTE on ``suppress_value``: the reference *intends* -1000 (and -100 in tools/test.py:209)
    but actually computes ``-1000. * torch.zeros_like(...)`` (trainV2_simt.py:208-209), so
    the argmax channel is set to **0** in every published run. We default to the faithful 0.
    """
    total = num_classes + open_classes
    logits32 = logits.astype(jnp.float32)
    pseudo = jnp.argmax(logits32, axis=-1)  # (B,H,W)

    # Suppress the argmax channel (reference :205-209).
    onehot = jax.nn.one_hot(pseudo, total, dtype=jnp.bool_)
    predict = jnp.where(onehot, suppress_value, logits32)

    # Known-class label: argmax where it is a known class (:211-213).
    pseudo1 = jnp.where(pseudo < num_classes, pseudo, ignore_label)
    if threshold is not None:
        pred_max = jnp.max(jax.nn.softmax(logits32, axis=-1), axis=-1)
        pseudo1 = jnp.where(pred_max > threshold, pseudo1, ignore_label)
    loss_known = cross_entropy_2d(logits32, pseudo1, ignore_label=ignore_label)

    # Unknown-class label: argmax over (0 for known channels, suppressed logits for open
    # channels) (:219-223).
    channel = jnp.arange(total)
    predict_open = jnp.where(channel >= num_classes, predict, 0.0)
    place_y = jnp.argmax(predict_open, axis=-1)
    place_y = jnp.where(pseudo1 == ignore_label, ignore_label, place_y)
    loss_unknown = cross_entropy_2d(predict, place_y, ignore_label=ignore_label)

    return loss_known + lambda_place * loss_unknown


def volume_loss(t: jax.Array) -> jax.Array:
    """log sqrt |det(T^T T)| in float32, NaN/Inf guarded to 0 (trainV2_simt.py:417-421).

    The guard in the reference zeroes the *sum* of both heads' volume terms when either is
    non-finite; callers should therefore sum the raw terms and apply :func:`finite_or_zero`.
    """
    t = t.astype(jnp.float32)
    gram = jnp.dot(t.T, t, preferred_element_type=jnp.float32)
    # 0.5 * log|det(G)| via slogdet — mathematically identical to the reference's
    # log(sqrt(abs(det(G)))) but numerically stable for the near-singular Gram matrices
    # this loss produces (det ~ 1e-30 underflows a float32 det).
    _, logabsdet = jnp.linalg.slogdet(gram)
    return 0.5 * logabsdet


def finite_or_zero(x: jax.Array) -> jax.Array:
    """The reference's ``isinf/isnan -> 0`` guard (trainV2_simt.py:420-421), functional."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def mse_sum(a: jax.Array, b: jax.Array) -> jax.Array:
    """``torch.nn.MSELoss(reduction='sum')`` (trainV2_simt.py:305), float32 accumulation."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(d * d)
