"""Cross-modal retrieval loss library.

Functional JAX re-implementations of the reference loss set
(`/root/reference/lib/models/losses.py`): identity-classification
(`instance_loss`, losses.py:42-62) with optional label smoothing
(losses.py:6-39), the soft-margin pairwise alignment loss
(`global_align_loss`, losses.py:102-128 and the `_from_sim` variant at
131-153), the MoCo InfoNCE loss (losses.py:206-217), and the CMPC/CMPM
losses (losses.py:65-99,156-203) kept for capability parity.

All functions are pure and shape-static so they fuse inside the jitted
train step; the "exclude same-identity queue entries" selection that the
reference performs with a dynamic gather (`moco_head/head.py:147-157`)
is expressed here as an additive ``-inf`` mask on the negative logits,
which is mathematically identical under the softmax cross-entropy with
target index 0 and keeps every shape static for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# torch.nn.functional.normalize clamps the norm at 1e-12; match it exactly.
_NORM_EPS = 1e-12


def l2_normalize(x: Array, axis: int = -1, eps: float = _NORM_EPS) -> Array:
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cross_entropy(logits: Array, labels: Array) -> Array:
    """Mean softmax cross-entropy with integer labels."""
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - true_logit)


def cross_entropy_label_smooth(
    logits: Array, labels: Array, epsilon: float = 0.1
) -> Array:
    """Label-smoothed CE matching the reference (losses.py:6-39).

    Targets are ``(1 - eps) * onehot + eps / C``; the loss is
    ``(-targets * log_probs).mean(0).sum()``.
    """
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=log_probs.dtype)
    targets = (1.0 - epsilon) * onehot + epsilon / num_classes
    return jnp.sum(jnp.mean(-targets * log_probs, axis=0))


def instance_loss(
    projection: Array,
    visual_embed: Array,
    textual_embed: Array,
    labels: Array,
    scale: float = 1.0,
    norm: bool = False,
    epsilon: float = 0.0,
) -> Array:
    """Shared-projection identity classification loss (losses.py:42-62).

    ``projection`` is a ``[feature_size, num_classes]`` parameter whose
    columns are L2-normalized before the logits matmul.
    """
    if norm:
        visual_embed = l2_normalize(visual_embed, axis=-1)
        textual_embed = l2_normalize(textual_embed, axis=-1)
    projection = l2_normalize(projection, axis=0)

    v_logits = scale * (visual_embed @ projection)
    t_logits = scale * (textual_embed @ projection)

    if epsilon > 0:
        return cross_entropy_label_smooth(
            v_logits, labels, epsilon
        ) + cross_entropy_label_smooth(t_logits, labels, epsilon)
    return cross_entropy(v_logits, labels) + cross_entropy(t_logits, labels)


def global_align_loss(
    visual_embed: Array,
    textual_embed: Array,
    labels: Array,
    alpha: float = 0.6,
    beta: float = 0.4,
    scale_pos: float = 10.0,
    scale_neg: float = 40.0,
) -> Array:
    """Soft-margin pairwise cosine alignment loss (losses.py:102-128)."""
    visual_norm = l2_normalize(visual_embed, axis=-1)
    textual_norm = l2_normalize(textual_embed, axis=-1)
    similarity = visual_norm @ textual_norm.T
    return global_align_loss_from_sim(
        similarity, labels, alpha, beta, scale_pos, scale_neg
    )


def global_align_loss_from_sim(
    similarity: Array,
    labels: Array,
    alpha: float = 0.6,
    beta: float = 0.4,
    scale_pos: float = 10.0,
    scale_neg: float = 40.0,
) -> Array:
    """Variant taking a precomputed similarity matrix (losses.py:131-153)."""
    batch_size = labels.shape[0]
    pos = (labels[:, None] == labels[None, :]).astype(similarity.dtype)
    # softplus(x) = log(1 + exp(x)), numerically stable.
    loss_pos = jax.nn.softplus(-scale_pos * (similarity - alpha))
    loss_neg = jax.nn.softplus(scale_neg * (similarity - beta))
    total = jnp.sum(pos * loss_pos) + jnp.sum((1.0 - pos) * loss_neg)
    return total * 2.0 / batch_size


def infonce_loss(
    v_pos: Array,
    v_neg: Array,
    t_pos: Array,
    t_neg: Array,
    temperature: float = 0.07,
) -> Array:
    """Bidirectional InfoNCE over [positive | queue negatives] (losses.py:206-217).

    ``v_pos``/``t_pos`` are ``[N, 1]``; ``v_neg``/``t_neg`` are ``[N, K]``
    and may contain ``-inf`` entries for masked (same-identity) negatives.
    """

    def one_side(pos, neg):
        logits = jnp.concatenate([pos, neg], axis=1) / temperature
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        return jnp.mean(logz - logits[:, 0])

    return one_side(v_pos, v_neg) + one_side(t_pos, t_neg)


def cmpc_loss(
    projection: Array,
    visual_embed: Array,
    textual_embed: Array,
    labels: Array,
) -> Array:
    """Cross-Modal Projection Classification loss (losses.py:65-99)."""
    visual_norm = l2_normalize(visual_embed, axis=-1)
    textual_norm = l2_normalize(textual_embed, axis=-1)
    projection = l2_normalize(projection, axis=0)

    image_proj_text = (
        jnp.sum(visual_embed * textual_norm, axis=1, keepdims=True) * textual_norm
    )
    text_proj_image = (
        jnp.sum(textual_embed * visual_norm, axis=1, keepdims=True) * visual_norm
    )
    image_logits = image_proj_text @ projection
    text_logits = text_proj_image @ projection
    return cross_entropy(image_logits, labels) + cross_entropy(text_logits, labels)


def cmpm_loss(
    visual_embed: Array,
    textual_embed: Array,
    labels: Array,
    epsilon: float = 1e-8,
) -> Array:
    """Cross-Modal Projection Matching loss (losses.py:156-203)."""
    labels_mask = (labels[:, None] == labels[None, :]).astype(visual_embed.dtype)

    visual_norm = l2_normalize(visual_embed, axis=-1)
    textual_norm = l2_normalize(textual_embed, axis=-1)
    image_proj_text = visual_embed @ textual_norm.T
    text_proj_image = textual_embed @ visual_norm.T

    # Reference normalizes the row mask by its own L2 norm (losses.py:182).
    mask_norm = labels_mask / jnp.linalg.norm(labels_mask, axis=1)

    def kl_side(logits):
        pred = jax.nn.softmax(logits, axis=1)
        return jnp.mean(
            jnp.sum(
                pred * (jax.nn.log_softmax(logits, axis=1) - jnp.log(mask_norm + epsilon)),
                axis=1,
            )
        )

    return kl_side(image_proj_text) + kl_side(text_proj_image)
