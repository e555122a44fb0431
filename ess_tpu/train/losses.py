"""Segmentation and domain-adaptation losses.

Capability parity with /root/reference/utils/loss_functions.py:
- ``task_loss`` = dice + cross-entropy with ignore handling (TaskLoss, :6-24)
- ``symmetric_js_divergence`` (symJSDivLoss, :27-37) including torch
  KLDivLoss's elementwise-mean reduction and the 1e-10 clamp
- ``dice_loss`` (DiceLoss/BinaryDiceLoss, :43-135): softmax probs and one-hot
  targets masked by the ignore mask, per-class dice over the whole batch with
  smooth=1, averaged over classes
- ``l1_loss`` (torch.nn.L1Loss used as the cycle-content loss,
  ess_trainer.py:29)

All take NHWC logits and NHW integer labels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, *, ignore_label: int = 255
) -> jax.Array:
    """Mean softmax cross-entropy over non-ignored pixels
    (torch.nn.CrossEntropyLoss(ignore_index) semantics)."""
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # select the label's log-prob with a fused class-iota mask-reduce: a
    # take_along_axis gather serializes on TPU (~31 ms/step at DSEC scale,
    # measured); the masked sum is one bandwidth-bound elementwise pass.
    cls = jax.lax.broadcasted_iota(
        jnp.int32, log_probs.shape, log_probs.ndim - 1)
    picked = jnp.sum(
        jnp.where(cls == safe_labels[..., None].astype(jnp.int32),
                  log_probs, 0.0), axis=-1)
    nll = jnp.where(valid, -picked, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    num_classes: int,
    ignore_label: int = 255,
    smooth: float = 1.0,
) -> jax.Array:
    """Multi-class dice with ignore masking (loss_functions.py:107-135).

    Per class c: ``1 - (2*sum(p_c*t_c)+s) / (sum(p_c^2)+sum(t_c^2)+s)`` with
    sums over every pixel of the batch, then averaged over classes. Both the
    probabilities and the one-hot targets are zeroed at ignored pixels.
    """
    valid = (labels != ignore_label)[..., None]
    safe_labels = jnp.where(labels == ignore_label, 0, labels)
    one_hot = jax.nn.one_hot(safe_labels, num_classes, dtype=jnp.float32) * valid
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid

    # reduce over batch + spatial dims, keep class axis
    axes = tuple(range(probs.ndim - 1))
    num = 2.0 * jnp.sum(probs * one_hot, axis=axes) + smooth
    den = jnp.sum(probs * probs, axis=axes) + jnp.sum(one_hot * one_hot, axis=axes) + smooth
    return jnp.mean(1.0 - num / den)


def task_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    num_classes: int,
    ignore_label: int = 255,
    losses: tuple[str, ...] = ("dice", "cross_entropy"),
) -> jax.Array:
    """Configurable sum of dice + CE (TaskLoss, loss_functions.py:6-24).

    When both terms are active the softmax work is shared: one
    ``log_softmax`` pass feeds the CE pick directly and ``exp`` of it feeds
    dice — at DSEC scale that saves several full passes over the
    (B, 440, 640, C) logits versus calling the two losses independently.
    """
    if set(losses) >= {"dice", "cross_entropy"}:
        # Large 4-D logits take the class-on-sublane path: an NHWC tensor
        # with a tiny class dim is lane-padded C -> 128 on TPU, so every
        # softmax/mask pass costs ~128/C times its information content
        # (measured ~19 ms of a 321 ms DSEC step). One transpose to (C, N)
        # makes the class dim a (padded-to-16) sublane axis and all loss
        # math compact. Same f32 math either way.
        if logits.ndim == 4 and logits.shape[-1] <= 32 and (
                logits.shape[0] * logits.shape[1] * logits.shape[2] >= 1 << 20):
            c = logits.shape[-1]
            lt = jnp.transpose(
                logits.reshape(-1, c)).astype(jnp.float32)     # (C, N)
            lab = labels.reshape(1, -1).astype(jnp.int32)
            valid = lab != ignore_label
            safe_labels = jnp.where(valid, lab, 0)
            log_probs = jax.nn.log_softmax(lt, axis=0)
            cls = jax.lax.broadcasted_iota(jnp.int32, lt.shape, 0)
            label_mask = cls == safe_labels
            picked = jnp.sum(jnp.where(label_mask, log_probs, 0.0), axis=0,
                             keepdims=True)
            nll = jnp.where(valid, -picked, 0.0)
            ce = jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)

            probs = jnp.exp(log_probs) * valid
            one_hot = (label_mask & valid).astype(jnp.float32)
            smooth = 1.0
            num = 2.0 * jnp.sum(probs * one_hot, axis=1) + smooth
            den = (jnp.sum(probs * probs, axis=1)
                   + jnp.sum(one_hot, axis=1) + smooth)
            dice = jnp.mean(1.0 - num / den)
            return ce + dice

        # loss math in f32 regardless of the (possibly bf16) logits dtype —
        # the upcast fuses into the softmax pass instead of materializing a
        # full-resolution f32 logits tensor upstream
        logits = logits.astype(jnp.float32)
        valid = labels != ignore_label
        safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        cls = jax.lax.broadcasted_iota(
            jnp.int32, log_probs.shape, log_probs.ndim - 1)
        label_mask = cls == safe_labels[..., None]
        picked = jnp.sum(jnp.where(label_mask, log_probs, 0.0), axis=-1)
        nll = jnp.where(valid, -picked, 0.0)
        ce = jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)

        vmask = valid[..., None]
        probs = jnp.exp(log_probs) * vmask
        one_hot = (label_mask & vmask).astype(logits.dtype)
        axes = tuple(range(probs.ndim - 1))
        smooth = 1.0
        num = 2.0 * jnp.sum(probs * one_hot, axis=axes) + smooth
        den = (jnp.sum(probs * probs, axis=axes)
               + jnp.sum(one_hot, axis=axes) + smooth)
        dice = jnp.mean(1.0 - num / den)
        return ce + dice

    total = jnp.float32(0.0)
    if "dice" in losses:
        total = total + dice_loss(
            logits, labels, num_classes=num_classes, ignore_label=ignore_label)
    if "cross_entropy" in losses:
        total = total + cross_entropy_loss(logits, labels, ignore_label=ignore_label)
    return total


def symmetric_js_divergence(p_logits: jax.Array, q_logits: jax.Array) -> jax.Array:
    """0.5*KL(q||p) + 0.5*KL(p||q) over softmaxed logits.

    Mirrors symJSDivLoss (loss_functions.py:27-37) exactly, including torch
    KLDivLoss's legacy 'mean' reduction (divide by element count, not batch)
    and the min=1e-10 clamp before the log.

    Large NHWC logits take the same class-on-sublane path as task_loss:
    with a tiny class dim minor the softmax/log/mul chain is lane-padded
    C -> 128 on TPU; one transpose to (C, N) makes every pass compact.
    Same f32 math either way. (Measured ~neutral end-to-end at DSEC UDA
    scale — XLA fuses the padded chain well here — kept for parity with
    task_loss's proven layout and for larger class counts.)
    """
    if p_logits.ndim == 4 and p_logits.shape[-1] <= 32 and (
            p_logits.shape[0] * p_logits.shape[1] * p_logits.shape[2]
            >= 1 << 20):
        c = p_logits.shape[-1]
        p_logits = jnp.transpose(p_logits.reshape(-1, c))      # (C, N)
        q_logits = jnp.transpose(q_logits.reshape(-1, c))
        axis = 0
    else:
        axis = -1
    p = jnp.clip(jax.nn.softmax(p_logits.astype(jnp.float32), axis=axis),
                 1e-10, None)
    q = jnp.clip(jax.nn.softmax(q_logits.astype(jnp.float32), axis=axis),
                 1e-10, None)
    kl_qp = jnp.mean(q * (jnp.log(q) - jnp.log(p)))  # KLDivLoss(log p, q)
    kl_pq = jnp.mean(p * (jnp.log(p) - jnp.log(q)))
    return 0.5 * kl_qp + 0.5 * kl_pq


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean absolute error (the cycle-content loss, ess_trainer.py:29)."""
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


# ----------------------------------------------------------------------
# Block-layout (s4d) loss adapters — the blocked SegmentationHead emits
# logits as (B, H/4, W/4, 16*C) (models/seghead.py block_space). Softmax
# losses only need the class dim minor and labels in the matching pixel
# order; both adapters are pure reshapes/transposes of SMALL-minor tensors
# (int labels / pre-pad logits), never the lane-padded full-res form.
# ----------------------------------------------------------------------

def s4d_logits_class_minor(logits_s4d: jax.Array, num_classes: int) -> jax.Array:
    """(B, h, w, 16*C) s4d logits -> (B, h, w*16, C): classes minor, one
    pseudo-pixel per subpixel. Pure reshape (the s4d channel layout is
    (subpixel)*C + c, so the split is contiguous)."""
    b, h, w, cc = logits_s4d.shape
    assert cc == 16 * num_classes, (cc, num_classes)
    return logits_s4d.reshape(b, h, w * 16, num_classes)


def fold_labels_up2x(labels: jax.Array) -> jax.Array:
    """(B, H, W) labels -> (B, H/2, (W/2)*4) pseudo-pixels in (j, r, s)
    order, matching the fused-final head's (B, h, w*4, C) logits
    (models/seghead.py _final_stage fused=True).

    The transpose runs on uint8 (class ids and the 255 ignore label all
    fit) — 4x less relayout traffic than int32 — and the result is sealed
    behind an optimization barrier: without it XLA propagates the 5-D
    (..., 2, 2) fold shape into the CE/dice backward, materializing f32
    loss intermediates in a pathological T(2,128) tiling (~7 ms/step at
    DSEC scale, measured r4)."""
    b, hh, ww = labels.shape
    x = labels.astype(jnp.uint8).reshape(b, hh // 2, 2, ww // 2, 2)
    x = x.transpose(0, 1, 3, 2, 4)          # (B, h, w, r, s)
    x = x.reshape(b, hh // 2, (ww // 2) * 4).astype(jnp.int32)
    return jax.lax.optimization_barrier(x)


def fold_labels_s4d(labels: jax.Array) -> jax.Array:
    """(B, H, W) labels -> (B, H/4, (W/4)*16) in the s4d subpixel order,
    matching :func:`s4d_logits_class_minor` of the blocked head's logits."""
    b, hh, ww = labels.shape
    x = labels.reshape(b, hh // 4, 4, ww // 4, 4)
    x = x.transpose(0, 1, 3, 2, 4)          # (B, h, w, r, s)
    return x.reshape(b, hh // 4, (ww // 4) * 16)
