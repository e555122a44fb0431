"""Loss & metric parity vs the torch reference implementations.

These tests import the reference modules (read-only, torch CPU) and check
our JAX losses/metrics produce the same numbers on random inputs. Note the
layout difference: reference is NCHW, ours NHWC.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
from utils.loss_functions import TaskLoss, symJSDivLoss  # noqa: E402
from evaluation.metrics import semseg_compute_confusion  # noqa: E402

from ess_tpu.train import (  # noqa: E402
    MetricsSemseg,
    confusion_matrix,
    confusion_to_accuracy,
    confusion_to_iou,
    cross_entropy_loss,
    dice_loss,
    symmetric_js_divergence,
    task_loss,
)


def rand_logits_labels(rng, n=2, h=8, w=8, c=6, ignore_frac=0.2):
    logits = rng.normal(size=(n, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(n, h, w))
    mask = rng.random(size=(n, h, w)) < ignore_frac
    labels = np.where(mask, 255, labels).astype(np.int64)
    return logits, labels


def to_torch(logits, labels):
    return (
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels),
    )


def test_cross_entropy_parity(rng):
    logits, labels = rand_logits_labels(rng)
    tl, tlbl = to_torch(logits, labels)
    ref = torch.nn.CrossEntropyLoss(ignore_index=255)(tl, tlbl).item()
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_dice_parity(rng):
    logits, labels = rand_logits_labels(rng)
    tl, tlbl = to_torch(logits, labels)
    ref_loss = TaskLoss(losses=["dice"], num_classes=6, ignore_index=255)(tl, tlbl).item()
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), num_classes=6))
    np.testing.assert_allclose(got, ref_loss, rtol=1e-5)


def test_task_loss_parity(rng):
    logits, labels = rand_logits_labels(rng, c=11)
    tl, tlbl = to_torch(logits, labels)
    ref = TaskLoss(losses=["dice", "cross_entropy"], num_classes=11, ignore_index=255)(
        tl, tlbl).item()
    got = float(task_loss(jnp.asarray(logits), jnp.asarray(labels), num_classes=11))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_sym_js_parity(rng):
    a = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    b = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = symJSDivLoss()(ta, tb).item()
    got = float(symmetric_js_divergence(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-7)


def test_confusion_parity(rng):
    n, h, w, c = 2, 16, 16, 6
    pred = rng.integers(0, c, size=(n, h, w))
    label = np.where(rng.random(size=(n, h, w)) < 0.3, 255,
                     rng.integers(0, c, size=(n, h, w)))
    ref = semseg_compute_confusion(
        torch.from_numpy(pred), torch.from_numpy(label), c, 255).numpy()
    got = np.asarray(confusion_matrix(
        jnp.asarray(pred), jnp.asarray(label), num_classes=c))
    np.testing.assert_array_equal(got, ref)


def test_metrics_accumulator(rng):
    m = MetricsSemseg(3, 255, ["a", "b", "c"])
    pred = np.array([[[0, 1], [2, 2]]])
    label = np.array([[[0, 1], [2, 255]]])
    m.update_batch(pred, label)
    m.update_batch(pred, label)
    s = m.summary()
    np.testing.assert_allclose(s["mean_iou"], 100.0)
    np.testing.assert_allclose(s["acc"], 100.0)
    assert s["cm"].sum() == 6  # 3 valid pixels x 2 batches


def test_iou_known_values():
    conf = np.array([[3, 1], [1, 5]], np.float64)
    iou, miou = confusion_to_iou(conf)
    np.testing.assert_allclose(iou, [100 * 3 / 5, 100 * 5 / 7])
    np.testing.assert_allclose(confusion_to_accuracy(conf), 80.0)


def test_radam_matches_reference_trajectory(rng):
    """optax.radam reproduces the reference RAdam (utils/radam.py) step for
    step, including the rectification warmup and SGD fallback, at the
    reference's hyperparameters betas=(0, 0.999), lr arbitrary."""
    from utils.radam import RAdam as TorchRAdam
    import jax.numpy as jnp
    from ess_tpu.train.state import make_radam

    w0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(12)]

    # torch reference
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = TorchRAdam([p], lr=1e-2, betas=(0.0, 0.999), eps=1e-8, weight_decay=0)
    torch_traj = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
        torch_traj.append(p.detach().numpy().copy())

    # optax
    tx = make_radam(1e-2, b1=0.0, b2=0.999)
    params = jnp.asarray(w0)
    state = tx.init(params)
    import optax
    for i, g in enumerate(grads):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params), torch_traj[i], rtol=1e-4, atol=1e-6,
            err_msg=f"diverged at step {i}")


def test_task_loss_class_major_path_matches_small_path():
    """The big-tensor class-on-sublane branch of task_loss computes the
    same f32 value as the NHWC branch (which is torch-parity-tested)."""
    import jax.numpy as jnp

    from ess_tpu.train.losses import task_loss

    r = np.random.default_rng(7)
    # B*H*W = 2*1024*512 = 1M pixels: triggers the class-major branch
    logits = jnp.asarray(r.normal(size=(2, 1024, 512, 5)).astype(np.float32))
    labels = jnp.asarray(r.integers(0, 6, (2, 1024, 512)).astype(np.int32))
    labels = jnp.where(labels == 5, 255, labels)  # some ignored pixels

    big = task_loss(logits, labels, num_classes=5, ignore_label=255)
    # same values through the small-tensor branch: split into quadrants so
    # each call stays under the size threshold, CE/dice recombine exactly
    # only for identical inputs — so instead compare against the standalone
    # losses (the torch-parity-tested implementations)
    from ess_tpu.train.losses import cross_entropy_loss, dice_loss
    ref = (cross_entropy_loss(logits, labels, ignore_label=255)
           + dice_loss(logits, labels, num_classes=5, ignore_label=255))
    np.testing.assert_allclose(float(big), float(ref), rtol=2e-6)
