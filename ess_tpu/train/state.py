"""Train state pytrees and optimizer factories.

Replaces the reference's models_dict/optimizers_dict mutation style
(base_trainer.py:21-66, ess_trainer.py:83-101) with a single immutable
flax.struct pytree: everything the jitted step touches — trainable params,
BN statistics, frozen E2VID params, RAdam states, step counter — lives in
one donated carry.

Optimizer: RAdam(betas=(0, 0.999), eps=1e-8, wd=0) like the reference
(ess_trainer.py:88-101; utils/radam.py is the canonical Liu et al. rectified
Adam, which optax.radam reproduces with threshold=5). The per-epoch
ExponentialLR (base_trainer.py:59-66) becomes a staircase
``optax.exponential_decay`` keyed on the step counter.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    # sensor-A image front-end (ResNet18) — trainable, has BN stats
    front_params: Any = None
    front_batch_stats: Any = None
    # shared segmentation head — trainable
    back_params: Any = None
    # frozen E2VID recurrent backbone
    e2vid_params: Any = None
    # optimizer states
    opt_front: Any = None
    opt_back: Any = None


def make_radam(
    lr: float,
    *,
    lr_decay: float = 1.0,
    steps_per_epoch: int = 1,
    b1: float = 0.0,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """RAdam with optional per-epoch staircase exponential LR decay."""
    if lr_decay != 1.0:
        schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=max(steps_per_epoch, 1),
            decay_rate=lr_decay,
            staircase=True,
        )
    else:
        schedule = lr
    return optax.radam(learning_rate=schedule, b1=b1, b2=b2, eps=1e-8, threshold=5.0)


def apply_updates(params, grads, opt: optax.GradientTransformation, opt_state):
    updates, new_opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state
