"""Model/optimizer/state construction from a Config.

Replaces the reference's buildModels/createOptimizerDict
(ess_trainer.py:45-101, ess_supervised_trainer.py:42-75) with pure builders:
module definitions are static Python objects; parameters are explicit
pytrees initialized here (or loaded from converted checkpoints).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ess_tpu.core.config import Config
from ess_tpu.models import RecurrentUNet, ResNet18Encoder, SegmentationHead
from ess_tpu.recon import Reconstructor
from ess_tpu.train.state import TrainState, make_radam


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32


@dataclass(frozen=True)
class ESSModules:
    """Static module definitions + reconstruction runtimes for one config."""

    cfg: Config
    e2vid: RecurrentUNet
    front_a: Optional[ResNet18Encoder]
    head: SegmentationHead
    recon_train: Reconstructor
    recon_val: Reconstructor
    opt_front: Optional[optax.GradientTransformation]
    opt_back: optax.GradientTransformation


def build_modules(cfg: Config, *, steps_per_epoch: int = 1) -> ESSModules:
    dtype = _dtype(cfg)
    m = cfg.model

    from ess_tpu.ops.conv_lstm_pallas import resolve_lstm_impl

    # Block-space head/encoder convs stay on the XLA lowering for now: the
    # standalone Pallas conv (ops/conv3x3_pallas.py) measured SLOWER than
    # XLA end-to-end (v5e round-3: head 22.5 vs 8.7 ms/step, enc0 20.5 vs
    # 16.4 — im2row build amortizes poorly at N=64/128 outputs, and the
    # extra absmax reduces eat the quant-prep saving). The fused
    # encoder-level kernel supersedes this path.
    lstm_impl = resolve_lstm_impl(m.lstm_impl)
    e2vid = RecurrentUNet(
        base_channels=m.e2vid_base_channels,
        num_encoders=m.e2vid_num_encoders,
        num_residual_blocks=m.e2vid_num_residual_blocks,
        skip_type=m.e2vid_skip_type,
        recurrent_block=m.e2vid_recurrent_block,
        norm=m.e2vid_norm,
        head_conv_impl=m.head_conv_impl,
        lstm_impl=lstm_impl,
        dtype=dtype,
    )

    is_uda = m.model_name == "ess"
    # Encoder widths must match the E2VID latent channels at scales 2/4/8
    # (2b/4b/8b), i.e. layer1 = 2 * e2vid_base (64 for the lightweight net,
    # which is exactly torchvision resnet18's width).
    front_a = (
        ResNet18Encoder(dtype=dtype, skip_connect=m.skip_connect_encoder,
                        base_width=2 * m.e2vid_base_channels)
        if is_uda else None
    )

    # The segmentation head decodes the scale-8 latent (SemSegE2VID,
    # style_networks.py:9-107) — the reference's ESS only ever runs the
    # 3-encoder E2VID. Fail here rather than with a KeyError at init.
    assert m.e2vid_num_encoders == 3, (
        "ESS training requires e2vid_num_encoders=3 (the segmentation head "
        "consumes the scale-8 latent; reference parity)")
    head = SegmentationHead(
        num_classes=cfg.task.semseg_num_classes,
        input_features=m.e2vid_base_channels * 2 ** m.e2vid_num_encoders,
        skip_connect=m.skip_connect_task,
        skip_type=m.skip_connect_task_type,
        dtype=dtype,
    )

    # Reconstructor geometry. UDA trains at the (possibly cropped) train size
    # and validates at the fixed val size (ess_trainer.py:56-72); supervised
    # uses ceil(shape/8)*8 (ess_supervised_trainer.py:49-53). The loaders
    # resize event tensors to these shapes.
    if is_uda:
        th, tw = cfg.train_input_size_b
        vh, vw = cfg.val_input_size_b
    else:
        h, w = cfg.dataset.sensor_b.shape
        th = vh = math.ceil(h / 8) * 8
        tw = vw = math.ceil(w / 8) * 8

    # Per-window nonzero normalization (the reference's EventPreprocessor,
    # inference_utils.py:95-108) happens inside the voxelizer on the flat
    # (B, C, cells) layout (ess_tpu/ops/batch_voxel.py) — the NHWC layout's
    # lane-padded reductions measured ~25 ms/window on v5e; the flat form is
    # free. So the reconstructor itself doesn't re-normalize.
    # The train rollout may run a different (e.g. int8) ConvLSTM cell than
    # eval: a sibling module definition with the same parameter tree.
    e2vid_train = e2vid
    train_impl = e2vid.lstm_impl
    if m.lstm_impl_train is not None:
        train_impl = resolve_lstm_impl(m.lstm_impl_train)
    # NOTE (r4): the quad-block train rollout is no longer wired here — it
    # measured a full-step regression on v5e in two independent ladders
    # (−104 r3, −109 r4, tools/bench_increments.py) despite winning its
    # micro-benchmark. The exact-math machinery survives as a tested
    # experiment (models/e2vid.py quad_block, tests/test_quad_block.py),
    # constructible directly via RecurrentUNet(quad_block=True).
    if train_impl != e2vid.lstm_impl:
        e2vid_train = e2vid.clone(lstm_impl=train_impl)
    recon_train = Reconstructor(model=e2vid_train, height=th, width=tw,
                                normalize=False)
    recon_val = Reconstructor(model=e2vid, height=vh, width=vw,
                              normalize=False)

    opt_front = (
        make_radam(cfg.optim.lr_front, lr_decay=cfg.optim.lr_decay,
                   steps_per_epoch=steps_per_epoch)
        if is_uda else None
    )
    opt_back = make_radam(cfg.optim.lr_back, lr_decay=cfg.optim.lr_decay,
                          steps_per_epoch=steps_per_epoch)

    return ESSModules(
        cfg=cfg, e2vid=e2vid, front_a=front_a, head=head,
        recon_train=recon_train, recon_val=recon_val,
        opt_front=opt_front, opt_back=opt_back,
    )


def make_pipeline(
    cfg: Config, *, train: bool = True, rectify_map=None,
):
    """Dataset-specific on-device EventPipeline (SURVEY.md section 2.3/2.4).

    - DSEC: host-rectified float coords -> trilinear kernel at 480x640,
      40-bottom-row crop, flip aug (sequence.py:255-295).
    - DDD17: integer coords -> temporal bilinear at 260x346, 60-row crop +
      resize to 200x352, bottom-anchored 120x216 random crop + flip
      (ddd17_events_loader.py:139-183).
    - anything else: plain voxelize at the dataset shape.
    """
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig

    ds = cfg.dataset.sensor_b
    aug = train and cfg.model.data_augmentation_train
    if ds.name.startswith("DSEC"):
        pc = PipelineConfig(
            sensor_height=480, sensor_width=640,
            num_bins=ds.nr_temporal_bins,
            representation=ds.event_representation,
            separate_pol=ds.separate_pol,
            normalize=True,
            crop_bottom=40,
            random_flip=aug,
            trilinear=True,
            rectify=rectify_map is not None,
        )
    elif ds.name.startswith("DDD17"):
        pc = PipelineConfig(
            sensor_height=260, sensor_width=346,
            num_bins=ds.nr_temporal_bins,
            representation=ds.event_representation,
            separate_pol=ds.separate_pol,
            normalize=True,
            crop_bottom=60,
            resize_to=(200, 352),
            random_crop=(120, 216) if aug and cfg.model.model_name == "ess" else None,
            crop_anchor="bottom",
            random_flip=aug,
        )
    else:
        h, w = ds.shape
        pc = PipelineConfig(
            sensor_height=h, sensor_width=w,
            num_bins=ds.nr_temporal_bins,
            representation=ds.event_representation,
            separate_pol=ds.separate_pol,
            normalize=True,
            random_flip=aug,
        )
    return EventPipeline(pc, rectify_map=rectify_map)


def init_state(
    mods: ESSModules,
    rng: jax.Array,
    *,
    e2vid_params=None,
    front_params=None,
    front_batch_stats=None,
) -> TrainState:
    """Initialize all parameter pytrees (or adopt converted checkpoints)."""
    cfg = mods.cfg
    k_e2vid, k_front, k_head = jax.random.split(rng, 3)

    g = mods.recon_train.geometry
    ph, pw = g.padded_height, g.padded_width
    bins = cfg.dataset.sensor_b.input_channels

    if e2vid_params is None:
        # initialize through the EVAL model/geometry: the train model may
        # roll out quad-block (differently-shaped recurrent state), but the
        # parameter tree is identical — remaps happen at apply time
        gv = mods.recon_val.geometry
        dummy = jnp.zeros((1, gv.padded_height, gv.padded_width, bins))
        st = mods.recon_val.init_state(1)
        e2vid_params = mods.e2vid.init(k_e2vid, dummy, st)["params"]

    base = mods.e2vid.base_channels
    latent_dummy = {1: jnp.zeros((1, ph, pw, base))}
    for i in range(mods.e2vid.num_encoders):
        latent_dummy[2 ** (i + 1)] = jnp.zeros(
            (1, ph // 2 ** (i + 1), pw // 2 ** (i + 1), base * 2 ** (i + 1)))
    back_params = mods.head.init(k_head, latent_dummy)["params"]

    opt_front_state = None
    if mods.front_a is not None:
        if front_params is None:
            ha, wa = cfg.dataset.sensor_a.shape
            variables = mods.front_a.init(k_front, jnp.zeros((1, ha, wa, 1)))
            front_params = variables["params"]
            front_batch_stats = variables["batch_stats"]
        opt_front_state = mods.opt_front.init(front_params)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        front_params=front_params,
        front_batch_stats=front_batch_stats,
        back_params=back_params,
        e2vid_params=e2vid_params,
        opt_front=opt_front_state,
        opt_back=mods.opt_back.init(back_params),
    )
