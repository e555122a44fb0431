"""On-device event-sample pipeline: voxelize -> crop -> resize -> augment.

Replaces the reference's host-side per-sample transforms:
- DSEC: rectify + voxelize at sensor res, drop the 40 bottom rows, optional
  bilinear resize, random horizontal flip of tensor+label
  (DSEC/dataset/sequence.py:193-295)
- DDD17: voxelize, bilinear resize 346->352 wide, drop 60 bottom rows,
  optional bottom-anchored random crop to 120x216 + flip
  (datasets/ddd17_events_loader.py:101-183)

TPU-first architecture: the dense (B, T, H, W, C) voxel stack is NEVER
materialized. Events travel host->HBM as struct-of-arrays (one (B, T, N)
buffer per field — a trailing size-4 AoS dim would be lane-padded 32x by TPU
tiling), and each recurrent step voxelizes exactly one window inside the
rollout's ``lax.scan`` (ess_tpu.recon.Reconstructor.rollout_events). For a
DSEC batch that saves ~450 MB of HBM and H2D traffic per step versus
shipping prebuilt grids.

Augmentation parameters (flip bit, crop offset) are sampled once per batch
element and shared across all T windows — matching the reference, which
flips/crops the whole stacked tensor consistently.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ess_tpu.ops.batch_voxel import (
    _use_pallas_default, voxelize_window_soa, voxelize_windows)
from ess_tpu.ops.resize import resize_bilinear


@dataclass(frozen=True)
class PipelineConfig:
    """Static geometry/augmentation spec for one event dataset."""

    sensor_height: int
    sensor_width: int
    num_bins: int = 5
    representation: str = "voxel_grid"
    separate_pol: bool = False
    normalize: bool = False          # per-window nonzero normalize at build
    crop_bottom: int = 0             # rows dropped from the bottom (sensor res)
    resize_to: Optional[Tuple[int, int]] = None   # (H, W) after crop
    # the reference resizes event tensors with align_corners=True
    # (ddd17_events_loader.py:164, sequence.py:288)
    resize_align_corners: bool = True
    random_crop: Optional[Tuple[int, int]] = None  # train-time crop (H, W)
    crop_anchor: str = "random"      # 'random' | 'bottom' (DDD17 uses bottom)
    random_flip: bool = False
    trilinear: bool = False          # float-coord 8-corner kernel (rectified
                                     # streams); False = temporal bilinear
    rectify: bool = False            # apply rectify_map ON DEVICE (slow
                                     # gather; production rectifies on host)
    use_pallas: Optional[bool] = None  # None = auto (Pallas on TPU)
    pallas_interpret: bool = False   # run the kernel interpreted (CPU mesh
                                     # dryruns/tests of the production path)
    # tent-plane operand dtype of the Pallas voxelizer: 'bfloat16'
    # (default, full-rate MXU), 'float32' (scatter bit-parity), or 'int8'
    # (double-rate MXU, 1/127-step corner weights — see
    # ops/voxel_pallas.voxelize_tiled)
    voxel_oh_dtype: str = "bfloat16"
    # events per kernel DMA block. None = the mode default
    # (ops/voxel_pallas.CHUNK for the halo kernel, FOLDED_CHUNK for the
    # slotted fold-free kernel — per-(band, x-slot) groups average ~1.1k
    # events at DSEC scale, so large blocks waste fill on group tails)
    voxel_chunk: Optional[int] = None
    # raw-window mode: the recurrent scan consumes the voxelizer's RAW
    # band accumulator and fuses the fine s2d transform (+ deferred
    # normalize/flip) into one in-scan pass per window, skipping the
    # bulk stack reshape/transpose/copy chain. MEASURED REGRESSION at
    # DSEC step scale (742.4 -> 691.3 w/s, r5 ladder): the per-window
    # transform serializes inside the scan (fwd AND bwd) and costs more
    # than the bulk 4-pass chain it removes. None = auto (OFF). Kept as
    # a tested opt-in (bit-exact vs the s2d stack path).
    raw_windows: Optional[bool] = None
    # stack-window mode: the voxelizer kernel emits the space-to-depth
    # NCHW window stack DIRECTLY (voxelize_folded layout='stack') and
    # the per-window map is ONLY elementwise normalize/flip + the
    # window relayout the scan already pays. MEASURED NEUTRAL at DSEC
    # step scale (744.8 vs 743.2 w/s, r5 ladder + xplane): the in-kernel
    # emission is ~free (+0.7 ms) and the 13.7 ms chain drops to one
    # 6.3 ms bulk relayout XLA re-inserts toward its preferred C-minor
    # stack layout, but the per-window map costs 2x the plain window
    # relayout (9.0 vs 4.9 ms) — the chain is LAYOUT-bound, not
    # pass-count-bound (same convergence as deint and raw_windows).
    # Needs pre-folded band batches on the slotted kernel, no resize.
    # None = auto (OFF). Kept as a parity-tested opt-in.
    stack_windows: Optional[bool] = None

    @property
    def _oh_dtype(self):
        import jax.numpy as _jnp
        return {"bfloat16": _jnp.bfloat16, "float32": _jnp.float32,
                "int8": _jnp.int8}[self.voxel_oh_dtype]

    @property
    def channels(self) -> int:
        if self.representation == "histogram":
            return 2
        return self.num_bins * 2 if self.separate_pol else self.num_bins

    @property
    def post_crop_size(self) -> Tuple[int, int]:
        return (self.sensor_height - self.crop_bottom, self.sensor_width)

    @property
    def pre_aug_size(self) -> Tuple[int, int]:
        return self.resize_to if self.resize_to is not None else self.post_crop_size

    def output_size(self, train: bool) -> Tuple[int, int]:
        if train and self.random_crop is not None:
            return self.random_crop
        return self.pre_aug_size


def to_soa(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Host-side: split an AoS raw-event batch into contiguous SoA buffers.

    {"raw_events": (B,T,N,4), "valid": (B,T,N)} ->
    {"ev_x","ev_y","ev_t","ev_p": (B,T,N) f32, "ev_valid": (B,T,N) bool}.
    Packed-wire batches (ev_xq/... u16 columns from the native ingest) are
    already SoA and pass through untouched.
    """
    if "ev_xq" in batch:
        out = dict(batch)
        for k in ("tile_offsets", "band_offsets"):
            if k in out:
                out["ev_" + k] = out.pop(k)
        return out
    out = {k: v for k, v in batch.items() if k not in ("raw_events", "valid")}
    raw = batch["raw_events"]
    out["ev_x"] = np.ascontiguousarray(raw[..., 0])
    out["ev_y"] = np.ascontiguousarray(raw[..., 1])
    out["ev_t"] = np.ascontiguousarray(raw[..., 2])
    out["ev_p"] = np.ascontiguousarray(raw[..., 3])
    out["ev_valid"] = np.ascontiguousarray(batch["valid"])
    # host-binned offsets ride along when the loader produced them (band
    # offsets mark the pre-folded fold-free kernel mode)
    for k in ("tile_offsets", "band_offsets"):
        if k in batch:
            out["ev_" + k] = batch[k]
            out.pop(k, None)
    return out


@dataclass(frozen=True)
class AugmentParams:
    """Per-sample augmentation draws, shared across a sample's windows."""

    flip: Optional[jax.Array] = None      # (B,) bool
    crop_y: Optional[jax.Array] = None    # (B,) int32
    crop_x: Optional[jax.Array] = None    # (B,) int32


class EventPipeline:
    """Builds jit-friendly per-window voxelization + transform closures."""

    def __init__(self, cfg: PipelineConfig, rectify_map=None):
        self.cfg = cfg
        self.rectify_map = (
            jnp.asarray(rectify_map) if rectify_map is not None else None)
        if cfg.rectify and self.rectify_map is None:
            raise ValueError("rectify=True requires a rectify_map")

    # -------------------- augmentation sampling --------------------

    def sample_augment(
        self, rng: Optional[jax.Array], batch_size: int, *, train: bool
    ) -> AugmentParams:
        cfg = self.cfg
        if not train or rng is None:
            return AugmentParams()
        flip = crop_y = crop_x = None
        if cfg.random_flip:
            rng, k = jax.random.split(rng)
            flip = jax.random.bernoulli(k, 0.5, (batch_size,))
        if cfg.random_crop is not None:
            ch, cw = cfg.random_crop
            h, w = self.cfg.pre_aug_size
            rng, ky, kx = jax.random.split(rng, 3)
            if cfg.crop_anchor == "bottom":
                crop_y = jnp.full((batch_size,), h - ch, jnp.int32)
            else:
                crop_y = jax.random.randint(ky, (batch_size,), 0, h - ch + 1)
            crop_x = jax.random.randint(kx, (batch_size,), 0, w - cw + 1)
        return AugmentParams(flip=flip, crop_y=crop_y, crop_x=crop_x)

    # -------------------- packed wire format --------------------

    def decode_packed(self, batch: dict) -> dict:
        """Dequantize a packed-wire batch (native.ingest_rectify_bin_packed
        or _packed_folded: 1/64-px u16 coords, per-window-normalized u16
        time, polarity u8 — or i8 PRE-WEIGHTED in 1/127 steps for the
        folded wire — validity implied by the offsets) into the standard
        ev_* form.

        Runs on device inside the jit — one fused elementwise pass over the
        small u16 buffers. The time column arrives ALREADY normalized to
        [0, bins-1] (scaled), so the voxelizer skips its per-window min/max
        (``ev_t_prenormalized`` marker).
        """
        from ess_tpu.data.native import COORD_SCALE, POL_SCALE, TIME_SCALE

        cfg = self.cfg
        xq = batch["ev_xq"]
        n = xq.shape[-1]
        folded = "ev_band_offsets" in batch
        offs = batch["ev_band_offsets" if folded else "ev_tile_offsets"]
        out = {k: v for k, v in batch.items()
               if k not in ("ev_xq", "ev_yq", "ev_tq", "ev_pq")}
        out["ev_x"] = xq.astype(jnp.float32) * (1.0 / COORD_SCALE)
        out["ev_y"] = batch["ev_yq"].astype(jnp.float32) * (1.0 / COORD_SCALE)
        out["ev_t"] = batch["ev_tq"].astype(jnp.float32) * (
            (cfg.num_bins - 1) / TIME_SCALE)
        if folded:
            # i8 pre-weighted polarity (edge/boundary fractions folded in)
            out["ev_p"] = batch["ev_pq"].astype(jnp.float32) * (
                1.0 / POL_SCALE)
        else:
            out["ev_p"] = batch["ev_pq"].astype(jnp.float32)
        count = offs[..., -1]            # valid events per window
        out["ev_valid"] = jnp.arange(n, dtype=jnp.int32) < count[..., None]
        out["ev_t_prenormalized"] = True
        return out

    # -------------------- space-to-depth fast path --------------------

    def s2d_capable(self, *, train: bool) -> bool:
        """True when the batched build can emit space-to-depth blocks
        directly (Pallas voxelizer + transforms expressible in block space:
        even-row bottom crop and horizontal flip; no random crop). A
        width-only resize (DDD17's 346->352) is allowed: pre-folded
        band-offset batches fold it into the voxelizer as a minor-axis
        matmul (tile-offset batches with a resize still take the standard
        path — callers must also check the batch's offsets kind).
        """
        cfg = self.cfg
        use_pallas = (cfg.use_pallas if cfg.use_pallas is not None
                      else _use_pallas_default())
        resize_ok = cfg.resize_to is None or (
            cfg.resize_to[0] == cfg.post_crop_size[0]
            and cfg.resize_to[1] % 2 == 0)
        return (use_pallas
                and cfg.representation == "voxel_grid"
                and resize_ok
                and (cfg.random_crop is None or not train)
                and cfg.crop_bottom % 2 == 0
                and cfg.sensor_height % 2 == 0
                and cfg.sensor_width % 2 == 0
                and not (cfg.rectify and self.rectify_map is not None))

    def s4d_capable(self, *, train: bool) -> bool:
        """Like :meth:`s2d_capable` for the quad-block (4x4) window layout
        (geometry divisible by 4; same transform restrictions)."""
        cfg = self.cfg
        return (self.s2d_capable(train=train)
                and cfg.crop_bottom % 4 == 0
                and cfg.sensor_height % 4 == 0
                and cfg.sensor_width % 4 == 0
                and (cfg.resize_to is None or cfg.resize_to[1] % 4 == 0))

    def _transform_s2d(self, grids: jax.Array, aug: AugmentParams,
                       block: int = 2) -> jax.Array:
        """Block-space transforms: bottom crop (block-aligned rows) +
        horizontal flip.

        A horizontal flip of the full-res grid maps block column X, phase s
        to block column WB-1-X, phase B-1-s: reverse the block axis and
        reverse the s phase groups of the (r*B+s)*C + c channel order.
        """
        cfg = self.cfg
        if cfg.crop_bottom > 0:
            grids = grids[:, : (cfg.sensor_height - cfg.crop_bottom) // block]
        if aug.flip is not None:
            c = grids.shape[-1] // (block * block)
            perm = np.arange(grids.shape[-1])
            perm = perm.reshape(block, block, c)[:, ::-1].reshape(-1)
            flipped = grids[:, :, ::-1, :][..., perm]
            grids = jnp.where(aug.flip[:, None, None, None], flipped, grids)
        return grids

    # -------------------- per-window transform --------------------

    def _transform_grid(self, grids: jax.Array, aug: AugmentParams) -> jax.Array:
        """(B, Hs, Ws, C) sensor-res grids -> model-input grids."""
        cfg = self.cfg
        if cfg.crop_bottom > 0:
            grids = grids[:, : cfg.sensor_height - cfg.crop_bottom]
        if cfg.resize_to is not None:
            grids = resize_bilinear(grids, *cfg.resize_to,
                                    align_corners=cfg.resize_align_corners)
        if aug.crop_y is not None:
            ch, cw = cfg.random_crop

            def crop_one(g, y0, x0):
                return jax.lax.dynamic_slice(
                    g, (y0, x0, 0), (ch, cw, g.shape[-1]))

            grids = jax.vmap(crop_one)(grids, aug.crop_y, aug.crop_x)
        if aug.flip is not None:
            grids = jnp.where(
                aug.flip[:, None, None, None], grids[:, :, ::-1, :], grids)
        return grids

    def make_window_fn(
        self, aug: AugmentParams, *, t_prenormalized: bool = False,
        offsets_kind: str = "tile",
    ) -> Callable[..., jax.Array]:
        """fn(x, y, t, p, valid, tile_offsets=None) each (B, N)
        -> (B, H_out, W_out, C)."""
        cfg = self.cfg

        def fn(x, y, t, p, valid, tile_offsets=None):
            grids = voxelize_window_soa(
                x, y, t, p, valid,
                offsets_kind=offsets_kind,
                num_bins=cfg.num_bins,
                height=cfg.sensor_height, width=cfg.sensor_width,
                representation=cfg.representation,
                separate_pol=cfg.separate_pol,
                trilinear=cfg.trilinear,
                rectify_map=self.rectify_map if cfg.rectify else None,
                normalize=cfg.normalize,
                tile_offsets=tile_offsets,
                use_pallas=cfg.use_pallas,
                pallas_interpret=cfg.pallas_interpret,
                oh_dtype=cfg._oh_dtype,
                t_prenormalized=t_prenormalized,
                voxel_chunk=cfg.voxel_chunk,
            )
            return self._transform_grid(grids, aug)

        return fn

    def apply_label_transform(
        self, label: jax.Array, aug: AugmentParams
    ) -> jax.Array:
        """Apply the SAME spatial augs to (B, H, W) integer labels.

        Labels are stored at the pipeline's pre-augmentation resolution
        (post crop/resize), mirroring the reference loaders.
        """
        cfg = self.cfg
        if aug.crop_y is not None and label.shape[1:] == tuple(cfg.pre_aug_size):
            ch, cw = cfg.random_crop
            label = jax.vmap(
                lambda l, y0, x0: jax.lax.dynamic_slice(l, (y0, x0), (ch, cw))
            )(label, aug.crop_y, aug.crop_x)
        if aug.flip is not None:
            label = jnp.where(aug.flip[:, None, None], label[:, :, ::-1], label)
        return label

    def build_all(self, batch: dict, rng: Optional[jax.Array] = None,
                  *, train: bool = False, layout: str = "nhwc",
                  out_dtype=jnp.float32, time_major: bool = False):
        """SoA batch -> (grids (B, T, H', W', C), transformed label).

        Voxelizes ALL T windows in ONE batched kernel invocation (B*T folded
        into the kernel grid) and applies the spatial transforms over the
        flattened window axis. ~9% faster end-to-end than voxelizing inside
        the rollout scan on v5e (one pallas_call + batched fold/normalize),
        at the cost of materializing the (B, T, H, W, C) stack in HBM
        (~450 MB at DSEC scale) — use the fused per-window path
        (make_window_fn + rollout_events) when HBM is tight.

        ``layout='s2d'`` (requires :meth:`s2d_capable`) emits space-to-depth
        block windows (B, T, H'/2, W'/2, 4*C) in ``out_dtype`` — the layout
        the E2VID block-space head consumes — without ever materializing the
        full-resolution grids.

        ``time_major=True`` returns grids with the window axis leading
        (T, B, ...): the recurrent scan then slices contiguous leading-axis
        blocks instead of paying a strided gather per window (~10 ms/step at
        DSEC scale). Labels are unaffected.
        """
        cfg = self.cfg
        if "ev_xq" in batch:
            batch = self.decode_packed(batch)
        t_prenorm = bool(batch.get("ev_t_prenormalized", False))
        # pre-folded band-binned batches (host_band_bin_folded) carry
        # "ev_band_offsets" — key PRESENCE is the (jit-static) mode marker
        offsets_kind = "band" if "ev_band_offsets" in batch else "tile"
        b, t_dim, n = batch["ev_x"].shape
        if time_major:
            # flatten the (small) event buffers window-major so the kernel
            # grid — and therefore the folded window stack — comes out
            # (T, B, ...) with no full-grid transpose afterwards
            flat = lambda a: jnp.swapaxes(a, 0, 1).reshape(t_dim * b, n)
        else:
            flat = lambda a: a.reshape(b * t_dim, n)
        offs = (batch.get("ev_band_offsets") if offsets_kind == "band"
                else batch.get("ev_tile_offsets"))
        if offs is not None and time_major:
            offs = jnp.swapaxes(offs, 0, 1)
        if layout == "s4d":
            assert self.s4d_capable(train=train), "s4d layout unavailable"
        elif layout == "s2d":
            assert self.s2d_capable(train=train), "s2d layout unavailable"
        resize_width_to = None
        if layout in ("s2d", "s4d") and cfg.resize_to is not None:
            # width-only resize folds into the voxelizer (band mode only)
            assert offsets_kind == "band", (
                "s2d build with a resize needs pre-folded band offsets")
            resize_width_to = cfg.resize_to[1]
        grids = voxelize_window_soa(
            flat(batch["ev_x"]), flat(batch["ev_y"]), flat(batch["ev_t"]),
            flat(batch["ev_p"]), flat(batch["ev_valid"]),
            num_bins=cfg.num_bins,
            height=cfg.sensor_height, width=cfg.sensor_width,
            representation=cfg.representation,
            separate_pol=cfg.separate_pol,
            trilinear=cfg.trilinear,
            rectify_map=self.rectify_map if cfg.rectify else None,
            normalize=cfg.normalize,
            tile_offsets=offs.reshape(b * t_dim, -1)
            if offs is not None else None,
            use_pallas=cfg.use_pallas,
            pallas_interpret=cfg.pallas_interpret,
            oh_dtype=cfg._oh_dtype,
            layout=layout,
            out_dtype=out_dtype if layout in ("s2d", "s4d") else jnp.float32,
            t_prenormalized=t_prenorm,
            offsets_kind=offsets_kind,
            resize_width_to=resize_width_to,
            resize_align_corners=cfg.resize_align_corners,
            voxel_chunk=cfg.voxel_chunk,
        )
        aug = self.sample_augment(rng, b, train=train)
        if time_major:
            # flat order is (t, b): per-sample draws tile, not repeat
            rep = lambda a: None if a is None else jnp.tile(a, t_dim)
        else:
            rep = lambda a: None if a is None else jnp.repeat(a, t_dim, axis=0)
        aug_t = AugmentParams(flip=rep(aug.flip), crop_y=rep(aug.crop_y),
                              crop_x=rep(aug.crop_x))
        if layout == "s4d":
            grids = self._transform_s2d(grids, aug_t, block=4)
        elif layout == "s2d":
            grids = self._transform_s2d(grids, aug_t)
        else:
            grids = self._transform_grid(grids, aug_t)
        if time_major:
            grids = grids.reshape(t_dim, b, *grids.shape[1:])
        else:
            grids = grids.reshape(b, t_dim, *grids.shape[1:])
        label = batch.get("label")
        if label is not None:
            label = self.apply_label_transform(label, aug)
        return grids, label

    def raw_capable(self, *, train: bool, batch: dict) -> bool:
        """True when :meth:`build_all_raw` can serve this batch: the
        fold-free kernel's pre-folded band offsets are present and every
        transform is expressible on the raw accumulator (the
        :meth:`s2d_capable` conditions)."""
        cfg = self.cfg
        on = cfg.raw_windows if cfg.raw_windows is not None else False
        return (on and self.s2d_capable(train=train)
                and ("ev_band_offsets" in batch or "band_offsets" in batch))

    def stack_capable(self, *, train: bool, batch: dict) -> bool:
        """True when :meth:`build_all_stack` can serve this batch: the
        slotted fold-free kernel's pre-folded band offsets are present,
        the transforms are expressible in block space (:meth:`s2d_capable`)
        and there is no resize (the stack emission cannot fold the width
        matmul)."""
        from ess_tpu.ops.voxel_pallas import tile_h_for_bins
        from ess_tpu.ops.batch_voxel import effective_bins

        cfg = self.cfg
        on = cfg.stack_windows if cfg.stack_windows is not None else False
        offs = batch.get("ev_band_offsets")
        # s2d_capable already covers use_pallas (default-resolved),
        # representation, even geometry and block-space transforms
        if not (on and self.s2d_capable(train=train) and offs is not None
                and cfg.resize_to is None):
            return False
        bins_eff = effective_bins(
            cfg.num_bins, cfg.separate_pol, cfg.trilinear)
        th = tile_h_for_bins(bins_eff)
        hp = -(-cfg.sensor_height // th) * th
        # slotted kernel only (per-x-slot offsets), even tile height
        return th % 2 == 0 and offs.shape[-1] - 1 > hp // th

    def build_all_stack(self, batch: dict, rng: Optional[jax.Array] = None,
                        *, train: bool = False, out_dtype=jnp.bfloat16):
        """SoA pre-folded batch -> (s2d NCHW window stack, label,
        window_map).

        The voxelizer kernel emits the space-to-depth stack DIRECTLY
        (``voxelize_folded`` ``layout='stack'``): the returned stack is
        ``(T, B, 4*bins, H/2, W/2)`` and ``window_map(stack_t, stats_t)
        -> (B, H'/2, W'/2, 4*bins)`` applies ONLY the deferred per-window
        elementwise normalization, the block-space flip, the bottom crop
        and the NHWC transpose — all of which fuse into the window
        relayout copy the recurrent scan already pays. Unlike the default
        s2d build, the bulk reshape/transpose/copy chain (~13.7 ms at
        DSEC step scale) never runs; unlike ``build_all_raw``, no fine
        s2d reshape happens inside the scan. Values match
        ``build_all(layout='s2d', time_major=True)`` windows exactly up
        to the kernel stats' reduction order under normalize (the deint
        emission permutes the accumulator, so mean/std agree to ~1 ulp).
        """
        from ess_tpu.ops.batch_voxel import effective_bins

        cfg = self.cfg
        if "ev_xq" in batch:
            batch = self.decode_packed(batch)
        assert "ev_band_offsets" in batch, "stack mode needs band offsets"
        t_prenorm = bool(batch.get("ev_t_prenormalized", False))
        b, t_dim, n = batch["ev_x"].shape
        flat = lambda a: jnp.swapaxes(a, 0, 1).reshape(t_dim * b, n)
        offs = jnp.swapaxes(batch["ev_band_offsets"], 0, 1)
        stack, stats = voxelize_window_soa(
            flat(batch["ev_x"]), flat(batch["ev_y"]), flat(batch["ev_t"]),
            flat(batch["ev_p"]), flat(batch["ev_valid"]),
            num_bins=cfg.num_bins,
            height=cfg.sensor_height, width=cfg.sensor_width,
            representation=cfg.representation,
            separate_pol=cfg.separate_pol,
            trilinear=cfg.trilinear,
            normalize=cfg.normalize,
            tile_offsets=offs.reshape(b * t_dim, -1),
            use_pallas=cfg.use_pallas,
            pallas_interpret=cfg.pallas_interpret,
            oh_dtype=cfg._oh_dtype,
            layout="stack",
            out_dtype=out_dtype,
            t_prenormalized=t_prenorm,
            offsets_kind="band",
            voxel_chunk=cfg.voxel_chunk,
        )
        stack = stack.reshape(t_dim, b, *stack.shape[1:])
        stats = (stats.reshape(t_dim, b, 3) if cfg.normalize else None)
        aug = self.sample_augment(rng, b, train=train)

        bins_eff = effective_bins(
            cfg.num_bins, cfg.separate_pol, cfg.trilinear)
        out_h = cfg.sensor_height - cfg.crop_bottom
        if aug.flip is not None:
            flip_perm = np.arange(4 * bins_eff).reshape(
                2, 2, bins_eff)[:, ::-1].reshape(-1)

        def window_map(r: jax.Array, s: Optional[jax.Array]) -> jax.Array:
            # r: (B, 4*bins, H/2, W/2) NCHW; s: (B, 3) f32 stats or None
            if s is not None:
                # deferred nonzero standardization — identical math/order
                # to the bulk build's kernel-stats normalize
                num = s[:, 2]
                num_f = jnp.maximum(num, 1.0)
                mean = s[:, 0] / num_f
                var = s[:, 1] / num_f - mean * mean
                std = jnp.sqrt(jnp.maximum(var, 0.0))
                std = jnp.where(std > 0, std, 1.0)
                bshape = (-1, 1, 1, 1)
                shift = mean.astype(r.dtype).reshape(bshape)
                scale = (1.0 / std).astype(r.dtype).reshape(bshape)
                normed = jnp.where(r != 0, (r - shift) * scale,
                                   jnp.zeros_like(r))
                r = jnp.where((num > 0).reshape(bshape), normed, r)
            if aug.flip is not None:
                # block-space horizontal flip: reverse the block-x axis
                # and the px phase of the (py*2+px)*bins+c channel order
                # (_transform_s2d semantics on the NCHW form)
                flipped = r[:, flip_perm, :, ::-1]
                r = jnp.where(aug.flip[:, None, None, None], flipped, r)
            r = r[:, :, : out_h // 2]
            return jnp.transpose(r, (0, 2, 3, 1))

        label = batch.get("label")
        if label is not None:
            label = self.apply_label_transform(label, aug)
        return {"raw": stack, "stats": stats}, label, window_map

    def build_all_raw(self, batch: dict, rng: Optional[jax.Array] = None,
                      *, train: bool = False, out_dtype=jnp.bfloat16):
        """SoA pre-folded batch -> (raw window stack, label, window_map).

        Like :meth:`build_all` with ``layout='s2d'`` + ``time_major=True``,
        but the returned stack is the voxelizer's RAW band accumulator
        ``(T, B, n_bands, bins*th, Wp)`` — the kernel's natural layout,
        written once and never repacked. ``window_map(raw_t, stats_t) ->
        (B, H'/2, W'/2, 4*bins)`` applies the deferred per-window
        normalization, the horizontal flip draw, the fine s2d transform
        and the crop; the recurrent scan calls it per window
        (Reconstructor.rollout_raw) so the whole transform is ONE fused
        in-scan pass instead of the bulk 4-pass stack chain (~10.5 ms +
        3.3 ms slice_bitcasts + 4.9 ms in-scan relayout at DSEC scale).

        ``stats`` is None when normalization is off or already folded into
        the kernel tail (resize datasets — ordering, see voxelize_folded).
        """
        from ess_tpu.ops.voxel_pallas import tile_h_for_bins
        from ess_tpu.ops.batch_voxel import effective_bins

        cfg = self.cfg
        if "ev_xq" in batch:
            batch = self.decode_packed(batch)
        assert "ev_band_offsets" in batch, "raw mode needs band offsets"
        t_prenorm = bool(batch.get("ev_t_prenormalized", False))
        b, t_dim, n = batch["ev_x"].shape
        # time-major flatten: the kernel grid — and therefore the raw
        # stack — comes out (T, B, ...); the scan slices leading-axis
        # blocks with no transpose
        flat = lambda a: jnp.swapaxes(a, 0, 1).reshape(t_dim * b, n)
        offs = jnp.swapaxes(batch["ev_band_offsets"], 0, 1)
        resize_width_to = None
        if cfg.resize_to is not None and cfg.resize_to[1] != cfg.sensor_width:
            resize_width_to = cfg.resize_to[1]
        raw, stats = voxelize_window_soa(
            flat(batch["ev_x"]), flat(batch["ev_y"]), flat(batch["ev_t"]),
            flat(batch["ev_p"]), flat(batch["ev_valid"]),
            num_bins=cfg.num_bins,
            height=cfg.sensor_height, width=cfg.sensor_width,
            representation=cfg.representation,
            separate_pol=cfg.separate_pol,
            trilinear=cfg.trilinear,
            normalize=cfg.normalize,
            tile_offsets=offs.reshape(b * t_dim, -1),
            use_pallas=cfg.use_pallas,
            pallas_interpret=cfg.pallas_interpret,
            oh_dtype=cfg._oh_dtype,
            layout="raw",
            out_dtype=out_dtype,
            t_prenormalized=t_prenorm,
            offsets_kind="band",
            resize_width_to=resize_width_to,
            resize_align_corners=cfg.resize_align_corners,
            voxel_chunk=cfg.voxel_chunk,
        )
        raw = raw.reshape(t_dim, b, *raw.shape[1:])
        defer_norm = cfg.normalize and resize_width_to is None
        stats = (stats.reshape(t_dim, b, 3) if defer_norm else None)
        aug = self.sample_augment(rng, b, train=train)

        bins_eff = effective_bins(
            cfg.num_bins, cfg.separate_pol, cfg.trilinear)
        th = tile_h_for_bins(bins_eff)
        out_h = cfg.sensor_height - cfg.crop_bottom
        out_w = (resize_width_to if resize_width_to is not None
                 else cfg.sensor_width)
        n_bands = raw.shape[2]

        def window_map(r: jax.Array, s: Optional[jax.Array]) -> jax.Array:
            # r: (B, n_bands, bins*th, Wp'); s: (B, 3) f32 stats or None
            if s is not None:
                # deferred nonzero standardization — bit-identical math to
                # voxelize_folded's in-tail normalize (same dtype/order)
                num = s[:, 2]
                num_f = jnp.maximum(num, 1.0)
                mean = s[:, 0] / num_f
                var = s[:, 1] / num_f - mean * mean
                std = jnp.sqrt(jnp.maximum(var, 0.0))
                std = jnp.where(std > 0, std, 1.0)
                bshape = (-1, 1, 1, 1)
                shift = mean.astype(r.dtype).reshape(bshape)
                scale = (1.0 / std).astype(r.dtype).reshape(bshape)
                normed = jnp.where(r != 0, (r - shift) * scale,
                                   jnp.zeros_like(r))
                r = jnp.where((num > 0).reshape(bshape), normed, r)
            # drop the kernel's lane padding first (wp >= sensor width,
            # resize out_pad >= resized width): the flip must reverse the
            # TRUE x axis, not the padded one
            if r.shape[-1] != out_w:
                r = r[..., :out_w]
            if aug.flip is not None:
                # a horizontal flip of the voxel grid is a pure reversal
                # of the raw accumulator's minor (x) axis — cheaper and
                # simpler than the block-space channel permutation the
                # transposed s2d form needs (_transform_s2d)
                r = jnp.where(aug.flip[:, None, None, None],
                              r[..., ::-1], r)
            w_ = r.shape[-1]
            core = r.reshape(r.shape[0], n_bands, bins_eff, th // 2, 2,
                             w_ // 2, 2)
            core = jnp.transpose(core, (0, 1, 3, 5, 4, 6, 2))
            g = core.reshape(r.shape[0], (n_bands * th) // 2, w_ // 2,
                             4 * bins_eff)
            return g[:, : out_h // 2, : out_w // 2]

        label = batch.get("label")
        if label is not None:
            label = self.apply_label_transform(label, aug)
        return {"raw": raw, "stats": stats}, label, window_map

    # -------------------- legacy dense path --------------------

    def __call__(self, batch: dict, rng: Optional[jax.Array] = None,
                 *, train: bool = False) -> dict:
        """Dense path: build the full (B, T, H, W, C) stack at once.

        Kept for small-scale tests and CPU use; production training uses the
        fused ``make_window_fn`` + ``rollout_events`` path instead.
        """
        cfg = self.cfg
        grids = voxelize_windows(
            batch["raw_events"], batch["valid"],
            num_bins=cfg.num_bins,
            height=cfg.sensor_height, width=cfg.sensor_width,
            representation=cfg.representation,
            separate_pol=cfg.separate_pol,
            trilinear=cfg.trilinear,
            rectify_map=self.rectify_map if cfg.rectify else None,
            normalize=cfg.normalize,
        )
        b, t = grids.shape[:2]
        aug = self.sample_augment(rng, b, train=train)
        flat = grids.reshape(b * t, *grids.shape[2:])
        rep = lambda a: (None if a is None
                         else jnp.repeat(a, t, axis=0))
        aug_t = AugmentParams(flip=rep(aug.flip), crop_y=rep(aug.crop_y),
                              crop_x=rep(aug.crop_x))
        flat = self._transform_grid(flat, aug_t)
        grids = flat.reshape(b, t, *flat.shape[1:])

        out = dict(batch)
        out["events"] = grids
        if "label" in batch:
            out["label"] = self.apply_label_transform(batch["label"], aug)
        out.pop("raw_events", None)
        out.pop("valid", None)
        return out
