"""Recurrent E2VID reconstruction runtime.

Capability parity with the reference's ImageReconstructor
(/root/reference/e2vid/image_reconstructor.py:18-163): per-window event
normalization (EventPreprocessor, inference_utils.py:56-109), reflection pad
to UNet-divisible size (CropParameters, inference_utils.py:302-338), the
recurrent model forward with carried ConvLSTM state, and optional per-image
standardization.

TPU-first redesign: instead of a stateful object called 20x per batch from
Python (ess_trainer.py:277-280), the whole multi-window rollout is ONE
``jax.lax.scan`` inside jit — state stays in HBM, XLA pipelines the windows,
and nothing retraces. The reference resets state per sample
(ess_trainer.py:271); here the caller passes a fresh ``init_state`` (or a
carried one for streaming eval — sequence_recurrent.py semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ess_tpu.models.e2vid import RecurrentUNet, zero_recurrent_state
from ess_tpu.ops.pad import CropGeometry, reflect_pad
from ess_tpu.ops.voxel import normalize_nonzero


def preprocess_event_tensor(
    events: jax.Array, *, normalize: bool = True, flip: bool = False
) -> jax.Array:
    """Per-sample event-tensor preprocessing (inference_utils.py:86-108).

    ``events`` is NHWC. Normalization standardizes the nonzero entries of
    each sample's voxel grid to mean 0 / std 1.
    """
    if flip:
        events = events[:, ::-1, ::-1, :]
    if normalize:
        events = jax.vmap(normalize_nonzero)(events)
    return events


@dataclass(frozen=True)
class Reconstructor:
    """Functional recurrent-reconstruction runtime.

    Holds the model *definition* and static geometry; parameters are passed
    per-call (pure functions compose with jit/grad/shard_map).
    """

    model: RecurrentUNet
    height: int
    width: int
    normalize: bool = True
    flip: bool = False
    standardize: bool = False
    # disable the recurrent connection: state resets every window
    # (inference_options --no-recurrent, image_reconstructor.py:109-112)
    no_recurrent: bool = False
    # Evaluate head + first encoder in space-to-depth block layout
    # (ops/conv_s2d.py): identical math/params, no full-res head
    # intermediate on encoder-only windows. Requires a norm-free model
    # (E2VID-lightweight is); auto-disabled otherwise.
    block_space: bool = True

    @property
    def _use_blocks(self) -> bool:
        return self.block_space and self.model.norm is None

    @property
    def geometry(self) -> CropGeometry:
        return CropGeometry(self.height, self.width, self.model.num_encoders)

    def init_state(self, batch: int, dtype=None):
        g = self.geometry
        return zero_recurrent_state(
            batch, g.padded_height, g.padded_width,
            num_encoders=self.model.num_encoders,
            base_channels=self.model.base_channels,
            recurrent_block=self.model.recurrent_block,
            quad_block=self._use_blocks and self.model.quad_block,
            dtype=dtype or self.model.dtype,
        )

    def step(self, params, events: jax.Array, state, *, decode: bool = True,
             events_s2d: bool = False):
        """One reconstruction update: preprocess -> pad -> recurrent forward.

        ``events``: (B, H, W, C) voxel grid for one window — or, with
        ``events_s2d=True``, the pre-built (B, H/2, W/2, 4C) space-to-depth
        blocks (already normalized; geometry must need no padding), as the
        Pallas voxelizer's s2d fold emits them.
        Returns (image (B, Hp, Wp, 1) or None, new_state, latent dict).
        """
        if events_s2d:
            g = self.geometry
            assert self._use_blocks and not self.flip
            assert (g.padded_height, g.padded_width) == (self.height, self.width)
            d = 4 if self.model.quad_block else 2
            assert events.shape[1:3] == (self.height // d, self.width // d)
            if self.normalize:
                # nonzero-standardization is layout-invariant (same value set)
                events = jax.vmap(normalize_nonzero)(events)
            img, new_state, latent = self.model.apply(
                {"params": params}, events, state, decode=decode,
                block_input=True)
            if decode and self.standardize:
                lo = jnp.min(img, axis=(1, 2, 3), keepdims=True)
                hi = jnp.max(img, axis=(1, 2, 3), keepdims=True)
                img = (img - lo) / jnp.maximum(hi - lo, 1e-12)
            return img, new_state, latent
        x = preprocess_event_tensor(events, normalize=self.normalize, flip=self.flip)
        x = reflect_pad(x, self.geometry)
        if self._use_blocks:
            from ess_tpu.ops.conv_s2d import space_to_depth, space_to_depth4
            s2d = space_to_depth4 if self.model.quad_block else space_to_depth
            img, new_state, latent = self.model.apply(
                {"params": params}, s2d(x), state, decode=decode,
                block_input=True)
        else:
            img, new_state, latent = self.model.apply(
                {"params": params}, x, state, decode=decode)
        if decode and self.standardize:
            lo = jnp.min(img, axis=(1, 2, 3), keepdims=True)
            hi = jnp.max(img, axis=(1, 2, 3), keepdims=True)
            img = (img - lo) / jnp.maximum(hi - lo, 1e-12)
        return img, new_state, latent

    def rollout(self, params, windows: jax.Array, init_state=None,
                *, windows_s2d: bool = False, time_major: bool = False):
        """Roll T event windows through the recurrent net via ``lax.scan``.

        ``windows``: (B, T, H, W, C) — or (B, T, H/2, W/2, 4C) pre-built
        space-to-depth blocks with ``windows_s2d=True``; with
        ``time_major=True`` the first two axes are swapped (T leading) so
        the scan slices contiguous blocks. Returns (final_image,
        final_state, final_latent) — the quantities ESS training consumes
        (ess_trainer.py:277-285). The first T-1 windows run encoder-only
        (state update); only the final window pays for the decoder.
        """
        if time_major:
            t, b = windows.shape[:2]
        else:
            b, t = windows.shape[:2]
        state = self.init_state(b) if init_state is None else init_state

        def body(carry, ev):
            _, new_state, _ = self.step(params, ev, carry, decode=False,
                                        events_s2d=windows_s2d)
            return new_state, None

        if t > 1 and not self.no_recurrent:
            xs = (windows[:-1] if time_major
                  else jnp.moveaxis(windows[:, :-1], 1, 0))
            state, _ = jax.lax.scan(body, state, xs)
        last = windows[-1] if time_major else windows[:, -1]
        final_img, final_state, final_latent = self.step(
            params, last, state, decode=True, events_s2d=windows_s2d)
        return final_img, final_state, final_latent

    def rollout_events(self, params, soa: dict, voxel_fn, init_state=None):
        """Fused rollout from RAW events: voxelize-inside-the-scan.

        ``soa``: {"ev_x","ev_y","ev_t","ev_p": (B, T, N), "ev_valid"} struct
        -of-arrays event buffers; ``voxel_fn(x, y, t, p, valid) -> (B, H, W,
        C)`` from ``EventPipeline.make_window_fn``. One window's voxel grid
        exists at a time — the dense (B, T, H, W, C) stack is never
        materialized in HBM.
        """
        b, t_dim = soa["ev_x"].shape[:2]
        state = self.init_state(b) if init_state is None else init_state

        def get_window(i):
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, i, axis=1, keepdims=False)
            offs_key = ("ev_band_offsets" if "ev_band_offsets" in soa
                        else "ev_tile_offsets")
            offs = take(soa[offs_key]) if offs_key in soa else None
            return voxel_fn(take(soa["ev_x"]), take(soa["ev_y"]),
                            take(soa["ev_t"]), take(soa["ev_p"]),
                            take(soa["ev_valid"]), tile_offsets=offs)

        def body(carry, i):
            _, new_state, _ = self.step(params, get_window(i), carry, decode=False)
            if self.no_recurrent:
                new_state = carry
            return new_state, None

        if t_dim > 1 and not self.no_recurrent:
            state, _ = jax.lax.scan(body, state, jnp.arange(t_dim - 1))
        final_img, final_state, final_latent = self.step(
            params, get_window(t_dim - 1), state, decode=True)
        return final_img, final_state, final_latent

    def rollout_raw(self, params, raw: jax.Array, stats, window_map,
                    init_state=None):
        """Roll out from the voxelizer's RAW band-accumulator stack.

        ``raw``: (T, B, n_bands, bins*th, Wp) from
        ``EventPipeline.build_all_raw``; ``stats``: (T, B, 3) deferred
        normalization stats or None; ``window_map(raw_t, stats_t) ->
        (B, H/2, W/2, 4C)`` s2d window. Each scan step dynamic-indexes one
        contiguous leading-axis block and applies the transform inside the
        scan body — the transposed window stack (and its fwd/bwd slice
        copies) never materializes in HBM. Semantics match
        :meth:`rollout` with ``windows_s2d=True, time_major=True``.
        """
        t_dim, b = raw.shape[:2]
        state = self.init_state(b) if init_state is None else init_state

        def get(i):
            r = jax.lax.dynamic_index_in_dim(raw, i, axis=0, keepdims=False)
            s = (jax.lax.dynamic_index_in_dim(stats, i, axis=0,
                                              keepdims=False)
                 if stats is not None else None)
            return window_map(r, s)

        def body(carry, i):
            _, new_state, _ = self.step(params, get(i), carry, decode=False,
                                        events_s2d=True)
            if self.no_recurrent:
                new_state = carry
            return new_state, None

        if t_dim > 1 and not self.no_recurrent:
            state, _ = jax.lax.scan(body, state, jnp.arange(t_dim - 1))
        return self.step(params, get(t_dim - 1), state, decode=True,
                         events_s2d=True)

    def rollout_all(self, params, windows: jax.Array, init_state=None):
        """Like :meth:`rollout` but returns every intermediate image
        (T, B, Hp, Wp, 1) — the standalone reconstruction CLI's output
        (run_reconstruction.py:96-110 semantics)."""
        b = windows.shape[0]
        state = self.init_state(b) if init_state is None else init_state

        def body(carry, ev):
            img, new_state, _ = self.step(params, ev, carry)
            if self.no_recurrent:
                new_state = carry
            return new_state, img

        xs = jnp.moveaxis(windows, 1, 0)
        final_state, imgs = jax.lax.scan(body, state, xs)
        return imgs, final_state
