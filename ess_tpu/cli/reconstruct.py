"""Standalone E2VID reconstruction CLI.

Capability parity with /root/reference/e2vid/run_reconstruction.py:14-112:
read an event file (``t x y p`` text/zip with a ``width height`` header),
window it by fixed count or fixed duration, voxelize, roll through the
recurrent reconstruction network with carried state, and write grayscale
PNG frames.

``python -m ess_tpu.cli.reconstruct -c e2vid.pth.tar -i events.txt -o out/``
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="events -> video reconstruction")
    parser.add_argument("-c", "--checkpoint", default="",
                        help="E2VID torch .pth.tar (converted on the fly) or "
                             "empty for random weights")
    parser.add_argument("-i", "--input_file", required=True)
    parser.add_argument("-o", "--output_folder", default="reconstruction")
    parser.add_argument("-N", "--window_size", type=int, default=None,
                        help="fixed event count per window")
    parser.add_argument("-T", "--window_duration", type=float, default=None,
                        help="fixed window duration in ms")
    parser.add_argument("--num_bins", type=int, default=5)
    parser.add_argument("--no-normalize", dest="normalize", action="store_false")
    parser.add_argument("--color", action="store_true",
                        help="DAVIS346color Bayer stream -> color frames "
                             "(inference_options.py:55-57)")
    # live display (ImageDisplay, inference_utils.py:210-258)
    parser.add_argument("--display", action="store_true",
                        help="show the reconstruction in a cv2 window")
    parser.add_argument("--show_events", action="store_true",
                        help="hstack an event preview left of the frame")
    parser.add_argument("--event_display_mode", default="red-blue",
                        choices=("red-blue", "grayscale"))
    parser.add_argument("--num_bins_to_show", type=int, default=-1)
    parser.add_argument("--display_border_crop", type=int, default=0)
    parser.add_argument("--display_wait_time", type=int, default=1)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ess_tpu.data.readers import (
        FixedDurationEventReader, FixedSizeEventReader, read_header)
    from ess_tpu.models import RecurrentUNet
    from ess_tpu.ops.batch_voxel import voxelize_window_soa
    from ess_tpu.recon import Reconstructor

    width, height = read_header(args.input_file)
    print(f"sensor size: {width} x {height}")

    if args.checkpoint:
        from ess_tpu.io.convert import load_e2vid_checkpoint
        params, config = load_e2vid_checkpoint(args.checkpoint)
        model = RecurrentUNet(
            base_channels=int(config.get("base_num_channels", 32)),
            num_encoders=int(config.get("num_encoders", 3)),
            num_residual_blocks=int(config.get("num_residual_blocks", 2)),
            skip_type=str(config.get("skip_type", "sum")),
        )
    else:
        model = RecurrentUNet()
        params = None

    recon = Reconstructor(model=model, height=height, width=width,
                          normalize=False)
    state = recon.init_state(1)
    if params is None:
        g = recon.geometry
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, g.padded_height, g.padded_width, args.num_bins)),
            state)["params"]

    if args.window_duration is not None:
        reader = FixedDurationEventReader(args.input_file, args.window_duration)
    else:
        reader = FixedSizeEventReader(args.input_file, args.window_size or 10000)

    from ess_tpu.ops.voxel import normalize_nonzero
    norm_fn = jax.jit(normalize_nonzero)

    @jax.jit
    def step_fn(params, grid, state):
        return recon.step(params, grid, state)

    if args.color:
        # four Bayer-phase streams share the grayscale net; each carries its
        # own recurrent state, batched as ONE forward of 4 per window
        # (reference runs them sequentially: image_reconstructor.py:102-123)
        from ess_tpu.recon.color import (
            BAYER_PHASES, merge_channels_into_color_image, to_uint8)
        recon_half = Reconstructor(model=model, height=height // 2,
                                   width=width // 2, normalize=False)
        color_state = recon_half.init_state(4)

        @jax.jit
        def color_step_fn(params, grids, state):
            return recon_half.step(params, grids, state)

    os.makedirs(args.output_folder, exist_ok=True)
    try:
        import cv2
    except ImportError:
        cv2 = None

    from ess_tpu.recon.display import ImageDisplay
    display = ImageDisplay(
        display=args.display, show_events=args.show_events,
        event_display_mode=args.event_display_mode,
        num_bins_to_show=args.num_bins_to_show,
        border=args.display_border_crop, wait_time=args.display_wait_time)

    for i, window in enumerate(reader):
        t, x, y, p = window[:, 0], window[:, 1], window[:, 2], window[:, 3]
        grid = voxelize_window_soa(
            jnp.asarray(x, jnp.float32)[None], jnp.asarray(y, jnp.float32)[None],
            jnp.asarray(t - t[0], jnp.float32)[None],
            jnp.asarray(p, jnp.float32)[None],
            jnp.ones((1, len(x)), bool),
            num_bins=args.num_bins, height=height, width=width,
            normalize=False)
        if args.display and args.show_events:
            # the reference previews the RAW event tensor
            # (run_reconstruction.py:98 passes it pre-normalization;
            # normalization happens inside ImageReconstructor) — and a
            # device->host grid fetch costs ~25-60 ms/window on a tunneled
            # chip, so only pay it when a window is actually shown
            preview = np.moveaxis(np.asarray(grid[0, :height, :width]), -1, 0)
        else:
            preview = None
        if args.normalize:
            grid = norm_fn(grid)
        img, state, _ = step_fn(params, grid, state)
        frame = np.asarray(img[0, :height, :width, 0])
        frame8 = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
        out_path = os.path.join(args.output_folder, f"frame_{i:010d}.png")
        if args.color and cv2 is not None:
            # slice the normalized grid at the four 2x2 Bayer phases —
            # matching the reference order exactly: event_preprocessor
            # normalizes the FULL grid first (image_reconstructor.py:91),
            # THEN the phases are sliced from it (:96-100)
            phases = jnp.stack([grid[0, r::2, s::2]
                                for r, s in BAYER_PHASES.values()])
            imgs, color_state, _ = color_step_fn(params, phases, color_state)
            imgs = np.asarray(imgs[:, : height // 2, : width // 2, 0])
            channels = {ch: to_uint8(imgs[k])
                        for k, ch in enumerate(BAYER_PHASES)}
            channels["grayscale"] = frame8
            cv2.imwrite(out_path, merge_channels_into_color_image(channels))
        elif cv2 is not None:
            cv2.imwrite(out_path, frame8)
        else:
            frame8.tofile(out_path + ".raw")
        display(frame8, preview)
        print(f"window {i}: {len(x)} events -> {out_path}")


if __name__ == "__main__":
    main()
