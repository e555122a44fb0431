"""Analytic speed-of-light (SoL) roofline for the DSEC supervised train step.

VERDICT round-2 item 1 accepts, in place of the raw >=800 windows/s bar, "a
measured, xplane-attributed proof that the remaining time is at hardware
roofline". This tool is that proof's analytic half: for every component of
bench.py's step (B8 x T20 x 100k events, 440x640, 5 bins, E2VID-lightweight
3-encoder/base-32 geometry — SURVEY.md section 2.5, reference
e2vid/model/unet.py:117-181) it derives

  - FLOPs from the conv/matmul shapes,
  - the minimum HBM traffic the dataflow requires (operands that cannot live
    in VMEM across the producing/consuming ops),
  - SoL time = max(FLOPs / MXU peak, bytes / HBM bandwidth)

against v5e peaks, and prints a markdown table merging in xplane-measured
times where we have them (tools/profile_bench.py). "xSoL" = measured / SoL;
1.0x means the op runs at the hardware limit and no kernel work can improve
it — only algorithmic change (fewer FLOPs / fewer bytes) can.

Pure host arithmetic: no jax import, runs anywhere, zero TPU time.

Usage:  python tools/roofline.py [--measured k=ms ...] [--json]
"""

import argparse
import json

# ---- v5e chip peaks (public: cloud.google.com/tpu/docs/v5e) ----------------
BF16_TFLOPS = 197.0        # MXU peak, bf16 x bf16 -> f32
INT8_TOPS = 394.0          # double-rate int8 MXU path
HBM_GBPS = 819.0           # HBM bandwidth

# ---- bench.py workload (the reference's DSEC training shape) ---------------
B, T = 8, 20               # batch x windows (windows/step = 160)
H, W = 440, 640            # post-crop grid
BINS = 5
EVENTS = 100_000           # per window
NUM_CLASSES = 11

# E2VID-lightweight: head 5x5 (BINS->32) stride 1; 3 encoder levels of
# [5x5 stride-2 conv C->2C] + [ConvLSTM, 3x3 gate conv (2C)->(4C)];
# 2 residual blocks at 256; 3 decoder levels [bilinear x2 + 5x5 conv];
# 1x1 prediction conv. Channels double per level from base 32.
BASE = 32
LEVELS = 3


def conv_flops(hw, k, cin, cout):
    """2*MAC FLOPs of a kxk conv producing hw spatial x cout channels."""
    return 2 * hw * k * k * cin * cout


def gb(nbytes):
    return nbytes / 1e9


def sol_ms(flops=0.0, bytes_=0.0, peak_tflops=BF16_TFLOPS):
    t_flop = flops / (peak_tflops * 1e12)
    t_mem = bytes_ / (HBM_GBPS * 1e9)
    return max(t_flop, t_mem) * 1e3, t_flop * 1e3, t_mem * 1e3


def components():
    """Yield (key, description, flops, hbm_bytes, peak) per TRAIN STEP."""
    out = []
    nw = B * T  # window-samples per step

    # -- voxelizer (ops/voxel_pallas.py kernel v3) ---------------------------
    # The kernel's arithmetic is layout-structured (tile-binned tent-plane
    # dots), so its FLOP count is a design choice, not intrinsic; the
    # intrinsic floor is the HBM traffic: read the SoA event stream (4 x f32
    # per event) and write the bf16 s2d voxel grid once.
    ev_bytes = nw * EVENTS * 4 * 4
    grid_bytes = nw * BINS * H * W * 2
    out.append(("voxelize", "event stream -> bf16 voxel grid (Pallas v3)",
                0.0, ev_bytes + grid_bytes, BF16_TFLOPS))

    # -- per-window normalization / fold -------------------------------------
    # nonzero mean/std stats (one grid read) + apply (read + write); the
    # apply pass is fused into the s2d emit so the floor is 2 reads 1 write.
    out.append(("fold_norm", "nonzero-normalize + s2d fold",
                0.0, 3 * grid_bytes, BF16_TFLOPS))

    # -- recurrent rollout (x B x T) -----------------------------------------
    hw_full = H * W
    out.append(("head_conv", "5x5 conv BINS->32 (s4d quad-block)",
                nw * conv_flops(hw_full, 5, BINS, BASE),
                # reads the voxel grid (counted in voxelize write? no: its
                # own read) + writes 32ch activation at full res (bf16)
                nw * (grid_bytes // nw + hw_full * BASE * 2),
                BF16_TFLOPS))

    for i in range(LEVELS):
        c_in = BASE * 2 ** i
        c_out = 2 * c_in
        hw = (H >> (i + 1)) * (W >> (i + 1))
        out.append((
            f"enc{i}_conv", f"5x5 s2 conv {c_in}->{c_out} @/{2 ** (i + 1)}",
            nw * conv_flops(hw, 5, c_in, c_out),
            nw * (4 * hw * c_in * 2 + hw * c_out * 2),  # read x, write y
            BF16_TFLOPS))
        # ConvLSTM gate conv: 3x3 on concat(x, h) = 2*c_out -> 4*c_out.
        # Frozen train rollout runs this int8 (lstm_impl_train='pallas_int8',
        # error bound tested in tests/test_conv_lstm_pallas.py).
        out.append((
            f"lstm{i}_gates", f"3x3 gate conv {2 * c_out}->{4 * c_out} int8",
            nw * conv_flops(hw, 3, 2 * c_out, 4 * c_out),
            # fused cell: gates never hit HBM; traffic counted in pointwise
            0.0,
            INT8_TOPS))
        # cell pointwise dataflow floor: read x, h, c; write h, c (bf16).
        out.append((
            f"lstm{i}_ptwise", f"cell state dataflow {c_out}ch",
            0.0, nw * 5 * hw * c_out * 2, BF16_TFLOPS))

    # -- decode tail (once per step, B samples: last window only) ------------
    c_top = BASE * 2 ** LEVELS  # 256
    hw_top = (H >> LEVELS) * (W >> LEVELS)
    out.append(("resblocks", "2x residual block 256ch @/8",
                B * 2 * 2 * conv_flops(hw_top, 3, c_top, c_top),
                B * 2 * 2 * 2 * hw_top * c_top * 2, BF16_TFLOPS))
    dec_flops = 0
    dec_bytes = 0
    for i in range(LEVELS):
        c_in = BASE * 2 ** (LEVELS - i)      # 256, 128, 64 (sum skips)
        c_out = c_in // 2
        hw = (H >> (LEVELS - i - 1)) * (W >> (LEVELS - i - 1))
        dec_flops += B * conv_flops(hw, 5, c_in, c_out)
        dec_bytes += B * (hw * c_in * 2 + hw * c_out * 2)
    out.append(("decoders", "3x [x2 up + 5x5 conv] (s2d blocked)",
                dec_flops, dec_bytes, BF16_TFLOPS))

    # -- segmentation head fwd+bwd (the only trainable part) -----------------
    # 5x INSResBlock @256 /8 + conv 256->128 + [up + 2 convs -> 64] + [up +
    # conv -> 32 + 1x1 -> C] (models/seghead.py, reference
    # style_networks.py:9-107). bwd ~= 2x fwd FLOPs.
    head = 5 * 2 * conv_flops(hw_top, 3, c_top, c_top)
    head += conv_flops(hw_top, 3, c_top, 128)
    hw4 = (H >> 2) * (W >> 2)
    head += conv_flops(hw4, 3, 128 + 64, 64) + conv_flops(hw4, 3, 64, 64)
    hw2 = (H >> 1) * (W >> 1)
    head += conv_flops(hw2, 3, 64 + 32, 64) + conv_flops(hw2, 3, 64, 32)
    head += conv_flops(hw2, 1, 32, NUM_CLASSES)
    out.append(("seghead_fwd_bwd", "task head fwd+bwd (block-space)",
                B * 3 * head, 0.0, BF16_TFLOPS))

    # -- loss + optimizer -----------------------------------------------------
    # blocked logits (B, H/4, W/4, 16*C): log-softmax + CE/dice mask-reduce,
    # read logits fwd + bwd write grad (f32 tail)
    logits_bytes = B * hw4 * 16 * NUM_CLASSES * 2
    out.append(("loss", "dice+CE on folded logits + bwd",
                0.0, 3 * logits_bytes, BF16_TFLOPS))
    return out


def uda_components():
    """DSEC UDA step (train/uda.py; reference ess_trainer.py:103-148):
    everything in the supervised step's rollout + decode, PLUS the trainable
    image branch applied twice (img_a and the reconstructed img_fake), three
    head passes, cycle losses, and two optimizers. B images = B event
    samples = 8 at 440x640."""
    out = [c for c in components()
           if c[0] not in ("seghead_fwd_bwd", "loss")]

    # -- ResNet18 front end (stem + layer1-3, models/resnet.py), fwd+bwd,
    #    applied to img_a AND img_fake: 2 images x ~3x fwd FLOPs ------------
    hw2 = (H >> 1) * (W >> 1)
    hw4 = (H >> 2) * (W >> 2)
    hw8 = (H >> 3) * (W >> 3)
    fe = conv_flops(hw2, 7, 1, 64)                     # 7x7/2 stem (blocked)
    fe += 4 * conv_flops(hw2, 3, 64, 64)               # layer1: 2 BasicBlocks
    fe += (conv_flops(hw4, 3, 64, 128) + 3 * conv_flops(hw4, 3, 128, 128)
           + conv_flops(hw4, 1, 64, 128))              # layer2 + downsample
    fe += (conv_flops(hw8, 3, 128, 256) + 3 * conv_flops(hw8, 3, 256, 256)
           + conv_flops(hw8, 1, 128, 256))             # layer3 + downsample
    out.append(("front_a_x2", "resnet18 stem+layer1-3 fwd+bwd, 2 images",
                B * 2 * 3 * fe, 0.0, BF16_TFLOPS))

    # -- three head passes (uda_losses: pred_a fwd+bwd(back), pred_fake fwd +
    #    bwd-to-latent (trains front_a), pred_real fwd+bwd(back)) ------------
    c_top = BASE * 2 ** LEVELS
    hw_top = hw8
    head = 5 * 2 * conv_flops(hw_top, 3, c_top, c_top)
    head += conv_flops(hw_top, 3, c_top, 128)
    head += conv_flops(hw4, 3, 128 + 64, 64) + conv_flops(hw4, 3, 64, 64)
    head += conv_flops(hw2, 3, 64 + 32, 64) + conv_flops(hw2, 3, 64, 32)
    head += conv_flops(hw2, 1, 32, NUM_CLASSES)
    out.append(("head_x3_fwd_bwd", "3 head passes (a/fake/real) fwd+bwd",
                B * 3 * 3 * head, 0.0, BF16_TFLOPS))

    # -- cycle + task losses: L1 on latent dicts {2,4,8} + symJS + dice/CE
    #    on blocked logits — all bytes-bound elementwise ----------------------
    lat_bytes = B * (hw2 * 64 + hw4 * 128 + hw8 * 256) * 2 * 2  # fake + real
    logits_bytes = 3 * B * hw4 * 16 * NUM_CLASSES * 2
    out.append(("cycle_losses", "L1 latent + symJS + dice/CE + bwd",
                0.0, 3 * (lat_bytes + logits_bytes), BF16_TFLOPS))
    return out


KNOWN_MEASURED = {
    # xplane-attributed ms/step at the 638 w/s state (tools/profile_bench.py,
    # BASELINE.md round-3 anatomy). Re-measure after quad+blocked-head land.
    "voxelize": 29.6,
    "fold_norm": 15.0,
    "lstm_all": 80.0,   # fused int8 cells, all 3 levels incl. pointwise
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", nargs="*", default=[],
                    help="component=ms overrides, e.g. voxelize=21.2")
    ap.add_argument("--step", choices=["supervised", "uda"],
                    default="supervised")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    measured = dict(KNOWN_MEASURED)
    for kv in args.measured:
        k, v = kv.split("=")
        measured[k] = float(v)

    comps = components() if args.step == "supervised" else uda_components()
    rows = []
    tot_sol = 0.0
    for key, desc, fl, by, peak in comps:
        s, t_f, t_m = sol_ms(fl, by, peak)
        bound = "MXU" if t_f >= t_m else "HBM"
        rows.append({
            "component": key, "desc": desc, "gflops": fl / 1e9,
            "hbm_mb": by / 1e6, "sol_ms": s, "bound": bound,
            "measured_ms": measured.get(key),
        })
        tot_sol += s

    if args.json:
        print(json.dumps({"rows": rows, "total_sol_ms": tot_sol,
                          "windows_per_step": B * T}))
        return

    print(f"# SoL roofline — DSEC {args.step} step (B{B} x T{T}, {H}x{W})\n")
    print("| component | what | GFLOP | HBM MB | bound | SoL ms | meas ms |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        m = f"{r['measured_ms']:.1f}" if r["measured_ms"] else ""
        print(f"| {r['component']} | {r['desc']} | {r['gflops']:.0f} | "
              f"{r['hbm_mb']:.0f} | {r['bound']} | {r['sol_ms']:.2f} | {m} |")
    print(f"\nTotal SoL: {tot_sol:.1f} ms/step = "
          f"{B * T / tot_sol * 1e3:.0f} windows/s speed-of-light")
    print("800 windows/s target = 200 ms/step; "
          f"SoL headroom vs target: {200 - tot_sol:.1f} ms")


if __name__ == "__main__":
    main()
