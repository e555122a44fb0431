"""Lever-by-lever attribution of the DSEC UDA step (the flagship ESS mode).

Same discipline as tools/bench_increments.py, for bench_extra.bench_uda_dsec's
exact step (B8 images + B8 x T20 x 100k events at 440x640):

  0. xla-cells       lstm_impl='xla', resnet stem 'xla'
  1. int8-cells      fused Pallas int8 train cells, stem 'xla'
  2. +blocked-stem   resnet stem+layer1 in s2d block space (the default)

The resnet stem toggle is a module attribute (models/resnet.py stem_impl),
swapped via dataclasses.replace on the built front module — same params.

Usage: python tools/bench_uda_increments.py [--iters 8] [--only 2 3]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import bench_extra  # noqa: E402

# Demoted rung (r4): +block-head measured 359.4 (-58) on this step and was
# removed from the config surface (it survives as an op-level experiment).
LADDER = [
    ("xla-cells", {"lstm_impl_train": None, "lstm_impl": "xla"}, "xla", False),
    ("int8-cells", {}, "xla", False),
    ("+blocked-stem (default)", {}, "auto", False),
    ("+raw-windows (opt-in)", {}, "auto", True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax

    from ess_tpu.train import uda as uda_mod
    from ess_tpu.train.builder import build_modules, init_state

    base = bench_extra.make_uda_dsec_cfg()
    pipe, batch = bench_extra.make_uda_dsec_inputs()
    b, t = bench_extra.UDA_DSEC_B, bench_extra.UDA_DSEC_T
    pipe_raw = type(pipe)(dataclasses.replace(
        pipe.cfg, raw_windows=True), rectify_map=pipe.rectify_map)

    prev = None
    for i, (name, tweak, stem, raw) in enumerate(LADDER):
        if args.only is not None and i not in args.only:
            continue
        pipe_i = pipe_raw if raw else pipe
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, **tweak))
        try:
            mods = build_modules(cfg)
            if mods.front_a.stem_impl != stem:
                mods = dataclasses.replace(
                    mods, front_a=dataclasses.replace(
                        mods.front_a, stem_impl=stem))
            state = init_state(mods, jax.random.PRNGKey(0))
            step = uda_mod.make_train_step(mods, pipe_i)
            state, out = step(state, batch)   # compile + warmup
            float(out["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, out = step(state, batch)
            float(out["loss"])
            dt = (time.perf_counter() - t0) / args.iters
        except Exception as e:  # keep the remaining rungs
            print(f"[{i}] {name:24s} FAILED: {e!r}", flush=True)
            continue
        wps = b * t / dt
        delta = f"  ({wps - prev:+.0f} w/s vs prev rung)" if prev else ""
        print(f"[{i}] {name:24s} {dt * 1e3:7.1f} ms/step  "
              f"{wps:6.1f} windows/s{delta}", flush=True)
        prev = wps


if __name__ == "__main__":
    main()
