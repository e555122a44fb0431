"""Lever-by-lever attribution of the DSEC supervised step, one TPU session.

Measures bench.py's exact step across a ladder of config increments so one
tunnel session yields the full round-3 anatomy (BASELINE.md table):

  0. xla-cells       lstm_impl='xla'
  1. int8-cells      fused Pallas int8 train cells — the r3 default
  2. +folded-voxel   ghost-folded band binning -> fold-free kernel (default)
  3. +voxel-int8     int8 tent planes (opt-in pin; measured -11 w/s)

Round-3 v5e results: 546.8 / 639.3 / 580.2 / 476.4 windows/s — the blocked
head (-59) and quad rollout (-104) are full-step REGRESSIONS despite winning
their micro-benchmarks, so auto resolves both OFF (rungs 2/3 are opt-ins).

Prints one line per increment: windows/s + delta vs the previous rung.
Timing follows CLAUDE.md discipline: queued dispatches chained through the
donated TrainState, ONE scalar fetch at the end (per-iteration fetches
measure the tunnel RTT, not the step).

Usage: python tools/bench_increments.py [--iters 10] [--only 2 3]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (shares config/batch with the driver metric)

# (name, model tweaks, pipeline overrides, folded batch?)
# Demoted rungs (r4 final reprice, measured on the folded+stats stack):
#   +block-head 597.3 (-62) and +quad 488.6 (-109 further) — third/second
#   independent full-step regressions; both were removed from the config
#   surface (VERDICT r3 #7) and survive only as op-level experiments.
LADDER = [
    ("xla-cells", {"lstm_impl_train": None, "lstm_impl": "xla"}, {}, False),
    ("int8-cells (r3 default)", {}, {}, False),
    ("+folded-voxel (default)", {}, {}, True),
    ("+raw-windows (opt-in)", {}, {"raw_windows": True}, True),
    ("+stack-emit", {}, {"stack_windows": True}, True),
    ("+voxel-int8 (opt-in)", {}, {"voxel_oh_dtype": "int8"}, True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=int, nargs="*", default=None,
                    help="ladder indices to run (default: all)")
    args = ap.parse_args()

    import jax

    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state

    base = bench.make_cfg()
    pipelines = {}
    batches = {}

    prev = None
    for i, (name, tweak, pipe_kw, folded) in enumerate(LADDER):
        if args.only is not None and i not in args.only:
            continue
        pk = tuple(sorted(pipe_kw.items()))
        if pk not in pipelines:
            pipelines[pk] = bench.make_pipeline(**pipe_kw)
        pipeline = pipelines[pk]
        if folded not in batches:
            batches[folded] = bench.make_batch(folded=folded)
        batch = batches[folded]
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, **tweak))
        try:
            mods = build_modules(cfg)
            state = init_state(mods, jax.random.PRNGKey(0))
            step = sup.make_train_step(mods, pipeline)
            state, out = step(state, batch)   # compile + warmup
            float(out["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, out = step(state, batch)
            float(out["loss"])
            dt = (time.perf_counter() - t0) / args.iters
        except Exception as e:  # keep the remaining rungs
            print(f"[{i}] {name:18s} FAILED: {e!r}", flush=True)
            continue
        wps = bench.BATCH * bench.WINDOWS / dt
        delta = f"  ({wps - prev:+.0f} w/s vs prev rung)" if prev else ""
        print(f"[{i}] {name:18s} {dt * 1e3:7.1f} ms/step  "
              f"{wps:6.1f} windows/s{delta}", flush=True)
        prev = wps


if __name__ == "__main__":
    main()
