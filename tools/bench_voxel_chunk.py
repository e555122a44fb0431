"""Full-step sweep of the fold-free voxelizer's DMA block size.

Per-(band, x-slot) groups average ~1.1k events at the DSEC shape, so
FOLDED_CHUNK=1024 wastes ~2x work on group-tail fill + slot-boundary
block sharing. This measures bench.py's exact step across chunk sizes
(CLAUDE.md timing discipline: queued dispatches, one scalar fetch).

Usage: python tools/bench_voxel_chunk.py [--iters 10] [--chunks 1024 512 256]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[1024, 768, 512, 256])
    args = ap.parse_args()

    import jax

    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state

    cfg = bench.make_cfg()
    batch = bench.make_batch(folded=True)
    prev = None
    for ck in args.chunks:
        pipeline = bench.make_pipeline(voxel_chunk=ck)
        try:
            mods = build_modules(cfg)
            state = init_state(mods, jax.random.PRNGKey(0))
            step = sup.make_train_step(mods, pipeline)
            state, out = step(state, batch)
            float(out["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, out = step(state, batch)
            float(out["loss"])
            dt = (time.perf_counter() - t0) / args.iters
        except Exception as e:
            print(f"chunk={ck:5d} FAILED: {e!r}", flush=True)
            continue
        wps = bench.BATCH * bench.WINDOWS / dt
        delta = f"  ({wps - prev:+.1f} vs prev)" if prev else ""
        print(f"chunk={ck:5d}  {dt * 1e3:7.1f} ms/step  "
              f"{wps:6.1f} windows/s{delta}", flush=True)
        prev = wps


if __name__ == "__main__":
    main()
