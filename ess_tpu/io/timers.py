"""Region timers and profiler hooks (observability).

Capability parity with /root/reference/e2vid/utils/timers.py:10-57
(CudaTimer/Timer context managers accumulating per-region means, atexit
report). The device analogue of ``torch.cuda.synchronize`` is
``jax.block_until_ready`` on a representative output; ``trace`` wraps
``jax.profiler`` for XLA-level traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import atexit
import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional

_ACCUM: Dict[str, list] = defaultdict(list)


class Timer:
    """Wall-clock region timer: ``with Timer('voxelize'): ...``.

    Pass ``sync=x`` (any jax pytree) to block on device completion before
    stopping the clock, mirroring CudaTimer's synchronize."""

    def __init__(self, name: str, sync: Any = None):
        self.name = name
        self.sync = sync

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            import jax
            jax.block_until_ready(self.sync)
        _ACCUM[self.name].append(time.perf_counter() - self.t0)
        return False


@contextlib.contextmanager
def timed_scope(name: str) -> Iterator[None]:
    with Timer(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """XLA profiler trace (view with TensorBoard's profile plugin)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timer_report() -> Dict[str, float]:
    """Mean seconds per region."""
    return {k: sum(v) / len(v) for k, v in _ACCUM.items() if v}


def reset_timers() -> None:
    _ACCUM.clear()


@atexit.register
def _print_report() -> None:  # parity with timers.py:46-57
    rep = timer_report()
    if rep:
        print("== ess-tpu timing report ==")
        for name, mean_s in sorted(rep.items()):
            n = len(_ACCUM[name])
            print(f"  {name}: {1000 * mean_s:.2f} ms (n={n})")
