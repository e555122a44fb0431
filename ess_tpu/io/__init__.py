from ess_tpu.io.checkpoint import CheckpointManager
from ess_tpu.io.timers import Timer, timed_scope, timer_report

__all__ = ["CheckpointManager", "Timer", "timed_scope", "timer_report"]
