from ess_tpu.utils import viz

__all__ = ["viz"]
