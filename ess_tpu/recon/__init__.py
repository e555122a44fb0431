from ess_tpu.recon.reconstructor import Reconstructor, preprocess_event_tensor

__all__ = ["Reconstructor", "preprocess_event_tensor"]
