from ess_tpu.data.pipeline import EventPipeline, PipelineConfig

__all__ = ["EventPipeline", "PipelineConfig"]
