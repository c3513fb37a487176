from pyspectrogram_tpu.models.sti import StiPipeline, StiResult

__all__ = ["StiPipeline", "StiResult"]
