from pyspectrogram_tpu.models.batch import (
    BatchedStiPipeline,
    make_batched_sti_fn_pm,
)
from pyspectrogram_tpu.models.sti import StiPipeline, StiResult

__all__ = [
    "BatchedStiPipeline",
    "StiPipeline",
    "StiResult",
    "make_batched_sti_fn_pm",
]
