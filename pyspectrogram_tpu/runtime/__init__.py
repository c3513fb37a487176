from pyspectrogram_tpu.runtime.processor import SpectrogramProcessor
from pyspectrogram_tpu.runtime.signals import (
    Iterated,
    ProcessorCallbacks,
    StatsUpdated,
    Terminated,
)

__all__ = [
    "Iterated",
    "ProcessorCallbacks",
    "SpectrogramProcessor",
    "StatsUpdated",
    "Terminated",
]
