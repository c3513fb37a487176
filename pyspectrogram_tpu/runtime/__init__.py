from pyspectrogram_tpu.runtime.live import LiveStreamEngine
from pyspectrogram_tpu.runtime.processor import SpectrogramProcessor
from pyspectrogram_tpu.runtime.scheduler import SharedRefreshScheduler
from pyspectrogram_tpu.runtime.signals import (
    Iterated,
    ProcessorCallbacks,
    StatsUpdated,
    Terminated,
)

__all__ = [
    "Iterated",
    "LiveStreamEngine",
    "ProcessorCallbacks",
    "SharedRefreshScheduler",
    "SpectrogramProcessor",
    "StatsUpdated",
    "Terminated",
]
