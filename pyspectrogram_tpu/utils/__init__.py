from pyspectrogram_tpu.utils.config import (
    ProcessorStats,
    SpectrogramConfig,
)
from pyspectrogram_tpu.utils.errors import (
    ChannelNotFoundError,
    DataGapError,
    FormatError,
    PySpectrogramTPUError,
    TerminateReason,
)

__all__ = [
    "ChannelNotFoundError",
    "DataGapError",
    "FormatError",
    "ProcessorStats",
    "PySpectrogramTPUError",
    "SpectrogramConfig",
    "TerminateReason",
]
