from pyspectrogram_tpu.utils.config import SpectrogramConfig
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
    "PySpectrogramTPUError",
    "SpectrogramConfig",
    "TerminateReason",
]
