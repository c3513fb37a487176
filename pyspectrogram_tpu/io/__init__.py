from pyspectrogram_tpu.io.drf_format import ChannelProperties, get_ref
from pyspectrogram_tpu.io.reader import DigitalRFReader, RFDataset
from pyspectrogram_tpu.io.time_util import (
    sample_to_datetime,
    sample_to_time,
    time_to_sample,
)
from pyspectrogram_tpu.io.writer import DigitalRFWriter

__all__ = [
    "ChannelProperties",
    "DigitalRFReader",
    "DigitalRFWriter",
    "RFDataset",
    "get_ref",
    "sample_to_datetime",
    "sample_to_time",
    "time_to_sample",
]
