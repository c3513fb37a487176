"""Live-capture chase: processor in streaming mode against a dataset that
a writer is appending to concurrently (the reference's streaming scenario:
bounds refresh every iteration, trailing window follows the tail;
drfProc.py:239-241, 283, 291-293)."""

import threading
import time

import numpy as np

from pyspectrogram_tpu.io.reader import RFDataset
from pyspectrogram_tpu.io.synthetic import tone_signal
from pyspectrogram_tpu.io.writer import DigitalRFWriter
from pyspectrogram_tpu.runtime import ProcessorCallbacks, SpectrogramProcessor
from pyspectrogram_tpu.utils.config import SpectrogramConfig
from pyspectrogram_tpu.utils.errors import TerminateReason


def test_streaming_chases_growing_capture(tmp_path):
    sr = 100_000
    start = 1_451_661_840 * sr
    block = 20_000
    w = DigitalRFWriter(
        tmp_path, "live", np.complex64, start_global_index=start,
        sample_rate_numerator=sr, file_cadence_millisecs=100,
        subdir_cadence_secs=1,
    )
    w.rf_write(tone_signal(block, sr, [12_500.0]).astype(np.complex64))

    # record where each iteration's last frame ended (absolute samples);
    # the live path is incremental now (runtime.live), so track via the
    # emitted payloads rather than pipeline.compute (never called live).
    # Completion is emission-driven (abort once enough tails were seen
    # AND the window demonstrably advanced) rather than a fixed iteration
    # count: ticks that land before the writer's next block legitimately
    # emit nothing, so a fixed max_iterations is flaky under host load.
    tails = []

    def track(e):
        us = int(e.times[-1].astype("datetime64[us]").astype(np.int64))
        tails.append(us * sr // 1_000_000 + 256)
        if len(tails) >= 6 and tails[-1] > tails[0]:
            proc.abort()

    cb = ProcessorCallbacks(on_iterated=track)
    proc = SpectrogramProcessor(
        "streaming", tmp_path, tab_id=1,
        config=SpectrogramConfig(nfft=256, ntime=8, stream_seconds=0.05),
        callbacks=cb, streaming_sleep=0.02,
        max_iterations=400,  # backstop only; track() aborts long before
    )

    stop = threading.Event()

    def writer_thread():
        # keep appending until the processor has what it needs, so growth
        # between emissions is guaranteed even on a badly loaded host
        i = 1
        while not stop.is_set() and i < 400:
            w.rf_write(tone_signal(block, sr, [12_500.0],
                                   start_sample=i * block).astype(np.complex64))
            i += 1
            time.sleep(0.015)

    t = threading.Thread(target=writer_thread, daemon=True)
    t.start()
    proc.run()
    stop.set()
    t.join(10)

    assert proc.reason == TerminateReason.OK
    assert len(tails) >= 6
    # the trailing window must have advanced as data grew
    assert tails[-1] > tails[0]
    # and every iteration's tail is within the (then-current) bounds + slack
    ds = RFDataset(tmp_path)
    lo, hi = ds.bnds["live"]
    assert all(lo <= tt <= hi + 1 for tt in tails)
