"""Execute examples/demo.py end-to-end (the README's demo journey must
not rot: synthesize -> STI -> processor loop -> stream -> filter/WAV)."""

import importlib.util
import sys
from pathlib import Path


def test_demo_runs_and_writes_artifacts(tmp_path, capsys):
    demo_path = Path(__file__).resolve().parents[1] / "examples" / "demo.py"
    spec = importlib.util.spec_from_file_location("pstpu_demo", demo_path)
    demo = importlib.util.module_from_spec(spec)
    sys.modules["pstpu_demo"] = demo   # register BEFORE exec, per importlib docs
    spec.loader.exec_module(demo)
    demo.main(str(tmp_path))
    out = capsys.readouterr().out
    assert "peak at +125.0 kHz" in out
    for name in ("waterfall.png", "psd.csv", "stream.png", "filtered.wav"):
        assert (tmp_path / name).exists(), name
