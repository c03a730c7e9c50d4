"""aggregate_trace parses perfetto traces and picks the right lanes."""
import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

from profile_eval import aggregate_trace


def _write_trace(path, events):
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_device_lane_selection(tmp_path):
    """TPU traces: only the per-op "XLA Ops" lane counts — the "XLA
    Modules" lane spans whole executions and would double-count every op;
    generated .N suffixes aggregate; metadata and host lanes are ignored;
    only the NEWEST trace file is read (stale runs under the same --out
    must not mix in)."""
    stale = [
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 10,
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 1, "tid": 10, "name": "stale_op", "dur": 777.0},
    ]
    _write_trace(tmp_path / "old" / "w.trace.json.gz", stale)
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 9,
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "name": "thread_name", "pid": 1, "tid": 10,
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 1, "tid": 9, "name": "jit_infer(123)",
         "dur": 175.0},
        {"ph": "X", "pid": 1, "tid": 10, "name": "fusion.1", "dur": 100.0},
        {"ph": "X", "pid": 1, "tid": 10, "name": "fusion.2", "dur": 50.0},
        {"ph": "X", "pid": 1, "tid": 10, "name": "sort.3", "dur": 25.0},
        {"ph": "X", "pid": 2, "tid": 11, "name": "hostwork", "dur": 999.0},
    ]
    _write_trace(tmp_path / "a" / "x.trace.json.gz", events)
    by_op, total = aggregate_trace(tmp_path)
    assert by_op["fusion"] == 150.0
    assert by_op["sort"] == 25.0
    assert "hostwork" not in by_op
    assert "jit_infer(123)" not in by_op
    assert "stale_op" not in by_op
    assert total == 175.0


def test_cpu_eigen_fallback(tmp_path):
    """No device pid: fall back to XLAEigen thread lanes, skipping the
    paired end:/infra markers."""
    events = [
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 7,
         "args": {"name": "tf_XLAEigen/123"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 8,
         "args": {"name": "python"}},
        {"ph": "X", "pid": 3, "tid": 7, "name": "dot.4", "dur": 10.0},
        {"ph": "X", "pid": 3, "tid": 7, "name": "end: dot.4", "dur": 10.0},
        {"ph": "X", "pid": 3, "tid": 7, "name": "ThunkExecutor::Execute",
         "dur": 99.0},
        {"ph": "X", "pid": 3, "tid": 8, "name": "py_stuff", "dur": 42.0},
    ]
    _write_trace(tmp_path / "b" / "y.trace.json.gz", events)
    by_op, total = aggregate_trace(tmp_path)
    assert dict(by_op) == {"dot": 10.0}
    assert total == 10.0
