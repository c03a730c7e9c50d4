"""Training/eval metric streaming.

Parity: the reference streams every tb_dict key per iteration plus lr and
eval scalars to TensorBoard (tools/train_utils/train_utils.py:101-105,
tools/test.py:131-133). Here the always-on sink is a JSONL file (one line
per logged step — trivially greppable/plottable, survives any environment),
and a TensorBoard event writer is layered on when a SummaryWriter
implementation is importable (tensorboardX or torch.utils.tensorboard).
"""
from __future__ import annotations

import json
from pathlib import Path


def _make_summary_writer(log_dir):
    try:
        from tensorboardX import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir=str(log_dir))
    except Exception:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir=str(log_dir))
    except Exception:
        return None


class MetricsWriter:
    """Append-only scalar stream: JSONL always, TensorBoard when available.

    write(step, scalars, prefix="train/") mirrors the reference's
    `tb_log.add_scalar('train/' + key, val, accumulated_iter)` loop.
    """

    def __init__(self, log_dir, filename="metrics.jsonl", tensorboard=True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._path = self.log_dir / filename
        self._f = open(self._path, "a", buffering=1)
        self._tb = _make_summary_writer(self.log_dir / "tensorboard") \
            if tensorboard else None

    def write(self, step, scalars, prefix="train/"):
        row = {"step": int(step)}
        for k, v in scalars.items():
            try:
                row[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(k, v, int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
