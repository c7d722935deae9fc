"""Scalar logging: JSONL always, TensorBoard when tensorboardX is available.

Contract: LoG/utils/recorder.py (Recorder.log(step, key, val)).
"""
from __future__ import annotations

import json
import os
import time


class Recorder:
    def __init__(self, logdir="log"):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self.writer = None
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(logdir)
        except ImportError:
            pass

    def log(self, step, key, val):
        try:
            val = float(val)
        except (TypeError, ValueError):
            return
        self._jsonl.write(
            json.dumps({"t": time.time(), "step": int(step), "key": key, "val": val})
            + "\n"
        )
        self._jsonl.flush()
        if self.writer is not None:
            self.writer.add_scalar(key, val, step)
