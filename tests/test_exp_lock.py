"""Exp-dir lockfile: a second trainer on the same exp dir must fail fast.

Round-2 postmortem (BASELINE.md): two trainers colliding on one exp dir /
TPU session produced interleaved logs and a NaN-poisoned checkpoint. The
lock makes that impossible rather than merely documented.
"""
import os

import pytest

from log_tpu.utils.trainer import Trainer


def _lock_only(exp):
    t = Trainer.__new__(Trainer)
    t.exp = str(exp)
    t._acquire_exp_lock()
    return t


def test_second_lock_fails(tmp_path):
    first = _lock_only(tmp_path)
    with pytest.raises(RuntimeError, match="locked by a running trainer"):
        _lock_only(tmp_path)
    # the lockfile records the owner pid
    with open(tmp_path / ".lock") as f:
        assert int(f.read().strip()) == os.getpid()
    os.close(first._exp_lock_fd)


def test_lock_released_on_close(tmp_path):
    first = _lock_only(tmp_path)
    os.close(first._exp_lock_fd)  # simulates process death
    second = _lock_only(tmp_path)
    os.close(second._exp_lock_fd)
