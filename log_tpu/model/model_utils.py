"""Dotted-path attribute access (LoG/model/model_utils.py:4-8)."""
from __future__ import annotations


def get_module_by_str(obj, path: str):
    cur = obj
    for part in path.split("."):
        if not hasattr(cur, part):
            return None
        cur = getattr(cur, part)
    return cur
