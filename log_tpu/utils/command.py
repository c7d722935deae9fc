"""CLI helpers: $var substitution, checkpoint loading, code snapshots.

Contract: LoG/utils/command.py.
"""
from __future__ import annotations

import fnmatch
import os
import pickle


def update_global_variable(global_var, cfg):
    """Replace '$name' string values from top-level cfg keys, recursively
    (LoG/utils/command.py:4-11)."""
    for key, val in cfg.items():
        if isinstance(val, dict):
            cfg[key] = update_global_variable(global_var, val)
        elif isinstance(val, str) and val.startswith("$"):
            print("[Config] replace key", val)
            cfg[key] = global_var[val[1:]]
    return cfg


def load_statedict(ckptname, map_location="cpu"):
    """Load a checkpoint: our pickle format OR a reference torch .pth.

    Torch zip archives start with 'PK'; our own checkpoints are plain pickle
    regardless of extension (the trainer mirrors the reference's .pth names;
    LoG/utils/trainer.py:429-443)."""
    with open(ckptname, "rb") as f:
        head = f.read(2)
    if head != b"PK":
        try:
            with open(ckptname, "rb") as f:
                statedict = pickle.load(f)
            if "state_dict" in statedict:
                statedict = statedict["state_dict"]
            return statedict
        except Exception:
            pass
    # torch serialization (reference checkpoints)
    import torch

    statedict = torch.load(ckptname, map_location=map_location, weights_only=False)
    if "state_dict" in statedict:
        statedict = statedict["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in statedict.items()}


def load_gitignore_rules(src_dir):
    rules = []
    try:
        with open(os.path.join(src_dir, ".gitignore"), "r") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    rules.append(line)
    except FileNotFoundError:
        pass
    return rules


def should_ignore(path, rules):
    return any(fnmatch.fnmatch(path, rule) for rule in rules)


def copy_files(src_dir, dst_dir):
    import shutil

    filenames = []
    rules = load_gitignore_rules(src_dir)
    for root, dirs, files in os.walk(src_dir, topdown=True):
        dirs[:] = [
            d
            for d in dirs
            if d not in [".git", "debug", "data", "cache", "output", "extension",
                         "submodules"]
        ]
        for name in files:
            file_path = os.path.join(root, name)
            rel_path = os.path.relpath(file_path, src_dir)
            if not should_ignore(rel_path, rules):
                dst_path = os.path.join(dst_dir, rel_path)
                os.makedirs(os.path.dirname(dst_path), exist_ok=True)
                shutil.copyfile(file_path, dst_path)
                filenames.append(file_path)
    return filenames


def copy_git_tracked_files(code_dir, output_base_dir):
    from datetime import datetime

    timestamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    output_dir = os.path.join(output_base_dir, f"code_backup_{timestamp}")
    os.makedirs(output_dir, exist_ok=True)
    filenames = copy_files(code_dir, output_dir)
    print(f">>> Code {len(filenames)} files has been copied to {output_dir}")
    return output_dir
