"""Viewer smoke with random Gaussians — no data needed.

Contract: /root/reference/apps/check_gui.py:7-33 (random-Gaussian GUI check).
Starts the web viewer on a synthetic record; --oneshot renders one frame to
debug/ and exits (for CI).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from log_tpu.dataset.synthetic import random_gaussians
    from log_tpu.model.base_gaussian import BaseGaussian
    from log_tpu.render.renderer import NaiveRendererAndLoss

    rng = np.random.default_rng(0)
    scene = random_gaussians(2000, rng)
    model = BaseGaussian.create_from_record(scene, sh_degree=0)
    model.eval()
    renderer = NaiveRendererAndLoss(split="demo", background=(1.0, 1.0, 1.0))
    from apps.viewer import ViewerState, make_handler

    state = ViewerState(
        model, renderer, H=360, W=480, focal=500.0, center=(0, 0, 0),
        znear=0.01, zfar=100.0,
    )
    if "--oneshot" in sys.argv:
        jpeg = state.render_jpeg(0.3, 0.4, 4.0, np.zeros(3))
        os.makedirs("debug", exist_ok=True)
        with open("debug/check_viewer.jpg", "wb") as f:
            f.write(jpeg)
        print(f"wrote debug/check_viewer.jpg ({len(jpeg)} bytes)")
        return
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("0.0.0.0", 8008), make_handler(state))
    print("[check_viewer] http://localhost:8008")
    server.serve_forever()


if __name__ == "__main__":
    main()
