"""Interactive viewer entry point (name parity with the reference apps/gui.py,
which drives an imgui/OpenGL window). This environment is headless, so the
command launches the web viewer — same per-frame loop (camera -> LoD cut ->
rasterize) served over HTTP. See apps/viewer.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    from viewer import main

    main()
