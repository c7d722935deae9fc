"""Interactive viewer — web equivalent of the reference's imgui/OpenGL GUI.

The reference GUI (apps/gui.py + LoG/utils/easyvolcap_utils.py) drives
renderer.vis per frame into an OpenGL quad; that stack needs a local display.
This serves the same loop over HTTP instead: a browser page with orbit/pan/
dolly controls requests /render?...; the server runs the model's LoD cut +
rasterizer per request and streams a JPEG.

Usage: python apps/viewer.py --cfg config/...yml ckptname <ckpt> [port 8008]
"""
from __future__ import annotations

import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PAGE = """<!doctype html>
<html><head><title>log_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:6px}
img{display:block;margin:auto}
</style></head><body>
<div id="hud">drag: orbit | shift-drag: pan | wheel: dolly | fps <span id="fps">-</span></div>
<img id="view" width="%W%" height="%H%"/>
<script>
let yaw=0, pitch=0.5, dist=4, cx=0, cy=0, cz=0, busy=false, t0=0;
const img=document.getElementById('view');
function refresh(){
  if(busy) return; busy=true; t0=performance.now();
  const u=`/render?yaw=${yaw}&pitch=${pitch}&dist=${dist}&cx=${cx}&cy=${cy}&cz=${cz}&_=${Math.random()}`;
  const pre=new Image();
  pre.onload=()=>{img.src=pre.src; busy=false;
    document.getElementById('fps').textContent=(1000/(performance.now()-t0)).toFixed(1);};
  pre.src=u;
}
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY,e.shiftKey];e.preventDefault()};
window.onmouseup=()=>{drag=null};
window.onmousemove=e=>{
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(drag[2]){cx-=dx*dist*0.002; cy+=dy*dist*0.002;}
  else {yaw-=dx*0.01; pitch=Math.min(1.5,Math.max(-1.5,pitch+dy*0.01));}
  drag=[e.clientX,e.clientY,drag[2]]; refresh();
};
window.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001); refresh();};
refresh(); setInterval(refresh, 250);
</script></body></html>"""


class ViewerState:
    def __init__(self, model, renderer, H, W, focal, center, znear, zfar):
        self.model = model
        self.renderer = renderer
        self.H, self.W = H, W
        self.focal = focal
        self.center = np.asarray(center, np.float64)
        self.znear, self.zfar = znear, zfar
        self.lock = threading.Lock()

    def camera(self, yaw, pitch, dist, offset):
        import math

        from log_tpu.dataset.base import prepare_camera

        eye = self.center + offset + dist * np.array(
            [
                math.cos(yaw) * math.cos(pitch),
                math.sin(yaw) * math.cos(pitch),
                math.sin(pitch),
            ]
        )
        fwd = (self.center + offset) - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        n = np.linalg.norm(right)
        right = right / (n if n > 1e-6 else 1.0)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=0)
        T = -R @ eye[:, None]
        K = np.array(
            [[self.focal, 0, self.W / 2], [0, self.focal, self.H / 2], [0, 0, 1]]
        )
        cam = {"K": K, "R": R, "T": T, "W": self.W, "H": self.H,
               "center": eye.reshape(3, 1)}
        return prepare_camera(cam, 1, self.znear, self.zfar)

    def render_jpeg(self, yaw, pitch, dist, offset):
        import cv2

        with self.lock:
            camera = self.camera(yaw, pitch, dist, offset)
            self.model.clear()
            self.model.prepare_from_camera(camera)
            out = self.renderer.render_one(
                self.model, camera, np.ones(3, np.float32)
            )
            bgr = self.renderer.tensor_to_bgr(out["render"])
        ok, buf = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, 85])
        return buf.tobytes()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            parsed = urlparse(self.path)
            if parsed.path == "/":
                body = (
                    PAGE.replace("%W%", str(state.W)).replace("%H%", str(state.H))
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif parsed.path == "/render":
                q = parse_qs(parsed.query)

                def f(name, default=0.0):
                    return float(q.get(name, [default])[0])

                jpeg = state.render_jpeg(
                    f("yaw"), f("pitch", 0.5), f("dist", 4.0),
                    np.array([f("cx"), f("cy"), f("cz")]),
                )
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.end_headers()
                self.wfile.write(jpeg)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main():
    from log_tpu.utils.command import load_statedict, update_global_variable
    from log_tpu.utils.config import Config, load_object

    args, cfg = Config.load_args(usage="viewer")
    cfg = update_global_variable(cfg, cfg)
    model = load_object(cfg.model.module, cfg.model.args)
    if "ckptname" in cfg:
        model.load_state_dict(load_statedict(cfg.ckptname))
    model.eval()
    model.set_state(enable_sh=True)
    renderer = load_object(cfg.train.render.module, cfg.train.render.args)
    renderer.split = "demo"
    vc = cfg.get("viewer", {})
    xyz = model.gaussian.to_numpy(["xyz"])["xyz"]
    center = vc.get("center", xyz.mean(axis=0).tolist())
    H = int(vc.get("H", 720))
    W = int(vc.get("W", 1280))
    state = ViewerState(
        model, renderer, H, W, focal=float(vc.get("focal", 1.2 * W)),
        center=center, znear=0.01, zfar=100.0,
    )
    port = int(cfg.get("port", 8008))
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"[viewer] serving on http://localhost:{port} ({model.num_points} pts)")
    server.serve_forever()


if __name__ == "__main__":
    main()
