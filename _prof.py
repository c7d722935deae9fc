import time, math
import numpy as np, jax, jax.numpy as jnp
from log_tpu.dataset.base import prepare_camera
from log_tpu.dataset.synthetic import random_gaussians, ring_cameras
from log_tpu.ops.projection import project_gaussians
from log_tpu.ops import rasterize_tiled as rt

N = 100_000; H, W = 1088, 1920; A = 1 << 20
rng = np.random.default_rng(0)
scene = random_gaussians(N, rng, extent=2.0, scale_range=(0.005, 0.03))
dev = {k: jnp.asarray(v) for k, v in scene.items()}
zeros2 = jnp.zeros((N, 2), jnp.float32)
bg = jnp.zeros(3, jnp.float32)
cam = ring_cameras(3, H, W, radius=5.0)[2]
pc = prepare_camera(cam, 1, 0.01, 100.0)
tfx = math.tan(pc["FoVx"]*0.5); tfy = math.tan(pc["FoVy"]*0.5)
wv = jnp.asarray(pc["world_view_transform"]); fp = jnp.asarray(pc["full_proj_transform"])
fx = W/(2*tfx); fy = H/(2*tfy)

def proj(wv, fp):
    return project_gaussians(dev["xyz"], dev["scaling"], dev["rotation"], dev["opacity"],
        wv, fp, fx, fy, tfx, tfy, H, W, means2d_offset=zeros2)

@jax.jit
def stage_proj(wv, fp):
    s = proj(wv, fp)
    return jnp.sum(s.pix_xy) + jnp.sum(s.conic) + jnp.sum(s.depth)

@jax.jit
def stage_pairs(wv, fp):
    s = proj(wv, fp)
    pr = rt.build_pairs(s, dev["colors"], H, W, A)
    w = jnp.arange(pr["pair_data"].shape[1], dtype=jnp.float32)
    return jnp.sum(pr["pair_data"][0] * w) + jnp.sum(pr["tile_start"]) + jnp.sum(pr["pair_gid"])

@jax.jit
def stage_full(wv, fp):
    out = rt.rasterize_tiled(dev["xyz"], dev["colors"], dev["opacity"], dev["scaling"],
        dev["rotation"], zeros2, wv, fp, fx, fy, tfx, tfy, bg, H, W,
        max_pairs=A, with_stats=False, interpret=False)
    return jnp.sum(out["render"])

@jax.jit
def stage_full_stats(wv, fp):
    out = rt.rasterize_tiled(dev["xyz"], dev["colors"], dev["opacity"], dev["scaling"],
        dev["rotation"], zeros2, wv, fp, fx, fy, tfx, tfy, bg, H, W,
        max_pairs=A, with_stats=True, interpret=False)
    return jnp.sum(out["render"]) + jnp.sum(out["point_weight"]) + jnp.sum(out["point_id_pixel"])

@jax.jit
def noop(x): return x + 1

def t(f, *a, n=20):
    float(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    float(r)
    return (time.perf_counter()-t0)/n*1000

rtt = t(noop, jnp.float32(1.0)) 
print("rtt/20           %.2f ms" % rtt)
print("proj             %.2f ms" % (t(stage_proj, wv, fp)-rtt))
print("proj+pairs       %.2f ms" % (t(stage_pairs, wv, fp)-rtt))
print("full render      %.2f ms" % (t(stage_full, wv, fp)-rtt))
print("full with stats  %.2f ms" % (t(stage_full_stats, wv, fp)-rtt))
