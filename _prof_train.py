import time
import numpy as np, jax
from log_tpu.dataset.synthetic import SyntheticDataset
from log_tpu.model.level_of_gaussian import LoG
import sys
sys.path.insert(0, 'tests')
from test_train_smoke import MODEL_CFG

N = 100_000; H, W = 1088, 1920
ds = SyntheticDataset(n_gaussians=64, n_views=4, H=H, W=W, seed=0)
rng = np.random.default_rng(0)
pc = {"xyz": rng.normal(0, 2.0, (N, 3)).astype(np.float32) + np.array([0, 0, 0], np.float32),
      "colors": rng.random((N, 3)).astype(np.float32)}
model = LoG(**dict(MODEL_CFG))
scales = np.full(N, 0.02, np.float32)
model.gaussian.register_by_pointcloud(pc["xyz"], pc["colors"], scales, init_opacity=0.5)
model.counter.reset(model.num_points, model.capacity)
model.base_iter = 10
model.training_setup()

bg = ds.background
item = ds[0]; cam = item["camera"]
gt = (item["image"].transpose(2, 0, 1) * 255).astype(np.uint8)

# warm up both paths
model.prepare_from_camera(cam)
m, aux = model.train_step(cam, gt, bg, view_index=0)
float(m["loss"])
for _ in range(2):
    m = model.training_iteration(cam, gt, bg, view_index=0)
    m = m[0] if isinstance(m, tuple) else m
float(m["loss"])

n = 10
t0 = time.perf_counter()
for _ in range(n):
    m = model.training_iteration(cam, gt, bg, view_index=0)
    m = m[0] if isinstance(m, tuple) else m
float(m["loss"])
dt = (time.perf_counter() - t0) / n * 1000
print("merged training_iteration @1080p/100k: %.1f ms  (%.2f steps/s)" % (dt, 1000/dt))

t0 = time.perf_counter()
for _ in range(n):
    model.prepare_from_camera(cam)
    m, aux = model.train_step(cam, gt, bg, view_index=0)
float(m["loss"])
dt2 = (time.perf_counter() - t0) / n * 1000
print("two-phase prepare+train: %.1f ms" % dt2)

import jax.numpy as jnp
# upload cost of gt alone
t0 = time.perf_counter()
for _ in range(n):
    g = jnp.asarray(gt)
float(jnp.sum(g))
print("gt upload 25MB: %.1f ms" % ((time.perf_counter()-t0)/n*1000))

# device-resident gt + camera: does the step get cheaper?
gt_dev = jnp.asarray(gt)
t0 = time.perf_counter()
for _ in range(n):
    m = model.training_iteration(cam, gt_dev, bg, view_index=0)
    m = m[0] if isinstance(m, tuple) else m
float(m["loss"])
print("merged step, device gt: %.1f ms" % ((time.perf_counter()-t0)/n*1000))
