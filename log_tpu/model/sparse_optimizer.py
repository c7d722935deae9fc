"""Sparse per-point Adam over capacity-padded moment arrays.

The reference (LoG/model/sparse_optimizer.py:121-248) keeps Adam moments for
every point and each step gathers the visible subset, runs Adam, and scatters
back — with optional CPU offload of moments past 50M/100M points. Here the
moments live in TPU HBM as capacity-padded arrays (sharded over the point axis
in multi-chip mode; see log_tpu.parallel) and the gather→update→scatter runs
inside the fused train step jit: padding lanes carry an out-of-range index so
their scatters are dropped. The 50M/100M CPU spill becomes unnecessary on a
sharded HBM pool but host offload remains available via
`SparseOptimizerState.to_host` as a capacity fallback.

Adam math matches `_single_tensor_adam` (LoG/model/sparse_optimizer.py:41-78):
global-step bias correction, eps=1e-15 added after sqrt, beta=(0.9, 0.999).
LR schedule is the Plenoxels log-lerp (sparse_optimizer.py:6-39).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: float = 0,
    lr_delay_mult: float = 1.0,
    max_steps: float = 1_000_000,
):
    """Log-linear LR decay (jnp-traceable; LoG/model/sparse_optimizer.py:24-38)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


def adam_slice_update(
    param,
    grad,
    exp_avg,
    exp_avg_sq,
    global_step,
    lr,
    eps: float = 1e-15,
    beta1: float = 0.9,
    beta2: float = 0.999,
    max_exp_avg_sq=None,
):
    """One Adam step on a gathered slice. All args (K, ...) arrays.

    Returns (param, exp_avg, exp_avg_sq, max_exp_avg_sq)."""
    exp_avg = beta1 * exp_avg + (1 - beta1) * grad
    exp_avg_sq = beta2 * exp_avg_sq + (1 - beta2) * grad * grad
    step = jnp.asarray(global_step, jnp.float32)
    bias_c1 = 1 - beta1**step
    bias_c2 = 1 - beta2**step
    step_size = lr / bias_c1
    if max_exp_avg_sq is not None:
        max_exp_avg_sq = jnp.maximum(max_exp_avg_sq, exp_avg_sq)
        denom = jnp.sqrt(max_exp_avg_sq) / jnp.sqrt(bias_c2) + eps
    else:
        denom = jnp.sqrt(exp_avg_sq) / jnp.sqrt(bias_c2) + eps
    param = param - step_size * (exp_avg / denom)
    return param, exp_avg, exp_avg_sq, max_exp_avg_sq


def dense_adam_step(params, moments, grads, update_mask, global_step, lrs,
                    eps: float = 1e-15):
    """Adam over the FULL capacity axis with a per-row update mask — the
    identity fast path for steps whose slice bucket covers the whole
    capacity (init stage: k_leaf == cap, index == arange). Numerically
    identical to sparse_adam_step at identity index: masked rows keep
    params AND moments (the sparse path's sentinel-index scatters drop
    them), but the 3 capacity-sized gathers + 3 scatters disappear
    (~35 ms of the 43 ms optimizer tail at K = cap = 131k;
    scripts/bench_trainstep_dissect.py, round 5). Per-key elementwise —
    XLA fuses the chain, no concat copies needed."""
    keys = [k for k, g in grads.items() if g is not None and k in lrs]
    new_params = dict(params)
    new_m1 = dict(moments["exp_avg"])
    new_m2 = dict(moments["exp_avg_sq"])
    for k in keys:
        g = grads[k]
        m1 = moments["exp_avg"][k]
        m2 = moments["exp_avg_sq"][k]
        p, m1_u, m2_u, _ = adam_slice_update(
            params[k], g, m1, m2, global_step,
            jnp.asarray(lrs[k], jnp.float32), eps=eps,
        )
        mask = update_mask.reshape(
            (update_mask.shape[0],) + (1,) * (params[k].ndim - 1)
        )
        new_params[k] = jnp.where(mask, p, params[k])
        new_m1[k] = jnp.where(mask, m1_u, m1)
        new_m2[k] = jnp.where(mask, m2_u, m2)
    return new_params, {"exp_avg": new_m1, "exp_avg_sq": new_m2}


def sparse_adam_step(
    params: dict,
    moments: dict,
    grads: dict,
    index: jax.Array,
    update_mask: jax.Array,
    global_step,
    lrs: dict,
    eps: float = 1e-15,
    spilled: tuple = (),
    m_slices: dict | None = None,
):
    """Gather -> Adam -> scatter over the big arrays; pure function.

    params/moments: capacity-padded dicts; moments has 'exp_avg'/'exp_avg_sq'
      sub-dicts keyed like params.
    grads: (K, ...) gradients of the gathered slice (zeros for non-updated).
    index: (K,) global row per slice lane; masked lanes must hold an
      out-of-range sentinel so their scatters drop.
    update_mask: (K,) bool — e.g. `radii > 0` (the reference's flag_vis;
      LoG/model/level_of_gaussian.py:379-392).
    Returns (new_params, new_moments).

    spilled/m_slices: host moment offload (the reference's 50M/100M-point
    CPU spill, LoG/model/splitter.py:198-204). For each moment kind in
    `spilled` ('exp_avg'/'exp_avg_sq') the capacity array is NOT in HBM;
    the caller passes the pre-gathered (K, ...) per-key slices in
    m_slices[kind] and receives the updated slices back (third return
    value) to scatter host-side. Masked lanes' returned slices carry the
    GATHERED (unchanged) values so a blanket host scatter is a no-op for
    them.
    """
    sentinel = params[next(iter(params))].shape[0]
    idx = jnp.where(update_mask, index, sentinel)
    keys = [k for k, g in grads.items() if g is not None and k in lrs]
    cap = sentinel
    K = index.shape[0]
    if not spilled and K <= cap // 16:
        # small-bucket branch (tree stage: k << cap): per-key gather ->
        # Adam -> scatter, NO concatenation. The packed-cat form below
        # materializes (cap, 23) copies of params AND both moments —
        # ~130 ms of pure HBM copies at 12.58M capacity (round-5
        # dissection) — while per-key gathers/scatters cost ~K rows and
        # the donated capacity arrays update in place.
        new_params = dict(params)
        new_m1 = dict(moments["exp_avg"])
        new_m2 = dict(moments["exp_avg_sq"])
        for k in keys:
            shape = params[k].shape
            # gather/scatter on 2-D views only: a 3-D (cap, 3, 3) scatter
            # operand forces a (4, 128)-tiled layout copy — 25.7 GB at
            # 12.58M capacity (OOM); (cap, 9) keeps the plain layout
            p2 = params[k].reshape(cap, -1)
            m1_2 = moments["exp_avg"][k].reshape(cap, -1)
            m2_2 = moments["exp_avg_sq"][k].reshape(cap, -1)
            p_sl = p2.at[idx].get(mode="fill", fill_value=0.0)
            m1_sl = m1_2.at[idx].get(mode="fill", fill_value=0.0)
            m2_sl = m2_2.at[idx].get(mode="fill", fill_value=0.0)
            p_u, m1_u, m2_u, _ = adam_slice_update(
                p_sl, grads[k].reshape(K, -1), m1_sl, m2_sl, global_step,
                jnp.asarray(lrs[k], jnp.float32), eps=eps,
            )
            new_params[k] = p2.at[idx].set(p_u, mode="drop").reshape(shape)
            new_m1[k] = m1_2.at[idx].set(m1_u, mode="drop").reshape(shape)
            new_m2[k] = m2_2.at[idx].set(m2_u, mode="drop").reshape(shape)
        return new_params, {"exp_avg": new_m1, "exp_avg_sq": new_m2}
    # Pack every key's columns into ONE (cap, sum_dims) array so the step
    # issues 3 gathers + 3 scatters total instead of 5 per key (XLA TPU
    # serializes each gather/scatter; measured 25 -> ~6 ms at K=100k). The
    # per-key LR becomes a per-column vector; the Adam math is unchanged.
    shapes = {k: params[k].shape[1:] for k in keys}
    dims = [int(np.prod(shapes[k])) for k in keys]
    splits = np.cumsum(dims)[:-1].tolist()

    def flat(a):
        return a.reshape(a.shape[0], -1)

    p_cat = jnp.concatenate([flat(params[k]) for k in keys], axis=1)
    g_cat = jnp.concatenate([flat(grads[k]) for k in keys], axis=1)
    lr_cols = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(lrs[k], jnp.float32), (d,))
         for k, d in zip(keys, dims)]
    )

    def moment_slice(kind):
        if kind in spilled:
            return None, jnp.concatenate(
                [flat(m_slices[kind][k]) for k in keys], axis=1
            )
        cat = jnp.concatenate(
            [flat(moments[kind][k]) for k in keys], axis=1
        )
        return cat, cat.at[idx].get(mode="fill", fill_value=0.0)

    m1_cat, m1 = moment_slice("exp_avg")
    m2_cat, m2 = moment_slice("exp_avg_sq")
    p = p_cat.at[idx].get(mode="fill", fill_value=0.0)
    p, m1_u, m2_u, _ = adam_slice_update(
        p, g_cat, m1, m2, global_step, lr_cols[None, :], eps=eps
    )
    # masked lanes keep gathered values so a blanket host scatter is a no-op
    m1_n = jnp.where(update_mask[:, None], m1_u, m1)
    m2_n = jnp.where(update_mask[:, None], m2_u, m2)
    p_cat = p_cat.at[idx].set(p, mode="drop")
    if m1_cat is not None:
        m1_cat = m1_cat.at[idx].set(m1_u, mode="drop")
    if m2_cat is not None:
        m2_cat = m2_cat.at[idx].set(m2_u, mode="drop")

    def unflatten(cat):
        parts = jnp.split(cat, splits, axis=1)
        return {
            k: parts[i].reshape((cat.shape[0],) + shapes[k])
            for i, k in enumerate(keys)
        }

    new_params = dict(params)
    new_params.update(unflatten(p_cat))
    new_moments = {"exp_avg": dict(moments["exp_avg"]),
                   "exp_avg_sq": dict(moments["exp_avg_sq"])}
    out_slices = {}
    for kind, cat, sl in (
        ("exp_avg", m1_cat, m1_n), ("exp_avg_sq", m2_cat, m2_n)
    ):
        if kind in spilled:
            out_slices[kind] = unflatten(sl)
        else:
            new_moments[kind].update(unflatten(cat))
    if spilled:
        return new_params, new_moments, out_slices
    return new_params, new_moments


class SparseOptimizer:
    """Host container: moments + LR schedule config.

    Mirrors LoG/model/sparse_optimizer.py:121-162 (xyz/scaling scheduled,
    per-key constant LRs otherwise, xyz scaled by xyz_scale).
    """

    def __init__(self, optimize_keys, lr_dict, model, xyz_scale=None,
                 spill_points=50_000_000, spill_points_full=100_000_000):
        self.optimize_keys = list(optimize_keys)
        self.lr_dict = dict(lr_dict)
        self.global_steps = 0
        self.xyz_scale = xyz_scale if xyz_scale is not None else 1.0
        self.max_steps = int(lr_dict.get("max_steps", 1_000_000))
        self.xyz_lr = self.lr_dict.get("xyz", 0.0) * self.xyz_scale
        # automatic host offload thresholds (reference: exp_avg_sq past 50M
        # points, exp_avg too past 100M — LoG/model/splitter.py:198-204).
        # Near the HBM ceiling training degrades to a two-phase step with
        # host-resident moments instead of OOMing.
        self.spill_points = int(lr_dict.get("spill_points", spill_points))
        self.spill_points_full = int(
            lr_dict.get("spill_points_full", spill_points_full)
        )
        self.spilled: tuple = ()
        cap = model.capacity
        self.moments = {
            "exp_avg": {},
            "exp_avg_sq": {},
        }
        for key in self.optimize_keys:
            if key not in model.keys:
                continue
            shape = model.get(key).shape
            for mk in ("exp_avg", "exp_avg_sq"):
                self.moments[mk][key] = jnp.zeros(shape, jnp.float32)
        print(
            f"[{self.__class__.__name__}] xyz_scale: {self.xyz_scale}, "
            f"steps: {self.max_steps}, lr "
            f"{self.lr_dict.get('xyz', 0) * self.xyz_scale}->"
            f"{self.lr_dict.get('xyz_final', self.lr_dict.get('xyz', 0) * 0.01) * self.xyz_scale}"
        )

    def lrs_for_step(self, step) -> dict:
        """Per-key LR dict for a (possibly traced) global step."""
        lrs = {}
        for key in self.optimize_keys:
            if key == "xyz":
                lrs[key] = expon_lr(
                    step,
                    self.lr_dict["xyz"] * self.xyz_scale,
                    self.lr_dict.get("xyz_final", self.lr_dict["xyz"] * 0.01)
                    * self.xyz_scale,
                    max_steps=self.max_steps,
                )
            elif key == "scaling" and "scaling" in self.lr_dict:
                lrs[key] = expon_lr(
                    step,
                    self.lr_dict["scaling"],
                    self.lr_dict.get("scaling_final", self.lr_dict["scaling"]),
                    max_steps=self.max_steps,
                )
            elif key in self.lr_dict:
                lrs[key] = jnp.asarray(self.lr_dict[key], jnp.float32)
        return lrs

    # ---------------------------------------------------------- host moves
    def to_host(self, keys=("exp_avg_sq",)) -> None:
        """Move moment kinds to host numpy and free their HBM
        (mirrors splitter.py:198-204). The training step then runs in
        spill mode: host gather -> device Adam on slices -> host scatter."""
        self.host_moments = getattr(self, "host_moments", {})
        for mk in keys:
            if mk in self.spilled:
                continue
            self.host_moments[mk] = {
                # np.array: asarray of a device buffer is a READ-ONLY view
                k: np.array(v) for k, v in self.moments[mk].items()
            }
            self.moments[mk] = {}  # free HBM
            self.spilled = tuple(sorted(set(self.spilled) | {mk}))

    def maybe_spill(self, num_points: int) -> bool:
        """Auto-spill hook: call after capacity growth (densify). Returns
        True if a spill happened this call."""
        did = False
        if num_points > self.spill_points and "exp_avg_sq" not in self.spilled:
            print(f"[{self.__class__.__name__}] {num_points} points > "
                  f"{self.spill_points}: spilling exp_avg_sq to host")
            self.to_host(("exp_avg_sq",))
            did = True
        if (num_points > self.spill_points_full
                and "exp_avg" not in self.spilled):
            print(f"[{self.__class__.__name__}] {num_points} points > "
                  f"{self.spill_points_full}: spilling exp_avg to host")
            self.to_host(("exp_avg",))
            did = True
        return did

    def host_gather(self, index: np.ndarray) -> dict:
        """Gather (K, ...) moment slices for every spilled kind. Out-of-
        range sentinel lanes read row 0 (their updates are masked)."""
        out = {}
        for mk in self.spilled:
            rows = {}
            for k, arr in self.host_moments[mk].items():
                idx = np.clip(index, 0, arr.shape[0] - 1)
                rows[k] = jnp.asarray(arr[idx])
            out[mk] = rows
        return out

    def host_scatter(self, index: np.ndarray, slices: dict,
                     mask: np.ndarray) -> None:
        """Write updated (K, ...) slices back into the host arrays where
        mask is True."""
        sel = np.asarray(mask, bool)
        idx = np.asarray(index)[sel]
        for mk, rows in slices.items():
            for k, sl in rows.items():
                self.host_moments[mk][k][idx] = np.asarray(sl)[sel]

    def set_numpy(self, moments: dict, capacity: int) -> None:
        from .gaussian import pad_rows

        for mk in ("exp_avg", "exp_avg_sq"):
            for key, val in moments.get(mk, {}).items():
                padded = pad_rows(np.asarray(val), capacity)
                if mk in self.spilled:
                    self.host_moments[mk][key] = np.array(padded)
                else:
                    self.moments[mk][key] = jnp.asarray(padded)

    def to_numpy(self, num_points: int) -> dict:
        out = {}
        for mk in ("exp_avg", "exp_avg_sq"):
            src = (
                self.host_moments[mk] if mk in self.spilled
                else self.moments[mk]
            )
            out[mk] = {k: np.asarray(v)[:num_points] for k, v in src.items()}
        return out
