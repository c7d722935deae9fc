"""log_tpu: a TPU-native (JAX/XLA/Pallas) framework for training and real-time
rendering of urban-scale 3D Gaussian Splatting scenes, functionally equivalent
to zju3dv/LoG (Level of Gaussians)."""

__version__ = "0.1.0"

import os as _os


def _setup_platform_override() -> None:
    """LOG_TPU_PLATFORM=cpu forces the local CPU backend even when the
    environment pins jax to a remote TPU plugin (which wins over the
    JAX_PLATFORMS env var — only a config update overrides it)."""
    plat = _os.environ.get("LOG_TPU_PLATFORM")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_setup_platform_override()


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache: this framework leans on a small set
    of bucketed shapes, so caching compiles across processes/restarts is a
    large end-to-end win (set LOG_TPU_NO_CACHE=1 to disable)."""
    if _os.environ.get("LOG_TPU_NO_CACHE"):
        return
    try:
        import jax

        plat = (
            _os.environ.get("LOG_TPU_PLATFORM")
            or _os.environ.get("JAX_PLATFORMS", "default")
        )
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            f"/root/.cache/jax_comp_cache/{plat}",
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_setup_compilation_cache()
