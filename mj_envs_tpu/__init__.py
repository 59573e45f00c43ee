"""mj_envs_tpu — TPU-native vectorized physics + environments for the
Adroit hand-manipulation suite (hammer/door/pen/relocate-v0), built from
scratch on JAX/XLA (reference behavior spec: bilkitty/mj_envs, see
SURVEY.md)."""
import os as _os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (the pipeline programs are large;
    cold compiles run minutes on CPU XLA — cache makes reruns instant)."""
    import jax
    cache = path or _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache")
    _os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


if _os.environ.get("MJ_ENVS_TPU_CACHE", "1") != "0":
    try:
        enable_compilation_cache()
    except Exception:
        pass
