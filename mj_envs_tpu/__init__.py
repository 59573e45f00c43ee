"""mj_envs_tpu — TPU-native vectorized physics + environments for the
Adroit hand-manipulation suite (hammer/door/pen/relocate-v0), built from
scratch on JAX/XLA (reference behavior spec: bilkitty/mj_envs, see
SURVEY.md)."""
import os as _os


def _host_fingerprint() -> str:
    """CPU fingerprint: XLA:CPU AOT executables are ISA- AND
    tuning-specific (LLVM sets model-dependent tune flags like
    prefer-no-scatter), and this repo's volume persists across sessions
    that land on different host machines — sharing one cache dir across
    them segfaulted on AOT load.  Hash the model name and the full flag
    set so any CPU change rolls the cache directory."""
    import hashlib
    sig = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    sig.append(line.strip())
                if len(sig) == 2:
                    break
    except OSError:
        import platform
        sig.append(platform.processor())
    return hashlib.md5("|".join(sorted(set(sig))).encode()).hexdigest()[:8]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — TPU processes only.

    On TPU the pipeline programs compile in tens of seconds and the
    cache makes bench/driver reruns near-instant; executables are
    chip-keyed and serialize safely.

    On XLA:CPU the persistent cache is a net LIABILITY on this class of
    host and is deliberately left off: three distinct native crash modes
    were reproduced across round-1/2 test runs — (a)
    `executable.serialize()` aborts the process on the largest
    executables (fused 200-step eval rollouts), (b) the AOT
    *deserializer* segfaults after ~100 loads in one process (see
    tests/test_step_parity._build_cached), and (c) after many
    serialize/deserialize cycles a later fresh compile segfaults inside
    backend_compile_and_load.  None are catchable from Python.  CPU
    runs (tests, parity harnesses) therefore recompile per process —
    slower but deterministic.  Set MJ_ENVS_TPU_CPU_CACHE=1 to opt back
    in on hosts where XLA:CPU serialization is sound."""
    import jax
    # Platform tag from the environment (NOT jax.default_backend(), which
    # would initialize backends at import time).
    backend = _os.environ.get("JAX_PLATFORMS", "").split(",")[0] or "auto"
    # 'auto' (JAX_PLATFORMS unset) is TPU only when the axon plugin's
    # activation vars are present; on a plain CPU host 'auto' resolves
    # to XLA:CPU and must NOT get the cache (the crash modes above).
    resolved = backend
    if backend in ("auto", ""):
        axon_active = any(k.startswith(("PALLAS_AXON", "AXON_"))
                          for k in _os.environ)
        resolved = "axon" if axon_active else "cpu"
    if resolved not in ("axon", "tpu") and \
            _os.environ.get("MJ_ENVS_TPU_CPU_CACHE", "0") != "1":
        return
    cache = path or _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache", f"{resolved}-{_host_fingerprint()}")
    _os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


if _os.environ.get("MJ_ENVS_TPU_CACHE", "1") != "0":
    try:
        enable_compilation_cache()
    except Exception:
        pass


def _force_f32_matmuls() -> None:
    """TPU default matmul precision is bf16, which corrupts the physics
    (measured: 1.6e-3 qpos divergence in 30 steps vs 6e-8 at 'highest';
    expert policies then fail or NaN).  Physics matmuls are tiny, so the
    'highest' MXU passes cost little; NN-heavy code can locally override
    with jax.default_matmul_precision(...) context managers."""
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")


if _os.environ.get("MJ_ENVS_TPU_BF16_MATMUL", "0") != "1":
    try:
        _force_f32_matmuls()
    except Exception:
        pass
