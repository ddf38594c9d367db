"""Persistent XLA compilation cache — the TPU analogue of TRT's timing cache
and serialized engine file (reference: tensorrt_llm/builder.py:204-267).

The reference amortizes engine compilation by serializing the built engine to
disk; on TPU the equivalent is XLA's persistent compilation cache: the first
process pays the full compile, later processes deserialize the executable.
Call `enable_compile_cache()` once near program start (idempotent).
"""

from __future__ import annotations

import hashlib
import os

_enabled = False


def host_fingerprint() -> str:
    """Short hash identifying this host's CPU feature set + JAX version.

    XLA:CPU AOT executables embed target machine features (e.g.
    +prefer-no-gather); deserializing an executable compiled on a host with a
    different feature set can SIGILL. JAX's cache key does not cover host CPU
    features, so we partition the cache directory by them ourselves.
    """
    import jax

    parts = [jax.__version__]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags") or line.startswith("Features"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        import platform

        parts.append(platform.processor() or platform.machine())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache. Returns the cache dir.

    Priority: explicit arg > $TLLM_CACHE_DIR > <repo>/.jax_cache next to the
    package > ~/.cache/trtllm_llama_tpu. Safe to call multiple times.
    The directory is suffixed with a host fingerprint so executables AOT-
    compiled on a different machine (different CPU features) are never
    deserialized here (they can SIGILL — see host_fingerprint).
    """
    global _enabled
    import jax

    # Never persist-cache CPU executables: XLA:CPU AOT artifacts embed
    # LLVM-derived *tuning* features (+prefer-no-gather/scatter) chosen from
    # the CPU model, which /proc/cpuinfo fingerprinting cannot capture —
    # hosts with identical cpuinfo flag sets still produce incompatible
    # artifacts whose deserialization warns "could lead to SIGILL"
    # (cpu_aot_loader.cc:210). CPU is only the test/dryrun backend here;
    # the cache's value is the TPU bench/serve path, which keys correctly.
    if jax.default_backend() == "cpu" and not os.environ.get(
            "TLLM_CACHE_CPU"):
        return ""
    if cache_dir is None:
        cache_dir = os.environ.get("TLLM_CACHE_DIR")
    if cache_dir is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if os.access(pkg_root, os.W_OK):
            cache_dir = os.path.join(pkg_root, ".jax_cache")
        else:
            cache_dir = os.path.expanduser("~/.cache/trtllm_llama_tpu")
    cache_dir = os.path.join(cache_dir, host_fingerprint())
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache even small kernels: a 7B decode step is one huge executable,
        # but pallas/Mosaic sub-compiles and tiny shape-probe fns also add up
        # through the ~23ms-per-dispatch axon tunnel.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return cache_dir
