"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on `xla_force_host_platform_device_count=8`
CPU devices (the driver separately dry-runs the multichip path); the real-TPU
bench path is exercised by bench.py, not pytest.

Note: the environment's sitecustomize registers the axon TPU plugin and
forces JAX_PLATFORMS=axon, so we must override via jax.config *after* import
(env vars alone are ignored once register() has run).
"""

import os

# Keep tests hermetic: never read/write the persistent compile cache (it is
# the bench/TPU path's TRT-engine-file analogue; sharing it with CPU test
# executables risks cross-machine AOT feature mismatches).
os.environ["TLLM_NO_COMPILE_CACHE"] = "1"

if os.environ.get("TLLM_TPU_TESTS"):
    # Real-chip mode: run only the TPU-marked kernel tests —
    #   TLLM_TPU_TESTS=1 pytest tests/test_tpu_kernels.py -q
    # Mosaic-compiled behavior (alignment, bitcasts, scalar prefetch, DMA)
    # differs from interpret mode; this is the pre-bench regression canary.
    import jax  # noqa: E402
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
