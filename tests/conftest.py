"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (the capability FasterTransformer lacked — SURVEY.md
§4.3). Pallas kernels detect the CPU platform and run in interpreter mode.

Must run before any `import jax` in test modules, hence conftest.
"""

import os

# The session environment pins JAX_PLATFORMS to the TPU tunnel ("axon");
# tests must run on CPU regardless, so override unless FLEXQ_TEST_TPU=1 asks
# for an on-device run.
if os.environ.get("FLEXQ_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The axon sitecustomize registers the TPU backend programmatically,
    # which overrides the env var — force the config back to CPU.
    import jax

    jax.config.update("jax_platforms", "cpu")

    # Persistent XLA compilation cache: the suite's wall time is dominated
    # by shard_map/while_loop compiles on this 2-core box; a warm cache
    # turns repeat runs from ~30 min into minutes. Repo-local, gitignored.
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             ".jax_compile_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
