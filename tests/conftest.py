"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware, per the multi-chip dry-run contract. Must run before
jax is imported anywhere.

Set KREP_TPU_TEST_TPU=1 to run the suite against the real TPU backend
instead (compiled SWAR kernels; slower — use for per-round validation that
Mosaic-compiled kernels match the interpret-mode semantics)."""

import os

if os.environ.get("KREP_TPU_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("KREP_TPU_BACKEND", "xla")

    # The session env pins JAX_PLATFORMS=axon (real TPU tunnel); the config
    # update is what actually wins over that for the test process.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
