"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware, per the multi-chip dry-run contract. Must run before
jax is imported anywhere.

Set KREP_TPU_TEST_TPU=1 to run the suite against the real TPU backend
instead (compiled SWAR kernels; slower — use for per-round validation that
Mosaic-compiled kernels match the interpret-mode semantics)."""

import os

# Strict mode: fast-path fallbacks (regex device filter, fork pool) become
# hard failures in tests so a broken fast path can never hide behind the
# plain engine (engine/regex_engine._strict).
os.environ.setdefault("KREP_TPU_STRICT", "1")

# Host-route break-even OFF by default in the suite: production routes
# sub-break-even inputs to the native host scan (ops/hostscan.py), which
# would otherwise swallow every small-text test and erase device-path
# coverage. test_hostscan.py re-runs the parity corners with the route
# forced ON (monkeypatch KREP_TPU_HOST_BREAKEVEN).
os.environ.setdefault("KREP_TPU_HOST_BREAKEVEN", "0")

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


# XLA:CPU segfaults deterministically in backend_compile_and_load after a
# few hundred accumulated compiled executables (reproduced 3x at the same
# test in full-suite runs; any half-suite passes, RSS stays ~3 GB — an
# upstream JIT-state bug, not OOM). Dropping the compiled-program caches at
# module boundaries keeps the process under the threshold. CPU runs only —
# TPU runs are fine and benefit from cross-module cache reuse.
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow_big: multi-GiB end-to-end streaming tests"
    )


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    if os.environ.get("KREP_TPU_TEST_TPU") != "1":
        import jax

        jax.clear_caches()
