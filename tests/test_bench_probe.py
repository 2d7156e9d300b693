"""Probe-cache recovery: bench.py must re-detect a recovered chip within
one invocation instead of inheriting a stale cached "bad" verdict
(VERDICT r3 item 9 — a bench run started during recovery used to emit a
CPU-tagged record while the chip was already back)."""

import os
import time


def _write_verdict(cache_dir, code, verdict, budget):
    import hashlib

    key = hashlib.sha1(
        (os.environ.get("JAX_PLATFORMS", "") + "\0" + code).encode()
    ).hexdigest()[:16]
    path = os.path.join(cache_dir, f"probe_{key}")
    with open(path, "w") as f:
        f.write(f"{verdict} {budget:.0f}")
    return path


def test_fresh_probe_ignores_cached_bad_verdict(tmp_path, monkeypatch):
    code = "print('ok')"  # a probe that always succeeds (the recovered chip)
    monkeypatch.setenv("KREP_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("KREP_TPU_PROBE_CODE", code)

    from krep_tpu.parallel.mesh import _default_backend_initializes

    cache = _write_verdict(str(tmp_path), code, "bad", 9999)
    # cached path: the bad verdict (huge budget, fresh mtime) binds
    assert _default_backend_initializes(1.0, 1, fresh=False) is False
    # bench path: fresh=True bypasses the cache and finds the chip back
    # (generous budget: the probe is a python subprocess whose startup
    # alone can exceed 5s when the host is loaded — this test asserts the
    # bypass logic, not probe latency)
    _write_verdict(str(tmp_path), code, "bad", 9999)
    assert _default_backend_initializes(60.0, 1, fresh=True) is True
    # ... and the fresh probe REFRESHES the cache so later CLI invocations
    # see the recovery too
    with open(cache) as f:
        assert f.read().split()[0] == "ok"


def test_fresh_probe_still_detects_real_outage(tmp_path, monkeypatch):
    monkeypatch.setenv("KREP_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("KREP_TPU_PROBE_CODE", "import time; time.sleep(600)")

    from krep_tpu.parallel.mesh import _default_backend_initializes

    t0 = time.time()
    assert _default_backend_initializes(1.0, 1, fresh=True) is False
    assert time.time() - t0 < 30  # bounded, no hang
