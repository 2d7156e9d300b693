"""KREP_TPU_PROFILE smoke test: the observability layer (SURVEY.md §5 —
the analogue of the reference's get_time() timing printouts) must emit
per-scan GB/s lines on stderr without perturbing stdout or the exit code.
Subprocess-driven because profiling.ENABLED is read at import time."""

import os
import subprocess
import sys
import tempfile


def test_profile_lines_on_stderr():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["KREP_TPU_PROFILE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(b"the cat\nthe dog\nno\n" * 100)
        path = f.name
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "krep_tpu.cli", "-c", "the", path],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert proc.stdout.strip() == f"{path}:200"
        assert "krep-tpu:" in proc.stderr and "GB/s" in proc.stderr
    finally:
        os.unlink(path)
