"""Reference-binary oracle.

Builds the reference krep (sources at /root/reference, read-only) into a
/tmp scratch dir and shells out to it, so every semantic corner is asserted
against the real thing rather than our reading of it.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from pathlib import Path

REFERENCE = Path("/root/reference")
ORACLE_DIR = Path("/tmp/krep_oracle_build")
ORACLE_BIN = ORACLE_DIR / "krep"


def ensure_oracle() -> Path | None:
    """Build (once) and return the oracle binary path, or None if the
    reference tree isn't available (tests then skip)."""
    if ORACLE_BIN.exists():
        return ORACLE_BIN
    if not REFERENCE.exists():
        return None
    ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    for name in ("krep.c", "krep.h", "aho_corasick.c", "aho_corasick.h", "Makefile"):
        shutil.copy(REFERENCE / name, ORACLE_DIR / name)
    try:
        subprocess.run(
            ["make", "-s", "krep"], cwd=ORACLE_DIR, check=True,
            capture_output=True, timeout=300,
        )
    except subprocess.CalledProcessError:
        subprocess.run(["make"], cwd=ORACLE_DIR, check=True, capture_output=True)
    return ORACLE_BIN if ORACLE_BIN.exists() else None


def run(args: list[str], stdin: bytes | None = None):
    """Run the oracle; returns (stdout_bytes, returncode)."""
    bin_ = ensure_oracle()
    assert bin_ is not None, "reference oracle unavailable"
    p = subprocess.run(
        [str(bin_), *args], input=stdin, capture_output=True, timeout=120
    )
    return p.stdout, p.returncode


def run_full(args: list[str], stdin: bytes | None = None, timeout: int = 30):
    """Run the oracle; returns (stdout, stderr, returncode). Shorter default
    timeout than run(): validation-error cases return immediately, and some
    degenerate inputs hang the reference (KNOWN_DIVERGENCES), so callers
    probing error paths must not stall the suite."""
    bin_ = ensure_oracle()
    assert bin_ is not None, "reference oracle unavailable"
    p = subprocess.run(
        [str(bin_), *args], input=stdin, capture_output=True, timeout=timeout
    )
    return p.stdout, p.stderr, p.returncode


def run_on_text(text: bytes, args: list[str]):
    """Write text to a temp file and search it; returns (stdout, rc)."""
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return run([*args, path])
    finally:
        os.unlink(path)


def count_from_output(stdout: bytes) -> int:
    """Parse `file:N` count output."""
    line = stdout.strip().split(b"\n")[-1]
    return int(line.rsplit(b":", 1)[-1]) if line else 0
