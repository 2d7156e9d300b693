"""In-process CLI runner capturing (stdout, stderr, rc) — shared by the
parity/fuzz suites. stderr capture matters: round-3's stdin/-s validation
bug was invisible to stdout-only diffing (the divergence was rc + stderr)."""

from __future__ import annotations

import io
import sys

from krep_tpu import cli


def run_cli(argv: list[str], stdin_bytes: bytes | None = None):
    """Run our CLI in-process; returns (stdout_bytes, stderr_bytes, rc)."""
    out = io.BytesIO()
    err = io.StringIO()
    old_err, old_stdin = sys.stderr, sys.stdin
    sys.stderr = err
    if stdin_bytes is not None:
        class _S:
            buffer = io.BytesIO(stdin_bytes)
        sys.stdin = _S()
    try:
        rc = cli.main(list(argv), out=out)
    finally:
        sys.stderr, sys.stdin = old_err, old_stdin
    return out.getvalue(), err.getvalue().encode(), rc
