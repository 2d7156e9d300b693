"""Pattern-validation parity with the reference on EVERY target kind.

The reference validates literal pattern sets at *search entry*, not in the
CLI: search_file runs the checks for every target including stdin with a
"krep: <target>: " message prefix (krep.c:2298-2322), and search_string runs
them for -s with a bare "Error: ..." message (krep.c:2030-2047). The CLI
layer itself caps pattern accumulation (-e at krep.c:3644-3657, -s at
3548-3568, -f's fgets loop at 3571-3626). Round-3 adversarial probing found
our checks lived only on the file-target CLI branch; these tests pin every
divergent surface against the oracle binary.
"""

import io
import sys

import pytest

import oracle

from krep_tpu import cli

pytestmark = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)

EMPTY_MULTI = b"Error: Empty pattern provided for literal search with multiple patterns.\n"


def ours(argv, stdin_bytes: bytes | None = None):
    """Run our CLI in-process, capturing (stdout, stderr, rc)."""
    out = io.BytesIO()
    err = io.StringIO()
    old_err, old_stdin = sys.stderr, sys.stdin
    sys.stderr = err
    if stdin_bytes is not None:
        class _S:
            buffer = io.BytesIO(stdin_bytes)
        sys.stdin = _S()
    try:
        rc = cli.main(argv, out=out)
    finally:
        sys.stderr, sys.stdin = old_err, old_stdin
    return out.getvalue(), err.getvalue().encode(), rc


def assert_parity(argv, stdin_bytes=None, path=None, check_stdout=True,
                  sort_stderr=False):
    """Byte-diff (stdout, stderr, rc) of our CLI vs the oracle binary."""
    got_out, got_err, got_rc = ours(list(argv), stdin_bytes)
    want_out, want_err, want_rc = oracle.run_full(list(argv), stdin_bytes)
    if path is not None:
        got_err = got_err.replace(path.encode(), b"F")
        want_err = want_err.replace(path.encode(), b"F")
        got_out = got_out.replace(path.encode(), b"F")
        want_out = want_out.replace(path.encode(), b"F")
    if sort_stderr:
        got_err = b"\n".join(sorted(got_err.splitlines()))
        want_err = b"\n".join(sorted(want_err.splitlines()))
    assert got_err == want_err, argv
    if check_stdout:
        assert got_out == want_out, argv
    assert got_rc == want_rc, argv


# --- empty pattern inside a multi-pattern literal set (the round-3 bug) ---

def test_empty_multi_file_target(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"the cat\n")
    assert_parity(["-e", "", "-e", "cat", str(p)], path=str(p))


def test_empty_multi_stdin():
    assert_parity(["-e", "", "-e", "cat"], stdin_bytes=b"the cat\n")


def test_empty_multi_string_mode():
    # -s adds its own pattern, so -e "" makes it a multi-pattern set; the
    # search_string message has no "krep: target:" prefix (krep.c:2038)
    assert_parity(["-e", "", "-s", "cat", "the cat"])
    assert_parity(["-e", "", "-e", "cat", "-s", "x", "the cat"])


def test_empty_multi_from_pattern_sources(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"the cat\n")
    # -f skips empty lines, so the empty pattern must come via -e
    assert_parity(["-e", "cat", "-e", "", str(p)], path=str(p))


def test_empty_multi_validated_before_file_open(tmp_path):
    # validation runs before the file is even opened (krep.c:2298 precedes
    # the open/mmap at 2625): a nonexistent file still gets the pattern error
    missing = str(tmp_path / "nonexistent.txt")
    assert_parity(["-e", "", "-e", "cat", missing], path=missing)


def test_single_empty_pattern_still_allowed(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"the cat\n")
    assert_parity(["-e", "", str(p)], path=str(p))
    assert_parity(["-e", ""], stdin_bytes=b"the cat\n")
    assert_parity(["-s", "", "the cat"])


def test_empty_multi_recursive(tmp_path):
    d = tmp_path / "tree"
    d.mkdir()
    (d / "a.txt").write_bytes(b"the cat\n")
    (d / "b.txt").write_bytes(b"dog\n")
    # per-file errors in readdir order differ; compare the sorted line sets
    # plus the trailing "Encountered N errors" summary (krep.c:3841-3846)
    assert_parity(
        ["-r", "-e", "", "-e", "cat", str(d)], path=str(d), sort_stderr=True
    )


# --- pattern length cap at search entry (krep.c:2313-2320, 2042-2047) ---

def test_pattern_too_long_file(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"aaa\n")
    assert_parity(["-e", "a" * 1025, str(p)], path=str(p))


def test_pattern_too_long_stdin():
    assert_parity(["-e", "a" * 1025], stdin_bytes=b"aaa\n")


def test_pattern_too_long_string_mode():
    assert_parity(["-s", "a" * 1025, "aaa"])


def test_pattern_exactly_1024_ok(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"a" * 2000 + b"\n")
    assert_parity(["-c", "-e", "a" * 1024, str(p)], path=str(p))


# --- CLI pattern-accumulation caps (krep.c:3552-3660) ---

def test_too_many_e_patterns(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"x\n")
    argv = []
    for i in range(1025):
        argv += ["-e", f"zz{i:04d}"]
    argv.append(str(p))
    assert_parity(argv, path=str(p))


def test_pattern_file_silent_cap(tmp_path):
    # -f stops reading at 1024 patterns with NO error (fgets loop condition,
    # krep.c:3591): 1030 patterns -> the last 6 are silently dropped
    pf = tmp_path / "pats.txt"
    pf.write_text("".join(f"zz{i:04d}\n" for i in range(1030)))
    body = tmp_path / "t.txt"
    body.write_bytes(b"zz1028 zz0005\n")
    assert_parity(["-c", "-f", str(pf), str(body)], path=str(body))


def test_pattern_file_fgets_line_splitting(tmp_path):
    # fgets reads at most 1023 bytes per call (char line[1024]): a 1500-byte
    # pattern line becomes TWO patterns of 1023 and 477 bytes (krep.c:3590)
    pf = tmp_path / "pats.txt"
    pf.write_bytes(b"a" * 1500 + b"\n")
    body = tmp_path / "t.txt"
    body.write_bytes(b"a" * 2000 + b"\n")
    assert_parity(["-c", "-f", str(pf), str(body)], path=str(body))


def test_pattern_file_nul_truncation(tmp_path):
    # strlen-based processing: a NUL inside a pattern line truncates it
    pf = tmp_path / "pats.txt"
    pf.write_bytes(b"ca\x00t\n")
    body = tmp_path / "t.txt"
    body.write_bytes(b"the ca cat\n")
    assert_parity(["-c", "-f", str(pf), str(body)], path=str(body))


def test_pattern_file_empty_checked_in_argv_order(tmp_path):
    # the "No patterns found" check runs when -f is PROCESSED, so a later
    # -e can't rescue it (krep.c:3619-3625) but an earlier one can
    pf = tmp_path / "empty.txt"
    pf.write_bytes(b"")
    body = tmp_path / "t.txt"
    body.write_bytes(b"the cat\n")
    assert_parity(["-f", str(pf), "-e", "the", str(body)], path=str(pf))
    assert_parity(["-e", "the", "-f", str(pf), str(body)],
                  path=str(body), check_stdout=False)


def test_pattern_file_cannot_open(tmp_path):
    missing = str(tmp_path / "nope.txt")
    body = tmp_path / "t.txt"
    body.write_bytes(b"x\n")
    assert_parity(["-f", missing, str(body)], path=missing)


def test_pattern_file_stdin_empty():
    assert_parity(["-f", "-", "t.txt"], stdin_bytes=b"\n\n")


# --- option-argument validation messages (krep.c:3655-3698) ---

def test_algo_unknown(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"cat\n")
    assert_parity(["--algo", "xyz", "cat", str(p)], path=str(p),
                  check_stdout=True)


def test_color_invalid(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"cat\n")
    # usage blocks differ by design; stderr message + rc must match
    assert_parity(["--color=bogus", "cat", str(p)], path=str(p),
                  check_stdout=False)


def test_s_missing_target():
    assert_parity(["-s", "pat"], check_stdout=False)


def test_s_with_r_rejected(tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    assert_parity(["-s", "pat", "-r", str(d)], path=str(d),
                  check_stdout=False)
