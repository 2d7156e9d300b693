"""Parity of the host fast path (ops/hostscan.py + native
krep_literal_scan) — the small-input regime where the device can never
win (reference: one open+read+scan with no launch overhead,
krep.c:3402-3430).

conftest.py pins KREP_TPU_HOST_BREAKEVEN=0 so the rest of the suite keeps
exercising the device path; every test here forces the route ON and
asserts three-way agreement: native host scan == naive oracle ==
reference binary (and, for the routing tests, == our own device path).
"""

from __future__ import annotations

import io
import os
import tempfile

import numpy as np
import pytest

import naive
import oracle
from krep_tpu import cli

hostscan = pytest.importorskip("krep_tpu.ops.hostscan")
native = pytest.importorskip("krep_tpu.native.runtime")

FORCE_ON = str(32 << 20)


@pytest.fixture(autouse=True)
def host_route(monkeypatch):
    """Force the host route for every test in this file (env beats the
    cached calibration, hostscan.threshold())."""
    monkeypatch.setenv("KREP_TPU_HOST_BREAKEVEN", FORCE_ON)
    yield


def ours(argv, stdin=None):
    out = io.BytesIO()
    if stdin is not None:
        import sys

        class _S:
            buffer = io.BytesIO(stdin)

        old = sys.stdin
        sys.stdin = _S()
        try:
            rc = cli.main(argv, out=out)
        finally:
            sys.stdin = old
    else:
        rc = cli.main(argv, out=out)
    return out.getvalue(), rc


# ---- kernel-level: native literal_scan vs the naive oracle ---------------

# SWAR ladder lengths + the >stack-buffer case (fp heap path at m>256)
PATTERN_LENS = [1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65, 257]


@pytest.mark.parametrize("case_sensitive", [True, False])
@pytest.mark.parametrize("whole_word", [True, False])
def test_literal_scan_matches_naive(case_sensitive, whole_word):
    rng = np.random.default_rng(7)
    text = naive.gen_corpus(3, 20_000, alphabet=b"abTHEt he_x\n ")
    for m in PATTERN_LENS:
        if m > len(text) // 2:
            continue
        # pull real substrings so matches actually occur
        off = int(rng.integers(0, len(text) - m))
        pat = text[off : off + m]
        if b"\x00" in pat:
            continue
        want = naive.all_starts(text, pat, case_sensitive, whole_word)
        cnt, starts = native.literal_scan(
            np.frombuffer(text, np.uint8), pat,
            not case_sensitive, whole_word, track_positions=True,
        )
        assert starts.tolist() == want, (m, case_sensitive, whole_word)
        assert cnt == len(want)
        # count-only agrees with tracked
        c2, none = native.literal_scan(
            np.frombuffer(text, np.uint8), pat,
            not case_sensitive, whole_word,
        )
        assert none is None and c2 == len(want)
        # -c line dedup
        lines, _ = native.literal_scan(
            np.frombuffer(text, np.uint8), pat,
            not case_sensitive, whole_word, count_lines=True,
        )
        assert lines == naive.matched_lines(text, want)


def test_literal_scan_edges():
    t = np.frombuffer(b"aaaa", np.uint8)
    assert native.literal_scan(t, b"aa", False, False)[0] == 3  # ALL overlap
    assert native.literal_scan(t, b"aaaaa", False, False)[0] == 0  # m > n
    assert native.literal_scan(np.zeros(0, np.uint8), b"a", False, False)[0] == 0
    # match at the very last position + whole-word at both text edges
    t2 = np.frombuffer(b"cat", np.uint8)
    cnt, s = native.literal_scan(t2, b"cat", False, True, track_positions=True)
    assert cnt == 1 and s.tolist() == [0]
    # NUL bytes in text are ordinary bytes
    t3 = np.frombuffer(b"a\x00b\x00a\x00b", np.uint8)
    cnt, s = native.literal_scan(t3, b"a\x00b", False, False, track_positions=True)
    assert s.tolist() == [0, 4]


def test_literal_scan_max_count_caps_counting_only():
    t = np.frombuffer(b"x x x x x x\nx x\n", np.uint8)
    cnt, _ = native.literal_scan(t, b"x", False, False, max_count=3)
    assert cnt == 3
    lines, _ = native.literal_scan(
        t, b"x", False, False, count_lines=True, max_count=1
    )
    assert lines == 1
    # tracked positions are never capped (caller caps after policy)
    cnt, s = native.literal_scan(
        t, b"x", False, False, track_positions=True, max_count=2
    )
    assert cnt == 8 and len(s) == 8


def test_batch_literal_counts_matches_per_slice():
    rng = np.random.default_rng(9)
    text = naive.gen_corpus(5, 30_000, alphabet=b"the fox\n")
    buf = np.frombuffer(text, np.uint8)
    cuts = np.sort(rng.choice(len(text), 7, replace=False))
    bounds = []
    prev = 0
    for c in list(cuts) + [len(text)]:
        bounds.append((prev, int(c)))
        prev = int(c)
    bounds = np.array(bounds, np.int64)
    for count_lines in (False, True):
        got = native.batch_literal_counts(
            buf, bounds, b"the", False, False, count_lines
        )
        for (s, e), g in zip(bounds.tolist(), got.tolist()):
            want, _ = native.literal_scan(
                buf[s:e], b"the", False, False, count_lines=count_lines
            )
            assert g == want, (s, e)


# ---- routing -------------------------------------------------------------


def test_route_small_logic(monkeypatch):
    monkeypatch.setenv("KREP_TPU_HOST_BREAKEVEN", "1000")
    assert hostscan.route_small(1000)
    assert not hostscan.route_small(1001)
    assert not hostscan.route_small(0)
    # K patterns multiply the host cost
    assert hostscan.route_small(250, k_patterns=4)
    assert not hostscan.route_small(251, k_patterns=4)
    monkeypatch.setenv("KREP_TPU_HOST_BREAKEVEN", "0")
    assert not hostscan.route_small(1)  # 0 disables the route


def test_host_and_device_paths_agree(monkeypatch, tmp_path):
    """Same invocation with the route ON vs OFF must be byte-identical —
    the two backends share the resolution stage but not the scan."""
    text = naive.gen_english(11, 40_000)
    p = tmp_path / "t.txt"
    p.write_bytes(text)
    for argv in (
        ["the", str(p)],
        ["-c", "the", str(p)],
        ["-o", "-i", "THE", str(p)],
        ["-w", "-c", "the", str(p)],
        ["-m", "5", "the", str(p)],
        ["-e", "the", "-e", "fox", "-o", str(p)],
        ["-e", "the", "-e", "fox", "-c", str(p)],
    ):
        monkeypatch.setenv("KREP_TPU_HOST_BREAKEVEN", FORCE_ON)
        host_out, host_rc = ours(argv)
        monkeypatch.setenv("KREP_TPU_HOST_BREAKEVEN", "0")
        dev_out, dev_rc = ours(argv)
        assert (host_out, host_rc) == (dev_out, dev_rc), argv


# ---- CLI-level parity vs the reference binary -----------------------------

pytestmark_oracle = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)

HOST_ARGSETS = [
    ["the"],
    ["-c", "the"],
    ["-o", "the"],
    ["-i", "THE"],
    ["-i", "-o", "THE"],
    ["-w", "the"],
    ["-w", "-c", "the"],
    ["-m", "3", "-o", "the"],
    ["-m", "2", "the"],
    ["-e", "the", "-e", "fox", "-o"],
    ["-e", "the", "-e", "fox", "-c"],
    ["e"],
    ["-o", "th"],
    ["--color=always", "the"],
    ["zzqqxx"],
    ["-c", "zzqqxx"],
]


@pytestmark_oracle
@pytest.mark.parametrize("argv", HOST_ARGSETS, ids=lambda a: " ".join(a))
def test_cli_parity_host_route(argv, tmp_path):
    text = naive.gen_english(5, 30_000)
    p = tmp_path / "c.txt"
    p.write_bytes(text)
    full = argv + [str(p)]
    ref_out, ref_rc = oracle.run(full)
    got_out, got_rc = ours(full)
    assert got_out == ref_out and got_rc == ref_rc


@pytestmark_oracle
def test_recursive_tree_parity_host_route(tmp_path):
    """-r over a small tree: the batch path's host branch (submit_batch
    routes counts and starts natively) vs the reference binary."""
    rng = np.random.default_rng(21)
    root = tmp_path / "tree"
    for d in ("a", "a/b", "c"):
        (root / d).mkdir(parents=True)
    for i in range(12):
        sub = ("a", "a/b", "c")[i % 3]
        body = naive.gen_english(100 + i, 500 + int(rng.integers(0, 3000)))
        (root / sub / f"f{i:02d}.txt").write_bytes(body)
    (root / "a" / "empty.txt").write_bytes(b"")
    for argv in (
        ["-r", "-c", "the"],
        ["-r", "the"],
        ["-r", "-o", "-i", "THE"],
        ["-r", "-w", "-c", "the"],
        ["-r", "-m", "2", "the"],
    ):
        full = argv + [str(root)]
        ref_out, ref_rc = oracle.run(full)
        got_out, got_rc = ours(full)
        # directory order is filesystem-dependent: compare sorted lines
        assert sorted(got_out.splitlines()) == sorted(ref_out.splitlines()), argv
        assert got_rc == ref_rc, argv


@pytestmark_oracle
def test_stdin_parity_host_route():
    text = naive.gen_english(31, 20_000)
    for argv in (["-c", "the"], ["-o", "the"], ["the"]):
        ref_out, ref_rc = oracle.run(argv, stdin=text)
        got_out, got_rc = ours(argv, stdin=text)
        assert got_out == ref_out and got_rc == ref_rc, argv
