"""Regression tests for code-review findings."""

import io

import numpy as np
import pytest

import naive
from krep_tpu import SearchParams, cli


def ours(argv, out=None):
    out = out if out is not None else io.BytesIO()
    rc = cli.main(argv, out=out)
    return out.getvalue(), rc


def test_batch_excludes_newline_patterns(tmp_path):
    """A pattern containing '\\n' must not match into the batch separator."""
    d = tmp_path / "t"
    d.mkdir()
    (d / "a.txt").write_bytes(b"foo")          # no trailing newline
    (d / "b.txt").write_bytes(b"foo\nbar")
    got, rc = ours(["-r", "-c", "-o", "-e", "o\n", str(d)])
    counts = {
        line.rsplit(b":", 1)[0].rsplit(b"/", 1)[-1]: int(line.rsplit(b":", 1)[1])
        for line in got.splitlines()
    }
    assert counts[b"a.txt"] == 0   # "foo" has no "o\n"
    assert counts[b"b.txt"] == 1


def test_sharded_whole_word_at_boundary():
    """Whole-word filter must see the byte before a shard start."""
    import jax
    from jax.sharding import Mesh

    from krep_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")

    n = 4000
    shard = -(-n // 8)  # 500
    body = bytearray(b" " * n)
    # 'xfoo' with 'foo' starting exactly at shard boundary 500: mid-word
    body[499:503] = b"xfoo"
    # valid whole word at boundary 1000
    body[998:1004] = b" foo  "[:6]
    body[1000:1003] = b"foo"
    data = np.frombuffer(bytes(body), np.uint8)
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    c, l, starts = pmesh.sharded_scan(
        data, b"foo", whole_word=True, want_mask=True, mesh=m
    )
    want = naive.all_starts(bytes(body), b"foo", whole_word=True)
    assert starts.tolist() == want
    assert c == len(want)


def test_cli_empty_pattern_file(tmp_path):
    pf = tmp_path / "empty.txt"
    pf.write_bytes(b"\n\n")
    tf = tmp_path / "t.txt"
    tf.write_bytes(b"hello\n")
    got, rc = ours(["-f", str(pf), str(tf)])
    assert rc == 2


def test_cli_too_many_patterns(tmp_path):
    """-f silently caps at 1024 patterns like the reference's fgets loop
    (krep.c:3591: `&& num_patterns_found < MAX_PATTERN_LENGTH` — no
    error); the 1025th+ patterns are simply never loaded. Oracle-verified:
    1100 non-matching patterns -> rc 1, no stderr."""
    pf = tmp_path / "many.txt"
    pf.write_bytes(b"\n".join(b"q%04d" % i for i in range(1100)))
    tf = tmp_path / "t.txt"
    tf.write_bytes(b"hello\nq1050\n")
    got, rc = ours(["-f", str(pf), str(tf)])
    # q1050 is beyond the cap, so it must NOT match
    assert rc == 1
    assert got == b""
    # a pattern inside the cap still matches
    tf.write_bytes(b"hello\nq0500\n")
    got, rc = ours(["-f", str(pf), str(tf)])
    assert rc == 0


def test_cli_invalid_color():
    got, rc = ours(["--color=blue", "x"])
    assert rc == 2


def test_parallel_regex_gating():
    """Bracket/escape/newline patterns must not take the chunked path."""
    from krep_tpu.engine import regex_engine as re_

    text = naive.gen_english(44, 9 << 20)
    p = SearchParams(patterns=(b"foo[[:space:]]bar",), use_regex=True)
    # chunking would be unsound here; search_regex must not use it even on
    # multi-core hosts — simulate by checking the gate directly
    src = re_.build_regex_source(p)
    assert b"[" in src  # gate keys on this
    r = re_.search_regex(p, bytes(text))  # must not crash; exactness via seq
    r2 = re_._search_regex_seq(p, bytes(text))
    assert r.count == r2.count
