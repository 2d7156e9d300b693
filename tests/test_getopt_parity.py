"""getopt_long parity: option-parsing corners diffed against the oracle.

The reference parses with glibc getopt_long and a "+" optstring
(krep.c:3474-3494): unambiguous long-option abbreviation, optional_argument
for --color (bare --color means AUTO, krep.c:3661-3663), short-option
bundling, "--" terminator, and glibc's error texts. Round-4 probing found
bare --color diverged (we printed color where the reference did not);
krep_tpu/getoptlong.py now emulates glibc and these tests pin every corner.

glibc prefixes parse errors with argv[0] (the oracle's build path), ours
with "krep" — stderr comparisons normalize the oracle's progname. Usage
blocks printed on errors legitimately differ in content, so error-path
stdout is compared for presence only.
"""

import io
import sys

import pytest

import oracle

from krep_tpu import cli
from krep_tpu.getoptlong import OptError, getopt_long

pytestmark = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)


def ours(argv, stdin_bytes=None):
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


def theirs(argv, stdin_bytes=None):
    o, e, rc = oracle.run_full(list(argv), stdin_bytes)
    return o, e.replace(str(oracle.ensure_oracle()).encode(), b"krep"), rc


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("getopt") / "t.txt"
    p.write_bytes(b"the cat sat\nno match here\nthe end\n")
    return str(p)


# --- success paths: full (stdout, stderr, rc) byte parity ---

GOOD = [
    ["--color", "the"],          # bare --color piped => AUTO => no color
    ["--colo", "the"],           # abbreviated, still optional-arg
    ["--colo=always", "the"],    # abbreviated with value
    ["--color=never", "-o", "the"],
    ["--regex", "the", "-c"],    # abbreviated --regexp consumes next argv
    ["--regexp=the", "-c"],      # =value form
    ["--max-count=2", "the"],
    ["--max", "1", "-o", "the"],
    ["--fixed", "-c", "the"],    # abbreviated --fixed-strings
    ["--no-s", "-c", "the"],     # abbreviated --no-simd
    ["-icw", "THE"],             # short bundling
    ["-ethe", "-c"],             # attached short argument
    ["-m1", "-o", "the"],
    ["-cie", "the"],             # bundle ending in an arg-taking option
    ["--", "the"],               # terminator then pattern
    ["--max", "the", "x"],       # abbrev arg consumed => warning, pattern x
]


@pytest.mark.parametrize("args", GOOD, ids=lambda a: " ".join(a))
def test_parse_success_parity(corpus, args):
    argv = [*args, corpus]
    got_out, got_err, got_rc = ours(argv)
    want_out, want_err, want_rc = theirs(argv)
    want_out = want_out.replace(corpus.encode(), b"F")
    got_out = got_out.replace(corpus.encode(), b"F")
    assert (got_out, got_err, got_rc) == (want_out, want_err, want_rc), argv


# --- error paths: glibc message text + rc; usage block presence only ---

BAD = [
    ["-x", "the"],               # invalid option -- 'x'
    ["--foo", "the"],            # unrecognized option '--foo'
    ["--foo=bar", "the"],        # unrecognized keeps the =val text
    ["-e"],                      # option requires an argument -- 'e'
    ["--algo"],                  # option '--algo' requires an argument
    ["--max"],                   # abbreviated, missing argument
    ["--gitignore=x", "the"],    # option '--gitignore' doesn't allow ...
    ["--color=", "the"],         # empty WHEN is invalid (not NULL optarg)
    ["--color=blue", "the"],
    ["-cx", "the"],              # invalid inside a bundle
    [],                          # no args: PATTERN argument missing
    ["--max", "5"],              # options but no pattern positional
]


@pytest.mark.parametrize("args", BAD, ids=lambda a: " ".join(a) or "<empty>")
def test_parse_error_parity(corpus, args):
    # missing-argument-at-end and no-pattern cases must NOT get the corpus
    # appended (it would be consumed as the option's argument / pattern)
    argv = list(args) if args[-1:] != ["the"] else [*args, corpus]
    got_out, got_err, got_rc = ours(argv)
    want_out, want_err, want_rc = theirs(argv)
    assert got_rc == want_rc == 2, argv
    assert got_err == want_err, argv
    assert bool(got_out) == bool(want_out), argv  # usage texts differ


def test_help_abbreviation(corpus):
    # --h resolves to --help: usage to stdout, rc 0 (content differs)
    got_out, _, got_rc = ours(["--h", "the", corpus])
    want_out, _, want_rc = theirs(["--h", "the", corpus])
    assert got_rc == want_rc == 0
    assert bool(got_out) == bool(want_out)


# --- unit corners of the emulation itself ---

def test_ambiguous_prefix_message():
    with pytest.raises(OptError) as ei:
        getopt_long(["--ver"], "ab:", {"verbose": 0, "version": 0})
    assert str(ei.value) == (
        "option '--ver' is ambiguous; "
        "possibilities: '--verbose' '--version'"
    )


def test_exact_match_beats_prefix():
    opts, args = getopt_long(
        ["--color=never"], "", {"color": 2, "colorize": 1}
    )
    assert opts == [("--color", "never")]


def test_stop_at_first_positional():
    opts, args = getopt_long(["-c", "pat", "-o"], "co", {})
    assert opts == [("-c", "")]
    assert args == ["pat", "-o"]


def test_lone_dash_is_positional():
    opts, args = getopt_long(["-c", "-", "-o"], "co", {})
    assert opts == [("-c", "")]
    assert args == ["-", "-o"]
