"""Empty-file / empty-pattern special cases (krep.c:2419-2513), asserted
against the oracle binary's observed behavior."""

import io
import os
import tempfile

import pytest

import oracle
from krep_tpu import cli

pytestmark = pytest.mark.skipif(
    oracle.ensure_oracle() is None, reason="reference oracle unavailable"
)


def ours(argv):
    out = io.BytesIO()
    rc = cli.main(argv, out=out)
    return out.getvalue(), rc


@pytest.fixture(scope="module")
def empty_file():
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        path = f.name
    yield path
    os.unlink(path)


@pytest.fixture(scope="module")
def tiny_file():
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        f.write(b"ab")
        path = f.name
    yield path
    os.unlink(path)


CASES = [
    [""],
    ["-c", ""],
    ["-o", ""],
    ["-c", "-o", ""],
    ["-E", "^$"],
    ["-E", "-c", "^$"],
    ["-E", "-o", "^$"],
    ["x"],
    ["-c", "x"],
]


@pytest.mark.parametrize("args", CASES, ids=lambda a: "krep " + " ".join(a))
def test_empty_file(empty_file, args):
    got, rc = ours([*args, empty_file])
    want, wrc = oracle.run([*args, empty_file])
    norm = lambda b: b.replace(empty_file.encode(), b"F")
    assert norm(got) == norm(want), args
    assert rc == wrc, args


def test_empty_pattern_nonempty_file(tiny_file):
    for args in ([""], ["-c", ""]):
        got, rc = ours([*args, tiny_file])
        want, wrc = oracle.run([*args, tiny_file])
        assert got.replace(tiny_file.encode(), b"F") == want.replace(
            tiny_file.encode(), b"F"
        )
        assert rc == wrc


def test_multi_with_empty_pattern_errors(tiny_file):
    got, rc = ours(["-e", "", "-e", "a", "-c", tiny_file])
    want, wrc = oracle.run(["-e", "", "-e", "a", "-c", tiny_file])
    assert rc == wrc == 2


def test_string_mode_no_special_case():
    for args in (["-s", "", ""], ["-c", "-s", "", ""], ["-o", "-s", "", ""]):
        got, rc = ours(args)
        want, wrc = oracle.run(args)
        assert got == want, args
        assert rc == wrc, args
