#!/usr/bin/env python
"""Long-horizon differential soak against the reference binary.

CI pins fixed fuzz seeds for determinism (tests/test_fuzz_oracle.py,
tests/test_fuzz_regex.py); this tool drives the SAME generators through
fresh seed space for a wall-clock budget — an open-ended randomized
search for parity bugs on the literal CLI surface and the ERE surface
(the reference's loops at krep.c:1389-1579 / 4371-4503 and our whole
engine stack behind them).

Usage:
    python tools/soak_fuzz.py [--seconds 1800] [--seed-base N]

Runs on the CPU platform (chip-independent). Prints a progress line per
minute; on the first mismatch prints a standalone repro (seed + args +
corpus file kept in /tmp) and exits 1. Exit 0 = budget exhausted clean.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [REPO, os.path.join(REPO, "tests")]

# UNCONDITIONAL: the session env pins JAX_PLATFORMS to the TPU plugin;
# the soak must be chip-independent (tests/conftest.py does the same)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("KREP_TPU_STRICT", "1")

import numpy as np  # noqa: E402

import oracle  # noqa: E402
import test_fuzz_oracle as fo  # noqa: E402
import test_fuzz_regex as fr  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from krep_tpu import cli  # noqa: E402


def fail(kind: int, seed: int, case: int, args, text: bytes,
         got: bytes, want: bytes, rc: int, wrc: int) -> None:
    keep = tempfile.NamedTemporaryFile(
        prefix="soak_repro_", suffix=".txt", delete=False
    )
    keep.write(text)
    keep.close()
    print(
        f"MISMATCH kind={kind} seed={seed} case={case}\n"
        f"  args: {args} + {keep.name}\n"
        f"  rc {rc} vs oracle {wrc}\n"
        f"  got[:300]:  {got[:300]!r}\n"
        f"  want[:300]: {want[:300]!r}",
        flush=True,
    )
    sys.exit(1)


_ARG_SHORTS = set("efmts")
_LONG_ALIASES = {  # canonical -> equivalent respellings (same parse)
    "-e": lambda v, r: (["-e" + v], ["--regexp", v], ["--regexp=" + v],
                        ["--regex", v])[r % 4],
    "-m": lambda v, r: (["-m" + v], ["--max-count=" + v], ["--max", v],
                        ["-m", v])[r % 4],
}


def respell_args(rng, args):
    """Respell an argv into an equivalent getopt_long spelling — attached
    short arguments, --regexp/--max-count aliases, unambiguous long-option
    abbreviations, short-flag bundles — so the option PARSER itself (glibc
    emulation, krep.c:3474-3494) is fuzz surface, not just the engine.
    Only tokens before the first positional are touched; both sides get
    the identical respelled argv."""
    out: list[str] = []
    bundle: list[str] = []

    def flush():
        if bundle:
            out.append("-" + "".join(bundle))
            bundle.clear()

    i, n = 0, len(args)
    while i < n:
        a = args[i]
        if not a.startswith("-") or a in ("-", "--"):
            break
        if a.startswith("--"):
            flush()
            name, eq, val = a[2:].partition("=")
            # every name in the reference's table is unambiguous at any
            # prefix length >= 1 (no two share a first letter except none)
            if rng.random() < 0.5 and len(name) > 1:
                name = name[: int(rng.integers(1, len(name)))]
            out.append(f"--{name}={val}" if eq else f"--{name}")
            i += 1
            continue
        ch = a[1:]
        if len(ch) == 1 and ch in _ARG_SHORTS and i + 1 < n:
            flush()
            val = args[i + 1]
            alias = _LONG_ALIASES.get(a)
            if alias is not None and val:
                out += alias(val, int(rng.integers(0, 4)))
            elif val and rng.random() < 0.5:
                out.append(a + val)  # attached form
            else:
                out += [a, val]
            i += 2
            continue
        if len(ch) == 1:
            bundle.append(ch)
            if rng.random() < 0.5:
                flush()
            i += 1
            continue
        flush()
        out.append(a)
        i += 1
    flush()
    return out + args[i:]


def literal_batch(seed: int, cases: int) -> int:
    rng = np.random.default_rng(seed)
    for case in range(cases):
        text, args = fo.gen_case(rng)
        if rng.random() < 0.2:
            args = ["--color=always", *args]
        if rng.random() < 0.3:
            args = respell_args(rng, args)
        with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
            f.write(text)
            path = f.name
        try:
            out = io.BytesIO()
            rc = cli.main([*args, path], out=out)
            want, wrc = oracle.run([*args, path])
            got_n = out.getvalue().replace(path.encode(), b"F")
            want_n = want.replace(path.encode(), b"F")
            if rc != wrc:
                fail(0, seed, case, args, text, got_n, want_n, rc, wrc)
            if rc == 2:
                continue  # both errored: usage texts differ by design
            if got_n != want_n:
                fail(0, seed, case, args, text, got_n, want_n, rc, wrc)
        finally:
            os.unlink(path)
    return cases


def ere_batch(seed: int, cases: int) -> int:
    import subprocess

    rng = np.random.default_rng(seed)
    for case in range(cases):
        if rng.random() < 0.3:
            # multi-pattern EREs: the combined-OR + \b-wrapping source
            # (krep.c:2087-2161) x the factor prefilter
            text, pats, flags, _ = fr._multi_case(rng)
            if rng.random() < 0.2:
                flags = ["--color=always", *flags]
            args = ["-E", *flags]
            for p in pats:
                args += ["-e", p.decode("latin1")]
            pat = b"|".join(pats)
        else:
            text = fr.gen_corpus(rng)
            pat = fr.gen_pattern(rng)
            flags = fr.gen_flags(rng)
            if fr.ref_would_hang(pat, flags, text):
                flags.append("-c")  # dodge the reference's print-mode hang
            if rng.random() < 0.2:
                flags = ["--color=always", *flags]
            args = ["-E", *flags, "-e", pat.decode("latin1")]
        try:
            got, rc, want, wrc = fr.run_cli_vs_oracle(text, args)
        except subprocess.TimeoutExpired:
            # an UNDODGED reference hang: report it (it's a finding about
            # the reference worth pinning) and keep soaking
            print(f"REF-HANG seed={seed} case={case} args={args}",
                  flush=True)
            continue
        if got != want or rc != wrc:
            fail(1, seed, case, args, text, got, want, rc, wrc)
    return cases


def manypat_batch(seed: int, cases: int) -> int:
    """Large -f pattern sets through the CLI (the grouped-fused / MXU /
    prefix-group routes at K 16..96, mixed lengths incl. >13-byte
    members), diffed against the oracle across count/position modes."""
    rng = np.random.default_rng(seed)
    for case in range(cases):
        alpha = np.frombuffer(b"the quick brown fox_ jumps over\nlazy ",
                              np.uint8)
        n = int(rng.integers(10_000, 150_000))
        text = rng.choice(alpha, size=n).tobytes()
        k = int(rng.integers(16, 97))
        pats = []
        while len(pats) < k:
            m = int(rng.integers(1, 22))  # > 13 exercises prefix groups
            s = int(rng.integers(0, n - m))
            p = text[s : s + m].replace(b"\n", b"x").replace(b"\x00", b"y")
            if p and p not in pats:
                pats.append(p)
        flags = []
        if rng.random() < 0.3:
            flags.append("-i")
        if rng.random() < 0.25:
            flags.append("-w")
        mode = rng.random()
        if mode < 0.35:
            flags.append("-c")
        elif mode < 0.55:
            flags += ["-c", "-o"]
        elif mode < 0.9:
            flags.append("-o")
        if rng.random() < 0.2:
            flags += ["-m", str(int(rng.integers(1, 9)))]
        pf = tempfile.NamedTemporaryFile(suffix=".pats", delete=False)
        pf.write(b"\n".join(pats))
        pf.close()
        with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
            f.write(text)
            path = f.name
        try:
            args = [*flags, "-f", pf.name, path]
            out = io.BytesIO()
            rc = cli.main(args, out=out)
            want, wrc = oracle.run(args)
            got_n = out.getvalue().replace(path.encode(), b"F")
            want_n = want.replace(path.encode(), b"F")
            if rc != wrc or (rc != 2 and got_n != want_n):
                fail(3, seed, case, args, text, got_n, want_n, rc, wrc)
        finally:
            os.unlink(path)
            os.unlink(pf.name)
    return cases


def string_stdin_batch(seed: int, cases: int) -> int:
    """The two file-less entries: piped stdin (krep.c:2325-2401) and -s
    string mode (krep.c:3548-3570, 1999-2229), randomized flags including
    --color=always (the highlight path, krep.c:963-1001)."""
    rng = np.random.default_rng(seed)
    for case in range(cases):
        if rng.random() < 0.5:
            # stdin: reuse the literal generator's full case space
            text, args = fo.gen_case(rng)
            pat_idx = [i + 1 for i, a in enumerate(args) if a == "-e"]
            if (
                "-c" not in args and "-o" not in args
                and len(pat_idx) > 1
                and any("\n" in args[i] for i in pat_idx)
            ):
                # stdin default print hands the printer UNSORTED AC
                # end-ordered matches; a '\n'-spanning member's
                # earlier-line match is silently dropped by the
                # reference (KNOWN_DIVERGENCES #12) — de-newline the
                # members for the oracle comparison, like the #10 guard
                for i in pat_idx:
                    args[i] = args[i].replace("\n", "a")
            if rng.random() < 0.3:
                args = ["--color=always", *args]

            class _Stdin:
                buffer = io.BytesIO(text)

            old = sys.stdin
            sys.stdin = _Stdin()
            try:
                out = io.BytesIO()
                rc = cli.main(args, out=out)
            finally:
                sys.stdin = old
            want, wrc = oracle.run(args, stdin=text)
        else:
            # -s PATTERN STRING: argv carries the haystack (no NULs)
            text, _ = fo.gen_case(rng)
            text = text.replace(b"\x00", b"x")
            if len(text) > 3 and rng.random() < 0.7:
                m = int(rng.integers(1, min(12, len(text))))
                s = int(rng.integers(0, len(text) - m + 1))
                pat = text[s : s + m]
            else:
                pat = bytes(rng.choice(
                    np.frombuffer(b"theoq\nx", np.uint8),
                    size=int(rng.integers(1, 6))))
            pat = pat.replace(b"\x00", b"x") or b"a"
            flags = []
            if rng.random() < 0.3:
                flags.append("-i")
            if rng.random() < 0.3:
                flags.append("-w")
            if rng.random() < 0.3:
                flags.append("--color=always")
            mode = rng.random()
            if mode < 0.3:
                flags.append("-c")
            elif mode < 0.6:
                flags.append("-o")
            elif mode < 0.7:
                flags += ["-c", "-o"]
            elif pat.startswith(b"\n"):
                flags.append("-c")  # reference default-print hang dodge
            if rng.random() < 0.25:
                flags += ["-m", str(int(rng.integers(0, 5)))]
            if "-c" in flags and "-o" not in flags and b"\n" in pat:
                # reference SIMD -c loses lines for '\n'-containing
                # patterns (KNOWN_DIVERGENCES #9) — same guard as
                # test_fuzz_oracle.gen_case: pin the scalar selection
                flags.append("--no-simd")
            _WORD = frozenset(
                b"abcdefghijklmnopqrstuvwxyz"
                b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
            )
            if (
                "-w" in flags
                and any(c not in _WORD for c in pat)
            ):
                # rejected -w candidates consume pattern_len in the
                # reference's SIMD/KMP engines (KNOWN_DIVERGENCES #11);
                # --no-simd still routes repetitive patterns to KMP, so
                # pin --algo bm (single pattern here)
                flags += ["--algo", "bm"]
            args = [*flags, "-s", pat.decode("latin1"),
                    text.decode("latin1")]
            out = io.BytesIO()
            rc = cli.main(args, out=out)
            want, wrc = oracle.run(args)
        if rc != wrc:
            fail(4, seed, case, args, text, out.getvalue(), want, rc, wrc)
        if rc != 2 and out.getvalue() != want:
            fail(4, seed, case, args, text, out.getvalue(), want, rc, wrc)
    return cases


def degenerate_batch(seed: int, cases: int) -> int:
    """Soak rig G: degenerate pattern sets (empty-in-multi, duplicates,
    whole-line, cap-boundary lengths) through file/stdin/-s targets,
    diffing stdout + STDERR + rc — the stderr diff is what catches
    validation divergences (round-3's stdin/-s empty-pattern bug)."""
    from clirun import run_cli

    rng = np.random.default_rng(seed)
    for case in range(cases):
        text, args, kind = fo.gen_degenerate_case(rng)
        if rng.random() < 0.3:
            args = respell_args(rng, args)
        path = None
        try:
            if kind == "file":
                with tempfile.NamedTemporaryFile(
                    suffix=".txt", delete=False
                ) as f:
                    f.write(text)
                    path = f.name
                got, gerr, rc = run_cli([*args, path])
                want, werr, wrc = oracle.run_full([*args, path])
                got = got.replace(path.encode(), b"F")
                want = want.replace(path.encode(), b"F")
                gerr = gerr.replace(path.encode(), b"F")
                werr = werr.replace(path.encode(), b"F")
            elif kind == "stdin":
                got, gerr, rc = run_cli(args, stdin_bytes=text)
                want, werr, wrc = oracle.run_full(args, stdin=text)
            else:
                got, gerr, rc = run_cli(args)
                want, werr, wrc = oracle.run_full(args)
            if rc != wrc or got != want or gerr != werr:
                fail(5, seed, case, args, text,
                     got + b"||" + gerr, want + b"||" + werr, rc, wrc)
        finally:
            if path:
                os.unlink(path)
    return cases


TREE_WORDS = [b"the cat", b"a dog", b"no match here", b"the end", b"THE X",
              b"thing", b"over the lazy dog", b"xyz", b""]
TREE_EXTS = [".txt", ".log", ".md", ".js", ".min.js", ".png", ".o", ".c",
             ".json", ""]
SKIP_DIRS = [".git", "node_modules", "build", ".svn"]
GITIGNORE_LINES = [b"*.log", b"drop/", b"!keep.log", b"secret*", b"sub/*.md"]


def _gen_tree(rng, root: str) -> None:
    """Random directory tree: nested dirs (some from the skip table),
    files across the extension table (some skip-listed), a .gitignore
    chain, the occasional symlink, empty file, and >1MB binary/text pair
    (the binary-sniff threshold, krep.c walker)."""
    import pathlib

    dirs = [pathlib.Path(root)]
    for _ in range(int(rng.integers(0, 6))):
        base = dirs[int(rng.integers(0, len(dirs)))]
        name = (SKIP_DIRS[int(rng.integers(0, len(SKIP_DIRS)))]
                if rng.random() < 0.25 else
                f"d{int(rng.integers(0, 100))}")
        p = base / name
        p.mkdir(exist_ok=True)
        dirs.append(p)
    n_files = int(rng.integers(1, 12))
    made = []
    for i in range(n_files):
        base = dirs[int(rng.integers(0, len(dirs)))]
        ext = TREE_EXTS[int(rng.integers(0, len(TREE_EXTS)))]
        name = f"{'.' if rng.random() < 0.15 else ''}f{i}{ext}"
        lines = [TREE_WORDS[int(rng.integers(0, len(TREE_WORDS)))]
                 for _ in range(int(rng.integers(0, 8)))]
        fp = base / name
        fp.write_bytes(b"\n".join(lines) + (b"\n" if lines else b""))
        made.append(fp)
    if rng.random() < 0.1:
        # >1MB pair: binary (NUL in the first 1KB => skipped) vs text
        big = dirs[0] / "big.bin"
        big.write_bytes(b"\x00the\x01" * 300_000)
        (dirs[0] / "big.txt").write_bytes(b"the quick\n" * 120_000)
    if made and rng.random() < 0.2:
        link = dirs[0] / "lnk.txt"
        if not link.exists():
            link.symlink_to(made[0])
    if rng.random() < 0.4:
        gi = rng.permutation(len(GITIGNORE_LINES))[
            : int(rng.integers(1, 4))]
        (dirs[0] / ".gitignore").write_bytes(
            b"\n".join(GITIGNORE_LINES[j] for j in gi) + b"\n")


def tree_batch(seed: int, cases: int) -> int:
    """Randomized -r walker parity: sorted-multiset stdout equality + exit
    code vs the oracle (walk order is fs-dependent on both sides)."""
    import shutil

    rng = np.random.default_rng(seed)
    for case in range(cases):
        root = tempfile.mkdtemp(prefix="soak_tree_")
        try:
            _gen_tree(rng, root)
            flags = ["-r"]
            if rng.random() < 0.4:
                flags.append("--gitignore")
            if rng.random() < 0.3:
                flags.append("-i")
            if rng.random() < 0.2:
                flags.append("-w")
            mode = rng.random()
            if mode < 0.45:
                flags.append("-c")
            elif mode < 0.8:
                flags.append("-o")
            if rng.random() < 0.2:
                flags += ["-m", str(int(rng.integers(1, 4)))]
            pat = ["the", "THE", "dog", "thing", "e", "q"][
                int(rng.integers(0, 6))]
            args = [*flags, pat, root]
            out = io.BytesIO()
            rc = cli.main(args, out=out)
            want, wrc = oracle.run(args)
            got_s = sorted(out.getvalue().splitlines())
            want_s = sorted(want.splitlines())
            if got_s != want_s or rc != wrc:
                keep = tempfile.mkdtemp(prefix="soak_tree_repro_")
                shutil.copytree(root, keep, dirs_exist_ok=True,
                                symlinks=True)
                fail(2, seed, case, args, b"<tree kept at " +
                     keep.encode() + b">",
                     b"\n".join(got_s), b"\n".join(want_s), rc, wrc)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return cases


# ---- rig H: the -r batch/solo pipeline itself (VERDICT r4 item 7) ---------

NEG_GITIGNORE_CHAINS = [
    b"*.txt\n!keep.txt\n",
    b"sub0/\n!sub0/\n*.log\n",
    b"a*.txt\n!a1.txt\nsub1/*.txt\n!sub1/a*.txt\n",
    b"*.log\n!important.log\ndeep/\n",
    b"f0*\n!f00*\n",
]


def _gen_pipeline_tree(rng, root: str):
    """Rig H tree: tiny + batchable + >BATCH_FILE_MAX solo files, dangling
    symlinks, an unreadable dir (non-root only), and .gitignore negation
    chains — the shapes that stress submit/drain interleaving in
    io/batch.py + io/walker.py's ordered emit queue."""
    import pathlib

    from krep_tpu.io import batch as batch_mod

    base = pathlib.Path(root)
    subs = [base]
    for d in range(int(rng.integers(1, 4))):
        p = base / f"sub{d}"
        p.mkdir()
        subs.append(p)
    words = TREE_WORDS
    n_solo = 0
    for i in range(int(rng.integers(8, 28))):
        d = subs[int(rng.integers(0, len(subs)))]
        r = rng.random()
        if r < 0.25:
            body = (b"" if rng.random() < 0.5
                    else words[int(rng.integers(0, len(words)))] + b"\n")
        elif r < 0.88 or n_solo >= 2:
            k = int(rng.integers(1, 300))
            body = b"\n".join(
                words[int(j)] for j in rng.integers(0, len(words), k)
            ) + b"\n"
        else:
            # solo: beyond the batch limit, searched out-of-batch
            unit = b" ".join(
                words[int(j)] for j in rng.integers(0, len(words), 8)
            ) + b"\n"
            body = unit * (batch_mod.BATCH_FILE_MAX // len(unit) + 2)
            n_solo += 1
        name = f"{'a' if rng.random() < 0.3 else 'f'}{i:02d}" + (
            ".log" if rng.random() < 0.2 else ".txt")
        (d / name).write_bytes(body)
    if rng.random() < 0.5:
        (base / "dangling.txt").symlink_to(base / "missing_target.txt")
    if rng.random() < 0.4 and os.geteuid() != 0:
        locked = base / "locked"
        locked.mkdir()
        (locked / "hidden.txt").write_bytes(b"the cat\n")
        os.chmod(locked, 0)
    if rng.random() < 0.6:
        chain = NEG_GITIGNORE_CHAINS[
            int(rng.integers(0, len(NEG_GITIGNORE_CHAINS)))]
        (base / ".gitignore").write_bytes(chain)


def pipeline_batch(seed: int, cases: int) -> int:
    """Rig H: full stdout + stderr + rc diff of -r runs over pipeline-
    stressing trees, with the batch submit/drain instrumentation from
    tests/test_batch.py generalized — whenever several batches exist, the
    ordered emit queue must keep >= 2 in flight (no full drain on solo
    boundaries)."""
    import shutil
    import stat as stat_mod

    from clirun import run_cli
    from krep_tpu.io import batch as batch_mod

    rng = np.random.default_rng(seed)
    done = 0
    # force many small batches so depth is observable on small trees
    real_max = batch_mod.BATCH_BUFFER_MAX
    batch_mod.BATCH_BUFFER_MAX = 64 << 10
    real_submit, real_drain = batch_mod.submit_batch, batch_mod.drain_batch
    try:
        for case in range(cases):
            root = tempfile.mkdtemp(prefix="soak_pipe_")
            in_flight = [0]
            stats = {"max": 0, "submits": 0}

            def submit(params, b, _s=real_submit):
                in_flight[0] += 1
                stats["submits"] += 1
                stats["max"] = max(stats["max"], in_flight[0])
                return _s(params, b)

            def drain(params, pending, _d=real_drain):
                in_flight[0] -= 1
                yield from _d(params, pending)

            batch_mod.submit_batch = submit
            batch_mod.drain_batch = drain
            try:
                _gen_pipeline_tree(rng, root)
                flags = ["-r"]
                if rng.random() < 0.5:
                    flags.append("--gitignore")
                if rng.random() < 0.3:
                    flags.append("-i")
                if rng.random() < 0.2:
                    flags.append("-w")
                mode = rng.random()
                if mode < 0.5:
                    flags.append("-c")
                elif mode < 0.8:
                    flags.append("-o")
                if rng.random() < 0.15:
                    flags += ["-m", str(int(rng.integers(1, 5)))]
                pat = ["the", "cat", "THE", "e", "no match"][
                    int(rng.integers(0, 5))]
                args = [*flags, pat, root]
                got, gerr, rc = run_cli(args)
                want, werr, wrc = oracle.run_full(args, timeout=120)
                if (sorted(got.splitlines()) != sorted(want.splitlines())
                        or sorted(gerr.splitlines()) != sorted(want_err_lines(werr))
                        or rc != wrc):
                    keep = tempfile.mkdtemp(prefix="soak_pipe_repro_")
                    _unlock(root)
                    shutil.copytree(root, keep, dirs_exist_ok=True,
                                    symlinks=True)
                    fail(7, seed, case, args,
                         b"<tree kept at " + keep.encode() + b">",
                         got + b"|ERR|" + gerr, want + b"|ERR|" + werr,
                         rc, wrc)
                if stats["submits"] >= 3 and stats["max"] < 2:
                    fail(7, seed, case, args + ["<pipeline-depth>"],
                         b"<tree>", str(stats).encode(), b"max>=2", rc, wrc)
                done += 1
            finally:
                batch_mod.submit_batch = real_submit
                batch_mod.drain_batch = real_drain
                _unlock(root)
                shutil.rmtree(root, ignore_errors=True)
    finally:
        batch_mod.BATCH_BUFFER_MAX = real_max
    return done


def _unlock(root: str) -> None:
    for r, dirs, _fs in os.walk(root):
        for d in dirs:
            try:
                os.chmod(os.path.join(r, d), 0o755)
            except OSError:
                pass


def want_err_lines(werr: bytes) -> list[bytes]:
    return werr.splitlines()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=1800.0)
    ap.add_argument(
        "--seed-base", type=int, default=None,
        help="default: derived from the clock (printed for repro)",
    )
    a = ap.parse_args()
    if oracle.ensure_oracle() is None:
        print("reference oracle unavailable; nothing to diff", flush=True)
        return 2
    base = a.seed_base if a.seed_base is not None else int(time.time())
    print(f"soak: seed-base={base} budget={a.seconds:.0f}s", flush=True)
    t0 = time.time()
    last = t0
    total = 0
    rounds = 0
    while time.time() - t0 < a.seconds:
        total += literal_batch(base + 7 * rounds, 20)
        total += ere_batch(base + 7 * rounds + 1, 15)
        total += tree_batch(base + 7 * rounds + 2, 6)
        total += manypat_batch(base + 7 * rounds + 3, 3)
        total += string_stdin_batch(base + 7 * rounds + 4, 12)
        total += degenerate_batch(base + 7 * rounds + 5, 10)
        total += pipeline_batch(base + 7 * rounds + 6, 4)
        rounds += 1
        now = time.time()
        if now - last >= 60:
            print(
                f"  t+{now - t0:5.0f}s  {total} cases clean", flush=True
            )
            last = now
    print(f"soak clean: {total} cases in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
