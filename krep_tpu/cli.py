"""krep-compatible CLI (mirror of main/getopt at krep.c:3447-3888).

Usage mirrors the reference:
  krep [OPTIONS] PATTERN [FILE | DIRECTORY]
  krep [OPTIONS] -e PATTERN [-e PATTERN...] [FILE | DIRECTORY]
  krep [OPTIONS] -f FILE [FILE | DIRECTORY]
  krep [OPTIONS] -s PATTERN STRING_TO_SEARCH
  krep [OPTIONS] PATTERN < FILE

Exit codes: 0 match / 1 no match / 2 error (krep.c:1181-1184).
Option scanning stops at the first positional, like the reference's
"+"-prefixed optstring.
"""

from __future__ import annotations

import os
import sys

from . import __version__, getoptlong
from .params import SearchParams
from .output import printer

SHORT_OPTS = "ie:f:cm:oEFrt:s:vhw"
# the reference's long_options table, kinds included (krep.c:3475-3486);
# parsed by getoptlong (glibc emulation: optional_argument for --color,
# unambiguous-prefix abbreviation, glibc error text)
LONG_OPTS = {
    "color": getoptlong.OPTIONAL_ARG,
    "no-simd": getoptlong.NO_ARG,
    "fixed-strings": getoptlong.NO_ARG,
    "max-count": getoptlong.REQUIRED_ARG,
    "gitignore": getoptlong.NO_ARG,
    "algo": getoptlong.REQUIRED_ARG,
    "help": getoptlong.NO_ARG,
    "version": getoptlong.NO_ARG,
    "regexp": getoptlong.REQUIRED_ARG,  # alias for -e (krep.c:3481)
}

USAGE = f"""krep-tpu v{__version__}
TPU-native byte-scan engine with krep-compatible output.

Usage
  krep [OPTIONS] PATTERN [FILE | DIRECTORY]
  krep [OPTIONS] -e PATTERN [-e PATTERN...] [FILE | DIRECTORY]
  krep [OPTIONS] -f FILE [FILE | DIRECTORY]
  krep [OPTIONS] -s PATTERN STRING_TO_SEARCH
  krep [OPTIONS] PATTERN < FILE

Search
  -i             Case-insensitive matching.
  -e PATTERN     Specify pattern (repeatable).
  -f FILE        Read patterns from FILE ('-' = stdin).
  -E             POSIX Extended Regular Expressions.
  -F             Fixed strings (default unless -E).
  -w             Match whole words only.

Scope & Performance
  -r             Search directories recursively.
  --gitignore    Respect .gitignore with -r.
  --algo=ALGO    Force algorithm semantics: auto (default), bm, kmp.
  -t NUM         Thread count (accepted for compatibility; the device
                 grid replaces the thread pool).
  --no-simd      Emulate the reference's scalar selection semantics.

Output & UX
  -o             Print only matching parts.
  -c             Print only match counts.
  -m NUM         Stop after NUM matches/lines per file.
  -s PATTERN     Search in STRING_TO_SEARCH.
  --color[=WHEN] always | never | auto (default).
  -v             Version info.
  -h, --help     This help.

Exit: 0 match, 1 no match, 2 error.
"""


def _err(msg: str) -> int:
    sys.stderr.write(f"krep: {msg}\n")
    return 2


MAX_PATTERNS = 1024  # MAX_PATTERN_LENGTH doubles as the pattern-count cap


def _fgets_patterns(data: bytes, patterns: list[bytes]) -> None:
    """Emulate the reference's -f loop (krep.c:3590-3616): fgets with a
    1024-byte buffer (so lines beyond 1023 bytes SPLIT into multiple
    patterns), strlen semantics (a NUL truncates the line), trailing
    newline stripped, empty lines skipped, reading stops at 1024 patterns
    total (silent cap — the fgets loop condition, no error)."""
    i, n = 0, len(data)
    while i < n and len(patterns) < MAX_PATTERNS:
        j = data.find(b"\n", i, i + 1023)
        if j == -1:
            line = data[i : i + 1023]
        else:
            line = data[i : j + 1]
        i += len(line)
        nul = line.find(b"\0")
        if nul != -1:
            line = line[:nul]
        if line.endswith(b"\n"):
            line = line[:-1]
        if line:
            patterns.append(line)


def main(argv: list[str] | None = None, out=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    out = out if out is not None else sys.stdout.buffer
    try:
        opts, args = getoptlong.getopt_long(argv, SHORT_OPTS, LONG_OPTS)
    except getoptlong.OptError as e:
        # the reference prints getopt's error to stderr and the usage
        # block to STDOUT, exit 2 (krep.c:3695-3698)
        sys.stderr.write(f"krep: {e}\n")
        out.write(USAGE.encode())
        out.flush()
        return 2

    patterns: list[bytes] = []
    case_sensitive = True
    use_regex = False
    whole_word = False
    count_mode = False
    only_matching = False
    max_count = None
    recursive = False
    string_mode = False
    algo = None
    no_simd = False
    color_mode = "auto"
    threads = None
    use_gitignore = False

    for o, a in opts:
        if o == "-i":
            case_sensitive = False
        elif o in ("-e", "--regexp"):
            if len(patterns) >= MAX_PATTERNS:  # krep.c:3652-3657
                sys.stderr.write(
                    f"krep: Error: Too many patterns specified (max {MAX_PATTERNS})\n"
                )
                return 2
            patterns.append(a.encode())
        elif o == "-f":
            if a == "-":
                _fgets_patterns(sys.stdin.buffer.read(), patterns)
            else:
                try:
                    data = open(a, "rb").read()
                except OSError:
                    sys.stderr.write(
                        f"krep: Error: Cannot open pattern file: {a}\n"
                    )
                    return 2
                _fgets_patterns(data, patterns)
            if not patterns:
                # checked when -f is PROCESSED, so later -e options can't
                # rescue an empty pattern file (krep.c:3619-3625)
                sys.stderr.write(
                    "krep: Error: No patterns found in "
                    f"{'stdin' if a == '-' else a}\n"
                )
                return 2
        elif o == "-c":
            count_mode = True
        elif o in ("-m", "--max-count"):
            # strtol semantics (krep.c:3511-3520): out-of-range/garbage
            # values WARN and are ignored, they do not abort. Full-string
            # base-10 only (no underscores/unicode digits, which Python's
            # int() would accept; leading C whitespace is allowed, the
            # endptr check rejects anything trailing).
            import re

            m = re.fullmatch(r"[ \t\n\r\f\v]*[+-]?[0-9]+", a)
            v = int(a) if m else None
            if v is None or not (0 <= v <= (1 << 63) - 1):
                print(
                    f"krep: Warning: Invalid number for max-count '{a}'",
                    file=sys.stderr,
                )
            else:
                max_count = v
        elif o == "-o":
            only_matching = True
        elif o == "-E":
            use_regex = True
        elif o in ("-F", "--fixed-strings"):
            use_regex = False
        elif o == "-r":
            recursive = True
        elif o == "-t":
            try:
                threads = int(a)
                if threads <= 0:
                    raise ValueError
            except ValueError:
                # reference warns and uses the default (krep.c:3522-3529)
                sys.stderr.write(
                    f"krep: Warning: Invalid thread count '{a}', using default.\n"
                )
                threads = None
        elif o == "-s":
            # -s appends its pattern in argv order like any -e (krep.c:
            # 3548-3568); its own cap branch predates the (max %d) text
            if len(patterns) >= MAX_PATTERNS:
                sys.stderr.write("krep: Error: Too many patterns specified.\n")
                return 2
            patterns.append(a.encode())
            string_mode = True
        elif o == "-w":
            whole_word = True
        elif o in ("-v", "--version"):
            import jax

            from .parallel.mesh import guard_default_backend

            guard_default_backend()
            out.write(
                f"krep-tpu v{__version__}\nbackend: {jax.default_backend()}\n".encode()
            )
            out.flush()
            return 0
        elif o in ("-h", "--help"):
            out.write(USAGE.encode())
            out.flush()
            return 0
        elif o == "--color":
            # bare --color (optarg NULL) means AUTO, not always
            # (krep.c:3661-3663); --color= (empty string) is an error
            color_mode = a if a is not None else "auto"
            if color_mode not in ("auto", "always", "never"):
                # message + usage block, usage to stdout (krep.c:3668-3672)
                sys.stderr.write(
                    f"krep: Error: Invalid argument for --color: {color_mode}\n"
                )
                out.write(USAGE.encode())
                out.flush()
                return 2
        elif o == "--no-simd":
            no_simd = True
        elif o == "--gitignore":
            use_gitignore = True
        elif o == "--algo":
            if a not in ("auto", "bm", "kmp"):  # krep.c:3685-3697
                sys.stderr.write(
                    f"krep: Error: Unknown algorithm '{a}'. "
                    "Valid options: auto, bm, kmp\n"
                )
                return 2
            algo = a

    # --- pattern / target resolution (krep.c:3700-3810) ---
    if not patterns:
        if not args:
            # message to stderr, usage block to STDOUT (krep.c:3725-3727)
            sys.stderr.write("krep: Error: PATTERN argument missing.\n")
            out.write(USAGE.encode())
            out.flush()
            return 2
        patterns.append(args.pop(0).encode())

    if string_mode:
        if recursive:
            # krep.c:3803-3808: message + usage (usage to stdout)
            sys.stderr.write(
                "krep: Error: Options -s (search string) and -r (recursive) "
                "cannot be used together.\n"
            )
            out.write(USAGE.encode())
            out.flush()
            return 2
        if not args:
            sys.stderr.write(
                "krep: Error: STRING_TO_SEARCH argument missing for -s.\n"
            )
            out.write(USAGE.encode())
            out.flush()
            return 2
        haystack = args[0].encode()
        extra = args[1:]
        target = None
    else:
        target = args[0] if args else None
        extra = args[1:]
    if extra:
        # mirror krep: extra positionals are an error; the reference prints
        # the error to stderr but the usage block to STDOUT, exit 2
        sys.stderr.write(f"krep: Error: Extra arguments provided ('{extra[0]}'...). \n")
        out.write(USAGE.encode())
        out.flush()
        return 2

    color = color_mode == "always" or (
        color_mode == "auto" and sys.stdout.isatty()
    )

    try:
        params = SearchParams(
            patterns=tuple(patterns),
            case_sensitive=case_sensitive,
            use_regex=use_regex,
            whole_word=whole_word,
            only_matching=only_matching,
            count_mode=count_mode,
            max_count=max_count,
            algo_override=algo,
            no_simd=no_simd,
            use_gitignore=use_gitignore,
        )
    except ValueError as e:  # too many patterns / pattern too long
        return _err(str(e))

    from .engine.search import (
        PatternValidationError,
        search_string,
        validate_patterns,
    )

    try:
        if string_mode:
            # the reference's -s is single-threaded (krep.c:2390-2392); we
            # scan on the mesh but still let -t cap the shard count.
            # search_string prints positions in AC emission order, unsorted
            result = search_string(
                params.with_(sorted_positions=False), haystack, threads
            )
            _emit(out, result, haystack, None, params, color)
        elif recursive and target is not None:
            if not os.path.isdir(target):
                return _err(f"{target}: Is not a directory (required for -r)")
            from .io import walker

            return walker.search_directory(params, target, out, color, threads)
        elif target is not None and target != "-":
            if os.path.isdir(target):
                return _err(
                    f"{target}: Is a directory (use -r to search directories)"
                )
            # search_file validates before any I/O (krep.c:2298-2322): a
            # bad pattern set errors even on a nonexistent target
            validate_patterns(params, target)
            from .io import files

            try:
                data = files.read_bytes(target)
            except OSError as e:
                return _err(f"{target}: {e.strerror or e}")
            result = search_string(
                params,
                bytes(data) if not hasattr(data, "shape") else data,
                threads,
                target=target,
            )
            if len(data) == 0 and not use_regex and len(patterns) == 1 and len(patterns[0]) == 0:
                # empty pattern matches an empty FILE once (krep.c:2419-2513);
                # string/stdin search has no such special case (observed)
                import numpy as _np

                from .engine.search import SearchResult

                result = SearchResult(1, _np.array([[0, 0]], dtype=_np.int64), 0)
            if len(data) == 0 and result.count == 1 and params.only_matching and not params.count_mode:
                # the reference prints "file::" here, not "file:1:"
                out.write(f"{target}::\n".encode())
            else:
                _emit(out, result, data, target, params, color)
        else:
            # stdin is target "-": validate before consuming the pipe
            # (krep.c:2298 precedes the fread loop at 2325)
            validate_patterns(params, "-")
            data = sys.stdin.buffer.read()
            # the reference's search_string takes a C string (text_len =
            # strlen(text), krep.c:2025), so stdin data TRUNCATES at the
            # first NUL byte — file targets don't (mmap + stat size).
            # Found by soak rig G on a binary corpus.
            nul = data.find(b"\0")
            if nul != -1:
                data = data[:nul]
            # stdin rides search_string => AC emission order, unsorted
            result = search_string(
                params.with_(sorted_positions=False), data, threads,
                target="-",
            )
            _emit(out, result, data, None, params, color)
    except PatternValidationError as e:
        sys.stderr.write(e.message + "\n")
        return 2
    except NotImplementedError as e:
        return _err(str(e))
    except BrokenPipeError:
        # downstream closed (e.g. `| head`). The reference dies by SIGPIPE
        # and the shell sees 128+13; returning 141 is indistinguishable in
        # $? and keeps the daemon path (daemon.py) identical.
        return 141
    except Exception as e:
        from .engine.regex_engine import RegexError

        if isinstance(e, RegexError):
            return _err(str(e))
        raise

    out.flush()
    return 0 if result.matched else 1


def _emit(out, result, text, filename, params: SearchParams, color: bool):
    if params.count_mode:
        printer.print_count(out, result.count, filename)
    elif params.only_matching:
        printer.print_only_matching(
            out, text, result.positions, filename, color, params.max_count
        )
    else:
        printer.print_matching_lines(out, text, result.positions, filename, color)


if __name__ == "__main__":
    sys.exit(main())
