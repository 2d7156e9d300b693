"""glibc getopt_long emulation for the CLI driver.

The reference parses with getopt_long and a "+"-prefixed optstring
(krep.c:3474-3494): option scanning stops at the first positional,
`--color` is optional_argument, and long options accept unambiguous
abbreviations (`--colo`, `--regex`, `--max` all work). Python's getopt
can't express optional_argument and emits different error text, so this
module reproduces glibc's observable behavior directly:

- short-option bundling (`-icw`), attached (`-ethe`) and detached
  (`-e the`) arguments;
- long options with `=value` or a consumed next argv (required only),
  exact-match-wins-then-unambiguous-prefix resolution;
- optional_argument takes a value ONLY via `=` (bare `--color` yields
  a None argument, which the reference treats as "auto", krep.c:3661);
- `--` terminator; a lone `-` is a positional;
- error messages byte-identical to glibc's (sans the progname prefix,
  which the caller adds): verified against the built reference binary.

First error aborts the parse — the reference returns 2 from the first
'?' getopt_long yields (krep.c:3695-3698).
"""

from __future__ import annotations

NO_ARG, REQUIRED_ARG, OPTIONAL_ARG = 0, 1, 2


class OptError(Exception):
    """Parse error; str(self) is glibc's message text (no progname)."""


def _parse_shortspec(shortopts: str) -> dict[str, bool]:
    """optstring -> {char: takes_argument} (leading '+' ignored: stop-at-
    first-positional is always on, matching the reference's optstring)."""
    spec: dict[str, bool] = {}
    s = shortopts.lstrip("+-")
    i = 0
    while i < len(s):
        c = s[i]
        takes = i + 1 < len(s) and s[i + 1] == ":"
        spec[c] = takes
        i += 2 if takes else 1
    return spec


def getopt_long(
    argv: list[str], shortopts: str, longopts: dict[str, int]
) -> tuple[list[tuple[str, str | None]], list[str]]:
    """Returns (opts, args). opts entries are ('-e', value) /
    ('--color', value-or-None) with long names canonicalized to their
    full spelling; args is everything from the first positional on.
    Raises OptError with glibc's message on the first bad option."""
    spec = _parse_shortspec(shortopts)
    opts: list[tuple[str, str | None]] = []
    i = 0
    n = len(argv)
    while i < n:
        arg = argv[i]
        if arg == "--":
            i += 1
            break
        if arg.startswith("--"):
            body = arg[2:]
            name, eq, val = body.partition("=")
            if name in longopts:
                full = name
            else:
                cands = sorted(k for k in longopts if k.startswith(name))
                if not cands:
                    raise OptError(f"unrecognized option '{arg}'")
                if len(cands) > 1:
                    raise OptError(
                        f"option '--{name}' is ambiguous; possibilities:"
                        + "".join(f" '--{c}'" for c in cands)
                    )
                full = cands[0]
            kind = longopts[full]
            if eq:
                if kind == NO_ARG:
                    raise OptError(
                        f"option '--{full}' doesn't allow an argument"
                    )
                value: str | None = val
            elif kind == REQUIRED_ARG:
                i += 1
                if i >= n:
                    raise OptError(
                        f"option '--{full}' requires an argument"
                    )
                value = argv[i]
            else:
                value = None
            opts.append((f"--{full}", value))
            i += 1
            continue
        if arg.startswith("-") and arg != "-":
            j = 1
            while j < len(arg):
                c = arg[j]
                if c not in spec:
                    raise OptError(f"invalid option -- '{c}'")
                if spec[c]:
                    rest = arg[j + 1 :]
                    if rest:
                        opts.append((f"-{c}", rest))
                    else:
                        i += 1
                        if i >= n:
                            raise OptError(
                                f"option requires an argument -- '{c}'"
                            )
                        opts.append((f"-{c}", argv[i]))
                    break
                opts.append((f"-{c}", ""))
                j += 1
            i += 1
            continue
        break  # first positional: stop, like the '+' optstring
    return opts, argv[i:]
