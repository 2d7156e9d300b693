"""POSIX ERE static analysis for TPU-side filtering.

The reference treats `-E` as a scalar host path (krep.c:1774-1777,
1389-1579). The TPU-native acceleration keeps glibc regexec as the exact
matcher but runs it only where a match can possibly be: a wide device scan
finds the *required literal factors* of the ERE, and regexec visits only
the lines containing one (engine/regex_engine.py).

This module computes, for an ERE source (the already-combined/wrapped bytes
of build_regex_source):

  * ``newline_safe`` — True only if NO match can contain a 0x0A byte under
    REG_NEWLINE semantics ('.' and non-matching bracket lists never match
    newline; positive bracket lists only via an explicit member/range/class).
    Line-level filtering and line-chunked parallelism are exact iff this
    holds.
  * ``literals`` — a factor set: every match contains at least one member
    as a contiguous substring (under REG_ICASE the containment is
    case-insensitive; members are reported as written). Empty tuple when no
    useful factor exists.

Anything outside the understood grammar makes ``analyze`` return None —
callers must then treat the pattern as unsafe and use the plain path.
POSIX ERE has no backreferences, so every pattern is a regular language;
the analysis here is purely syntactic and conservative.
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_LITERALS = 32   # analyzer's own factor-set cap (deliberately tighter
                    # than ops/multi.FUSED_MAX=64: regex factor sets beyond
                    # ~32 stop being selective enough to pay for the scan)
MAX_LIT_LEN = 64    # SWAR kernel unroll budget; truncation keeps soundness


class _Unsupported(Exception):
    pass


@dataclass(frozen=True)
class Analysis:
    newline_safe: bool
    literals: tuple[bytes, ...]  # factor set; () = no filter available


@dataclass
class _Summary:
    """Analysis of one sub-expression."""

    can_nl: bool                      # some match may contain '\n'
    req_set: tuple[bytes, ...]        # every match contains ≥1 member ((): none)
    exact: bytes | None               # matches exactly this literal, or None


# GNU escapes that are zero-width assertions (safe, no byte consumed)
_ZERO_WIDTH_ESCAPES = frozenset(b"bB<>`'")
# escaped punctuation → the literal byte itself
_PUNCT = frozenset(b"\\.[]()*+?{}|^$/-,:;!@#~\"& =%<>`'_")
# one-byte consumers that cannot match '\n' (GNU \w = [0-9A-Za-z_],
# \S = non-space — '\n' IS space, so \S can't match it)
_SAFE_CLASS_ESCAPES = frozenset(b"wS")
# one-byte consumers that CAN match '\n' (\W non-word, \s space)
_NL_CLASS_ESCAPES = frozenset(b"Ws")

_NAMED_CLASSES_NL = {b"space", b"cntrl"}
_NAMED_CLASSES = {
    b"alpha", b"digit", b"alnum", b"upper", b"lower", b"punct",
    b"graph", b"print", b"xdigit", b"blank", b"space", b"cntrl", b"word",
}


class _Parser:
    def __init__(self, src: bytes):
        self.s = src
        self.i = 0
        self.n = len(src)

    def peek(self) -> int:
        return self.s[self.i] if self.i < self.n else -1

    def take(self) -> int:
        c = self.s[self.i]
        self.i += 1
        return c

    # --- grammar ---

    def parse(self) -> _Summary:
        out = self.alternation(top=True)
        if self.i != self.n:
            raise _Unsupported("trailing input")
        return out

    def alternation(self, top: bool = False) -> _Summary:
        branches = [self.branch()]
        while self.peek() == 0x7C:  # '|'
            self.take()
            branches.append(self.branch())
        if len(branches) == 1:
            return branches[0]
        can_nl = any(b.can_nl for b in branches)
        if all(b.req_set for b in branches):
            merged: list[bytes] = []
            for b in branches:
                for lit in b.req_set:
                    if lit not in merged:
                        merged.append(lit)
            req = tuple(merged) if len(merged) <= MAX_LITERALS else ()
        else:
            req = ()
        return _Summary(can_nl, req, None)

    def branch(self) -> _Summary:
        can_nl = False
        run = bytearray()       # current mandatory literal run
        runs: list[bytes] = []  # completed runs
        group_sets: list[tuple[bytes, ...]] = []  # mandatory groups' factors
        pure = bytearray()      # whole-branch literal accumulator
        is_pure = True

        def close_run():
            if run:
                runs.append(bytes(run))
                run.clear()

        while True:
            c = self.peek()
            if c in (-1, 0x7C) or (c == 0x29):  # end, '|', ')'
                break
            atom = self.atom()
            quant = self.quantifier()
            if self.peek() in (0x2A, 0x2B, 0x3F, 0x7B):
                # glibc chains quantifiers: 'a{2}{3}' is a SECOND repetition
                # of the quantified atom (matches 'aaaaaa', verified against
                # regcomp/regexec), not a literal '{3}'. The factor logic
                # below assumes one quantifier per atom — bail to the exact
                # plain path rather than silently under-matching.
                raise _Unsupported("chained quantifier")
            lo, hi = quant  # occurrence bounds; hi = -1 for unbounded

            can_nl = can_nl or (atom.can_nl and hi != 0)
            if quant != (1, 1):
                is_pure = False

            if atom.kind == "zero":
                # zero-width assertion: a match's bytes around it are still
                # contiguous — runs pass through unbroken
                continue
            if atom.kind == "lit":
                if lo >= 1:
                    run.append(atom.byte)
                    if pure is not None:
                        pure.append(atom.byte)
                    if not (lo == 1 and hi == 1):
                        close_run()  # repeats may interleave; keep one copy
                else:
                    close_run()
                    is_pure = False
                continue
            if atom.kind == "group":
                g = atom.summary
                if lo >= 1 and g.exact is not None and (lo, hi) == (1, 1):
                    run.extend(g.exact)
                    if pure is not None:
                        pure.extend(g.exact)
                    continue
                close_run()
                is_pure = False
                if lo >= 1:
                    if g.exact is not None:
                        runs.append(g.exact)  # ≥1 occurrence ⇒ contained
                    elif g.req_set:
                        group_sets.append(g.req_set)
                continue
            # consuming atom of unknown content ('.', bracket, class escape)
            close_run()
            is_pure = False

        close_run()

        # pick the best factor: longest single run beats a group set with a
        # short weakest member (score = the minimum guaranteed length)
        best: tuple[bytes, ...] = ()
        best_score = 0
        for r in runs:
            if len(r) > best_score:
                best, best_score = (r,), len(r)
        for gs in group_sets:
            score = min(len(x) for x in gs)
            if score > best_score and len(gs) <= MAX_LITERALS:
                best, best_score = gs, score
        best = tuple(x[:MAX_LIT_LEN] for x in best)
        exact = bytes(pure) if is_pure else None
        return _Summary(can_nl, best, exact)

    def quantifier(self) -> tuple[int, int]:
        """Returns (min, max) occurrences; max == -1 for unbounded."""
        c = self.peek()
        if c == 0x2A:  # '*'
            self.take()
            return (0, -1)
        if c == 0x2B:  # '+'
            self.take()
            return (1, -1)
        if c == 0x3F:  # '?'
            self.take()
            return (0, 1)
        if c == 0x7B:  # '{'
            j = self.s.find(b"}", self.i)
            if j == -1:
                raise _Unsupported("unbalanced {")
            body = self.s[self.i + 1 : j]
            parts = body.split(b",")

            def bound(b: bytes) -> int:
                # glibc accepts ASCII digits only: '{ 2 }', '{+2}', '{1_0}'
                # are all REG_BADBR (verified) — int() must not widen that
                if not b or not all(0x30 <= ch <= 0x39 for ch in b):
                    raise _Unsupported("bad interval")
                return int(b)

            if len(parts) == 1:
                lo = hi = bound(parts[0])
            elif len(parts) == 2:
                lo = bound(parts[0]) if parts[0] else 0
                hi = bound(parts[1]) if parts[1] else -1
            else:
                raise _Unsupported("bad interval")
            if hi != -1 and hi < lo:
                raise _Unsupported("bad interval")  # REG_BADBR: {3,2}
            self.i = j + 1
            return (lo, hi)
        return (1, 1)

    def atom(self):
        c = self.take()
        if c == 0x28:  # '('
            inner = self.alternation()
            if self.peek() != 0x29:
                raise _Unsupported("unbalanced (")
            self.take()
            return _Atom("group", summary=inner)
        if c == 0x5B:  # '['
            return self.bracket()
        if c == 0x5C:  # backslash
            e = self.peek()
            if e == -1:
                raise _Unsupported("trailing backslash")
            self.take()
            if e in _ZERO_WIDTH_ESCAPES:
                return _Atom("zero")
            if e in _SAFE_CLASS_ESCAPES:
                return _Atom("class", can_nl=False)
            if e in _NL_CLASS_ESCAPES:
                return _Atom("class", can_nl=True)
            if e in _PUNCT or not (0x41 <= e <= 0x5A or 0x61 <= e <= 0x7A
                                   or 0x30 <= e <= 0x39):
                return _Atom("lit", byte=e)
            # \n-style C escapes are NOT processed by regcomp (a "\n" escape
            # in source is the letter n) — but unknown letter escapes may be
            # GNU extensions with surprising semantics: bail out
            raise _Unsupported(f"escape \\{chr(e)}")
        if c == 0x5E or c == 0x24:  # '^' '$'
            return _Atom("zero")
        if c == 0x2E:  # '.'
            return _Atom("class", can_nl=False)  # REG_NEWLINE: '.' ≠ '\n'
        if c in (0x2A, 0x2B, 0x3F, 0x7B):
            # glibc ERE: a quantifier (incl. '{') with no atom to repeat is
            # REG_BADRPT ('{3}', 'a|{3}', '({3})' all fail regcomp) — '{'
            # is never a literal byte at atom position
            raise _Unsupported("dangling quantifier")
        if c == 0x0A:
            return _Atom("lit", byte=0x0A, can_nl=True)
        return _Atom("lit", byte=c)

    def bracket(self):
        """Parse a bracket expression; '[' already consumed."""
        neg = False
        if self.peek() == 0x5E:  # '^'
            neg = True
            self.take()
        members: list[int] = []
        has_range_or_class = False
        can_nl = False
        first = True
        while True:
            c = self.peek()
            if c == -1:
                raise _Unsupported("unbalanced [")
            if c == 0x5D and not first:  # ']'
                self.take()
                break
            first = False
            c = self.take()
            if c == 0x5B and self.peek() in (0x3A, 0x3D, 0x2E):  # [: [= [.
                kind = self.take()
                close = bytes([kind]) + b"]"
                j = self.s.find(close, self.i)
                if j == -1:
                    raise _Unsupported("unbalanced [: :]")
                name = self.s[self.i : j]
                self.i = j + 2
                if kind != 0x3A:
                    raise _Unsupported("collating element")  # [= =], [. .]
                if name not in _NAMED_CLASSES:
                    raise _Unsupported(f"class [:{name.decode()}:]")
                has_range_or_class = True
                if name in _NAMED_CLASSES_NL:
                    can_nl = True
                continue
            if self.peek() == 0x2D and self.s[self.i + 1 : self.i + 2] not in (
                b"]", b""
            ):  # range a-z
                self.take()  # '-'
                hi = self.take()
                if hi == 0x5B and self.peek() in (0x3A, 0x3D, 0x2E):
                    raise _Unsupported("range to class")
                has_range_or_class = True
                if c <= 0x0A <= hi:
                    can_nl = True
                continue
            members.append(c)
            if c == 0x0A:
                can_nl = True

        if neg:
            # REG_NEWLINE: a non-matching list never matches '\n'
            return _Atom("class", can_nl=False)
        if not has_range_or_class and len(members) == 1:
            return _Atom("lit", byte=members[0], can_nl=members[0] == 0x0A)
        return _Atom("class", can_nl=can_nl)


class _Atom:
    __slots__ = ("kind", "byte", "can_nl", "summary")

    def __init__(self, kind, byte=0, can_nl=False, summary=None):
        self.kind = kind      # "lit" | "class" | "zero" | "group"
        self.byte = byte
        self.can_nl = can_nl if kind != "group" else summary.can_nl
        self.summary = summary


def analyze(pattern: bytes) -> Analysis | None:
    """Parse + summarize; None when the source is outside the understood
    grammar (callers must then assume nothing)."""
    try:
        s = _Parser(bytes(pattern)).parse()
    except (_Unsupported, IndexError):
        return None
    literals = tuple(lit for lit in s.req_set if lit)
    return Analysis(newline_safe=not s.can_nl, literals=literals)
