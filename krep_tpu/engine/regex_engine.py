"""POSIX ERE engine (placeholder — M4).

Leftmost-longest + REG_NEWLINE semantics (krep.c:1389-1579) require the host
libc regex engine; Python `re` is leftmost-first and diverges. Implemented in
a later milestone by binding regcomp/regexec via the C runtime extension.
"""

from __future__ import annotations

from ..params import SearchParams


def search_regex(params: SearchParams, text: bytes):
    raise NotImplementedError("POSIX ERE engine lands in milestone M4")
