"""Dense-DFA multi-pattern scan for large pattern sets.

Host builds the Aho-Corasick automaton (aho_corasick.c:111-271) flattened to
a [S, 256] int32 next-state table; the device walks many independent text
chunks in parallel (lanes), each with a (maxlen-1)-byte halo, emitting only
ends inside the owned region. Lands as a Pallas kernel in milestone M3.

Until then, large sets are processed in fused groups of FUSED_MAX patterns —
semantically identical (union of per-pattern ALL matches), just more passes
over the text.
"""

from __future__ import annotations

import numpy as np

from ..params import SearchParams


def search_dfa(params: SearchParams, text) -> "SearchResult":
    from ..engine.search import SearchResult, _EMPTY_POS
    from ..engine import resolve
    from . import multi as multi_mod

    patterns = tuple(p for p in params.patterns if len(p) > 0)
    n = len(text)

    # Grouped fused scans: exact, multi-pass. Replaced by the DFA kernel.
    groups = [
        patterns[i : i + multi_mod.FUSED_MAX]
        for i in range(0, len(patterns), multi_mod.FUSED_MAX)
    ]
    all_starts, all_ends = [], []
    total = 0
    line_masks = []
    from . import dispatch, literal
    import jax.numpy as jnp

    text_arr, true_len = dispatch.stage_text(text)
    need_positions = params.track_positions and not params.count_matches_mode
    want_masks = need_positions or params.max_count is not None

    any_line_count = None
    if params.count_lines_mode:
        # OR across all groups on device would need one fused pass; do a
        # mask union on host for now (count-lines with >32 patterns is a
        # cold path until the DFA kernel lands).
        union = np.zeros(n, dtype=bool)
        for g in groups:
            _, _, packed = multi_mod.scan_multi(
                text_arr, true_len, patterns=g,
                case_sensitive=params.case_sensitive,
                whole_word=params.whole_word, want_masks=True,
            )
            for pk in packed:
                union |= np.asarray(pk)[:n].astype(bool)
        nl = resolve.newline_positions_host(text)
        starts = np.flatnonzero(union)
        lines = len(np.unique(np.searchsorted(nl, starts, side="left")))
        mc = params.max_count
        return SearchResult(min(lines, mc) if mc is not None else lines, np.zeros((0, 2), np.int64), n)

    for g in groups:
        t, _, packed = multi_mod.scan_multi(
            text_arr, true_len, patterns=g,
            case_sensitive=params.case_sensitive,
            whole_word=params.whole_word, want_masks=want_masks,
        )
        total += int(t)
        if want_masks:
            for p, pk in zip(g, packed):
                s = np.flatnonzero(np.asarray(pk)[:n])
                all_starts.append(s)
                all_ends.append(s + len(p))

    if not want_masks:
        return SearchResult(total, np.zeros((0, 2), np.int64), n)

    starts = np.concatenate(all_starts) if all_starts else np.zeros(0, np.int64)
    ends = np.concatenate(all_ends) if all_ends else np.zeros(0, np.int64)
    order = np.lexsort((starts, ends))
    starts, ends = starts[order], ends[order]
    if params.max_count is not None:
        starts, ends = starts[: params.max_count], ends[: params.max_count]
    order = np.lexsort((ends, starts))
    positions = np.stack([starts[order], ends[order]], axis=1).astype(np.int64)
    return SearchResult(len(positions), positions, n)
