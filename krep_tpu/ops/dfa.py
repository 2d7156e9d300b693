"""Large-pattern-set multi-pattern search.

Routes K > FUSED_MAX pattern sets through the dense-DFA device scan
(ops/ac.py — the TPU equivalent of aho_corasick.c). Pattern attribution and
whole-word filtering happen host-side at the (sparse) flagged end positions.
If the automaton would exceed the dense-table cap, falls back to grouped
fused scans (exact, more passes).
"""

from __future__ import annotations

import numpy as np

from ..params import SearchParams


def search_dfa(params: SearchParams, text) -> "SearchResult":
    """>FUSED_MAX-pattern search. Default route: grouped fused SWAR passes
    (measured ~500x faster than the gather-per-byte DFA walk on v5e — XLA
    lowers the state gather poorly). KREP_TPU_DFA=1 opts into the dense-DFA
    device path (ops/ac.py)."""
    import os

    from . import dispatch

    if os.environ.get("KREP_TPU_DFA") != "1":
        if dispatch.backend_name() == "swar":
            try:
                return _grouped_swar(params, text)
            except (ImportError, NotImplementedError):
                pass
        return _grouped_fallback(params, text)
    return _dense_dfa(params, text)


def _grouped_swar(params: SearchParams, text) -> "SearchResult":
    """Routed large-K device scans (MXU bit-matmul single pass when the set
    qualifies, else fused SWAR groups of FUSED_MAX); union masks OR-merge
    on device, attribution and line accounting as in ops/multi.py."""
    from ..engine.search import SearchResult, _EMPTY_POS
    from . import dispatch, multi as multi_mod

    patterns = tuple(p for p in params.patterns if len(p) > 0)
    n = len(text)
    staged = dispatch.stage(text)
    mc = params.max_count
    need_positions = params.track_positions and not params.count_matches_mode
    need_masks = need_positions or params.count_lines_mode

    if not need_masks:
        # pure counting: one routed device pass (MXU bit-matmul when the
        # set qualifies — single pass at any K beats per-group passes)
        total = int(
            multi_mod.fused_count_device(
                staged, patterns, params.case_sensitive, params.whole_word,
                max_count=mc,
            )
        )
        return SearchResult(min(total, mc) if mc is not None else total, _EMPTY_POS, n)

    if params.count_lines_mode:
        # union mask chained into the bit-packed line kernel on device —
        # -c at any K returns one scalar, no full-mask D2H readback (the
        # reference's AC counts lines in-stream, aho_corasick.c:390-403)
        lines = int(
            multi_mod.fused_lines_device(
                staged, patterns, params.case_sensitive, params.whole_word
            )
        )
        return SearchResult(min(lines, mc) if mc is not None else lines, _EMPTY_POS, n)

    mask, _mask_exact = multi_mod.fused_union_mask_device(
        staged, patterns, params.case_sensitive, params.whole_word
    )

    union = np.asarray(mask).view(np.uint8)[:n]
    union_starts = np.flatnonzero(union).astype(np.int64)
    data = (
        np.frombuffer(text, np.uint8)
        if isinstance(text, (bytes, bytearray))
        else np.asarray(text)
    )

    from ..engine import resolve

    starts, ends = resolve.attribute_patterns(
        data, union_starts, patterns,
        case_sensitive=params.case_sensitive, whole_word=params.whole_word,
        anchor="start",
    )
    positions = resolve.ac_order_truncate(
        starts, ends, mc, final_sort=params.sorted_positions
    )
    return SearchResult(len(positions), positions, n)


def _dense_dfa(params: SearchParams, text) -> "SearchResult":
    from ..engine.search import SearchResult, _EMPTY_POS
    from . import ac

    patterns = tuple(p for p in params.patterns if len(p) > 0)
    data = (
        np.frombuffer(text, np.uint8)
        if isinstance(text, (bytes, bytearray))
        else np.asarray(text)
    )
    n = data.shape[0]

    pure_count = params.count_matches_mode and not params.whole_word
    out = ac.search_dense_dfa(
        list(patterns), data, params.case_sensitive, want_positions=not pure_count
    )
    if out is None:  # automaton too large for the dense table
        return _grouped_fallback(params, text)
    total, ends = out

    mc = params.max_count
    if pure_count:
        return SearchResult(min(total, mc) if mc is not None else total, _EMPTY_POS, n)

    from ..engine import resolve as _resolve

    starts, ends_arr = _resolve.attribute_patterns(
        data, np.asarray(ends, np.int64), patterns,
        case_sensitive=params.case_sensitive, whole_word=params.whole_word,
        anchor="end",
    )

    if params.count_lines_mode:
        from ..engine.resolve import newline_positions_host

        nl = newline_positions_host(data)
        order = np.argsort(starts, kind="stable")
        try:
            from ..native import runtime as _native

            lines = _native.distinct_lines(
                np.ascontiguousarray(starts[order], np.int64),
                np.ascontiguousarray(nl, np.int64),
            )
        except Exception:
            lines = len(np.unique(np.searchsorted(nl, starts, side="left")))
        return SearchResult(min(lines, mc) if mc is not None else lines, _EMPTY_POS, n)

    positions = _resolve.ac_order_truncate(
        starts, ends_arr, mc, final_sort=params.sorted_positions
    )
    if params.count_matches_mode:  # whole_word forced the positions path
        return SearchResult(len(positions), _EMPTY_POS, n)
    return SearchResult(len(positions), positions, n)


def _grouped_fallback(params: SearchParams, text) -> "SearchResult":
    """Exact fallback: fused scans in groups of FUSED_MAX patterns."""
    from ..engine.search import SearchResult
    from . import dispatch, multi as multi_mod

    patterns = tuple(p for p in params.patterns if len(p) > 0)
    n = len(text)
    groups = [
        patterns[i : i + multi_mod.FUSED_MAX]
        for i in range(0, len(patterns), multi_mod.FUSED_MAX)
    ]
    text_arr, true_len = dispatch.stage_text(text)
    need_positions = params.track_positions and not params.count_matches_mode
    want_masks = need_positions or params.max_count is not None or params.count_lines_mode
    mc = params.max_count

    total = 0
    all_starts, all_ends = [], []
    union = np.zeros(n, dtype=bool) if params.count_lines_mode else None
    for g in groups:
        t, _, packed = multi_mod.scan_multi(
            text_arr, true_len, patterns=g,
            case_sensitive=params.case_sensitive,
            whole_word=params.whole_word, want_masks=want_masks,
        )
        total += int(t)
        if not want_masks and mc is not None and total >= mc:
            break  # -m cap reached: later groups can't lower the count
        if want_masks:
            for p, pk in zip(g, packed):
                s = np.flatnonzero(np.asarray(pk)[:n])
                if params.count_lines_mode:
                    union[s] = True
                all_starts.append(s)
                all_ends.append(s + len(p))

    if params.count_lines_mode:
        from ..engine.resolve import newline_positions_host

        nl = newline_positions_host(text)
        starts = np.flatnonzero(union)
        lines = len(np.unique(np.searchsorted(nl, starts, side="left")))
        return SearchResult(min(lines, mc) if mc is not None else lines, np.zeros((0, 2), np.int64), n)

    if not want_masks:
        return SearchResult(min(total, mc) if mc is not None else total, np.zeros((0, 2), np.int64), n)

    starts = np.concatenate(all_starts) if all_starts else np.zeros(0, np.int64)
    ends = np.concatenate(all_ends) if all_ends else np.zeros(0, np.int64)
    order = np.lexsort((starts, ends))
    starts, ends = starts[order], ends[order]
    if mc is not None:
        starts, ends = starts[:mc], ends[:mc]
    order = np.lexsort((ends, starts))
    positions = np.stack([starts[order], ends[order]], axis=1).astype(np.int64)
    if params.count_matches_mode:
        return SearchResult(len(positions), np.zeros((0, 2), np.int64), n)
    return SearchResult(len(positions), positions, n)
