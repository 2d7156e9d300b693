"""Multi-pattern literal search (the Aho-Corasick capability).

For small pattern sets the TPU-natural formulation is NOT a sequential DFA
walk (aho_corasick.c:299-466, one gather per byte) but a fused K-pattern
dense scan: the text streams through VMEM once and K all-starts masks are
computed in the same pass. This reproduces AC semantics exactly — the
reference's own tests assert AC count == Σ per-pattern BMH(ALL) counts
(test_multiple_patterns.c:345-471).

Emission order matters for -m truncation: AC emits by END position as it
walks the text, and within one end position by descending pattern length
(output chain walks from the deepest node via fail links,
aho_corasick.c:352-431). We therefore truncate in (end asc, start asc)
order, then re-sort by (start, end) like the final qsort (krep.c:3020-3023).

Large pattern sets (K > FUSED_MAX) fall back to the dense-DFA device path in
ops/dfa.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..params import SearchParams
from . import dispatch, literal

# One fused pass handles up to this many patterns. Measured on v5e at 1 GiB
# (english corpus, count mode): K=16 31.5 GB/s, K=32 17.2, K=64 single-pass
# 7.7 vs 7.0 for grouped 2x32 — single-pass wins through K=64 (shared
# E-shift/compare caches beat a second text pass).
FUSED_MAX = 64


@functools.partial(
    jax.jit,
    static_argnames=("patterns", "case_sensitive", "whole_word", "want_masks"),
)
def scan_multi(
    text_arr,
    true_len,
    *,
    patterns: tuple[bytes, ...],
    case_sensitive: bool,
    whole_word: bool,
    want_masks: bool,
):
    """Fused K-pattern scan. Returns (total_count, matched_line_count,
    tuple_of_packed_masks)."""
    masks = []
    total = jnp.int32(0)
    any_mask = jnp.zeros((text_arr.shape[0],), dtype=jnp.bool_)
    for p in patterns:
        m = literal.all_starts_mask(
            text_arr,
            p,
            case_sensitive=case_sensitive,
            whole_word=whole_word,
            true_len=true_len,
        )
        masks.append(m)
        total = total + jnp.sum(m.astype(jnp.int32))
        any_mask = any_mask | m
    lines = literal.matched_line_count(any_mask, text_arr)
    if want_masks:
        out_masks = tuple(m.astype(jnp.uint8) for m in masks)
    else:
        out_masks = tuple(jnp.zeros((128,), jnp.uint8) for _ in patterns)
    return total, lines, out_masks


MXU_MIN_K = 32        # measured crossover: MXU wins from K=32 up (v5e)
MXU_MAX_PASS = 256    # D-block VMEM cap for one MXU pass


def _mxu_eligible(patterns, whole_word):
    """Routing guard for ops/mxu_multi: besides length, its non-strict
    path requires NUL-free patterns (a NUL-containing pattern would match
    the zero padding past true_len — see scan_count's staging contract)."""
    import os

    from . import mxu_multi

    del whole_word  # supported in-kernel since the boundary dot
    return (
        os.environ.get("KREP_TPU_MXU", "auto") != "0"
        and len(patterns) >= MXU_MIN_K
        and all(
            0 < len(p) <= mxu_multi.MAX_LEN_LONG and 0 not in p
            for p in patterns
        )
    )


def fused_count_device(staged, patterns, case_sensitive, whole_word,
                       max_count=None, strict=False):
    """Total ALL-overlap K-pattern match count on device: routes between
    the fused SWAR VPU pass (small K / long patterns / whole-word) and the
    MXU bit-matmul kernel (ops/mxu_multi — measured faster from K=32 up
    when all patterns fit its 13-byte window). Returns a device scalar;
    multi-pass runs stop early once max_count is provably reached
    (krep.c:2950-2962's budget capping). strict=True forces explicit
    start-bound masking in the MXU kernel — required when the staged
    buffer's tail past true_len may hold non-zero bytes (with_len)."""
    from . import mxu_multi, pallas_swar

    if _mxu_eligible(patterns, whole_word):
        total = jnp.int32(0)
        for i in range(0, len(patterns), MXU_MAX_PASS):
            g = patterns[i : i + MXU_MAX_PASS]
            total = total + mxu_multi.scan_count(
                staged.u32, staged.true_len, patterns=g,
                case_sensitive=case_sensitive, strict=strict,
                whole_word=whole_word,
            )
            if (
                max_count is not None
                and i + MXU_MAX_PASS < len(patterns)
                and int(total) >= max_count
            ):
                break
        return total
    total = jnp.int32(0)
    for i in range(0, len(patterns), FUSED_MAX):
        g = patterns[i : i + FUSED_MAX]
        c, _, _ = pallas_swar.scan_multi(
            staged.u32, staged.true_len, patterns=g,
            case_sensitive=case_sensitive,
            whole_word=whole_word, want_mask=False, want_lines=False,
        )
        total = total + c
        if (
            max_count is not None
            and i + FUSED_MAX < len(patterns)
            and int(total) >= max_count
        ):
            break
    return total


def fused_union_mask_device(staged, patterns, case_sensitive, whole_word):
    """Union match-start mask (flat packed-u32, v1 layout) for K patterns:
    MXU bit-matmul when the set qualifies, else fused SWAR. Returns
    (mask, exact): both kernels prune whole-word boundaries in-kernel now
    (the MXU via its boundary dot), so the mask is always exact."""
    from . import mxu_multi, pallas_swar

    if _mxu_eligible(patterns, whole_word):
        union = None
        for i in range(0, len(patterns), MXU_MAX_PASS):
            g = patterns[i : i + MXU_MAX_PASS]
            _, m = mxu_multi.scan_count(
                staged.u32, staged.true_len, patterns=g,
                case_sensitive=case_sensitive, want_mask=True,
                whole_word=whole_word,
            )
            union = m if union is None else (union | m)
        return union, True
    union = None
    for i in range(0, len(patterns), FUSED_MAX):
        g = patterns[i : i + FUSED_MAX]
        _, _, m = pallas_swar.scan_multi(
            staged.u32, staged.true_len, patterns=g,
            case_sensitive=case_sensitive,
            whole_word=whole_word, want_mask=True, want_lines=False,
        )
        union = m if union is None else (union | m)
    return union, True


def fused_lines_device(staged, patterns, case_sensitive, whole_word):
    """Matched-line count of the K-pattern union, entirely on device —
    multi-pattern -c with scalar-only readback at any K (the reference's
    AC counts lines in-stream, aho_corasick.c:390-403 + krep.c:1331-1351).
    Route: the union mask (MXU bit-matmul from K=32 up, fused SWAR below)
    CHAINS into the bit-packed line kernel (pallas_swar.lines_from_mask).
    Measured on v5e at K=64 mixed 4-20B, 128 MiB: chained 9.18 GB/s vs
    8.17 for in-kernel accounting (mxu_multi want_lines=True — kept,
    tested, opt-in via KREP_TPU_MXU_LINES=inkernel): the MXU kernel is
    VPU-D-stage bound, so in-kernel accounting adds to its critical path
    while the chained second pass costs only ~1/200 per byte
    (BENCH_NOTES.md round 5). Returns a traced i32."""
    from . import mxu_multi, pallas_swar

    if (
        os.environ.get("KREP_TPU_MXU_LINES") == "inkernel"
        and _mxu_eligible(patterns, whole_word)
        and len(patterns) <= MXU_MAX_PASS
        and getattr(staged, "tail_zero", False)
    ):
        _, lines = mxu_multi.scan_count(
            staged.u32, staged.true_len, patterns=tuple(patterns),
            case_sensitive=case_sensitive, whole_word=whole_word,
            want_lines=True,
        )
        return lines
    mask, _ = fused_union_mask_device(
        staged, patterns, case_sensitive, whole_word
    )
    return pallas_swar.lines_from_mask(
        staged.u32, mask, staged.true_len,
        nl_start_matches=any(p[0:1] == b"\n" for p in patterns),
    )


def _search_multi_swar(params: SearchParams, text, patterns) -> "SearchResult":
    """Fused K-pattern SWAR device pass + host attribution."""
    from ..engine.search import SearchResult, _EMPTY_POS
    from . import dispatch, pallas_swar

    n = len(text)
    staged = dispatch.stage(text)
    mc = params.max_count

    if params.count_lines_mode:
        if _mxu_eligible(patterns, params.whole_word):
            # MXU union mask chained into the bit-packed line kernel —
            # multi-pattern -c at MXU rate with scalar-only readback (the
            # reference's AC counts lines in-stream at any K,
            # aho_corasick.c:390-403)
            lines = int(
                fused_lines_device(
                    staged, patterns, params.case_sensitive,
                    params.whole_word,
                )
            )
        else:
            _, lines, _ = pallas_swar.scan_multi(
                staged.u32, staged.true_len, patterns=patterns,
                case_sensitive=params.case_sensitive,
                whole_word=params.whole_word, want_mask=False, want_lines=True,
            )
            lines = int(lines)
        return SearchResult(min(lines, mc) if mc is not None else lines, _EMPTY_POS, n)

    need_positions = params.track_positions and not params.count_matches_mode
    if not need_positions:
        total = int(
            fused_count_device(
                staged, patterns, params.case_sensitive, params.whole_word
            )
        )
        return SearchResult(min(total, mc) if mc is not None else total, _EMPTY_POS, n)

    mask, _mask_exact = fused_union_mask_device(
        staged, patterns, params.case_sensitive, params.whole_word
    )
    from ..engine import resolve

    mk = np.asarray(mask).view(np.uint8)
    union_starts = np.flatnonzero(mk[:n]).astype(np.int64)
    data = (
        np.frombuffer(text, np.uint8)
        if isinstance(text, (bytes, bytearray))
        else np.asarray(text)
    )
    starts, ends = resolve.attribute_patterns(
        data, union_starts, patterns,
        case_sensitive=params.case_sensitive, whole_word=params.whole_word,
        anchor="start",
    )
    positions = resolve.ac_order_truncate(
        starts, ends, mc, final_sort=params.sorted_positions
    )
    return SearchResult(len(positions), positions, n)


def _search_multi_mixed(params: SearchParams, text, patterns) -> "SearchResult":
    """Pattern sets with members beyond the kernel's 64-byte unroll budget,
    or texts beyond the single-array size: short members scan fused, long
    members scan their 64-byte prefix as a filter, in slabs; the union of
    candidate starts is attributed and verified host-side (exact, any K).
    In-kernel whole-word filtering at slab edges is superset-safe (edges
    look like text edges, which only ADMITS candidates) — the host
    attribution enforces exact boundaries."""
    from ..engine import resolve
    from ..engine.search import LONG_PATTERN, SLAB_BYTES, SearchResult, _EMPTY_POS
    from . import dispatch

    n = len(text)
    data = (
        np.frombuffer(text, np.uint8)
        if isinstance(text, (bytes, bytearray))
        else np.asarray(text)
    )
    pieces = []

    shorts = tuple(p for p in patterns if len(p) <= LONG_PATTERN)
    longs = tuple(p for p in patterns if len(p) > LONG_PATTERN)
    use_swar = dispatch.backend_name() == "swar"

    pos = 0
    while pos < n:
        owned = min(SLAB_BYTES, n - pos)
        slab = data[pos : min(pos + owned + LONG_PATTERN, n)]
        staged = dispatch.stage(slab)

        def add_piece(starts):
            starts = starts[starts < owned]
            pieces.append(starts.astype(np.int64) + pos)

        for i in range(0, len(shorts), FUSED_MAX):
            g = shorts[i : i + FUSED_MAX]
            if use_swar:
                from . import pallas_swar

                _, _, mask = pallas_swar.scan_multi(
                    staged.u32, staged.true_len, patterns=g,
                    case_sensitive=params.case_sensitive,
                    whole_word=params.whole_word, want_mask=True, want_lines=False,
                )
                add_piece(dispatch.starts_from_device_mask(mask, len(slab)))
            else:
                _, _, masks = scan_multi(
                    staged.u8, staged.true_len, patterns=g,
                    case_sensitive=params.case_sensitive,
                    whole_word=params.whole_word, want_masks=True,
                )
                for pk in masks:
                    add_piece(np.flatnonzero(np.asarray(pk)[: len(slab)]))
        for p in longs:
            _, _, mask = dispatch.scan_literal_staged(
                staged, pattern=p[:LONG_PATTERN],
                case_sensitive=params.case_sensitive, whole_word=False,
                want_mask=True, want_lines=False,
            )
            add_piece(dispatch.starts_from_device_mask(mask, len(slab)))
        pos += owned

    anchors = (
        np.unique(np.concatenate(pieces)) if pieces else np.zeros(0, np.int64)
    )
    starts, ends = resolve.attribute_patterns(
        data, anchors, patterns,
        case_sensitive=params.case_sensitive, whole_word=params.whole_word,
        anchor="start",
    )
    mc = params.max_count
    if params.count_lines_mode:
        nl = resolve.newline_positions_host(data)
        lines = len(np.unique(np.searchsorted(nl, starts, side="left")))
        return SearchResult(min(lines, mc) if mc is not None else lines, _EMPTY_POS, n)
    positions = resolve.ac_order_truncate(
        starts, ends, mc, final_sort=params.sorted_positions
    )
    if params.count_matches_mode or not params.track_positions:
        return SearchResult(len(positions), _EMPTY_POS, n)
    return SearchResult(len(positions), positions, n)


def _search_multi_sharded(
    params: SearchParams, text, patterns, threads: int | None = None
) -> "SearchResult":
    """Fused K-pattern scan sharded across the device mesh (the reference's
    chunk threads sharing one read-only AC trie, krep.c:2524-2536): per-shard
    union masks + psum'd totals, host-side attribution at the sparse union
    starts."""
    from ..engine import resolve
    from ..engine.search import SearchResult, _EMPTY_POS
    from ..parallel import mesh

    n = len(text)
    data = (
        np.frombuffer(text, np.uint8)
        if isinstance(text, (bytes, bytearray))
        else np.asarray(text)
    )
    mc = params.max_count
    need_positions = params.track_positions and not params.count_matches_mode
    from ..engine.search import _mesh_for_threads

    pure_count = (
        params.count_matches_mode
        and not need_positions
        and not params.count_lines_mode
    )
    if pure_count and _mxu_eligible(patterns, params.whole_word):
        m = _mesh_for_threads(threads)
        if (
            m.devices.flat[0].platform != "cpu"
            and dispatch.backend_name() == "swar"
        ):
            # MXU bit-matmul per shard — the multi-chip route for large-K
            # pure counting (any K, unlike the fused-pass FUSED_MAX cap)
            total = mesh.sharded_count(
                data, patterns, case_sensitive=params.case_sensitive,
                whole_word=params.whole_word, mesh=m,
            )
            return SearchResult(
                min(total, mc) if mc is not None else total, _EMPTY_POS, n
            )
    from ..engine.search import LONG_PATTERN

    shorts = tuple(p for p in patterns if len(p) <= LONG_PATTERN)
    longs = tuple(p for p in patterns if len(p) > LONG_PATTERN)
    m = _mesh_for_threads(threads)

    if not longs and len(shorts) <= FUSED_MAX:
        # single fused group: exact in-mesh line accounting, no host pass
        total, lines, union_starts = mesh.sharded_scan(
            data,
            patterns,
            case_sensitive=params.case_sensitive,
            whole_word=params.whole_word,
            want_mask=need_positions,
            mesh=m,
        )
        if params.count_lines_mode:
            return SearchResult(
                min(lines, mc) if mc is not None else lines, _EMPTY_POS, n
            )
        if not need_positions:
            return SearchResult(
                min(total, mc) if mc is not None else total, _EMPTY_POS, n
            )
        starts, ends = resolve.attribute_patterns(
            data, union_starts, patterns,
            case_sensitive=params.case_sensitive, whole_word=params.whole_word,
            anchor="start",
        )
        positions = resolve.ac_order_truncate(
        starts, ends, mc, final_sort=params.sorted_positions
    )
        if params.count_matches_mode or not params.track_positions:
            return SearchResult(len(positions), _EMPTY_POS, n)
        return SearchResult(len(positions), positions, n)

    # Grouped mesh route for everything else (VERDICT r2 item 6): any K,
    # whole-word sets, >64-byte members — FUSED_MAX-sized groups of shorts
    # (and of long-member PREFIXES, a superset filter) each scan sharded
    # across the mesh; the sparse union of candidate starts is attributed
    # and verified host-side, exactly like the single-chip mixed path
    # (the reference parallelizes AC for every mode, krep.c:2524-2536).
    pure_count = not need_positions and not params.count_lines_mode
    if pure_count and not longs:
        # group totals add exactly (groups partition the pattern set and
        # AC's total is the sum of per-pattern ALL counts)
        total = 0
        for i in range(0, len(shorts), FUSED_MAX):
            g = shorts[i : i + FUSED_MAX]
            t, _, _ = mesh.sharded_scan(
                data, g, case_sensitive=params.case_sensitive,
                whole_word=params.whole_word, want_mask=False, mesh=m,
            )
            total += t
        return SearchResult(
            min(total, mc) if mc is not None else total, _EMPTY_POS, n
        )

    anchor_parts = []
    for i in range(0, len(shorts), FUSED_MAX):
        g = shorts[i : i + FUSED_MAX]
        _, _, st = mesh.sharded_scan(
            data, g, case_sensitive=params.case_sensitive,
            whole_word=params.whole_word, want_mask=True, mesh=m,
        )
        anchor_parts.append(st)
    for i in range(0, len(longs), FUSED_MAX):
        # prefixes scan without whole-word (the after-check at a prefix end
        # is meaningless); host attribution enforces exact boundaries
        g = tuple(p[:LONG_PATTERN] for p in longs[i : i + FUSED_MAX])
        _, _, st = mesh.sharded_scan(
            data, g, case_sensitive=params.case_sensitive,
            whole_word=False, want_mask=True, mesh=m,
        )
        anchor_parts.append(st)
    anchors = (
        np.unique(np.concatenate(anchor_parts))
        if anchor_parts
        else np.zeros(0, np.int64)
    )
    starts, ends = resolve.attribute_patterns(
        data, anchors, patterns,
        case_sensitive=params.case_sensitive, whole_word=params.whole_word,
        anchor="start",
    )
    if params.count_lines_mode:
        nl = resolve.newline_positions_host(data)
        lines = len(np.unique(np.searchsorted(nl, starts, side="left")))
        return SearchResult(
            min(lines, mc) if mc is not None else lines, _EMPTY_POS, n
        )
    positions = resolve.ac_order_truncate(
        starts, ends, mc, final_sort=params.sorted_positions
    )
    if params.count_matches_mode or not params.track_positions:
        return SearchResult(len(positions), _EMPTY_POS, n)
    return SearchResult(len(positions), positions, n)


SHARD_MIN_BYTES = 1 << 16


def search_multi(
    params: SearchParams, text, threads: int | None = None
) -> "SearchResult":
    from ..engine.search import LONG_PATTERN, SLAB_BYTES, SearchResult, _EMPTY_POS

    n = len(text)
    patterns = tuple(p for p in params.patterns if len(p) > 0)
    if not patterns or n == 0:
        return SearchResult(0, _EMPTY_POS, n)

    from ..parallel.mesh import safe_device_count

    D = safe_device_count()
    eff_d = D if threads is None else max(1, min(threads, D))
    per_shard = -(-n // eff_d)
    if (
        D > 1
        and n >= SHARD_MIN_BYTES
        and threads != 1
        and per_shard <= SLAB_BYTES
    ):
        # -t shapes the shard count like the reference's chunk threads
        # (applies to the AC path too, krep.c:2524-2536); -t 1 forces the
        # single-device path (inline single-chunk run, krep.c:2764).
        # Every mode shards: fused groups at any K, long members via
        # prefix groups, pure-count large-K via the per-shard MXU kernel.
        return _search_multi_sharded(params, text, patterns, threads)
    if any(len(p) > LONG_PATTERN for p in patterns) or n > SLAB_BYTES:
        return _search_multi_mixed(params, text, patterns)
    if len(patterns) > FUSED_MAX:
        from . import dfa

        return dfa.search_dfa(params, text)

    from . import dispatch

    if dispatch.backend_name() == "swar":
        try:
            return _search_multi_swar(params, text, patterns)
        except (ImportError, NotImplementedError):
            pass

    text_arr, true_len = dispatch.stage_text(text)
    max_count = params.max_count

    if params.count_lines_mode:
        _, lines, _ = scan_multi(
            text_arr,
            true_len,
            patterns=patterns,
            case_sensitive=params.case_sensitive,
            whole_word=params.whole_word,
            want_masks=False,
        )
        lines = int(lines)
        count = min(lines, max_count) if max_count is not None else lines
        return SearchResult(count, _EMPTY_POS, n)

    need_positions = params.track_positions and not params.count_matches_mode
    want_masks = need_positions or max_count is not None
    total, _, packed = scan_multi(
        text_arr,
        true_len,
        patterns=patterns,
        case_sensitive=params.case_sensitive,
        whole_word=params.whole_word,
        want_masks=want_masks,
    )

    if not want_masks:
        return SearchResult(int(total), _EMPTY_POS, n)

    starts_list, ends_list = [], []
    for p, pk in zip(patterns, packed):
        s = np.flatnonzero(np.asarray(pk)[:n])
        starts_list.append(s)
        ends_list.append(s + len(p))
    starts = np.concatenate(starts_list)
    ends = np.concatenate(ends_list)

    from ..engine import resolve

    # Truncate in AC emission order, then the file path's final
    # (start, end) presentation sort — or keep emission order for
    # stdin/-s targets (params.sorted_positions; krep.c:2187+ vs 3020-3023)
    positions = resolve.ac_order_truncate(
        starts, ends, max_count, final_sort=params.sorted_positions
    )
    return SearchResult(len(positions), positions, n)
