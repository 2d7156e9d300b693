"""Batched many-small-file device scan (BASELINE config 5).

The reference launches a full search per file even for tiny files
(krep.c:3402-3430); on TPU per-launch latency would dominate a `-r` walk
over a source tree. Instead, eligible files are concatenated into one
staged buffer with separator gaps and scanned in ONE device pass; results
are split per file on the host.

Separator: b"\\n" + NUL padding (+ alignment to 4 bytes for the SWAR
phases). Literal patterns never contain NUL (CLI patterns are C strings,
krep.c:3571-3626), so no match can cross a boundary, and the newline closes
the previous file's last line so per-file line accounting stays exact.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..params import MAX_PATTERN_LENGTH, SearchParams

BATCH_FILE_MAX = 1 << 20       # files larger than this are searched solo
BATCH_BUFFER_MAX = 64 << 20    # flush batch at this many bytes
GAP = MAX_PATTERN_LENGTH + 1   # separator bytes between files


@dataclass
class BatchEntry:
    path: str
    offset: int   # start of file bytes in the batch buffer
    size: int


def eligible_params(params: SearchParams) -> bool:
    """Size-independent half of `eligible` — a pure function of the search
    params, so walkers evaluate it ONCE per run instead of per file (the
    per-file `select_algorithm` re-derivation was ~25% of warm -r wall
    time on a 951-file tree)."""
    if params.use_regex or params.num_patterns != 1:
        return False
    # separator bytes are '\n' + NULs: any match crossing a file boundary
    # would have to contain one of them, so exclude such patterns
    if (
        b"\x00" in params.pattern
        or b"\n" in params.pattern
        or len(params.pattern) == 0
    ):
        return False
    from ..engine.select import select_algorithm
    from ..params import Algorithm

    sel = select_algorithm(params)
    if sel.algorithm is Algorithm.MEMCHR_SHORT and params.only_matching:
        return False  # host-emulated quirk path (krep.c:4495)
    return True


def eligible(params: SearchParams, size: int) -> bool:
    """Batching applies to single-literal non-regex searches of small files
    whose pattern contains no NUL (so separators cannot match)."""
    return size <= BATCH_FILE_MAX and eligible_params(params)


class Batch:
    def __init__(self):
        self.chunks: list[bytes] = []
        self.entries: list[BatchEntry] = []
        self.size = 0

    def add(self, path: str, data: bytes):
        self.entries.append(BatchEntry(path, self.size, len(data)))
        self.chunks.append(data)
        pad = GAP + (-(len(data) + GAP)) % 4
        self.chunks.append(b"\n" + b"\x00" * (pad - 1))
        self.size += len(data) + pad

    @property
    def full(self) -> bool:
        return self.size >= BATCH_BUFFER_MAX

    def buffer(self) -> np.ndarray:
        return np.frombuffer(b"".join(self.chunks), dtype=np.uint8)


_file_counts_jit = None


def _file_counts_dev(mask, starts_e, ends_e):
    """Per-file flag counts from the device-resident mask: exclusive cumsum
    over flag counts, differenced at (element-aligned) file boundaries.
    mask: u32 packed flag words (SWAR) or u8 flags (XLA)."""
    global _file_counts_jit
    if _file_counts_jit is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def f(mask, starts_e, ends_e):
            if mask.dtype == jnp.uint32:
                cm = (
                    (mask.reshape(-1).astype(jnp.uint32) * jnp.uint32(0x01010101))
                    >> jnp.uint32(24)
                ).astype(jnp.int32)
            else:
                cm = mask.reshape(-1).astype(jnp.int32)
            cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cm)])
            return cs[ends_e] - cs[starts_e]

        _file_counts_jit = f
    return _file_counts_jit(mask, starts_e, ends_e)


class PendingBatch:
    """A batch whose device work has been launched but not synced."""

    def __init__(self, batch, data, kind, payload):
        self.batch = batch
        self.data = data
        self.kind = kind        # "counts" | "mask"
        self.payload = payload


def _count_policy_ok(params: SearchParams) -> bool:
    """Device-side count differencing is exact when the reported count is
    the raw flag count (ALL advance policy; -m folds in via min)."""
    from ..engine.select import select_algorithm
    from ..params import MatchPolicy

    sel = select_algorithm(params)
    return sel.policy(params.only_matching) is MatchPolicy.ALL


def submit_batch(params: SearchParams, batch: Batch) -> PendingBatch:
    """Launch the device pass for a batch without syncing — staging,
    compute, and the tiny count readbacks all overlap the host's walk of
    the next batch (the async replacement for the reference's per-file
    launches, krep.c:3402-3430). Sub-break-even batches skip the device
    entirely: one native host pass over the concatenated buffer (the
    reference's small-file regime, where launch overhead can never
    amortize — see ops/hostscan.py). The host branch must not import
    ops.dispatch: pulling in jax costs ~1.7s of interpreter time, which
    IS the small-file regime's budget."""
    from ..ops import hostscan

    data = batch.buffer()

    if hostscan.route_small(batch.size):
        count_only = params.count_lines_mode or (
            params.count_matches_mode and _count_policy_ok(params)
        )
        if count_only:
            # per-file host counts in one native call: file edges are text
            # edges (matching per-file launches), so -c dedup and -w
            # boundaries are exact per file with no boundary fix-ups
            bounds = np.array(
                [(e.offset, e.offset + e.size) for e in batch.entries],
                dtype=np.int64,
            )
            counts = hostscan.batch_counts(
                data, bounds, params.pattern, params.case_sensitive,
                params.whole_word, params.count_lines_mode,
            )
            return PendingBatch(batch, data, "counts", counts)
        # position modes: one whole-buffer all-starts pass (separators are
        # '\n'+NULs, so no match crosses a file boundary and whole-word
        # sees non-word bytes at every file edge — same contract as the
        # device mask pass), split per file in drain_batch
        starts = hostscan.scan_starts(
            data, params.pattern, params.case_sensitive, params.whole_word
        )
        return PendingBatch(batch, data, "starts", starts)

    from ..ops import dispatch

    staged = dispatch.stage(data)

    count_only = params.count_lines_mode or (
        params.count_matches_mode and _count_policy_ok(params)
    )
    if count_only:
        # device-side per-file counts: the mask never leaves the device.
        # File offsets are 4-aligned (GAP padding) and separators cannot
        # match or hold line-dedup events, so element-aligned boundary
        # differencing is exact.
        mask_kind = "first_line" if params.count_lines_mode else "starts"
        _, _, mask = dispatch.scan_literal_staged(
            staged,
            pattern=params.pattern,
            case_sensitive=params.case_sensitive,
            whole_word=params.whole_word,
            want_mask=True,
            want_lines=params.count_lines_mode,
            mask_kind=mask_kind,
        )
        import jax.numpy as jnp

        unit = 4 if mask.dtype == jnp.uint32 else 1
        starts_e = np.array(
            [e.offset // unit for e in batch.entries], dtype=np.int32
        )
        ends_e = np.array(
            [-(-(e.offset + e.size) // unit) for e in batch.entries],
            dtype=np.int32,
        )
        counts = _file_counts_dev(mask, starts_e, ends_e)
        return PendingBatch(batch, data, "counts", counts)

    _, _, mask = dispatch.scan_literal_staged(
        staged,
        pattern=params.pattern,
        case_sensitive=params.case_sensitive,
        whole_word=params.whole_word,
        want_mask=True,
        want_lines=False,
    )
    return PendingBatch(batch, data, "mask", (staged, mask))


def drain_batch(params: SearchParams, pending: PendingBatch):
    """Sync one submitted batch; yields (path, file_bytes, SearchResult)
    per file in insertion order."""
    from ..engine import resolve
    from ..engine.search import SearchResult, _EMPTY_POS
    from ..engine.select import select_algorithm

    batch, data = pending.batch, pending.data
    mc = params.max_count

    if pending.kind == "counts":
        counts = np.asarray(pending.payload)
        for e, c in zip(batch.entries, counts.tolist()):
            c = min(c, mc) if mc is not None else c
            fdata = data[e.offset : e.offset + e.size]
            yield e.path, fdata, SearchResult(int(c), _EMPTY_POS, e.size)
        return

    if pending.kind == "starts":  # host fast path: starts already on host
        starts = pending.payload
    else:
        from ..ops import dispatch

        staged, mask = pending.payload
        starts = dispatch.starts_from_device_mask(mask, len(data))

    sel = select_algorithm(params)
    policy = sel.policy(params.only_matching)
    m = len(params.pattern)
    offsets = np.array([e.offset for e in batch.entries], dtype=np.int64)
    idx_lo = np.searchsorted(starts, offsets, side="left")
    idx_hi = np.searchsorted(
        starts, offsets + np.array([e.size for e in batch.entries]), side="left"
    )

    for e, lo, hi in zip(batch.entries, idx_lo, idx_hi):
        fstarts = starts[lo:hi] - e.offset
        fdata = data[e.offset : e.offset + e.size]
        # boundary word-filter fix-up: the byte before offset 0 is a
        # separator NUL (non-word) and so is the byte after the file — the
        # same as text edges, so whole-word is already exact.
        if params.count_lines_mode:
            nl = np.flatnonzero(fdata == 10)
            if len(fstarts):
                lines = len(np.unique(np.searchsorted(nl, fstarts, side="left")))
            else:
                lines = 0
            yield e.path, fdata, SearchResult(
                min(lines, mc) if mc is not None else lines, _EMPTY_POS, e.size
            )
            continue
        fstarts = resolve.apply_policy(fstarts, m, policy, e.size)
        fstarts = resolve.truncate_max_count(fstarts, mc)
        positions = np.stack([fstarts, fstarts + m], axis=1).astype(np.int64)
        count = len(fstarts)
        if params.count_matches_mode:
            yield e.path, fdata, SearchResult(count, _EMPTY_POS, e.size)
        else:
            yield e.path, fdata, SearchResult(count, positions, e.size)


def scan_batch(params: SearchParams, batch: Batch):
    """One device pass over the batch; yields (path, file_bytes,
    SearchResult) per file in insertion order. (submit + drain, unpipelined.)"""
    yield from drain_batch(params, submit_batch(params, batch))
