"""Aho-Corasick → dense DFA, and the chunk-parallel device scan.

Host side flattens the reference's 256-pointer trie (aho_corasick.c:17-24,
build at 111-271) into a dense `[S, 256] int32` next-state table with
goto-completion (so the device never walks failure chains), plus a per-state
emission count aggregated over the output chain.

Device side: the byte stream is split into L independent lanes, each with a
(maxlen-1)-byte prefix halo; a `lax.scan` steps all lanes together, each
step doing one vectorized gather `state = table[state, byte]` — sequential
in time, parallel across lanes (SURVEY.md §7 kernel mapping #4). Emission
*positions* come back as a dense mask; the host attributes patterns by
direct comparison at the flagged end positions (cheap: |ends| × K vector
compares), so no state trace is materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_DENSE_STATES = 1 << 16


def fold_np(b: np.ndarray) -> np.ndarray:
    return np.where((b >= 0x41) & (b <= 0x5A), b + 32, b).astype(np.uint8)


def build_dense_ac(patterns: list[bytes], case_sensitive: bool):
    """Returns (next_table [S,256] int32, emit_count [S] int32) or None if
    the automaton would exceed MAX_DENSE_STATES."""
    pats = [p if case_sensitive else bytes(fold_np(np.frombuffer(p, np.uint8))) for p in patterns]

    # trie as dict-of-children per node
    children: list[dict[int, int]] = [{}]
    out_count = [0]
    for p in pats:
        node = 0
        for c in p:
            nxt = children[node].get(c)
            if nxt is None:
                children.append({})
                out_count.append(0)
                nxt = len(children) - 1
                children[node][c] = nxt
            node = nxt
        out_count[node] += 1  # duplicates emit twice (aho_corasick.c output arrays)
        if len(children) > MAX_DENSE_STATES:
            return None

    S = len(children)
    next_table = np.zeros((S, 256), dtype=np.int32)
    fail = np.zeros(S, dtype=np.int32)
    emit = np.array(out_count, dtype=np.int32)

    # BFS: goto-completion + failure links + emission aggregation
    from collections import deque

    queue = deque()
    for c in range(256):
        nxt = children[0].get(c)
        if nxt is None:
            next_table[0, c] = 0
        else:
            next_table[0, c] = nxt
            fail[nxt] = 0
            queue.append(nxt)
    while queue:
        u = queue.popleft()
        emit[u] += emit[fail[u]]  # output-chain aggregation
        for c in range(256):
            v = children[u].get(c)
            if v is None:
                next_table[u, c] = next_table[fail[u], c]
            else:
                fail[v] = next_table[fail[u], c]
                next_table[u, c] = v
                queue.append(v)
    return next_table, emit


@functools.partial(jax.jit, static_argnames=("want_mask",))
def dfa_scan(chunks, table, emit, owned_from, *, want_mask: bool):
    """chunks: (L, T) uint8 lanes (halo-prefixed). Returns (total_count,
    emission mask (L, T) uint8 of emit-counts per end position).

    owned_from: (L,) int32 — first owned time index per lane (halo bytes
    before it are scanned for state only, not emitted).
    """
    L, T = chunks.shape
    flat_table = table.reshape(-1)

    owned_from_arr, owned_to = owned_from

    def step(states, xs):
        t, col = xs
        idx = states * 256 + col.astype(jnp.int32)
        states = flat_table[idx]
        e = emit[states]
        valid = (t >= owned_from_arr) & (t < owned_to)
        e = jnp.where(valid, e, 0)
        return states, e

    ts = jnp.arange(T, dtype=jnp.int32)
    states0 = jnp.zeros((L,), jnp.int32)
    _, es = jax.lax.scan(step, states0, (ts, chunks.T))
    # es: (T, L) emission counts
    total = jnp.sum(es.astype(jnp.int32))
    if want_mask:
        mask = (es.T > 0).astype(jnp.uint8)
    else:
        mask = jnp.zeros((1, 1), jnp.uint8)
    return total, mask


def make_lanes(data: np.ndarray, maxlen: int, n_lanes: int):
    """Split bytes into L lanes with (maxlen-1)-byte prefix halos.
    Returns (chunks (L, halo+T) uint8, owned_from (L,), chunk_len)."""
    n = data.shape[0]
    halo = maxlen - 1
    chunk = -(-n // n_lanes)
    padded = np.zeros(halo + n_lanes * chunk, dtype=np.uint8)
    padded[halo : halo + n] = data
    # lane i owns [i*chunk, (i+1)*chunk), sees [i*chunk - halo, (i+1)*chunk)
    view = np.lib.stride_tricks.sliding_window_view(padded, halo + chunk)[::chunk][
        :n_lanes
    ]
    owned_from = np.full(n_lanes, halo, dtype=np.int32)
    # first lane's halo is zero-padding; harmless (no pattern is fed those
    # bytes as emission positions). Beyond-text padding is excluded per-lane:
    owned_to = (
        halo + np.clip(n - np.arange(n_lanes, dtype=np.int64) * chunk, 0, chunk)
    ).astype(np.int32)
    return np.ascontiguousarray(view), (owned_from, owned_to), chunk


def search_dense_dfa(patterns: list[bytes], text, case_sensitive: bool, want_positions: bool):
    """Full multi-pattern scan via the dense DFA. Returns (total_count,
    ends np.ndarray or None). ends are absolute end positions (exclusive)
    where ≥1 pattern ends."""
    data = np.frombuffer(text, np.uint8) if isinstance(text, (bytes, bytearray)) else np.asarray(text)
    if not case_sensitive:
        data = fold_np(data)  # lower_table fold per byte (aho_corasick.c:331-333)
    n = data.shape[0]
    built = build_dense_ac(list(patterns), case_sensitive)
    if built is None:
        return None
    table, emit = built
    maxlen = max(len(p) for p in patterns)
    n_lanes = int(np.clip(1 << max(0, (n // 4096)).bit_length(), 16, 8192))
    chunks, (owned_from, owned_to), chunk = make_lanes(data, maxlen, n_lanes)
    total, mask = dfa_scan(
        jnp.asarray(chunks),
        jnp.asarray(table),
        jnp.asarray(emit),
        (jnp.asarray(owned_from), jnp.asarray(owned_to)),
        want_mask=want_positions,
    )
    ends = None
    if want_positions:
        m = np.asarray(mask)
        halo = maxlen - 1
        li, ti = np.nonzero(m)
        ends = li.astype(np.int64) * chunk + (ti.astype(np.int64) - halo) + 1
        ends = ends[(ends >= 1) & (ends <= n)]
        ends.sort()
    return int(total), ends
