"""Multi-chip sharded byte scan.

The TPU-native replacement for the reference's pthread chunk scheduler
(krep.c:2274-3066): the byte stream is split into D contiguous shards, each
extended by an (m-1)-byte halo — the analogue of the chunk overlap at
krep.c:2837-2846 — laid out host-side as a (D, shard+halo) slab and scanned
under `shard_map` over a 1-D Mesh('data'). Match counts reduce with `psum`;
line accounting returns per-shard stats that a tiny host combiner merges
*exactly* across shard boundaries (the reference's per-chunk line counts
"might be slightly off at boundaries", krep.c:2952 — this design is exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import literal

HALO_PAD = 1024  # max supported pattern overlap (MAX_PATTERN_LENGTH)


def build_shards(data: np.ndarray, n_shards: int, halo: int):
    """Host-side overlapping shard slab: (D, S+halo) uint8, zero-padded.
    Also returns the byte preceding each shard (0 for the first) — needed
    by the whole-word filter at shard starts."""
    n = data.shape[0]
    shard = -(-n // n_shards)  # cdiv
    # pad so every shard row (incl. halo read past the end) is in bounds
    padded = np.zeros(n_shards * shard + halo, dtype=np.uint8)
    padded[:n] = data
    rows = np.lib.stride_tricks.sliding_window_view(padded, shard + halo)[
        :: shard if shard > 0 else 1
    ][:n_shards]
    prev = np.zeros((n_shards, 1), dtype=np.uint8)
    starts = np.arange(1, n_shards, dtype=np.int64) * shard
    prev[1:, 0] = padded[np.minimum(starts - 1, n_shards * shard + halo - 1)]
    return np.ascontiguousarray(rows), prev, shard


@functools.partial(
    jax.jit,
    static_argnames=("pattern", "case_sensitive", "whole_word", "want_mask", "mesh"),
)
def _sharded_stats(
    slab, prev_bytes, shard_len, true_len, *, pattern, case_sensitive,
    whole_word, want_mask, mesh,
):
    """slab: (D, S+halo) uint8 sharded over 'data'. Returns per-shard
    (all_count, line_count_local, lead, trail, any, has_nl) stacked (D,),
    plus the per-shard start mask (D, S+halo) u8 when want_mask (halo
    columns are zeroed — only owned starts are flagged)."""

    def per_shard(block, prev_byte, shard_len, true_len):
        block = block[0]  # (S+halo,)
        d = jax.lax.axis_index("data")
        base = d.astype(jnp.int32) * shard_len
        # starts owned by this shard: [0, shard_len) ∩ [0, true_len - m]
        limit = jnp.minimum(shard_len, true_len - base)
        mask = literal.all_starts_mask(
            block,
            pattern,
            case_sensitive=case_sensitive,
            whole_word=whole_word,
            true_len=jnp.maximum(true_len - base, 0),
        )
        idx = jnp.arange(block.shape[0], dtype=jnp.int32)
        mask = mask & (idx < limit)
        if whole_word:
            # a shard start is not a text edge: the previous shard's last
            # byte decides the before-boundary at local index 0
            pb = prev_byte[0, 0]
            prev_is_word = (
                ((pb >= 0x30) & (pb <= 0x39))
                | ((pb >= 0x41) & (pb <= 0x5A))
                | ((pb >= 0x61) & (pb <= 0x7A))
                | (pb == 0x5F)
            )
            mask = mask & ((idx != 0) | ~prev_is_word)
        all_count = jnp.sum(mask.astype(jnp.int32))
        # restrict line stats to the owned region (halo bytes belong to the
        # next shard's accounting)
        owned = jnp.where(idx < limit, block, jnp.uint8(0))
        cnt, lead, trail, anym, hasnl = literal.shard_line_stats(mask, owned)
        total = jax.lax.psum(all_count, "data")
        outs = (
            total[None],
            cnt[None],
            lead[None],
            trail[None],
            anym[None],
            hasnl[None],
        )
        if want_mask:
            outs = outs + (mask.astype(jnp.uint8)[None, :],)
        return outs

    from jax import shard_map

    out_specs = (P("data"),) * 6
    if want_mask:
        out_specs = out_specs + (P("data", None),)
    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None), P(), P()),
        out_specs=out_specs,
    )
    return f(slab, prev_bytes, shard_len, true_len)


def combine_line_counts(local_counts, leads, trails, anys, has_nls) -> int:
    """Exact cross-shard line-count merge (see shard_line_stats)."""
    total = 0
    open_match = False  # line open at shard start already has a match
    for c, lead, trail, anym, hasnl in zip(local_counts, leads, trails, anys, has_nls):
        c = int(c)
        total += c
        if open_match and bool(lead):
            total -= 1  # the boundary-spanning line was already counted
        if bool(hasnl):
            open_match = bool(trail)
        else:
            open_match = open_match or bool(anym)
    return total


def _is_word_byte(b: int) -> bool:
    return (
        0x30 <= b <= 0x39 or 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A or b == 0x5F
    )


def build_shards_staged(data: np.ndarray, n_shards: int):
    """Shard slab in the SWAR staged layout: each row is S owned bytes
    (S a multiple of 64 KiB) + a 4 KiB forward halo of the next shard's
    bytes — so each row can go straight into the SWAR kernel as its uint32
    view. Returns (slab (D, S+4096) u8, prev_word (D,1) i32, S)."""
    from ..ops.dispatch import HALO_ROWS, LANES

    n = data.shape[0]
    unit = 512 * LANES  # 64 KiB: keeps R4 = S/512 a multiple of 128
    S = max(unit, ((-(-n // n_shards)) + unit - 1) // unit * unit)
    halo = HALO_ROWS * LANES
    padded = np.zeros(n_shards * S + halo, dtype=np.uint8)
    padded[:n] = data
    rows = np.lib.stride_tricks.sliding_window_view(padded, S + halo)[::S][:n_shards]
    prev = np.zeros((n_shards, 1), dtype=np.int32)
    for d in range(1, n_shards):
        prev[d, 0] = 1 if _is_word_byte(int(padded[d * S - 1])) else 0
    return np.ascontiguousarray(rows), prev, S


@functools.partial(
    jax.jit,
    static_argnames=("pattern", "case_sensitive", "whole_word", "want_mask", "mesh", "interpret"),
)
def _sharded_stats_swar(
    slab, prev_words, shard_len, true_len, m_len, *, pattern, case_sensitive,
    whole_word, want_mask, mesh, interpret=False,
):
    """SWAR per-shard scan under shard_map (the fast multi-chip path).
    Returns the same tuple layout as _sharded_stats."""
    from ..ops import pallas_swar

    def per_shard(block, prev_word, shard_len, true_len, m_len):
        row = block[0]  # (S + 4096,) u8
        d = jax.lax.axis_index("data")
        base = d.astype(jnp.int32) * shard_len
        owned = jnp.clip(true_len - base, 0, shard_len)
        # allow starts in [0, owned) whose matches extend into the halo,
        # but never past the end of the real text
        tl_shard = jnp.minimum(owned + m_len - 1, jnp.maximum(true_len - base, 0))
        u32 = jax.lax.bitcast_convert_type(
            row.reshape(-1, 4), jnp.uint32
        ).reshape(-1, 128)
        c, f, trail, lead, hasnl, mask = pallas_swar.scan_shard(
            u32, tl_shard, prev_word[0, 0],
            pattern=pattern, case_sensitive=case_sensitive,
            whole_word=whole_word, want_mask=want_mask, interpret=interpret,
        )
        total = jax.lax.psum(c, "data")
        outs = (
            total[None], f[None], (lead > 0)[None], (trail > 0)[None],
            (c > 0)[None], (hasnl > 0)[None],
        )
        if want_mask:
            outs = outs + (mask[None, :],)
        return outs

    from jax import shard_map

    out_specs = (P("data"),) * 6
    if want_mask:
        out_specs = out_specs + (P("data", None),)
    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,  # pallas_call out_shapes don't carry vma info
    )
    return f(slab, prev_words, shard_len, true_len, m_len)


def sharded_scan(
    data: np.ndarray,
    pattern: bytes,
    *,
    case_sensitive=True,
    whole_word=False,
    want_mask=False,
    mesh: Mesh | None = None,
):
    """Scan bytes across all devices. Returns (match_count, line_count,
    starts) — starts is a sorted int64 array of match-start offsets when
    want_mask, else None. The analogue of the reference's per-chunk
    match_result_merge with offset rebase (krep.c:2970-2980)."""
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("data",))
    D = mesh.devices.size
    sharding = jax.sharding.NamedSharding(mesh, P("data", None))
    from ..ops import dispatch

    # The SWAR path is a Mosaic (TPU-only) kernel: route by the *mesh's*
    # platform, not the process default backend — the dryrun may run on a
    # virtual CPU mesh while the default backend is a TPU client.
    mesh_platform = mesh.devices.flat[0].platform
    use_swar = dispatch.backend_name() == "swar" and mesh_platform != "cpu"
    if use_swar:
        slab_np, prev_np, shard = build_shards_staged(np.asarray(data, np.uint8), D)
        slab = jax.device_put(slab_np, sharding)
        prev_words = jax.device_put(prev_np, sharding)
        out = _sharded_stats_swar(
            slab,
            prev_words,
            jnp.int32(shard),
            jnp.int32(len(data)),
            jnp.int32(len(pattern)),
            pattern=pattern,
            case_sensitive=case_sensitive,
            whole_word=whole_word,
            want_mask=want_mask,
            mesh=mesh,
        )
        mask_bytes_per_shard = shard
    else:
        halo = max(len(pattern), 2)
        slab_np, prev_np, shard = build_shards(np.asarray(data, np.uint8), D, halo)
        slab = jax.device_put(slab_np, sharding)
        prev_bytes = jax.device_put(prev_np, sharding)
        out = _sharded_stats(
            slab,
            prev_bytes,
            jnp.int32(shard),
            jnp.int32(len(data)),
            pattern=pattern,
            case_sensitive=case_sensitive,
            whole_word=whole_word,
            want_mask=want_mask,
            mesh=mesh,
        )
        mask_bytes_per_shard = None
    total, cnts, leads, trails, anys, hasnls = map(np.asarray, out[:6])
    lines = combine_line_counts(cnts, leads, trails, anys, hasnls)
    starts = None
    if want_mask:
        masks = np.asarray(out[6])  # per-shard masks; non-owned flags zeroed
        if use_swar:
            masks = masks.view(np.uint8).reshape(D, -1)
        flat = np.flatnonzero(masks)
        rows, cols = np.divmod(flat, masks.shape[1])
        starts = (rows.astype(np.int64) * shard + cols).astype(np.int64)
        starts.sort()
    return int(total[0]), int(lines), starts


def sharded_counts(
    data: np.ndarray,
    pattern: bytes,
    *,
    case_sensitive=True,
    whole_word=False,
    mesh: Mesh | None = None,
):
    """Back-compat: (match_count, line_count)."""
    c, l, _ = sharded_scan(
        data, pattern, case_sensitive=case_sensitive, whole_word=whole_word,
        mesh=mesh,
    )
    return c, l


def pick_devices(n_devices: int):
    """Select n healthy devices for the mesh. The default platform may be a
    single real TPU chip or an unhealthy tunnel client (libtpu client/terminal
    version skew surfaces at device_put, not at enumeration), while the
    driver validates multi-chip on a virtual CPU mesh
    (--xla_force_host_platform_device_count). Probe the default backend and
    fall back to jax.devices('cpu') when it can't provide n working devices."""
    try:
        devs = jax.devices()
        if len(devs) >= n_devices:
            probe = jax.device_put(np.zeros(8, np.uint8), devs[0])
            np.asarray(probe)  # force a real transfer (axon ignores block_until_ready)
            return devs[:n_devices]
    except Exception:
        pass
    cpu = jax.devices("cpu")
    if len(cpu) < n_devices:
        raise RuntimeError(
            f"no platform has {n_devices} healthy devices "
            f"(default={len(jax.devices()) if jax.devices() else 0}, cpu={len(cpu)}); "
            "set XLA_FLAGS=--xla_force_host_platform_device_count"
        )
    return cpu[:n_devices]


def dryrun(n_devices: int) -> None:
    """Driver contract: jit + run sharded scan steps on tiny shapes over an
    n-device mesh — counts, line counts, positions, and the whole-word
    boundary path — checked against the single-array reference."""
    devs = np.array(pick_devices(n_devices))
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(0)
    data = np.frombuffer(
        b"the quick\nthe fox\n" * 64 + rng.bytes(512), dtype=np.uint8
    )
    mc, lc, starts = sharded_scan(np.asarray(data), b"the", want_mask=True, mesh=mesh)

    # numpy-native reference: independent of any JAX backend, so the dryrun
    # never touches a default platform that may be unhealthy (e.g. a libtpu
    # client/terminal version skew that only surfaces at device_put)
    c, l, want = _naive_scan(data, b"the")
    assert mc == c, (mc, c)
    assert lc == l, (lc, l)
    assert starts.tolist() == want.tolist()

    # whole-word with a word-char straddling a shard boundary
    mc2, lc2, _ = sharded_scan(
        np.asarray(data), b"the", whole_word=True, mesh=mesh
    )
    c2, l2, _ = _naive_scan(data, b"the", whole_word=True)
    assert mc2 == c2 and lc2 == l2, ((mc2, lc2), (c2, l2))


def _naive_scan(data: np.ndarray, pattern: bytes, *, whole_word=False):
    """Host numpy oracle for the dryrun: (all-starts count, matched-line
    count, sorted start offsets). Mirrors the kernel's all-starts + word
    boundary semantics (krep.c word boundary: [0-9A-Za-z_] neighbors)."""
    n, m = len(data), len(pattern)
    pat = np.frombuffer(pattern, np.uint8)
    ok = np.ones(max(n - m + 1, 0), dtype=bool)
    for j in range(m):
        ok &= data[j : n - m + 1 + j] == pat[j]
    starts = np.flatnonzero(ok).astype(np.int64)
    if whole_word:
        keep = []
        for s in starts:
            before_ok = s == 0 or not _is_word_byte(int(data[s - 1]))
            after_ok = s + m >= n or not _is_word_byte(int(data[s + m]))
            if before_ok and after_ok:
                keep.append(s)
        starts = np.asarray(keep, dtype=np.int64)
    nl = np.flatnonzero(data == 0x0A)
    line_of = np.searchsorted(nl, starts, side="left")
    return int(len(starts)), int(len(np.unique(line_of))), starts
