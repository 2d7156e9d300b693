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
import os
import subprocess
import sys

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
    static_argnames=("patterns", "case_sensitive", "whole_word", "want_mask", "mesh"),
)
def _sharded_stats(
    slab, prev_bytes, shard_len, true_len, *, patterns, case_sensitive,
    whole_word, want_mask, mesh,
):
    """slab: (D, S+halo) uint8 sharded over 'data'. Returns per-shard
    (all_count over ALL patterns, line_count_local over the union, lead,
    trail, any, has_nl) stacked (D,), plus the per-shard union start mask
    (D, S+halo) u8 when want_mask (halo columns are zeroed — only owned
    starts are flagged; multi-pattern attribution happens host-side)."""

    def per_shard(block, prev_byte, shard_len, true_len):
        block = block[0]  # (S+halo,)
        d = jax.lax.axis_index("data")
        base = d.astype(jnp.int32) * shard_len
        # starts owned by this shard: [0, shard_len) ∩ [0, true_len - m]
        limit = jnp.minimum(shard_len, true_len - base)
        idx = jnp.arange(block.shape[0], dtype=jnp.int32)
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
        all_count = jnp.int32(0)
        union = jnp.zeros(block.shape, dtype=jnp.bool_)
        for pattern in patterns:
            mask = literal.all_starts_mask(
                block,
                pattern,
                case_sensitive=case_sensitive,
                whole_word=whole_word,
                true_len=jnp.maximum(true_len - base, 0),
            )
            mask = mask & (idx < limit)
            if whole_word:
                mask = mask & ((idx != 0) | ~prev_is_word)
            all_count = all_count + jnp.sum(mask.astype(jnp.int32))
            union = union | mask
        # restrict line stats to the owned region (halo bytes belong to the
        # next shard's accounting)
        owned = jnp.where(idx < limit, block, jnp.uint8(0))
        cnt, lead, trail, anym, hasnl = literal.shard_line_stats(union, owned)
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
            outs = outs + (union.astype(jnp.uint8)[None, :],)
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


class LineCountCombiner:
    """Incremental exact cross-shard line-count merge (see shard_line_stats).
    `total` is monotone non-decreasing after each push — a later shard's
    boundary dedup only subtracts from its OWN contribution — so callers may
    early-exit (-m, krep.c:2950-2962) as soon as total reaches the cap."""

    def __init__(self):
        self.total = 0
        self.open_match = False  # line open at shard start already has a match

    def push(self, c, lead, trail, anym, hasnl) -> int:
        self.total += int(c)
        if self.open_match and bool(lead):
            self.total -= 1  # the boundary-spanning line was already counted
        if bool(hasnl):
            self.open_match = bool(trail)
        else:
            self.open_match = self.open_match or bool(anym)
        return self.total


def combine_line_counts(local_counts, leads, trails, anys, has_nls) -> int:
    """Exact cross-shard line-count merge (see shard_line_stats)."""
    comb = LineCountCombiner()
    for c, lead, trail, anym, hasnl in zip(local_counts, leads, trails, anys, has_nls):
        comb.push(c, lead, trail, anym, hasnl)
    return comb.total


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
    static_argnames=("patterns", "case_sensitive", "whole_word", "want_mask", "mesh", "interpret"),
)
def _sharded_stats_swar(
    slab, prev_words, shard_len, true_len, m_len, *, patterns, case_sensitive,
    whole_word, want_mask, mesh, interpret=False,
):
    """SWAR fused K-pattern per-shard scan under shard_map (the fast
    multi-chip path; one shared compiled kernel per shard, the analogue of
    all chunk threads sharing one AC trie, krep.c:2524-2536). Returns the
    same tuple layout as _sharded_stats."""
    from ..ops import pallas_swar

    def per_shard(block, prev_word, shard_len, true_len, m_len):
        row = block[0]  # (S + 4096,) u8
        d = jax.lax.axis_index("data")
        base = d.astype(jnp.int32) * shard_len
        owned = jnp.clip(true_len - base, 0, shard_len)
        # allow starts in [0, owned) whose matches extend into the halo,
        # but never past the end of the real text; m_len is the LONGEST
        # pattern — shorter members are bounded by start_limit=owned
        tl_shard = jnp.minimum(owned + m_len - 1, jnp.maximum(true_len - base, 0))
        u32 = jax.lax.bitcast_convert_type(
            row.reshape(-1, 4), jnp.uint32
        ).reshape(-1, 128)
        c, f, trail, lead, hasnl, mask = pallas_swar.scan_shard_multi(
            u32, tl_shard, prev_word[0, 0], owned,
            patterns=patterns, case_sensitive=case_sensitive,
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


GROUP_BYTES = 64 * 1024  # compaction group: 64 KiB of text


def _starts_from_sharded_mask(mask_dev, shard: int, D: int, use_swar: bool):
    """Device-sharded union mask → sorted absolute start offsets, without
    transferring the whole mask: per-64KiB-group match counts come back
    first (tiny), then only the groups containing matches are gathered
    device-side and copied out — the mesh-path analogue of
    dispatch.starts_from_device_mask. Dense masks fall back to one full
    copy (the transfer is the cost either way)."""
    if use_swar:
        gw = GROUP_BYTES // 4  # u32 words per group
        bytes_per_word = 4
    else:
        gw = GROUP_BYTES
        bytes_per_word = 1
    W = mask_dev.shape[1]

    def full_copy():
        masks = np.asarray(mask_dev)
        if use_swar:
            masks = masks.view(np.uint8).reshape(D, -1)
        flat = np.flatnonzero(masks)
        rows, cols = np.divmod(flat, masks.shape[1])
        starts = (rows.astype(np.int64) * shard + cols).astype(np.int64)
        starts.sort()
        return starts

    if W % gw != 0 or (W // gw) * D < 8:
        return full_copy()
    G = W // gw
    m3 = mask_dev.reshape(D * G, gw)
    if use_swar:
        w = m3.astype(jnp.uint32)
        counts = jnp.sum(
            ((w * jnp.uint32(0x01010101)) >> jnp.uint32(24)).astype(jnp.int32),
            axis=1,
        )
    else:
        counts = jnp.sum(m3.astype(jnp.int32), axis=1)
    counts = np.asarray(counts)
    nz = np.flatnonzero(counts)
    if len(nz) == 0:
        return np.zeros(0, np.int64)
    if len(nz) > (D * G) // 2:
        return full_copy()
    sel = np.asarray(jnp.take(m3, jnp.asarray(nz), axis=0))
    if use_swar:
        sel = sel.view(np.uint8)
    rows, cols = np.nonzero(sel.reshape(len(nz), gw * bytes_per_word))
    g = nz[rows]
    starts = (
        (g // G).astype(np.int64) * shard
        + (g % G).astype(np.int64) * GROUP_BYTES
        + cols
    )
    starts.sort()
    return starts


@functools.partial(
    jax.jit,
    static_argnames=(
        "patterns", "case_sensitive", "whole_word", "mesh", "interpret"
    ),
)
def _sharded_count_mxu(
    slab, prev_words, shard_len, true_len, *, patterns, case_sensitive,
    whole_word, mesh, interpret=False,
):
    """Per-shard MXU bit-matmul count under shard_map (ops/mxu_multi) —
    the large-K analogue of _sharded_stats_swar for pure counting. Each
    shard bounds match STARTS to its owned region via the kernel's
    start_limit (the chunk-overlap contract, krep.c:2837-2846); totals
    reduce with psum. Whole-word stays exact at shard boundaries: the
    right boundary byte reads from the forward halo (the next shard's
    real text) and the left boundary at shard start comes from
    prev_words (the previous shard's last-byte flag)."""
    from ..ops import mxu_multi

    def per_shard(block, prev_word, shard_len, true_len):
        row = block[0]  # (S + 4096,) u8
        d = jax.lax.axis_index("data")
        base = d.astype(jnp.int32) * shard_len
        owned = jnp.clip(true_len - base, 0, shard_len)
        u32 = jax.lax.bitcast_convert_type(
            row.reshape(-1, 4), jnp.uint32
        ).reshape(-1, 128)
        c = mxu_multi.scan_count(
            u32, owned, owned, prev_word[0, 0], patterns=patterns,
            case_sensitive=case_sensitive, whole_word=whole_word,
            interpret=interpret,
        )
        return jax.lax.psum(c, "data")[None]

    from jax import shard_map

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None), P(), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    return f(slab, prev_words, shard_len, true_len)


def sharded_count(
    data: np.ndarray,
    patterns,
    *,
    case_sensitive=True,
    whole_word=False,
    mesh: Mesh | None = None,
    interpret=False,
) -> int:
    """Total ALL-overlap K-pattern match count across the mesh via the MXU
    bit-matmul kernel (any K; patterns must satisfy ops/multi._mxu_eligible
    — the caller routes). The multi-chip analogue of fused_count_device."""
    patterns = tuple(patterns)
    if mesh is None:
        devs = np.array(healthy_devices())
        mesh = Mesh(devs, ("data",))
    D = mesh.devices.size
    sharding = jax.sharding.NamedSharding(mesh, P("data", None))
    from ..ops.multi import MXU_MAX_PASS

    # np scalars + default_device pin: NOTHING here may dispatch eagerly to
    # the process default backend — in the driver's dryrun environment that
    # backend is a libtpu client with version skew that fails on first use
    # while the mesh lives on virtual CPU devices (MULTICHIP_r02 rc=1).
    with jax.default_device(mesh.devices.flat[0]):
        slab_np, prev_np, shard = build_shards_staged(
            np.asarray(data, np.uint8), D
        )
        slab = jax.device_put(slab_np, sharding)
        prev = jax.device_put(prev_np, sharding)
        total = 0
        for i in range(0, len(patterns), MXU_MAX_PASS):
            g = patterns[i : i + MXU_MAX_PASS]
            out = _sharded_count_mxu(
                slab, prev, np.int32(shard), np.int32(len(data)),
                patterns=g, case_sensitive=case_sensitive,
                whole_word=whole_word, mesh=mesh, interpret=interpret,
            )
            total += int(np.asarray(out)[0])
    return total


def sharded_scan(
    data: np.ndarray,
    patterns,
    *,
    case_sensitive=True,
    whole_word=False,
    want_mask=False,
    mesh: Mesh | None = None,
):
    """Scan bytes across all devices for one or more literal patterns
    (bytes, or a tuple of bytes). Returns (total_match_count, line_count
    over the union, starts) — starts is a sorted int64 array of UNION
    match-start offsets when want_mask, else None (multi-pattern
    attribution happens host-side, resolve.attribute_patterns). The
    analogue of the reference's per-chunk match_result_merge with offset
    rebase (krep.c:2970-2980)."""
    if isinstance(patterns, (bytes, bytearray)):
        patterns = (bytes(patterns),)
    patterns = tuple(patterns)
    m_max = max(len(p) for p in patterns)
    if mesh is None:
        devs = np.array(healthy_devices())
        mesh = Mesh(devs, ("data",))
    D = mesh.devices.size
    sharding = jax.sharding.NamedSharding(mesh, P("data", None))
    from ..ops import dispatch

    # The SWAR path is a Mosaic (TPU-only) kernel: route by the *mesh's*
    # platform, not the process default backend — the dryrun may run on a
    # virtual CPU mesh while the default backend is a TPU client.
    mesh_platform = mesh.devices.flat[0].platform
    use_swar = dispatch.backend_name() == "swar" and mesh_platform != "cpu"
    # np scalars + default_device pin: NOTHING here may dispatch eagerly to
    # the process default backend — in the driver's dryrun environment that
    # backend is a libtpu client with version skew that fails on first use
    # while the mesh lives on virtual CPU devices (MULTICHIP_r02 rc=1).
    with jax.default_device(mesh.devices.flat[0]):
        if use_swar:
            slab_np, prev_np, shard = build_shards_staged(
                np.asarray(data, np.uint8), D
            )
            slab = jax.device_put(slab_np, sharding)
            prev_words = jax.device_put(prev_np, sharding)
            out = _sharded_stats_swar(
                slab,
                prev_words,
                np.int32(shard),
                np.int32(len(data)),
                np.int32(m_max),
                patterns=patterns,
                case_sensitive=case_sensitive,
                whole_word=whole_word,
                want_mask=want_mask,
                mesh=mesh,
            )
        else:
            halo = max(m_max, 2)
            slab_np, prev_np, shard = build_shards(
                np.asarray(data, np.uint8), D, halo
            )
            slab = jax.device_put(slab_np, sharding)
            prev_bytes = jax.device_put(prev_np, sharding)
            out = _sharded_stats(
                slab,
                prev_bytes,
                np.int32(shard),
                np.int32(len(data)),
                patterns=patterns,
                case_sensitive=case_sensitive,
                whole_word=whole_word,
                want_mask=want_mask,
                mesh=mesh,
            )
        total, cnts, leads, trails, anys, hasnls = map(np.asarray, out[:6])
        lines = combine_line_counts(cnts, leads, trails, anys, hasnls)
        starts = None
        if want_mask:
            starts = _starts_from_sharded_mask(out[6], shard, D, use_swar)
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


_PROBE_CODE = "import jax; jax.devices(); print('ok')"
_guarded = False
# Disk-cached probe verdicts so repeated CLI invocations don't re-pay the
# subprocess: a healthy verdict is trusted for 10 minutes, an outage
# verdict for 2 (so recovery is noticed quickly). Keyed by platform env +
# probe code so tests with injected probe code never poison real runs.
_PROBE_TTL_OK = 600.0
_PROBE_TTL_BAD = 120.0


def _probe_cache_path(code: str) -> str:
    import hashlib

    key = hashlib.sha1(
        (os.environ.get("JAX_PLATFORMS", "") + "\0" + code).encode()
    ).hexdigest()[:16]
    # user-owned cache dir, NOT world-writable /tmp: a predictable shared
    # path would let another local user pin verdicts (and sticky-bit /tmp
    # would block this user's corrective os.replace)
    d = os.environ.get(
        "KREP_TPU_CACHE_DIR", os.path.expanduser("~/.cache/krep_tpu")
    )
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        import tempfile

        d = tempfile.mkdtemp(prefix=f"krep_tpu_{os.getuid()}_")
    return os.path.join(d, f"probe_{key}")


def _default_backend_initializes(
    timeout_s: float, tries: int, fresh: bool = False
) -> bool:
    """True iff the default jax backend enumerates in a bounded time in a
    fresh subprocess of this environment. The axon-tunneled TPU client can
    HANG at init (not just raise) during an outage; probing out-of-process
    keeps this process free to fall back.

    fresh=True skips the cached verdict (still refreshing it on the way
    out): bench.py must re-detect a recovered chip immediately instead of
    inheriting a stale "bad" verdict for up to _PROBE_TTL_BAD seconds —
    a CPU-tagged bench record on a healthy chip wastes the whole round's
    measurement (VERDICT r3 weak #7)."""
    import time

    code = os.environ.get("KREP_TPU_PROBE_CODE", _PROBE_CODE)
    cache = _probe_cache_path(code)
    budget = timeout_s * tries
    if not fresh:
        try:
            with open(cache) as f:
                fields = f.read().split()
            verdict = fields[0] if fields else ""
            cached_budget = float(fields[1]) if len(fields) > 1 else 0.0
            age = time.time() - os.stat(cache).st_mtime
            if verdict == "ok" and age < _PROBE_TTL_OK:
                return True
            # a cached FAILURE only binds callers with an equal-or-smaller
            # budget: bench probes with a longer timeout than the CLI default
            # and must not inherit the CLI's short-budget verdict
            if verdict == "bad" and age < _PROBE_TTL_BAD and cached_budget >= budget:
                return False
        except (OSError, ValueError):
            pass
    ok = False
    for _ in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0 and b"ok" in r.stdout:
                ok = True
                break
        except subprocess.TimeoutExpired:
            pass
    try:
        tmp = cache + f".{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"{'ok' if ok else 'bad'} {budget:.0f}")
        os.replace(tmp, cache)
    except OSError:
        pass
    return ok


def guard_default_backend() -> None:
    """Bound the first default-backend touch of this process.

    `jax.devices()` initializes every discovered platform; when the
    tunneled TPU client hangs at init (the round-3 outage mode — distinct
    from the raise-at-transfer skew of MULTICHIP_r01/r02), any caller
    hangs with it, including the driver's `dryrun_multichip`. If no
    platform was explicitly chosen and no backend is up yet, probe the
    default backend in a bounded subprocess (bench.py does the same) and
    on failure pin this process to the CPU platform before jax ever
    touches the plugin."""
    global _guarded
    if _guarded or os.environ.get("KREP_TPU_NO_BACKEND_PROBE"):
        return
    _guarded = True
    # An explicit platform setting does NOT remove the hazard: the driver
    # environment exports JAX_PLATFORMS=<tpu plugin>, and it is precisely
    # that plugin's client init that hangs during an outage. Only an
    # explicit cpu-first choice is hazard-free.
    plats = os.environ.get("JAX_PLATFORMS", "")
    try:
        if jax.config.jax_platforms:
            plats = jax.config.jax_platforms
    except Exception:
        pass
    if plats.split(",")[0].strip().lower() == "cpu":
        return  # host platform first: no remote client init to hang
    try:
        from jax._src import xla_bridge as xb

        if getattr(xb, "_backends", None):
            return  # a backend already initialized in-process: healthy
    except Exception:
        pass
    timeout_s = float(os.environ.get("KREP_TPU_PROBE_TIMEOUT", "75"))
    tries = int(os.environ.get("KREP_TPU_PROBE_TRIES", "2"))
    if not _default_backend_initializes(timeout_s, tries):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def safe_devices():
    """`jax.devices()` behind the bounded outage guard — every production
    enumeration site goes through here (or safe_device_count) so a hanging
    tunnel client degrades to the CPU platform instead of wedging the
    process."""
    guard_default_backend()
    return jax.devices()


def healthy_devices():
    """safe_devices() plus a one-element transfer probe: a skewed client
    can enumerate fine yet fail at the first device_put (MULTICHIP_r01/r02)
    — mesh builders must discover that BEFORE committing a sharded slab.
    Falls back to the CPU platform devices and flips the dispatch skew
    flag so single-chip staging follows."""
    devs = safe_devices()
    try:
        probe = jax.device_put(np.zeros(8, np.uint8), devs[0])
        np.asarray(probe)  # force the transfer (axon ignores block_until_ready)
        return devs
    except Exception:
        try:
            from ..ops import dispatch

            dispatch._SKEW_CPU = True
        except Exception:
            pass
        return jax.devices("cpu")


def safe_device_count() -> int:
    guard_default_backend()
    return jax.device_count()


def pick_devices(n_devices: int):
    """Select n healthy devices for the mesh. The default platform may be a
    single real TPU chip or an unhealthy tunnel client (libtpu client/terminal
    version skew surfaces at device_put, not at enumeration; a full outage
    HANGS client init, hence guard_default_backend's bounded probe), while
    the driver validates multi-chip on a virtual CPU mesh
    (--xla_force_host_platform_device_count). Probe the default backend and
    fall back to jax.devices('cpu') when it can't provide n working devices."""
    guard_default_backend()
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
    n-device mesh — counts, line counts, positions, the whole-word boundary
    path, a fused multi-pattern step, and the long-pattern prefix filter —
    checked against a numpy-native reference."""
    devs = np.array(pick_devices(n_devices))
    mesh = Mesh(devs, ("data",))
    # Pin the WHOLE dryrun (engine helpers included) to the mesh devices:
    # the driver environment's default backend can be a broken libtpu
    # client, so any eager op that falls back to it kills the run
    # (MULTICHIP_r01/r02 rc=1). Hermeticity is enforced by
    # tests/test_multichip_hermetic.py with a poisoned default backend.
    with jax.default_device(mesh.devices.flat[0]):
        _dryrun_body(mesh)


def _dryrun_body(mesh: Mesh) -> None:
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

    # fused multi-pattern step (mixed lengths stress the per-pattern
    # owned-region start limit at shard halos)
    pats = (b"the", b"quick", b"q")
    mc3, lc3, starts3 = sharded_scan(
        np.asarray(data), pats, want_mask=True, mesh=mesh
    )
    tot = 0
    union = set()
    line_union = set()
    nl = np.flatnonzero(data == 0x0A)
    for p in pats:
        cc, _, ss = _naive_scan(data, p)
        tot += cc
        union.update(ss.tolist())
        line_union.update(np.searchsorted(nl, ss, side="left").tolist())
    assert mc3 == tot, (mc3, tot)
    assert lc3 == len(line_union), (lc3, len(line_union))
    assert starts3.tolist() == sorted(union)

    # long-pattern path: device prefix filter sharded over the mesh
    from ..engine.search import _finish_longpat
    from ..engine.select import select_algorithm
    from ..params import SearchParams

    longpat = bytes(b"the quick\nthe fox\n"[:18] * 5)  # 90 bytes, > LONG_PATTERN
    p = SearchParams(patterns=(longpat,), count_mode=True)  # -c
    _, _, cands = sharded_scan(
        np.asarray(data), longpat[:64], want_mask=True, mesh=mesh
    )
    r = _finish_longpat(p, data, cands, select_algorithm(p).policy(False))
    _, l4, _ = _naive_scan(data, longpat)
    assert r.count == l4, (r.count, l4)

    # large-K pure-count step: per-shard MXU bit-matmul (interpret on a
    # CPU mesh; Mosaic-compiled on TPU), start_limit-bounded owned regions
    pats40 = tuple(
        bytes(data[i : i + 2 + (i % 4)]) for i in range(0, 3 * 40, 3)
    )
    interp = mesh.devices.flat[0].platform == "cpu"
    mc5 = sharded_count(np.asarray(data), pats40, mesh=mesh, interpret=interp)
    tot5 = sum(_naive_scan(data, q)[0] for q in pats40)
    assert mc5 == tot5, (mc5, tot5)


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
