"""Backend dispatch + host→device staging.

Staging pads texts into geometric size buckets so jit caches are reused
across file sizes (the analogue of the reference's chunk-size policy at
krep.c:2729-2829, but for compile-cache hygiene rather than thread counts).

Backend knob: KREP_TPU_BACKEND = auto | xla | pallas.
  auto: Pallas tiled kernel on TPU, XLA elsewhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import literal

# Persistent compile cache: the CLI is a fresh process per invocation (like
# the reference binary), so kernel compiles must amortize across runs.
# CPU-only processes skip it — cache writes on the CPU backend have been
# observed to segfault inside jax's zstandard compression, and CPU compiles
# are cheap anyway.
def _cpu_backend() -> bool:
    hint = (getattr(jax.config, "jax_platforms", None) or "") or os.environ.get(
        "JAX_PLATFORMS", ""
    )
    if hint:
        return "cpu" in hint
    try:  # no explicit platform: resolve the default backend (behind the
        # bounded outage guard — this runs at import time and a hanging
        # tunnel client must not wedge `import krep_tpu`)
        from ..parallel.mesh import guard_default_backend

        guard_default_backend()
        return jax.default_backend() == "cpu"
    except Exception:
        return True  # fail safe: no cache


if os.environ.get("KREP_TPU_NO_CACHE") != "1" and not _cpu_backend():
    _cache_dir = os.environ.get(
        "KREP_TPU_CACHE_DIR", os.path.expanduser("~/.cache/krep_tpu/jax")
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is best-effort
        pass

# Staged layout contract (shared by the XLA and Pallas backends):
#   total bytes = 128 * (R + HALO_ROWS) where R is a row bucket
#   (power-of-two or 1.5x power-of-two, min TILE_ROWS) and the trailing
#   HALO_ROWS*128 bytes are zero. R is always a multiple of TILE_ROWS.
TILE_ROWS = 512        # 64 KiB tiles through VMEM (v1 byte kernel)
HALO_ROWS = 32         # 4 KiB forward halo (8 uint32 rows — Mosaic block
                       # sublane minimum); covers shifts up to 4095 bytes
LANES = 128


def row_bucket(rows: int) -> int:
    """Smallest row bucket ≥ rows from {512, 1024, 1536, 2048, 3072, ...}:
    powers of two plus midpoints, all multiples of TILE_ROWS."""
    if rows <= TILE_ROWS:
        return TILE_ROWS
    p = 1 << int(rows - 1).bit_length()
    mid = (p // 2) * 3 // 2
    if rows <= mid and mid % TILE_ROWS == 0:
        return mid
    return p


def bucket_size(n: int) -> int:
    rows = -(-n // LANES)
    return LANES * (row_bucket(rows) + HALO_ROWS)


_SKEW_CPU = False  # default backend died at first transfer: stay on CPU


def _put(x):
    """device_put with skew fallback: a tunneled client can initialize
    fine yet fail at the FIRST transfer (libtpu client/terminal version
    skew — the MULTICHIP_r01/r02 failure mode). A grep CLI must degrade
    to the CPU platform, not crash; backend_name() routes to the XLA
    path once the flag is set."""
    global _SKEW_CPU
    if not _SKEW_CPU:
        try:
            return jax.device_put(x)
        except Exception as e:
            _SKEW_CPU = True
            import sys

            sys.stderr.write(
                "krep-tpu: default backend failed at first transfer "
                f"({type(e).__name__}); falling back to the CPU platform\n"
            )
    return jax.device_put(x, jax.devices("cpu")[0])


class StagedText:
    """One host staging buffer, two device views (transferred on demand):
    .u8  — flat uint8, used by the XLA path and the v1 byte kernel
    .u32 — (R4 + H4/4, 128) uint32 little-endian 4-bytes-per-lane view,
           used by the SWAR kernel (zero-copy host reinterpret)."""

    def __init__(self, text: bytes | np.ndarray):
        buf = (
            np.frombuffer(text, dtype=np.uint8)
            if isinstance(text, (bytes, bytearray, memoryview))
            else np.asarray(text, dtype=np.uint8)
        )
        n = buf.shape[0]
        if n >= (1 << 31):
            # single-array offsets are int32; bigger inputs must go through
            # the slab loop (engine/search.py) or the sharded mesh path
            raise NotImplementedError(
                "single-array staging is limited to 2 GiB; use the slab or "
                "sharded paths"
            )
        b = bucket_size(n)
        # empty + tail-zero: half the host memory traffic of zeros+copy
        # (staging is the cold-scan bound; krep's analogue is mmap page-in,
        # krep.c:2674-2723)
        padded = np.empty(b, dtype=np.uint8)
        padded[:n] = buf
        padded[n:] = 0
        self._np = padded
        self.n = n
        self.true_len = _put(np.int32(n))
        self._u8 = None
        self._u32 = None
        # fresh staging zero-fills past n, so NUL-free patterns can skip
        # the kernel's start-bound compares entirely (pallas_swar
        # no_tail_guard); with_len views share a buffer whose tail holds
        # live text and must keep the guard
        self.tail_zero = True

    @property
    def u8(self):
        if self._u8 is None:
            src = getattr(self, "_src", None)
            self._u8 = src.u8 if src is not None else _put(self._np)
        return self._u8

    @property
    def u32(self):
        if self._u32 is None:
            src = getattr(self, "_src", None)
            if src is not None:
                self._u32 = src.u32
            else:
                rows4 = self._np.shape[0] // 512  # 128 u32 lanes × 4 bytes
                view = self._np.view("<u4").reshape(rows4, 128)
                self._u32 = _put(view)
        return self._u32

    def with_len(self, n: int, tail_zero: bool = False) -> "StagedText":
        """Same device buffers (staged once, shared), different effective
        length — used by benchmarking to defeat result caching. tail_zero:
        the caller asserts bytes at and beyond n are zero in the staged
        buffer (bench stages a copy whose final bytes are zeroed so
        chained with_len(n-j) lengths genuinely satisfy the contract)."""
        other = StagedText.__new__(StagedText)
        other._np = self._np
        other.n = n
        other.true_len = _put(np.int32(n))
        other._u8 = None
        other._u32 = None
        other._src = self
        other.tail_zero = tail_zero
        return other


def stage(text: bytes | np.ndarray) -> StagedText:
    return StagedText(text)


def stage_text(text: bytes | np.ndarray):
    """bytes → (device uint8 array in the staged layout, true_len int32)."""
    st = StagedText(text)
    return st.u8, st.true_len


def backend_name() -> str:
    mode = os.environ.get("KREP_TPU_BACKEND", "auto")
    if mode == "auto":
        if _SKEW_CPU:
            return "xla"  # transfers fell back to the CPU platform
        try:
            # bounded-probe guard first: jax.default_backend() initializes
            # the default platform, which can HANG (not just raise) when
            # the tunneled TPU client is down — see mesh.guard_default_backend
            from ..parallel.mesh import guard_default_backend

            guard_default_backend()
            default = jax.default_backend()
        except Exception:
            # a broken default platform (e.g. libtpu client/terminal skew)
            # must not take down CPU-mesh callers — route to the XLA path
            return "xla"
        return "swar" if default not in ("cpu",) else "xla"
    return mode


def scan_literal_staged(
    staged: "StagedText", *, pattern, case_sensitive, whole_word, want_mask,
    want_lines: bool = True, mask_kind: str = "starts",
    want_count: bool = True, assume_zero_tail: bool | None = None,
):
    """Fused literal scan via the selected backend (KREP_TPU_BACKEND =
    auto | swar | pallas | xla). Returns (match_count, matched_line_count,
    mask) where mask's little-endian bytes are the per-byte 0/1 mask
    (match starts, or -c dedup events for mask_kind="first_line").
    matched_line_count is only meaningful when want_lines=True.
    want_count=False lets lines-only callers (-c) skip the match-count
    popcount on the SWAR backend (the count slot returns 0 there);
    assume_zero_tail overrides staged.tail_zero (bench timing only)."""
    from ..utils import profiling

    with profiling.scan_span(f"scan[{backend_name()}] m={len(pattern)}", staged.n or 0):
        return _scan_literal_staged(
            staged,
            pattern=pattern,
            case_sensitive=case_sensitive,
            whole_word=whole_word,
            want_mask=want_mask,
            want_lines=want_lines,
            mask_kind=mask_kind,
            want_count=want_count,
            assume_zero_tail=assume_zero_tail,
        )


def _scan_literal_staged(
    staged: "StagedText", *, pattern, case_sensitive, whole_word, want_mask,
    want_lines: bool = True, mask_kind: str = "starts",
    want_count: bool = True, assume_zero_tail: bool | None = None,
):
    be = backend_name()
    if be == "swar":
        try:
            from . import pallas_swar

            if assume_zero_tail is None:
                assume_zero_tail = getattr(staged, "tail_zero", False)
            return pallas_swar.scan_literal(
                staged.u32,
                staged.true_len,
                pattern=pattern,
                case_sensitive=case_sensitive,
                whole_word=whole_word,
                want_mask=want_mask,
                want_lines=want_lines,
                mask_kind=mask_kind,
                assume_zero_tail=bool(assume_zero_tail),
                want_count=want_count,
            )
        except (ImportError, NotImplementedError):
            be = "pallas"
    if be == "pallas" and mask_kind == "starts":
        try:
            from . import pallas_scan

            return pallas_scan.scan_literal(
                staged.u8,
                staged.true_len,
                pattern=pattern,
                case_sensitive=case_sensitive,
                whole_word=whole_word,
                want_mask=want_mask,
            )
        except (ImportError, NotImplementedError):
            pass
    return literal.scan_literal(
        staged.u8,
        staged.true_len,
        pattern=pattern,
        case_sensitive=case_sensitive,
        whole_word=whole_word,
        want_mask=want_mask,
        mask_kind=mask_kind,
    )


@functools.partial(jax.jit, static_argnames=())
def _group_counts(mask2d):
    # per-group match counts; mask words hold 0/1 bytes
    w = mask2d.astype(jnp.uint32)
    return jnp.sum(((w * jnp.uint32(0x01010101)) >> jnp.uint32(24)).astype(jnp.int32), axis=1)


@jax.jit
def _pack_mask_bits(mask_words):
    """u32 mask words (0x01-bytes, little-endian byte order) → bit-packed
    uint8, 8 text positions per byte (position 8j+b = bit b of flat byte
    j). 8x less device→host transfer for DENSE masks (positions-at-scale
    -o queries).

    Implementation stays lane-local on a (M/128, 128) view: word → 4-bit
    nibble by one SWAR multiply (byte 3 of w*0x01020408 = b0+2b1+4b2+8b3,
    byte sums ≤ 15 so no carries), then a 3-step roll/shift combine puts
    the 8 nibbles of lanes 8q..8q+7 into lane 8q, and a stride-8 lane
    slice extracts them. TPU tiled layouts pad a trailing dim to 128
    lanes, so the obvious (-1, 2) word-pairing reshape materializes a
    64x-padded intermediate — 64 GiB of HBM for a 1 GiB text's mask."""
    a = mask_words.reshape(-1, LANES)
    nib = (a * jnp.uint32(0x01020408)) >> jnp.uint32(24)
    p = nib | (jnp.roll(nib, -1, axis=1) << jnp.uint32(4))
    p = p | (jnp.roll(p, -2, axis=1) << jnp.uint32(8))
    p = p | (jnp.roll(p, -4, axis=1) << jnp.uint32(16))
    g = p[:, ::8]                       # (M/128, 16) packed u32
    return jax.lax.bitcast_convert_type(g, jnp.uint8).reshape(-1)


GROUP_WORDS = 16384  # 64 KiB of text per group


def _starts_via_packed_bits(mask_dev, n: int) -> np.ndarray:
    """Dense-mask readback: pack 0/1 bytes to bits ON DEVICE, transfer n/8
    bytes, expand host-side (native ctz walk; np.unpackbits fallback)."""
    if mask_dev.size % LANES:
        mk = np.asarray(mask_dev).view(np.uint8)
        return np.flatnonzero(mk[:n]).astype(np.int64)
    packed = np.asarray(_pack_mask_bits(mask_dev))
    try:
        from ..native import runtime as _native
    except Exception:
        _native = None
    if _native is not None:
        return _native.bits_to_starts(packed, n)
    bits = np.unpackbits(packed, bitorder="little", count=n)
    return np.flatnonzero(bits).astype(np.int64)


def starts_from_device_mask(mask_dev, n: int) -> np.ndarray:
    """Extract match-start offsets from a device-resident mask without
    transferring the whole thing: per-64KiB-group counts come back first
    (tiny), then only the groups that contain matches are gathered
    device-side and copied out. Dense masks are bit-packed on device and
    transferred at n/8 bytes."""
    if mask_dev.dtype == np.uint8:  # XLA path returns bytes already on host path
        mk = np.asarray(mask_dev)
        return np.flatnonzero(mk[:n]).astype(np.int64)
    size = mask_dev.size
    if size % GROUP_WORDS != 0 or size < GROUP_WORDS * 4:
        mk = np.asarray(mask_dev).view(np.uint8)
        return np.flatnonzero(mk[:n]).astype(np.int64)
    G = size // GROUP_WORDS
    m2 = mask_dev.reshape(G, GROUP_WORDS)
    counts = np.asarray(_group_counts(m2))
    nz = np.flatnonzero(counts)
    if len(nz) == 0:
        return np.zeros(0, np.int64)
    if len(nz) > G // 2:
        return _starts_via_packed_bits(mask_dev, n)
    sel = np.asarray(jnp.take(m2, jnp.asarray(nz), axis=0)).view(np.uint8)
    rows, cols = np.nonzero(sel.reshape(len(nz), GROUP_WORDS * 4))
    starts = nz[rows].astype(np.int64) * (GROUP_WORDS * 4) + cols
    return starts[starts < n]


def scan_literal_auto(text_arr, true_len, *, pattern, case_sensitive, whole_word, want_mask):
    """Back-compat wrapper over a pre-staged u8 array (bench/tests)."""
    if backend_name() in ("pallas", "swar") and jax.default_backend() != "cpu":
        st = StagedText.__new__(StagedText)
        st._np = None
        st.n = None
        st.true_len = true_len
        st._u8 = text_arr
        # u32 view via on-device bitcast (one extra pass; prefer scan_literal_staged)
        rows4 = text_arr.shape[0] // 512
        st._u32 = jax.lax.bitcast_convert_type(
            text_arr.reshape(rows4 * 128, 4), jnp.uint32
        ).reshape(rows4, 128)
        return scan_literal_staged(
            st,
            pattern=pattern,
            case_sensitive=case_sensitive,
            whole_word=whole_word,
            want_mask=want_mask,
        )
    return literal.scan_literal(
        text_arr,
        true_len,
        pattern=pattern,
        case_sensitive=case_sensitive,
        whole_word=whole_word,
        want_mask=want_mask,
    )
