"""Backend dispatch + host→device staging.

Staging pads texts into geometric size buckets so jit caches are reused
across file sizes (the analogue of the reference's chunk-size policy at
krep.c:2729-2829, but for compile-cache hygiene rather than thread counts).

Backend knob: KREP_TPU_BACKEND = auto | xla | pallas.
  auto: Pallas tiled kernel on TPU, XLA elsewhere.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import literal

# Persistent compile cache: the CLI is a fresh process per invocation (like
# the reference binary), so kernel compiles must amortize across runs.
if os.environ.get("KREP_TPU_NO_CACHE") != "1":
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
TILE_ROWS = 512        # 64 KiB tiles through VMEM
HALO_ROWS = 16         # 2 KiB forward halo: covers shifts up to 2047 bytes
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


def stage_text(text: bytes | np.ndarray):
    """bytes → (device uint8 array in the staged layout, true_len int32)."""
    buf = (
        np.frombuffer(text, dtype=np.uint8)
        if isinstance(text, (bytes, bytearray, memoryview))
        else np.asarray(text, dtype=np.uint8)
    )
    n = buf.shape[0]
    b = bucket_size(n)
    padded = np.zeros(b, dtype=np.uint8)
    padded[:n] = buf
    arr = jax.device_put(padded)
    return arr, jnp.int32(n)


def backend_name() -> str:
    mode = os.environ.get("KREP_TPU_BACKEND", "auto")
    if mode == "auto":
        return "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    return mode


def scan_literal_auto(text_arr, true_len, *, pattern, case_sensitive, whole_word, want_mask):
    """Fused literal scan via the selected backend. Returns
    (match_count, matched_line_count, packed_mask)."""
    if backend_name() == "pallas":
        try:
            from . import pallas_scan

            return pallas_scan.scan_literal(
                text_arr,
                true_len,
                pattern=pattern,
                case_sensitive=case_sensitive,
                whole_word=whole_word,
                want_mask=want_mask,
            )
        except (ImportError, NotImplementedError):
            pass
    return literal.scan_literal(
        text_arr,
        true_len,
        pattern=pattern,
        case_sensitive=case_sensitive,
        whole_word=whole_word,
        want_mask=want_mask,
    )
