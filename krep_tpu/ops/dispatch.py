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

_MIN_BUCKET = 1024


def bucket_size(n: int) -> int:
    """Smallest bucket ≥ n: powers of two with a midpoint (1x, 1.5x)."""
    if n <= _MIN_BUCKET:
        return _MIN_BUCKET
    p = 1 << (int(n - 1).bit_length())
    half = p // 2 + p // 4 * 2  # = 1.5 * (p//2); p/2 < n <= p
    mid = (p // 2) * 3 // 2
    if n <= mid:
        return mid
    return p


def stage_text(text: bytes | np.ndarray):
    """bytes → (device uint8 array padded to a bucket, true_len int32)."""
    buf = (
        np.frombuffer(text, dtype=np.uint8)
        if isinstance(text, (bytes, bytearray, memoryview))
        else np.asarray(text, dtype=np.uint8)
    )
    n = buf.shape[0]
    b = bucket_size(n)
    if b != n:
        padded = np.zeros(b, dtype=np.uint8)
        padded[:n] = buf
        buf = padded
    arr = jax.device_put(buf)
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
