"""krep-tpu: a TPU-native byte-scan framework.

Re-implements the capabilities of the `krep` string-search engine
(reference: davidesantangelo/krep, C11 + SIMD) as a JAX/XLA/Pallas
framework: dense match-mask kernels over uint8 tiles in VMEM, a shared
host-side resolution stage for overlap policies / line accounting, and
sharded multi-chip scanning via `jax.sharding`.

Public API (mirrors krep.h:161-200):
    search_string(params, text)   -> SearchResult
    search_file(params, path)     -> SearchResult
    search_directory(params, path)-> aggregate result + exit code
"""

from .params import SearchParams, SimdProfile, MatchPolicy
from .engine.search import search_string, search_file, SearchResult

__version__ = "0.1.0"

__all__ = [
    "SearchParams",
    "SimdProfile",
    "MatchPolicy",
    "search_string",
    "search_file",
    "SearchResult",
    "__version__",
]
