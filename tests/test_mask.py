"""Kernel-level asserts: all-starts mask, line counting, packing — vs naive."""

import numpy as np
import pytest

import naive
from krep_tpu.ops import dispatch, literal


def _mask_starts(text: bytes, pattern: bytes, **kw):
    arr, n = dispatch.stage_text(text)
    m = literal.all_starts_mask(arr, pattern, true_len=n, **kw)
    return np.flatnonzero(np.asarray(m)[: len(text)]).tolist()


CASES = [
    (b"abababa", b"aba"),
    (b"aaaaa", b"aa"),
    (b"hello world", b"o w"),
    (b"hello", b"hello"),
    (b"hello", b"hellox"),
    (b"", b"a"),
    (b"x", b"x"),
    (b"the theme thread\nthe end", b"the"),
    (b"edge", b"e"),
]


@pytest.mark.parametrize("text,pat", CASES)
def test_all_starts_basic(text, pat):
    assert _mask_starts(text, pat) == naive.all_starts(text, pat)


@pytest.mark.parametrize("cs", [True, False])
@pytest.mark.parametrize("ww", [True, False])
def test_all_starts_random(cs, ww):
    for seed in range(5):
        text = naive.gen_corpus(seed, 4096)
        for pat in [b"the", b"a", b"qu", b"quick", b"THE", b"e q", b"ck the qu"]:
            got = _mask_starts(text, pat, case_sensitive=cs, whole_word=ww)
            want = naive.all_starts(text, pat, case_sensitive=cs, whole_word=ww)
            assert got == want, (seed, pat, cs, ww)


def test_whole_word_edges():
    # word chars at text boundaries count as boundaries (krep.h:307-319)
    assert _mask_starts(b"cat", b"cat", whole_word=True) == [0]
    assert _mask_starts(b"cats", b"cat", whole_word=True) == []
    assert _mask_starts(b"a cat.", b"cat", whole_word=True) == [2]
    assert _mask_starts(b"_cat", b"cat", whole_word=True) == []
    assert _mask_starts(b"9cat", b"cat", whole_word=True) == []
    assert _mask_starts(b"#cat#", b"cat", whole_word=True) == [1]


def test_matched_line_count():
    for seed in range(5):
        text = naive.gen_corpus(seed, 4096)
        for pat in [b"the", b"a", b"quick"]:
            arr, n = dispatch.stage_text(text)
            mask = literal.all_starts_mask(arr, pat, true_len=n)
            got = int(literal.matched_line_count(mask, arr))
            want = naive.matched_lines(text, naive.all_starts(text, pat))
            assert got == want, (seed, pat)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 7, 8, 9, 1000, 4096]:
        mask = rng.random(n) < 0.1
        import jax.numpy as jnp

        packed = np.asarray(literal.pack_mask(jnp.asarray(mask)))
        from krep_tpu.engine import resolve

        got = resolve.unpack_mask_host(packed, n)
        assert got.tolist() == np.flatnonzero(mask).tolist()


def test_scan_literal_fused():
    text = naive.gen_corpus(1, 8192)
    arr, n = dispatch.stage_text(text)
    count, lines, mask = literal.scan_literal(arr, n, pattern=b"the")
    starts = naive.all_starts(text, b"the")
    assert int(count) == len(starts)
    assert int(lines) == naive.matched_lines(text, starts)
    assert np.flatnonzero(np.asarray(mask)[: len(text)]).tolist() == starts


def test_packed_bits_dense_compaction():
    """Dense-mask readback path: device bit-packing + host unpackbits must
    equal the byte-mask flatnonzero for any density."""
    import numpy as np
    from krep_tpu.ops import dispatch

    rng = np.random.default_rng(3)
    size_words = 16384 * 8  # multiple of GROUP_WORDS
    for dens in (0.0, 0.02, 0.6, 1.0):
        bytes_buf = (rng.random(size_words * 4) < dens).astype(np.uint8)
        import jax.numpy as jnp

        mask_words = jnp.asarray(bytes_buf.view("<u4"))
        n = size_words * 4 - 57
        want = np.flatnonzero(bytes_buf[:n])
        got = dispatch._starts_via_packed_bits(mask_words, n)
        assert np.array_equal(got, want), dens
        got2 = dispatch.starts_from_device_mask(mask_words, n)
        assert np.array_equal(got2, want), dens
