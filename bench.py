#!/usr/bin/env python
"""Benchmarks against the reference's headline numbers (BASELINE.md).

Default: prints ONE JSON line — config 1, the `krep -c -F the` scan
throughput over ~1 GiB of English-like text (subtitles2016 is not fetchable
offline; the corpus is deterministic and count-parity against the reference
binary is checked when it is available).

`python bench.py --all` additionally runs BASELINE configs 2-5, one JSON
line each.

Timing: chained launches with a single final sync and per-iteration
distinct true_len — the axon tunnel has ~25 ms RTT per sync, an unreliable
block_until_ready, and appears to cache identical dispatches.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_GBPS = 5.7  # reference `krep -c -F the`: ~1GB / 0.1757s (README.md:171-175)
CORPUS_BYTES = int(os.environ.get("KREP_BENCH_BYTES", 1 << 30))
# Generated corpora live outside the repo so they never pollute source-size
# accounting (the round-1 LoC diagnostic counted 679k generated lines).
CORPUS_DIR = os.environ.get("KREP_BENCH_CORPUS_DIR", "/tmp/krep_bench_corpus")
PATTERN = b"the"
_OUTAGE_FALLBACK = False  # set by main() when the accelerator probe fails
PATTERNS_16 = [
    b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy", b"dog",
    b"Sherlock", b"time", b"words", b"some", b"then", b"deeply", b"was", b"more",
]


def gen_corpus(path: str, size: int):
    if os.path.exists(path) and os.path.getsize(path) == size:
        return
    rng = np.random.default_rng(12345)
    words = (
        b"the quick brown fox jumps over a lazy dog and then some more words "
        b"it was time for Sherlock to breathe deeply in the theatre"
    ).split()
    block = []
    total = 0
    with open(path, "wb") as f:
        while total < size:
            k = int(rng.integers(3, 9))
            idx = rng.integers(0, len(words), k)
            line = b" ".join(words[i] for i in idx) + b"\n"
            block.append(line)
            total += len(line)
            if len(block) >= 65536:
                f.write(b"".join(block))
                block = []
        if block:
            f.write(b"".join(block))
        f.truncate(size)


def chained_gbps(run_one, n_bytes, K=17, reps=9):
    """run_one(j) must return a device scalar; chained timing, single sync.

    The tunnel-attached chip is shared and slows down by up to ~3.5x for
    seconds at a time (measured on identical dispatches), so each
    measurement is min-filtered over many interleaved reps — the min pair
    captures a quiet window; means would report tenant noise.

    Returns (gbps, reps_record): the raw (t1, tK) pairs ship in the JSON so
    round-over-round deltas are auditable under co-tenant noise (a min
    alone can't distinguish a regression from a loud window — VERDICT r3
    item 6)."""
    import jax.numpy as jnp

    def timed(k):
        t0 = time.perf_counter()
        outs = [run_one(j) for j in range(k)]
        _ = int(jnp.stack(outs).sum())
        return time.perf_counter() - t0

    _ = timed(1)  # warm/compile
    t1s, tKs = [], []
    for _ in range(reps):
        t1s.append(timed(1))
        tKs.append(timed(K))
        time.sleep(0.05)
    dt = max((min(tKs) - min(t1s)) / (K - 1), 1e-9)
    pair_gbps = sorted(
        n_bytes / max((tk - t1) / (K - 1), 1e-9) / 1e9
        for t1, tk in zip(t1s, tKs)
    )
    rec = {
        "K": K,
        "t1_s": [round(t, 4) for t in t1s],
        "tK_s": [round(t, 4) for t in tKs],
        "pair_gbps_min": round(pair_gbps[0], 2),
        "pair_gbps_median": round(pair_gbps[len(pair_gbps) // 2], 2),
        "pair_gbps_max": round(pair_gbps[-1], 2),
    }
    return n_bytes / dt / 1e9, rec


def _oracle_bin():
    """Build (once) and return the reference oracle binary, or (None,
    reason). Reuses tests/oracle.ensure_oracle so the bench and the test
    suite agree on ONE build path (/tmp/krep_oracle_build/krep —
    BENCH_r03 shipped parity:null because this used to look at a path
    nothing builds, VERDICT r3 item 1)."""
    tests_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    if tests_dir not in sys.path:
        sys.path.insert(0, tests_dir)
    try:
        import oracle as oracle_mod

        bin_ = oracle_mod.ensure_oracle()
        if bin_ is None:
            return None, "reference tree not present"
        return str(bin_), None
    except Exception as e:
        return None, f"oracle build failed: {e}"


def oracle_count(args, timeout_s=900):
    """Reference count for `krep -c [-o] ... target` (single-threaded — the
    reference's own multithreaded regex/boundary bugs are documented
    divergences and must not pollute the gate). Returns (count, None) or
    (None, reason)."""
    bin_, reason = _oracle_bin()
    if bin_ is None:
        return None, reason
    try:
        out = subprocess.run(
            [bin_, "-t", "1", *args], capture_output=True, timeout=timeout_s
        )
    except subprocess.TimeoutExpired:
        return None, f"oracle timed out after {timeout_s}s"
    if out.returncode not in (0, 1):
        return None, f"oracle exited {out.returncode}"
    try:
        return int(out.stdout.rsplit(b":", 1)[-1]), None
    except ValueError:
        return None, "unparseable oracle output"


def parity_fields(our_count, args, timeout_s=900):
    """The per-config count-parity gate (the reference benchmark refuses to
    time anything until counts agree — benchmark_krep_vs_rg.sh:63-72).
    Never a silent null: either a real boolean or an explicit reason."""
    want, reason = oracle_count(args, timeout_s)
    if want is None:
        return {"match_count": int(our_count), "oracle_unavailable": reason}
    return {
        "match_count": int(our_count),
        "oracle_count": want,
        "count_parity_vs_reference": bool(int(our_count) == want),
    }


_RECORDS = []  # every emit() of the run, for the per-round artifact


def emit(metric, gbps, extra=None):
    rec = {
        "metric": metric,
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))
    _RECORDS.append(rec)


def _round_number() -> int:
    """Current build round, from the driver's PROGRESS.jsonl (0 if absent)."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "PROGRESS.jsonl")
        with open(path) as f:
            last = f.readlines()[-1]
        return int(json.loads(last)["round"])
    except Exception:
        return 0


def write_bench_all():
    """One auditable artifact per round: BENCH_ALL_r{N}.json holds every
    config's record (value, reps, parity fields) from this --all run —
    the analogue of the reference's methodology-stamped benchmark table
    (README.md:157-176)."""
    import jax

    rec = {
        "round": _round_number(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "platform": jax.default_backend(),
        "corpus_bytes": CORPUS_BYTES,
        "configs": _RECORDS,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"BENCH_ALL_r{rec['round']:02d}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"bench_all": path, "n_configs": len(_RECORDS)}))


def config1(staged, n, data_path):
    """-c 'the': matched-line count (the reference's headline)."""
    import jax

    from krep_tpu.ops import dispatch

    def run_one(j):
        # assume_zero_tail=True times the PRODUCTION kernel (fresh staging
        # zero-fills the tail, so the CLI path compiles without the
        # start-bound compares); the chained with_len(n-j) variations exist
        # only to defeat dispatch caching — their counts may include tail
        # matches, which is irrelevant for timing. want_count=False matches
        # the -c call site (engine/search.py), which only consumes lines.
        _, lines, _ = dispatch.scan_literal_staged(
            staged.with_len(n - j),
            pattern=PATTERN, case_sensitive=True, whole_word=False,
            want_mask=False, want_lines=True,
            want_count=False, assume_zero_tail=True,
        )
        return lines

    gbps, reps = chained_gbps(run_one, n)
    _, lines0, _ = dispatch.scan_literal_staged(
        staged, pattern=PATTERN, case_sensitive=True, whole_word=False,
        want_mask=False, want_lines=True, want_count=False,
    )
    lines0 = int(lines0)
    # UNCONDITIONAL parity gate: the bench builds the oracle itself and a
    # mismatch fails the run loudly (exit 1) — a perf headline without its
    # correctness gate is how silent regressions ship
    want, reason = oracle_count(["-c", PATTERN.decode(), data_path])
    parity = None if want is None else bool(want == lines0)
    extra = {
        "line_count": lines0,
        "count_parity_vs_reference": parity,
        "backend": jax.default_backend(),
        "corpus_bytes": n,
        "reps": reps,
    }
    if want is None:
        extra["oracle_unavailable"] = reason
    else:
        extra["oracle_count"] = want
    if _OUTAGE_FALLBACK:
        # The accelerator was unreachable at run time; this line's value is
        # a CPU-backend correctness run, ~3 orders below the chip. Carry the
        # last on-chip measurement (same code, same corpus) so the record
        # isn't blind — clearly labeled as historical.
        extra["note"] = ("accelerator backend down at bench time; value is "
                         "the CPU fallback run")
        extra["last_measured_on_tpu"] = {
            "value_gbps": 182.4, "date": "2026-08-17",
            "count_parity_vs_reference": True,
            "evidence": "BENCH_NOTES.md round-3 table (v5e, min-filtered)",
        }
    emit(
        "fixed-string -c scan throughput (pattern 'the', 1GiB english-like corpus)",
        gbps,
        extra,
    )
    if parity is False:
        # the reference's own benchmark aborts on count mismatch
        # (benchmark_krep_vs_rg.sh:63-72); match that stance
        print(
            json.dumps({"error": "count parity FAILED on the headline config",
                        "ours": lines0, "oracle": want}),
            file=sys.stderr,
        )
        sys.exit(1)


def config2(staged, n, data_path):
    """-i -w short pattern (memchr-class path), count matches."""
    from krep_tpu.ops import dispatch

    def run_one(j):
        c, _, _ = dispatch.scan_literal_staged(
            staged.with_len(n - j),
            pattern=b"e", case_sensitive=False, whole_word=True,
            want_mask=False, want_lines=False, assume_zero_tail=True,
        )
        return c

    gbps, reps = chained_gbps(run_one, n)
    # Parity gate on a 32 MiB prefix: the single-threaded reference at
    # -i -w runs ~1 MB/s on this host (its boundary checks fall off the
    # SIMD ladder), so a full-corpus oracle run blows the 900 s timeout
    # (the r5 dev run shipped oracle_unavailable). Count parity on the
    # prefix exercises the identical kernel route.
    pfx_bytes = min(n, 32 << 20)
    pfx_path = data_path + ".pfx32m"
    if not (os.path.exists(pfx_path)
            and os.path.getsize(pfx_path) == pfx_bytes):
        with open(data_path, "rb") as f, open(pfx_path, "wb") as g:
            g.write(f.read(pfx_bytes))
    pfx = dispatch.stage(np.memmap(pfx_path, dtype=np.uint8, mode="r"))
    c0, _, _ = dispatch.scan_literal_staged(
        pfx, pattern=b"e", case_sensitive=False, whole_word=True,
        want_mask=False, want_lines=False,
    )
    extra = parity_fields(int(c0), ["-c", "-o", "-i", "-w", "e", pfx_path])
    extra["parity_prefix_bytes"] = pfx_bytes
    extra["reps"] = reps
    emit("-i -w single-char match-count scan (config 2)", gbps, extra)


def _skip_if_outage(config_name: str) -> bool:
    """Configs that drive compiled Pallas kernels directly (3/4/6) have no
    CPU route (pallas_call on the CPU backend is interpret-only, ~4 orders
    slower); under the outage fallback they emit a labeled skip record
    instead of crashing the run."""
    if _OUTAGE_FALLBACK:
        emit(config_name, 0.0, {
            "skipped": "accelerator backend down at bench time; this "
                       "config drives compiled Pallas kernels directly "
                       "and has no CPU-backend route"})
        return True
    return False


def config3(staged, n, data_path):
    """16 literals fused (Aho-Corasick capability), total match count."""
    if _skip_if_outage("multi-pattern scans (config 3 family)"):
        return
    from krep_tpu.ops import pallas_swar

    import jax.numpy as jnp

    pats = tuple(PATTERNS_16)

    def run_one(j):
        c, _, _ = pallas_swar.scan_multi(
            staged.u32, jnp.int32(n - j), patterns=pats,
            case_sensitive=True, whole_word=False,
            want_mask=False, want_lines=False, assume_zero_tail=True,
        )
        return c

    gbps, reps = chained_gbps(run_one, n)
    c0, _, _ = pallas_swar.scan_multi(
        staged.u32, staged.true_len, patterns=pats,
        case_sensitive=True, whole_word=False,
        want_mask=False, want_lines=False,
    )
    args16 = ["-c", "-o"]
    for w in pats:
        args16 += ["-e", w.decode()]
    extra = parity_fields(int(c0), [*args16, data_path])
    extra["reps"] = reps
    emit("16-literal multi-pattern fused scan (config 3)", gbps, extra)

    # 64 literals, single fused pass (FUSED_MAX) — the large -f regime
    pats64 = []
    i = 0
    while len(pats64) < 64:
        w = PATTERNS_16[i % 16]
        r = i // 16
        p = (w[:5] + str(r).encode() if r else w)[:8]
        if p not in pats64:
            pats64.append(p)
        i += 1
    pats64 = tuple(pats64)

    # the routed production path (MXU bit-matmul from K=32 up). The CLI
    # path runs non-strict (fresh staging zero-fills the tail); to time
    # THAT kernel while still defeating dispatch caching with chained
    # with_len(n-j) lengths, stage a copy whose last 16 bytes are zero —
    # the zero-tail staging contract then genuinely holds for every
    # j < 17 (chained_gbps K=17), so counts stay exact too. (strict=True
    # on the shared buffer measured ~8% slower than production.)
    from krep_tpu.ops import dispatch as dispatch_mod
    from krep_tpu.ops import multi as multi_mod

    zdata = np.array(staged._np[:n])
    zdata[-16:] = 0
    staged_z = dispatch_mod.stage(zdata)
    del zdata

    def run64(j):
        return multi_mod.fused_count_device(
            staged_z.with_len(n - j), pats64, True, False, strict=False
        )

    gbps64, reps64 = chained_gbps(run64, n)
    # exact count on the TRUE corpus (staged_z's zeroed tail is a timing
    # artifact) for the parity gate
    c64 = int(multi_mod.fused_count_device(staged, pats64, True, False,
                                           strict=True))
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pats", delete=False) as pf:
        pf.write(b"\n".join(pats64))
        patpath = pf.name
    try:
        extra64 = parity_fields(
            c64, ["-c", "-o", "-f", patpath, data_path]
        )
    finally:
        os.unlink(patpath)
    extra64["reps"] = reps64
    emit("64-literal multi-pattern count (config 3b, MXU route)", gbps64,
         extra64)

    # config 3c: 64 literals of MIXED lengths 4-20 bytes — the realistic
    # -f word-set regime (VERDICT r3 item 5). Members >13 bytes force the
    # MXU kernel's two-window AND (second dot over window bytes 16..31);
    # previously such sets fell to the K-linear VPU path.
    rng3c = np.random.default_rng(777)
    corpus_words = (
        b"the quick brown fox jumps over a lazy dog and then some more "
        b"words it was time for Sherlock to breathe deeply in the theatre"
    ).split()
    pats_mixed = []
    while len(pats_mixed) < 64:
        k = int(rng3c.integers(1, 4))
        ws = [corpus_words[int(i)] for i in rng3c.integers(0, len(corpus_words), k)]
        p = b" ".join(ws)[: int(rng3c.integers(4, 21))]
        if len(p) >= 4 and p not in pats_mixed:
            pats_mixed.append(p)
    pats_mixed = tuple(pats_mixed)
    assert any(len(p) > 13 for p in pats_mixed)

    def run3c(j):
        return multi_mod.fused_count_device(
            staged_z.with_len(n - j), pats_mixed, True, False, strict=False
        )

    gbps3c, reps3c = chained_gbps(run3c, n)
    c3c = int(multi_mod.fused_count_device(staged, pats_mixed, True, False,
                                           strict=True))
    with tempfile.NamedTemporaryFile(suffix=".pats", delete=False) as pf:
        pf.write(b"\n".join(pats_mixed))
        patpath = pf.name
    try:
        extra3c = parity_fields(
            c3c, ["-c", "-o", "-f", patpath, data_path]
        )
    finally:
        os.unlink(patpath)
    extra3c["reps"] = reps3c
    extra3c["pattern_lengths"] = sorted({len(p) for p in pats_mixed})
    emit(
        "64-literal mixed-length (4-20B) multi-pattern count "
        "(config 3c, MXU two-window route)",
        gbps3c, extra3c,
    )

    # config 3w: the same mixed-length K=64 set with -w — routes the MXU
    # whole-word boundary dot (previously whole-word fell to the K-linear
    # VPU path; the reference covers -w at scale via AC + is_word_char,
    # krep.c:1389-1420).
    def run3w(j):
        return multi_mod.fused_count_device(
            staged_z.with_len(n - j), pats_mixed, True, True, strict=False
        )

    gbps3w, reps3w = chained_gbps(run3w, n)
    c3w = int(multi_mod.fused_count_device(staged, pats_mixed, True, True,
                                           strict=True))
    with tempfile.NamedTemporaryFile(suffix=".pats", delete=False) as pf:
        pf.write(b"\n".join(pats_mixed))
        patpath = pf.name
    try:
        extra3w = parity_fields(
            c3w, ["-w", "-c", "-o", "-f", patpath, data_path]
        )
    finally:
        os.unlink(patpath)
    extra3w["reps"] = reps3w
    emit(
        "64-literal mixed-length whole-word (-w) multi-pattern count "
        "(config 3w, MXU boundary-dot route)",
        gbps3w, extra3w,
    )

    # config 3L: the same mixed-length K=64 set in LINE-count mode (-c
    # without -o) — the flagship grep mode at scale. Routes the MXU union
    # mask chained into the bit-packed line kernel (lines_from_mask):
    # scalar-only readback, no K-linear VPU pass, no full-mask D2H
    # (VERDICT r4 item 2; the reference's AC counts lines in-stream,
    # aho_corasick.c:390-403).
    def run3L(j):
        # tail_zero holds (staged_z's last 16 bytes are zero, j < 17);
        # production route = MXU union mask chained into the line kernel
        return multi_mod.fused_lines_device(
            staged_z.with_len(n - j, tail_zero=True), pats_mixed, True, False
        )

    gbps3L, reps3L = chained_gbps(run3L, n)
    c3L = int(multi_mod.fused_lines_device(staged, pats_mixed, True, False))
    with tempfile.NamedTemporaryFile(suffix=".pats", delete=False) as pf:
        pf.write(b"\n".join(pats_mixed))
        patpath = pf.name
    try:
        extra3L = parity_fields(c3L, ["-c", "-f", patpath, data_path])
    finally:
        os.unlink(patpath)
    extra3L["reps"] = reps3L
    emit(
        "64-literal mixed-length multi-pattern LINE count "
        "(config 3L, MXU mask chained into the line kernel)",
        gbps3L, extra3L,
    )
    del staged_z


ING_WORDS = [b"jumping", b"singing", b"working", b"morning", b"nothing",
             b"Running", b"Marking"]


def gen_corpus_ing(path: str, size: int):
    """English-like corpus where ~3% of LINES contain an 'ing' word — the
    honest config-4 corpus (the plain bench corpus has zero factor hits,
    VERDICT r2 weak #3): the device factor scan runs BOTH its count and
    mask passes, and glibc regexec really executes on the candidates."""
    if os.path.exists(path) and os.path.getsize(path) == size:
        return
    rng = np.random.default_rng(4242)
    words = (
        b"the quick brown fox jumps over a lazy dog and then some more words "
        b"it was time for Sherlock to breathe deeply in the theatre"
    ).split()
    block = []
    total = 0
    with open(path, "wb") as f:
        while total < size:
            k = int(rng.integers(3, 9))
            idx = rng.integers(0, len(words), k)
            ws = [words[i] for i in idx]
            if rng.random() < 0.03:  # ~3% of lines carry a factor hit
                ws[int(rng.integers(0, k))] = ING_WORDS[
                    int(rng.integers(0, len(ING_WORDS)))
                ]
            line = b" ".join(ws) + b"\n"
            block.append(line)
            total += len(line)
            if len(block) >= 65536:
                f.write(b"".join(block))
                block = []
        if block:
            f.write(b"".join(block))
        f.truncate(size)


def config4(n, data_path):
    """POSIX ERE '[A-Z][a-z]+ing' via the TPU literal-factor prefilter on a
    corpus WITH factor hits: device count pass + device mask pass (both
    HBM-resident, chained) + one measured host pass (mask compaction,
    candidate line ranges, glibc regexec over candidate lines via the
    native ranges loop). end-to-end = n / (t_count + t_mask + t_host)."""
    if _skip_if_outage("ERE factor-prefilter scan (config 4)"):
        return
    import jax.numpy as jnp

    from krep_tpu import SearchParams
    from krep_tpu.engine import ere_analyze, regex_engine
    from krep_tpu.ops import dispatch, pallas_swar

    src = b"[A-Z][a-z]+ing"
    a = ere_analyze.analyze(src)
    assert a is not None and a.newline_safe and a.literals

    path4 = os.path.join(CORPUS_DIR, f"bench_ing_{CORPUS_BYTES}.txt")
    gen_corpus_ing(path4, CORPUS_BYTES)
    data4 = np.memmap(path4, dtype=np.uint8, mode="r")
    staged4 = dispatch.stage(data4)

    def count_pass(j):
        c, _, _ = pallas_swar.scan_multi(
            staged4.with_len(n - j).u32, jnp.int32(n - j), patterns=a.literals,
            case_sensitive=True, whole_word=False,
            want_mask=False, want_lines=False, assume_zero_tail=True,
        )
        return c

    def mask_pass(j):
        c, _, mask = pallas_swar.scan_multi(
            staged4.with_len(n - j).u32, jnp.int32(n - j), patterns=a.literals,
            case_sensitive=True, whole_word=False,
            want_mask=True, want_lines=False, assume_zero_tail=True,
        )
        return c + mask.reshape(-1)[0].astype(jnp.int32)

    gbps_count, reps_count = chained_gbps(count_pass, n)
    gbps_mask, reps_mask = chained_gbps(mask_pass, n)

    # one full host pass: compaction + line ranges + native regexec loop
    _, _, mask = pallas_swar.scan_multi(
        staged4.u32, staged4.true_len, patterns=a.literals,
        case_sensitive=True, whole_word=False,
        want_mask=True, want_lines=False,
    )
    t0 = time.perf_counter()
    starts = dispatch.starts_from_device_mask(mask, n)
    t_compact = time.perf_counter() - t0
    arr = np.asarray(data4)
    t0 = time.perf_counter()
    ranges = regex_engine._candidate_line_ranges(arr, starts)
    t_ranges = time.perf_counter() - t0
    p = SearchParams(patterns=(src,), use_regex=True, count_mode=True,
                     only_matching=True)
    data_b = arr.tobytes()
    from krep_tpu.native import runtime as native
    cflags = regex_engine.REG_EXTENDED | regex_engine.REG_NEWLINE
    t0 = time.perf_counter()
    count, _ = native.regex_search_ranges(
        src, data_b, ranges, cflags, False, False, False, 1 << 62,
    )
    t_regexec = time.perf_counter() - t0
    cand_bytes = int((ranges[:, 1] - ranges[:, 0]).sum())
    t_host = t_compact + t_ranges + t_regexec
    t_device = n / (gbps_count * 1e9) + n / (gbps_mask * 1e9)
    e2e = n / (t_device + t_host) / 1e9
    extra = parity_fields(int(count), ["-c", "-o", "-E", src.decode(), path4])
    extra.update(
        {"factor_scan_gbps": round(gbps_count, 3),
         "mask_pass_gbps": round(gbps_mask, 3),
         "candidate_lines": int(len(ranges)),
         "candidate_line_density_pct": round(100 * cand_bytes / n, 2),
         "host_seconds": round(t_host, 3),
         "compact_s": round(t_compact, 3),
         "ranges_s": round(t_ranges, 3),
         "regexec_s": round(t_regexec, 3),
         "reps_count": reps_count,
         "reps_mask": reps_mask})
    emit("POSIX ERE '[A-Z][a-z]+ing' (config 4, factor-hit corpus: device "
         "count+mask passes + host regexec on candidate lines)",
         e2e, extra)


def config5():
    """-r --gitignore over a synthetic source tree (batched small files)."""
    import io
    import shutil

    from krep_tpu import cli

    tree = os.path.join(CORPUS_DIR, "bench_tree")
    if not os.path.exists(tree):
        rng = np.random.default_rng(7)
        os.makedirs(tree, exist_ok=True)
        words = b"the quick brown fox def class import return self value".split()
        for d in range(20):
            sub = os.path.join(tree, f"pkg{d:02d}")
            os.makedirs(sub, exist_ok=True)
            for i in range(50):
                k = rng.integers(5_000, 40_000)
                lines = []
                t = 0
                while t < k:
                    ln = b" ".join(words[j] for j in rng.integers(0, len(words), 6))
                    lines.append(ln)
                    t += len(ln) + 1
                with open(os.path.join(sub, f"m{i:03d}.py"), "wb") as f:
                    f.write(b"\n".join(lines))
        with open(os.path.join(tree, ".gitignore"), "w") as f:
            f.write("pkg19/\n")
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(tree) for f in fs
    )
    # calibrate (and cache) the host-route break-even for this machine —
    # the routing config5's wall time depends on (ops/hostscan.py)
    from krep_tpu.ops import hostscan

    try:
        cal = hostscan.calibrate()
    except Exception as e:  # device probe failure: default threshold holds
        cal = {"error": str(e)}

    cli.main(["-r", "--gitignore", "-c", "the", tree], out=io.BytesIO())  # warm
    out = io.BytesIO()
    t0 = time.perf_counter()
    cli.main(["-r", "--gitignore", "-c", "the", tree], out=out)
    dt = time.perf_counter() - t0
    extra = {"files": out.getvalue().count(b"\n"), "seconds": round(dt, 3),
             "host_breakeven": cal}
    bin_, _ = _oracle_bin()
    if bin_:
        import subprocess

        r = subprocess.run(
            [bin_, "-r", "--gitignore", "-c", "the", tree],
            capture_output=True, timeout=600,
        )
        t1 = time.perf_counter()
        r = subprocess.run(
            [bin_, "-r", "--gitignore", "-c", "the", tree],
            capture_output=True, timeout=600,
        )
        ref_dt = time.perf_counter() - t1
        extra["count_parity_vs_reference"] = sorted(
            out.getvalue().splitlines()
        ) == sorted(r.stdout.splitlines())
        extra["reference_seconds"] = round(ref_dt, 4)
        extra["vs_reference_walltime"] = round(ref_dt / dt, 3)
    emit("-r --gitignore source-tree scan (config 5, end-to-end warm)",
         total / dt / 1e9, extra)


def config6(staged, n, data_path):
    """Positions at scale: -o 'the' over the 1 GiB corpus (~tens of
    millions of matches) — device mask pass, packed-bit compaction, greedy
    -o policy, bulk -o printer to /dev/null. This is the half of grep-style
    work the count configs never measure (VERDICT r2 weak #6)."""
    if _skip_if_outage("-o positions at scale (config 6)"):
        return
    import jax.numpy as jnp

    from krep_tpu import SearchParams, search_string
    from krep_tpu.engine import resolve
    from krep_tpu.output import printer
    from krep_tpu.params import MatchPolicy
    from krep_tpu.ops import dispatch, pallas_swar

    pat = PATTERN
    m = len(pat)

    def mask_pass(j):
        c, _, mask = pallas_swar.scan_multi(
            staged.with_len(n - j).u32, jnp.int32(n - j), patterns=(pat,),
            case_sensitive=True, whole_word=False,
            want_mask=True, want_lines=False, assume_zero_tail=True,
        )
        return c + mask.reshape(-1)[0].astype(jnp.int32)

    gbps_mask, reps_mask = chained_gbps(mask_pass, n)

    _, _, mask = pallas_swar.scan_multi(
        staged.u32, staged.true_len, patterns=(pat,),
        case_sensitive=True, whole_word=False,
        want_mask=True, want_lines=False, assume_zero_tail=True,
    )
    import jax

    jax.block_until_ready(mask)
    t0 = time.perf_counter()
    starts = dispatch.starts_from_device_mask(mask, n)
    t_compact = time.perf_counter() - t0
    t0 = time.perf_counter()
    kept = resolve.apply_policy(starts, m, MatchPolicy.NONOVERLAP, n)
    t_policy = time.perf_counter() - t0
    positions = np.stack([kept, kept + m], axis=1).astype(np.int64)
    data = np.memmap(data_path, dtype=np.uint8, mode="r")
    with open(os.devnull, "wb") as sink:
        t0 = time.perf_counter()
        printer.print_only_matching(sink, data, positions, "corpus.txt", False)
        t_print = time.perf_counter() - t0
    t_dev = n / (gbps_mask * 1e9)
    e2e = n / (t_dev + t_compact + t_policy + t_print) / 1e9

    # the actual CLI path for -o 'the' (memchr_short candidate-walk
    # emulation, host-side) end-to-end for comparison
    p = SearchParams(patterns=(pat,), only_matching=True)
    t0 = time.perf_counter()
    r = search_string(p, np.asarray(data), threads=1)
    t_memchr = time.perf_counter() - t0

    extra = parity_fields(
        int(len(positions)), ["-c", "-o", pat.decode(), data_path]
    )
    extra.update(
        {"mask_pass_gbps": round(gbps_mask, 3),
         "compact_s": round(t_compact, 3),
         "policy_s": round(t_policy, 3),
         "print_s": round(t_print, 3),
         "memchr_short_cli_path_s": round(t_memchr, 3),
         "memchr_short_matches": int(r.count),
         "reps_mask": reps_mask})
    emit("-o positions at scale (config 6: device mask + packed compaction "
         "+ greedy policy + bulk -o printer to /dev/null)",
         e2e, extra)


def _probe_tpu(timeout_s: float = 150.0, tries: int = 2) -> bool:
    """True iff the default jax backend initializes in a bounded time.

    The axon-tunneled chip can be down or hang at client init for minutes;
    probing in a subprocess keeps THIS process clean so it can still fall
    back to CPU and emit an honest (tagged) JSON line instead of hanging
    the driver. One implementation, shared with the mesh's
    guard_default_backend (bench wants a longer budget than the mesh's
    default, hence the explicit args). fresh=True: the bench must not
    inherit a stale cached "bad" verdict — a recovered chip is re-detected
    within THIS invocation (the probe result refreshes the cache for
    everyone else)."""
    from krep_tpu.parallel.mesh import _default_backend_initializes

    return _default_backend_initializes(timeout_s, tries, fresh=True)


def main():
    if not os.environ.get("KREP_BENCH_NO_PROBE") and not _probe_tpu():
        # chip/tunnel outage: run on CPU and say so rather than hang
        global _OUTAGE_FALLBACK
        _OUTAGE_FALLBACK = True
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        global CORPUS_BYTES
        # CPU-sized corpus: the CPU path is ~3 orders slower than the chip
        # (it exists for correctness, not speed); 16 MiB keeps the whole
        # fallback run under ~5 minutes
        CORPUS_BYTES = min(CORPUS_BYTES, 1 << 24)
        print(json.dumps({"note": "default accelerator backend failed to "
                          "initialize within the probe budget; results "
                          "below are CPU-backend fallback numbers"}))
    os.makedirs(CORPUS_DIR, exist_ok=True)
    path = os.path.join(CORPUS_DIR, f"bench_{CORPUS_BYTES}.txt")
    gen_corpus(path, CORPUS_BYTES)

    from krep_tpu.ops import dispatch

    data = np.memmap(path, dtype=np.uint8, mode="r")
    n = data.shape[0]
    staged = dispatch.stage(data)

    # --only=3,5 runs just those configs (dev iteration); default is
    # config 1 (the driver's headline), --all is the full table
    sel: set = set()
    for a in sys.argv:
        if a.startswith("--only="):
            sel.update(a.split("=", 1)[1].split(","))
    def guarded(name, fn, *a):
        """One config's crash must not lose the whole run's artifact
        (the first r5 --all run died in config5 after 40+ minutes of
        configs 1-4 and wrote nothing)."""
        try:
            fn(*a)
        except Exception as e:
            import traceback

            traceback.print_exc()
            emit(name, 0.0, {"failed": f"{type(e).__name__}: {e}"})

    if not sel or "1" in sel:
        config1(staged, n, path)
    if "--all" in sys.argv or sel:
        if not sel or "2" in sel:
            guarded("config 2", config2, staged, n, path)
        if not sel or "3" in sel:
            guarded("config 3 family", config3, staged, n, path)
        if not sel or "4" in sel:
            guarded("config 4", config4, n, path)
        if not sel or "5" in sel:
            guarded("config 5", config5)
        if not sel or "6" in sel:
            guarded("config 6", config6, staged, n, path)
        if not sel:
            write_bench_all()


if __name__ == "__main__":
    main()
