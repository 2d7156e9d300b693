/* krep-tpu native host runtime.
 *
 * The device produces dense match masks; these are the host-side sequential
 * post-passes that cannot vectorize (greedy advance policies) — the
 * TPU-native replacement for the advance loops inside the reference's
 * kernels (krep.c:1371/1741/4495/4837). Operating on sparse extracted
 * positions instead of the text keeps them O(matches), not O(bytes).
 *
 * Built as a plain shared library, bound with ctypes (no pybind11 in this
 * environment).
 */

#define _GNU_SOURCE /* memrchr */
#include <pthread.h>
#include <regex.h>
#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

/* Exact per-byte zero flags of a u64: bit 8k+7 set iff byte k == 0.
 * The borrow-prone classic ((x - ONES) & ~x & HIGH) FALSE-FLAGS byte k
 * when byte k == 0x01 and byte k-1 == 0x00 (the subtraction borrows
 * across byte lanes) — e.g. scanning "bcbb" for "bb": the true zero at
 * byte 0 ('b'^'b') flagged byte 1 ('c'^'b' == 0x01), and the first-byte-
 * anchored verifiers then accepted "cb" as a match (round-5 soak rig
 * catch). This carry-less form is exact; it is the same identity the
 * Pallas kernel uses for its '\n' detect (pallas_swar.py k01). */
static inline uint64_t krep__zero_bytes(uint64_t x)
{
    const uint64_t L7 = 0x7F7F7F7F7F7F7F7FULL;
    return ~(((x & L7) + L7) | x | L7);
}

static int krep__flush_fd(int fd, const uint8_t *buf, size_t len)
{
    size_t off = 0;
    while (off < len) {
        ssize_t w = write(fd, buf + off, len - off);
        if (w < 0)
            return -1;
        off += (size_t)w;
    }
    return 0;
}

/* Greedy left-to-right non-overlap selection from sorted all-start
 * positions. Mirrors KMP (krep.c:1741), BMH -o (krep.c:1371-1374),
 * SSE4.2 default (krep.c:4837-4848). Returns number kept; kept starts
 * written to out (may alias starts). */
int64_t krep_greedy_nonoverlap(const int64_t *starts, int64_t n, int64_t m,
                               int64_t *out)
{
    int64_t kept = 0;
    int64_t next_ok = INT64_MIN;
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = starts[i];
        if (s >= next_ok) {
            out[kept++] = s;
            next_ok = s + m;
        }
    }
    return kept;
}

/* memchr_short_search -o advance emulation (krep.c:4371-4503): every
 * first-byte candidate advances the scan by pattern_len whether or not the
 * remaining bytes verified; a whole-word rejection advances by 1. */
int64_t krep_memchr_short_o_walk(const int64_t *cands,
                                 const uint8_t *verified,
                                 const uint8_t *word_ok,
                                 int64_t n, int64_t m, int64_t *out)
{
    int64_t kept = 0;
    int64_t pos = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t c = cands[i];
        if (c < pos)
            continue;
        if (verified[i]) {
            if (word_ok[i]) {
                out[kept++] = c;
                pos = c + m;
            } else {
                pos = c + 1;
            }
        } else {
            pos = c + m;
        }
    }
    return kept;
}

/* ---- POSIX ERE scan loop (mirror of regex_search, krep.c:1389-1579) ----
 *
 * The whole per-match loop runs in C: glibc regexec with REG_STARTEND,
 * REG_NOTBOL unless at a line start, zero-length matches advance one byte,
 * optional whole-word double-check (advance so+1 on failure), -c line dedup
 * with skip-to-next-line, max_count early exit. Positions are appended to a
 * growable malloc'd array handed back to Python (krep_free releases it).
 */

static int is_word_c(unsigned char c)
{
    return (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
           (c >= 'a' && c <= 'z') || c == '_';
}

typedef struct {
    int64_t count;
    int64_t n_pos;
    int64_t *pos; /* (start, end) pairs */
    int error;    /* 0 ok; 1 compile error; 2 exec error */
} krep_regex_result;

/* drop_end: parallel line-aligned chunks set it for every chunk but the
 * last — a ZERO-LENGTH match exactly at the window end (start == text_len,
 * e.g. '^x*' right after the chunk's trailing newline) belongs to the NEXT
 * chunk, which re-finds it at its own offset 0; counting it here
 * double-counts at every boundary (both -o totals and the -c line). */
int64_t krep_regex_search(const char *pattern_z, const char *text,
                          int64_t text_len, int cflags, int whole_word,
                          int count_lines_mode, int track_positions,
                          int64_t max_count, int drop_end,
                          krep_regex_result *out)
{
    out->count = 0;
    out->n_pos = 0;
    out->pos = NULL;
    out->error = 0;

    regex_t rx;
    if (regcomp(&rx, pattern_z, cflags) != 0) {
        out->error = 1;
        return -1;
    }

    int64_t cap = 0;
    int64_t count = 0;
    int64_t cur = 0;
    int64_t last_line = -1;

    if (text_len == 0) {
        regmatch_t m;
        if (regexec(&rx, "", 1, &m, 0) == 0) {
            count = 1;
            if (track_positions) {
                out->pos = malloc(2 * sizeof(int64_t));
                out->pos[0] = 0;
                out->pos[1] = 0;
                out->n_pos = 1;
            }
        }
        regfree(&rx);
        out->count = count;
        return count;
    }

    /* Reference quirk (krep.c:1420): base_eflags mixes the CFLAG
     * REG_ICASE (2) into eflags, where 2 is REG_NOTEOL — so under -i the
     * reference suppresses '$' at the absolute end of text (verified
     * against the binary: 'c$' -i does not match "abc" without a trailing
     * newline). Byte parity requires cloning it. */
    int icase_noteol = (cflags & REG_ICASE) ? REG_NOTEOL : 0;

    while (cur < text_len) {
        regmatch_t pm;
        pm.rm_so = 0;
        pm.rm_eo = (regoff_t)(text_len - cur);
        int at_line_start = (cur == 0) || (text[cur - 1] == '\n');
        int eflags = REG_STARTEND | icase_noteol |
                     (at_line_start ? 0 : REG_NOTBOL);
        int rc = regexec(&rx, text + cur, 1, &pm, eflags);
        if (rc == REG_NOMATCH)
            break;
        if (rc != 0) {
            out->error = 2;
            break;
        }
        if (pm.rm_so < 0 || pm.rm_eo < pm.rm_so)
            break;
        int64_t start = cur + pm.rm_so;
        int64_t end = cur + pm.rm_eo;
        if (drop_end && start >= text_len)
            break; /* boundary ownership: the next chunk counts it */

        if (whole_word) {
            int before_ok = (start == 0) || !is_word_c((unsigned char)text[start - 1]);
            int after_ok = (end >= text_len) || !is_word_c((unsigned char)text[end]);
            if (!(before_ok && after_ok)) {
                cur = cur + pm.rm_so + 1;
                continue;
            }
        }

        if (count_lines_mode) {
            const char *ls = memrchr(text, '\n', (size_t)start);
            int64_t line_start = ls ? (int64_t)(ls - text) + 1 : 0;
            if (line_start != last_line) {
                count++;
                last_line = line_start;
                if (count >= max_count)
                    break;
                const char *le = memchr(text + line_start, '\n',
                                        (size_t)(text_len - line_start));
                cur = le ? (int64_t)(le - text) + 1 : text_len;
                continue;
            }
        } else {
            count++;
            if (track_positions) {
                if (out->n_pos >= cap) {
                    cap = cap ? cap * 2 : 4096;
                    int64_t *np = realloc(out->pos, (size_t)cap * 2 * sizeof(int64_t));
                    if (!np) {
                        out->error = 2;
                        break;
                    }
                    out->pos = np;
                }
                out->pos[out->n_pos * 2] = start;
                out->pos[out->n_pos * 2 + 1] = end;
                out->n_pos++;
            }
        }
        if (count >= max_count)
            break;
        int64_t adv = (pm.rm_so == pm.rm_eo) ? pm.rm_so + 1 : pm.rm_eo;
        if (cur + adv <= cur)
            adv = 1;
        cur += adv;
        if (cur > text_len)
            cur = text_len;
    }
    regfree(&rx);
    out->count = count;
    return count;
}

/* Same loop restricted to candidate line ranges (sorted, disjoint,
 * each exactly one line: start = line start, end = before the '\n' or
 * text_len). Used by the TPU-filtered ERE path: a device literal scan
 * proves matches can only live on these lines (REG_NEWLINE + a
 * newline-safe pattern make lines independent), so the exact glibc loop
 * only has to visit them. Offsets in out->pos are absolute. */
int64_t krep_regex_search_ranges(const char *pattern_z, const char *text,
                                 int64_t text_len, const int64_t *ranges,
                                 int64_t n_ranges, int cflags, int whole_word,
                                 int count_lines_mode, int track_positions,
                                 int64_t max_count, krep_regex_result *out)
{
    out->count = 0;
    out->n_pos = 0;
    out->pos = NULL;
    out->error = 0;

    regex_t rx;
    if (regcomp(&rx, pattern_z, cflags) != 0) {
        out->error = 1;
        return -1;
    }

    int64_t cap = 0;
    int64_t count = 0;

    for (int64_t r = 0; r < n_ranges && count < max_count; ++r) {
        int64_t ls = ranges[2 * r];
        int64_t le = ranges[2 * r + 1];
        if (ls < 0 || le > text_len || ls > le)
            continue;
        int64_t cur = ls;
        /* -i REG_NOTEOL quirk (see krep_regex_search): the reference's
         * window always ends at text_len, so NOTEOL only bites at the true
         * text end — for a range window that stops at a '\n' (le < n),
         * '$' still matches at the window end like it would before that
         * '\n' in the full loop, so NOTEOL must NOT be applied there. */
        int icase_noteol =
            ((cflags & REG_ICASE) && le == text_len) ? REG_NOTEOL : 0;
        while (cur < le) {
            regmatch_t pm;
            pm.rm_so = 0;
            pm.rm_eo = (regoff_t)(le - cur);
            /* ls is a line start by construction, so NOTBOL exactly when
             * mid-line — same as the full-buffer loop (krep.c:1432-1434) */
            int at_line_start = (cur == 0) || (text[cur - 1] == '\n');
            int eflags = REG_STARTEND | icase_noteol |
                         (at_line_start ? 0 : REG_NOTBOL);
            int rc = regexec(&rx, text + cur, 1, &pm, eflags);
            if (rc == REG_NOMATCH)
                break;
            if (rc != 0) {
                out->error = 2;
                goto done;
            }
            if (pm.rm_so < 0 || pm.rm_eo < pm.rm_so)
                break;
            int64_t start = cur + pm.rm_so;
            int64_t end = cur + pm.rm_eo;

            if (whole_word) {
                int before_ok = (start == 0) ||
                                !is_word_c((unsigned char)text[start - 1]);
                int after_ok = (end >= text_len) ||
                               !is_word_c((unsigned char)text[end]);
                if (!(before_ok && after_ok)) {
                    cur = cur + pm.rm_so + 1;
                    continue;
                }
            }

            if (count_lines_mode) {
                count++;           /* one range == one line: count and move on */
                break;
            }
            count++;
            if (track_positions) {
                if (out->n_pos >= cap) {
                    cap = cap ? cap * 2 : 4096;
                    int64_t *np = realloc(out->pos,
                                          (size_t)cap * 2 * sizeof(int64_t));
                    if (!np) {
                        out->error = 2;
                        goto done;
                    }
                    out->pos = np;
                }
                out->pos[out->n_pos * 2] = start;
                out->pos[out->n_pos * 2 + 1] = end;
                out->n_pos++;
            }
            if (count >= max_count)
                goto done;
            int64_t adv = (pm.rm_so == pm.rm_eo) ? pm.rm_so + 1 : pm.rm_eo;
            if (adv <= 0)
                adv = 1;
            cur += adv;
        }
    }
done:
    regfree(&rx);
    out->count = count;
    return count;
}

/* Whole memchr_short -o scan in one pass (krep.c:4371-4503): glibc memchr
 * jumps between first-byte candidates, short memcmp verifies, and the
 * reference's quirky advance is applied in-stream — matched or
 * failed-verify candidates skip pattern_len bytes, whole-word rejections
 * skip one. Replaces a numpy pipeline whose random gathers at ~77M
 * candidates/GiB ran ~50x slower. Returns #kept, or -1 on allocation
 * failure (the wrapper raises; a silent 0 would masquerade as no-match);
 * *out_pos is a malloc'd start-offset array (krep_free releases).
 * max_count < 0 = unlimited. */
int64_t krep_memchr_short_o_scan(const uint8_t *text, int64_t n,
                                 const uint8_t *pat, int64_t m,
                                 int case_insensitive, int whole_word,
                                 int64_t max_count, int64_t **out_pos)
{
    *out_pos = NULL;
    if (m <= 0 || n < m)
        return 0;
    uint8_t fp[16];
    for (int64_t j = 0; j < m && j < 16; ++j) {
        uint8_t c = pat[j];
        if (case_insensitive && c >= 'A' && c <= 'Z')
            c = (uint8_t)(c + 32);
        fp[j] = c;
    }
    uint8_t p0 = fp[0];
    uint8_t p0u = (p0 >= 'a' && p0 <= 'z') ? (uint8_t)(p0 - 32) : p0;
    int two = case_insensitive && p0u != p0;

    int64_t cap = 4096, cnt = 0;
    int64_t *buf = malloc((size_t)cap * sizeof *buf);
    if (!buf)
        return -1;
    int64_t pos = 0;
    int64_t last_start = n - m; /* inclusive */
    /* u64-SWAR candidate detection: at english-like densities (~7% 't')
     * per-candidate memchr hops cost ~55ns each; an 8-byte block test with
     * a ctz hop runs ~4-5x faster and degrades gracefully when dense. */
    const uint64_t ONES = 0x0101010101010101ULL;
    const uint64_t HIGH = 0x8080808080808080ULL;
    const uint64_t b0 = ONES * p0, b1 = ONES * p0u;
    while (pos <= last_start) {
        if (pos + 8 <= n) {
            uint64_t w;
            memcpy(&w, text + pos, 8);
            uint64_t x = w ^ b0;
            uint64_t c = krep__zero_bytes(x);
            if (two) {
                uint64_t y = w ^ b1;
                c |= krep__zero_bytes(y);
            }
            if (!c) {
                pos += 8;
                continue;
            }
            pos += __builtin_ctzll(c) >> 3;
            if (pos > last_start)
                break;
        } else {
            size_t rem = (size_t)(last_start - pos + 1);
            const uint8_t *h;
            if (!two) {
                h = memchr(text + pos, p0, rem);
            } else { /* earliest of both cases (krep.c:3925-3933) */
                const uint8_t *h1 = memchr(text + pos, p0, rem);
                const uint8_t *h2 = memchr(text + pos, p0u, rem);
                h = (h1 && h2) ? (h1 < h2 ? h1 : h2) : (h1 ? h1 : h2);
            }
            if (!h)
                break;
            pos = h - text;
        }
        int ok = 1;
        for (int64_t j = 1; j < m; ++j) {
            uint8_t c = text[pos + j];
            if (case_insensitive && c >= 'A' && c <= 'Z')
                c = (uint8_t)(c + 32);
            if (c != fp[j]) {
                ok = 0;
                break;
            }
        }
        if (ok && whole_word) {
            int before = (pos == 0) || !is_word_c(text[pos - 1]);
            int after = (pos + m >= n) || !is_word_c(text[pos + m]);
            if (!(before && after)) {
                pos += 1; /* word rejection advances one byte (walk quirk) */
                continue;
            }
        }
        if (ok) {
            if (cnt >= cap) {
                cap *= 2;
                int64_t *nb = realloc(buf, (size_t)cap * sizeof *nb);
                if (!nb) {
                    free(buf);
                    *out_pos = NULL;
                    return -1;
                }
                buf = nb;
            }
            buf[cnt++] = pos;
            if (max_count >= 0 && cnt >= max_count)
                break;
        }
        pos += m; /* candidate skip: matched or failed verify (krep.c:4495) */
    }
    *out_pos = buf;
    return cnt;
}

void krep_free(void *p) { free(p); }

/* ---- host literal scan (the small-batch fast path) ----------------------
 *
 * Below a measured break-even byte count the device can never win: staging
 * + launch latency alone exceeds a host scan of the whole input (through
 * the axon tunnel the gap is ~100x). The reference's small-file cost is one
 * open+read+scan with no launch overhead (krep.c:3402-3430 feeding the
 * kernel selection at krep.c:1771-1870); this is the equivalent host
 * kernel: ALL-advance candidate generation (u64-SWAR first-byte detect +
 * verify), whole-word filter, -c line dedup with skip-to-next-line
 * (krep.c:1331-1351). Advance POLICIES (non-overlap etc.) are applied by
 * the Python resolution stage on the returned all-starts, exactly like the
 * device mask path — one shared postlude, not ten copies (SURVEY.md §3.4).
 */

/* Full verify (byte 0 re-checked defensively + bytes 1..m-1 +
 * whole-word) at a first-byte candidate. */
static inline int krep__verify(const uint8_t *text, int64_t n, int64_t pos,
                               const uint8_t *fp, int64_t m,
                               int case_insensitive, int whole_word)
{
    uint8_t c0 = text[pos];
    if (case_insensitive && c0 >= 'A' && c0 <= 'Z')
        c0 = (uint8_t)(c0 + 32);
    if (c0 != fp[0])
        return 0;
    if (m > 1) {
        if (!case_insensitive) {
            /* last-byte filter then memcmp, the BMH verify order
             * (krep.c:1300-1318) */
            if (text[pos + m - 1] != fp[m - 1] ||
                (m > 2 &&
                 memcmp(text + pos + 1, fp + 1, (size_t)(m - 2)) != 0))
                return 0;
        } else {
            for (int64_t j = 1; j < m; ++j) {
                uint8_t c = text[pos + j];
                if (c >= 'A' && c <= 'Z')
                    c = (uint8_t)(c + 32);
                if (c != fp[j])
                    return 0;
            }
        }
    }
    if (whole_word) {
        int before = (pos == 0) || !is_word_c(text[pos - 1]);
        int after = (pos + m >= n) || !is_word_c(text[pos + m]);
        return before && after;
    }
    return 1;
}

#ifdef __AVX2__
#include <immintrin.h>
#endif

/* Returns: matched-line count when count_lines_mode, else the ALL-overlap
 * match count. track_positions: *out_pos gets a malloc'd array of match
 * start offsets (krep_free releases). max_count >= 0 caps COUNTING modes
 * only (exact: truncation takes matches in text order); it is ignored when
 * track_positions is set (the caller caps after applying its advance
 * policy). Returns -1 on allocation failure. */
int64_t krep_literal_scan(const uint8_t *text, int64_t n,
                          const uint8_t *pat, int64_t m,
                          int case_insensitive, int whole_word,
                          int count_lines_mode, int track_positions,
                          int64_t max_count, int64_t **out_pos)
{
    if (out_pos)
        *out_pos = NULL;
    if (m <= 0 || n < m)
        return 0;
    uint8_t fp_stack[256];
    uint8_t *fp = fp_stack;
    if (m > (int64_t)sizeof fp_stack) {
        fp = malloc((size_t)m);
        if (!fp)
            return -1;
    }
    for (int64_t j = 0; j < m; ++j) {
        uint8_t c = pat[j];
        if (case_insensitive && c >= 'A' && c <= 'Z')
            c = (uint8_t)(c + 32);
        fp[j] = c;
    }
    uint8_t p0 = fp[0];
    uint8_t p0u = (p0 >= 'a' && p0 <= 'z') ? (uint8_t)(p0 - 32) : p0;
    int two = case_insensitive && p0u != p0;
    /* two-byte anchor: AND the first-byte flags with the SECOND byte's
     * flags from an offset-by-1 load — candidate density multiplies
     * (english 'th' ~0.6% vs 't' ~8%), so the loop stays in the 8-byte
     * block test instead of verify exits (measured 0.77 -> ~2 GB/s on
     * 'the'). Exact: the pair test is a prefix of verification. */
    uint8_t p1 = m >= 2 ? fp[1] : 0;
    uint8_t p1u = (p1 >= 'a' && p1 <= 'z') ? (uint8_t)(p1 - 32) : p1;
    int two1 = case_insensitive && p1u != p1;

    int64_t cap = 0, cnt = 0;
    int64_t *buf = NULL;
    if (track_positions) {
        cap = 4096;
        buf = malloc((size_t)cap * sizeof *buf);
        if (!buf) {
            if (fp != fp_stack)
                free(fp);
            return -1;
        }
        max_count = -1; /* caller caps post-policy */
    }
    int64_t limit = max_count >= 0 ? max_count : INT64_MAX;

    int64_t pos = 0;
    int64_t last_start = n - m; /* inclusive */

#ifdef __AVX2__
    /* 32-byte vector candidate loop: exact per-byte equality bitmaps for
     * the first TWO pattern bytes (offset-by-1 load), ANDed — english
     * pair densities make the loop mostly block tests. The same
     * first+adjacent-byte broadcast-compare idea as the reference's AVX2
     * kernel (krep.c:4907-4976), recast for ALL-advance semantics:
     * every candidate bit is verified, policies apply downstream. */
    if (n >= 64) {
        const __m256i B0 = _mm256_set1_epi8((char)p0);
        const __m256i B0u = _mm256_set1_epi8((char)p0u);
        const __m256i A0 = _mm256_set1_epi8((char)p1);
        const __m256i A0u = _mm256_set1_epi8((char)p1u);
        int pair = m >= 2;
        while (pos + 32 + pair <= n && cnt < limit) {
            __m256i w = _mm256_loadu_si256((const __m256i *)(text + pos));
            uint32_t c = (uint32_t)_mm256_movemask_epi8(
                _mm256_cmpeq_epi8(w, B0));
            if (two)
                c |= (uint32_t)_mm256_movemask_epi8(
                    _mm256_cmpeq_epi8(w, B0u));
            if (c && pair) {
                __m256i v =
                    _mm256_loadu_si256((const __m256i *)(text + pos + 1));
                uint32_t c2 = (uint32_t)_mm256_movemask_epi8(
                    _mm256_cmpeq_epi8(v, A0));
                if (two1)
                    c2 |= (uint32_t)_mm256_movemask_epi8(
                        _mm256_cmpeq_epi8(v, A0u));
                c &= c2;
            }
            if (!c) {
                pos += 32;
                continue;
            }
            int64_t base = pos;
            int jumped = 0;
            while (c && cnt < limit) {
                int64_t cand = base + (int64_t)__builtin_ctz(c);
                c &= c - 1;
                if (cand > last_start)
                    break;
                if (!krep__verify(text, n, cand, fp, m, case_insensitive,
                                  whole_word))
                    continue;
                if (count_lines_mode) {
                    ++cnt;
                    const uint8_t *nl =
                        memchr(text + cand, '\n', (size_t)(n - cand));
                    if (!nl) {
                        pos = n;
                        jumped = 1;
                        break;
                    }
                    pos = (int64_t)(nl - text) + 1;
                    if (pos > base + 32) {
                        jumped = 1; /* skipped past this block */
                        break;
                    }
                    /* next line starts inside this block: drop candidate
                     * bits before it and keep going */
                    if (pos > base)
                        c &= ~((pos - base >= 32)
                                   ? 0xFFFFFFFFu
                                   : ((1u << (pos - base)) - 1u));
                    continue;
                }
                ++cnt;
                if (track_positions) {
                    if (cnt > cap) {
                        cap *= 2;
                        int64_t *nb =
                            realloc(buf, (size_t)cap * sizeof *nb);
                        if (!nb) {
                            free(buf);
                            if (fp != fp_stack)
                                free(fp);
                            return -1;
                        }
                        buf = nb;
                    }
                    buf[cnt - 1] = cand;
                }
            }
            if (!jumped)
                pos = base + 32;
        }
    }
#endif

    const uint64_t ONES = 0x0101010101010101ULL;
    const uint64_t HIGH = 0x8080808080808080ULL;
    const uint64_t b0 = ONES * p0, b1 = ONES * p0u;
    const uint64_t a0 = ONES * p1, a1 = ONES * p1u;
    while (pos <= last_start && cnt < limit) {
        /* candidate detection (same machinery as
         * krep_memchr_short_o_scan): 8-byte SWAR hop to the next
         * candidate, memchr for the tail */
        if (pos + 8 <= n) {
            uint64_t w;
            memcpy(&w, text + pos, 8);
            uint64_t x = w ^ b0;
            uint64_t c = krep__zero_bytes(x);
            if (two) {
                uint64_t y = w ^ b1;
                c |= krep__zero_bytes(y);
            }
            if (c && m >= 2 && pos + 9 <= n) {
                uint64_t v;
                memcpy(&v, text + pos + 1, 8);
                uint64_t x2 = v ^ a0;
                uint64_t c2 = krep__zero_bytes(x2);
                if (two1) {
                    uint64_t y2 = v ^ a1;
                    c2 |= krep__zero_bytes(y2);
                }
                c &= c2;
            }
            if (!c) {
                pos += 8;
                continue;
            }
            pos += __builtin_ctzll(c) >> 3;
            if (pos > last_start)
                break;
        } else {
            size_t rem = (size_t)(last_start - pos + 1);
            const uint8_t *h;
            if (!two) {
                h = memchr(text + pos, p0, rem);
            } else { /* earliest of both cases (krep.c:3925-3933) */
                const uint8_t *h1 = memchr(text + pos, p0, rem);
                const uint8_t *h2 = memchr(text + pos, p0u, rem);
                h = (h1 && h2) ? (h1 < h2 ? h1 : h2) : (h1 ? h1 : h2);
            }
            if (!h)
                break;
            pos = h - text;
        }
        int ok =
            krep__verify(text, n, pos, fp, m, case_insensitive, whole_word);
        if (ok) {
            if (count_lines_mode) {
                /* count the line containing the match START, then skip to
                 * the next line — exact dedup in one forward pass
                 * (krep.c:1331-1351). A '\n' AT pos terminates the line
                 * containing pos (find_line_end scans from pos). */
                ++cnt;
                const uint8_t *nl =
                    memchr(text + pos, '\n', (size_t)(n - pos));
                if (!nl)
                    break;
                pos = (int64_t)(nl - text) + 1;
                continue;
            }
            ++cnt;
            if (track_positions) {
                if (cnt > cap) {
                    cap *= 2;
                    int64_t *nb = realloc(buf, (size_t)cap * sizeof *nb);
                    if (!nb) {
                        free(buf);
                        if (fp != fp_stack)
                            free(fp);
                        return -1;
                    }
                    buf = nb;
                }
                buf[cnt - 1] = pos;
            }
        }
        pos += 1; /* ALL advance: policies apply downstream */
    }
    if (fp != fp_stack)
        free(fp);
    if (out_pos)
        *out_pos = buf;
    else
        free(buf);
    return cnt;
}

/* Per-file counts over a concatenated batch buffer in ONE native call —
 * the host replacement for the batched device pass (io/batch.py) below
 * break-even. bounds: (start, end) byte offsets per file; each file scans
 * independently (its edges are text edges, matching the per-file launches
 * at krep.c:3402-3430). out[i] = match count (or matched-line count when
 * count_lines_mode) of file i. */
void krep_batch_literal_counts(const uint8_t *buf, const int64_t *bounds,
                               int64_t nfiles, const uint8_t *pat, int64_t m,
                               int case_insensitive, int whole_word,
                               int count_lines_mode, int64_t *out)
{
    for (int64_t i = 0; i < nfiles; ++i) {
        int64_t s = bounds[2 * i], e = bounds[2 * i + 1];
        out[i] = krep_literal_scan(buf + s, e - s, pat, m, case_insensitive,
                                   whole_word, count_lines_mode, 0, -1, NULL);
    }
}

/* Threaded variant: files are independent scans, so the batch partitions
 * across worker threads by cumulative byte volume (the analogue of the
 * reference's chunked thread pool for ONE large file, krep.c:2790-2905 —
 * here the parallel unit is the file). Results land in disjoint out[i]
 * slots; no synchronization beyond join. */
#define KREP__BATCH_MAX_THREADS 64

typedef struct {
    const uint8_t *buf;
    const int64_t *bounds;
    const uint8_t *pat;
    int64_t m;
    int ci, ww, clm;
    int64_t lo, hi;
    int64_t *out;
} krep__batch_task;

static void *krep__batch_worker(void *arg)
{
    krep__batch_task *t = (krep__batch_task *)arg;
    for (int64_t i = t->lo; i < t->hi; ++i) {
        int64_t s = t->bounds[2 * i], e = t->bounds[2 * i + 1];
        t->out[i] = krep_literal_scan(t->buf + s, e - s, t->pat, t->m,
                                      t->ci, t->ww, t->clm, 0, -1, NULL);
    }
    return NULL;
}

void krep_batch_literal_counts_mt(const uint8_t *buf, const int64_t *bounds,
                                  int64_t nfiles, const uint8_t *pat,
                                  int64_t m, int case_insensitive,
                                  int whole_word, int count_lines_mode,
                                  int threads, int64_t *out)
{
    int64_t total = 0;
    for (int64_t i = 0; i < nfiles; ++i)
        total += bounds[2 * i + 1] - bounds[2 * i];
    if (threads > KREP__BATCH_MAX_THREADS)
        threads = KREP__BATCH_MAX_THREADS;
    if (threads > nfiles)
        threads = (int)nfiles;
    /* volume floor: thread spawn costs ~50us; a small batch scans faster
     * serially than it forks */
    if (threads <= 1 || total < (1 << 20)) {
        krep_batch_literal_counts(buf, bounds, nfiles, pat, m,
                                  case_insensitive, whole_word,
                                  count_lines_mode, out);
        return;
    }
    krep__batch_task tasks[KREP__BATCH_MAX_THREADS];
    pthread_t tids[KREP__BATCH_MAX_THREADS];
    int nt = 0;
    int64_t i = 0, acc = 0;
    for (int t = 0; t < threads && i < nfiles; ++t) {
        int64_t goal = (total * (t + 1)) / threads;
        int64_t lo = i;
        while (i < nfiles && (acc < goal || i == lo)) {
            acc += bounds[2 * i + 1] - bounds[2 * i];
            ++i;
        }
        if (t == threads - 1)
            i = nfiles; /* remainder */
        tasks[nt].buf = buf;
        tasks[nt].bounds = bounds;
        tasks[nt].pat = pat;
        tasks[nt].m = m;
        tasks[nt].ci = case_insensitive;
        tasks[nt].ww = whole_word;
        tasks[nt].clm = count_lines_mode;
        tasks[nt].lo = lo;
        tasks[nt].hi = i;
        tasks[nt].out = out;
        ++nt;
    }
    for (int t = 1; t < nt; ++t)
        if (pthread_create(&tids[t], NULL, krep__batch_worker, &tasks[t])) {
            /* spawn failure: run the remainder inline */
            krep__batch_worker(&tasks[t]);
            tids[t] = 0;
        }
    krep__batch_worker(&tasks[0]);
    for (int t = 1; t < nt; ++t)
        if (tids[t])
            pthread_join(tids[t], NULL);
}

/* Count of distinct line ids among sorted match starts, given sorted
 * newline positions: the -c dedup (krep.c:1331-1351) over sparse matches.
 * Used by host-only paths (regex/large-multi); the device kernel computes
 * this in-stream for literals. */
int64_t krep_distinct_lines(const int64_t *starts, int64_t n,
                            const int64_t *newlines, int64_t nn)
{
    int64_t count = 0;
    int64_t j = 0;        /* index into newlines */
    int64_t cur_line_end = nn > 0 ? newlines[0] : INT64_MAX;
    int64_t last_counted = -1; /* line index */
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = starts[i];
        while (j < nn && newlines[j] < s) {
            ++j;
        }
        /* line index = j (number of newlines strictly before s) */
        if (j != last_counted) {
            ++count;
            last_counted = j;
        }
        (void)cur_line_end;
    }
    return count;
}

/* Line numbers for SORTED match starts in one sequential text pass — the
 * incremental counting of krep.c:656-677 at vectorized-printer scale
 * (replaces a full newline-position array + per-match binary search,
 * which is O(n) temp memory and cache-hostile at tens of millions of
 * matches). out[i] = 1 + number of '\n' at positions < starts[i].
 * Returns the offset of the LAST newline in text (-1 if none) so the
 * caller can apply the reference's stale-lineno quirk (krep.c:621-653)
 * to matches beyond it. */
int64_t krep_linenos(const uint8_t *text, int64_t n,
                     const int64_t *starts, int64_t k, int64_t *out)
{
    int64_t line = 1;
    int64_t cur = 0;
    for (int64_t i = 0; i < k; ++i) {
        int64_t s = starts[i];
        if (s > n)
            s = n;
        while (cur < s) {
            const uint8_t *p =
                memchr(text + cur, '\n', (size_t)(s - cur));
            if (!p) {
                cur = s;
                break;
            }
            ++line;
            cur = (int64_t)(p - text) + 1;
        }
        out[i] = line;
    }
    const uint8_t *lp = n > 0 ? memrchr(text, '\n', (size_t)n) : NULL;
    return lp ? (int64_t)(lp - text) : -1;
}

/* Expand a little-endian bit-packed mask (the device's packed dense-mask
 * readback, 8 positions/byte) to sorted set-bit positions. out == NULL:
 * return the total popcount so the caller can size the output buffer.
 * Positions >= limit are dropped (ascending, so expansion stops there).
 * Replaces np.unpackbits + flatnonzero, which materialize the full n-byte
 * bit array (seconds at 1 GiB). */
int64_t krep_bits_to_starts(const uint8_t *packed, int64_t nbytes,
                            int64_t limit, int64_t *out)
{
    int64_t k = 0;
    int64_t nw = nbytes / 8;
    if (!out) {
        for (int64_t i = 0; i < nw; ++i) {
            uint64_t v;
            memcpy(&v, packed + i * 8, 8);
            k += __builtin_popcountll(v);
        }
        for (int64_t i = nw * 8; i < nbytes; ++i)
            k += __builtin_popcount(packed[i]);
        return k;
    }
    for (int64_t i = 0; i < nw; ++i) {
        uint64_t v;
        memcpy(&v, packed + i * 8, 8);
        int64_t base = i * 64;
        while (v) {
            int64_t p = base + __builtin_ctzll(v);
            if (p >= limit)
                return k;
            out[k++] = p;
            v &= v - 1;
        }
    }
    for (int64_t i = nw * 8; i < nbytes; ++i) {
        uint32_t b = packed[i];
        int64_t base = i * 8;
        while (b) {
            int64_t p = base + __builtin_ctz(b);
            if (p >= limit)
                return k;
            out[k++] = p;
            b &= b - 1;
        }
    }
    return k;
}

/* Distinct (line_start, line_end) ranges containing SORTED positions;
 * line_end excludes the '\n'. out holds up to k (start, end) pairs.
 * Touches only the candidate lines (memrchr back + memchr forward per
 * distinct line) — O(candidate-line bytes), not a full-text newline scan.
 * Returns the number of ranges. Matches the numpy formulation in
 * engine/regex_engine.py::_candidate_line_ranges (a position AT a '\n'
 * belongs to the line that newline terminates). */
int64_t krep_line_ranges(const uint8_t *text, int64_t n,
                         const int64_t *starts, int64_t k, int64_t *out)
{
    int64_t nr = 0;
    int64_t last_end = -2; /* '\n' offset (or n) of the last emitted line */
    for (int64_t i = 0; i < k; ++i) {
        int64_t s = starts[i];
        if (s >= n)
            s = n ? n - 1 : 0;
        if (nr && s <= last_end)
            continue; /* same line as the previous candidate */
        const uint8_t *ls = s > 0 ? memrchr(text, '\n', (size_t)s) : NULL;
        int64_t lstart = ls ? (int64_t)(ls - text) + 1 : 0;
        const uint8_t *le = memchr(text + s, '\n', (size_t)(n - s));
        int64_t lend = le ? (int64_t)(le - text) : n;
        out[2 * nr] = lstart;
        out[2 * nr + 1] = lend;
        ++nr;
        last_end = lend;
    }
    return nr;
}

/* Render the no-color -o stream "[FILE:]LINENO:MATCH\n" for SORTED
 * (start, end) pairs straight to a file descriptor — the whole
 * krep.c:517-793 hot path (incremental line counting, 8 MB batch buffer,
 * '\n'-to-space in match bodies, the stale-lineno quirk for matches past
 * the last newline) in one C pass. The vectorized numpy renderer costs
 * ~10 s at 43M matches on digit divmods + gathers; this runs at memcpy
 * speed. Returns the number of records written, or -1 on write/alloc
 * failure (caller treats -1 as a closed pipe and stops). */
int64_t krep_render_only_matching(const uint8_t *text, int64_t n,
                                  const int64_t *pos, int64_t k,
                                  const uint8_t *fn, int64_t fn_len,
                                  int fd)
{
    enum { CAP = 8 * 1024 * 1024 };
    uint8_t *buf = malloc(CAP);
    if (!buf)
        return -1;
    size_t used = 0;
    int64_t line = 1, cur = 0;
    const uint8_t *lp = n > 0 ? memrchr(text, '\n', (size_t)n) : NULL;
    int64_t last_nl = lp ? (int64_t)(lp - text) : -1;
    /* the reference's binary-search path (taken above 10 matches) leaves
     * a stale line index for matches beyond the last newline
     * (krep.c:621-653); k <= 10 stays on the python loop upstream */
    int use_quirk = (k > 10 && last_nl >= 0);
    int frozen = 0;
    for (int64_t i = 0; i < k; ++i) {
        int64_t s = pos[2 * i], e = pos[2 * i + 1];
        if (!frozen) {
            if (use_quirk && s > last_nl) {
                frozen = 1; /* keep prior match's lineno (1 if first) */
            } else {
                while (cur < s) {
                    const uint8_t *p =
                        memchr(text + cur, '\n', (size_t)(s - cur));
                    if (!p) {
                        cur = s;
                        break;
                    }
                    ++line;
                    cur = (int64_t)(p - text) + 1;
                }
            }
        }
        char digits[24];
        int nd = 0;
        int64_t v = line;
        do {
            digits[nd++] = (char)('0' + (v % 10));
            v /= 10;
        } while (v);
        size_t head = (size_t)(fn ? fn_len + 1 : 0) + (size_t)nd + 1;
        size_t body = (size_t)(e - s);
        if (used + head + body + 1 > CAP) {
            if (krep__flush_fd(fd, buf, used)) {
                free(buf);
                return -1;
            }
            used = 0;
        }
        if (fn) {
            memcpy(buf + used, fn, (size_t)fn_len);
            used += (size_t)fn_len;
            buf[used++] = ':';
        }
        while (nd)
            buf[used++] = (uint8_t)digits[--nd];
        buf[used++] = ':';
        if (head + body + 1 > CAP) {
            /* match longer than the batch buffer: stream it directly */
            if (krep__flush_fd(fd, buf, used)) {
                free(buf);
                return -1;
            }
            used = 0;
            for (int64_t b = s; b < e;) {
                size_t chunk = (size_t)(e - b) < (size_t)CAP
                                   ? (size_t)(e - b)
                                   : (size_t)CAP;
                memcpy(buf, text + b, chunk);
                for (size_t j = 0; j < chunk; ++j)
                    if (buf[j] == '\n')
                        buf[j] = ' ';
                if (krep__flush_fd(fd, buf, chunk)) {
                    free(buf);
                    return -1;
                }
                b += (int64_t)chunk;
            }
        } else {
            memcpy(buf + used, text + s, body);
            uint8_t *bp = buf + used;
            for (size_t j = 0; j < body; ++j)
                if (bp[j] == '\n')
                    bp[j] = ' ';
            used += body;
        }
        buf[used++] = '\n';
    }
    if (krep__flush_fd(fd, buf, used)) {
        free(buf);
        return -1;
    }
    free(buf);
    return k;
}
