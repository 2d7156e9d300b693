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

#include <stdint.h>
#include <stddef.h>

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
