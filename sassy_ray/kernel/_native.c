/* Scalar-C hot loops for the bit-parallel Myers kernel.
 *
 * This is the compiled twin of the NumPy kernels in kernel/myers.py: same
 * public algorithm (G. Myers, "A fast bit-vector algorithm for approximate
 * string matching based on dynamic programming", JACM 46(3), 1999, plus
 * Hyyro's semi-global variant and Myers' blocked band filter), same pinned
 * semantics (fuzz suites compare this path bit-for-bit against the NumPy
 * kernels and the pure-DP oracle).  Where the NumPy kernels vectorize one
 * text step across the batch axis (paying one NumPy dispatch per step per
 * op), this file walks each (pattern, text) job start-to-finish in
 * registers — the same work layout as the reference's per-lane SIMD loops
 * (/root/reference/src/bitpacking.rs semantics; none of its code).
 *
 * Compiled on demand per node by kernel/native.py (gcc -O3 -march=native,
 * cached under /tmp keyed by source hash); loaded via ctypes.  Everything
 * here is plain C99 + stdint — no Python API, no SIMD intrinsics (the
 * compiler auto-vectorizes what it can).
 *
 * One scan engine, three modes:
 *   mode 0: local-minima walk (search.rs:1284-1369 semantics, fused);
 *   mode 1: all positions with cost <= k;
 *   mode 2: min end-cost per job (the ER scorer / prefilter screen path).
 * Optional per-limb band (Myers' blocked filter: values <= k are exact,
 * values > k may be overestimates — callers clamp), optional overhang
 * (wildcard steps past the text end + floor(alpha*o) additions).
 */

#include <stdint.h>
#include <string.h>

#define BIGC ((int64_t)0x40000000) /* matches myers._BIG */

static inline int64_t imin64(int64_t a, int64_t b) { return a < b ? a : b; }


/* byte histogram (4 sub-tables to dodge store-forward conflicts) and a LUT
 * remap — the NumPy uint8 scatter/gather equivalents run at ~350 MB/s,
 * these at memory speed; used by the Python wrapper to build the dense
 * code alphabet. */
void sassy_byte_hist(const uint8_t *x, int64_t n, int64_t *hist256) {
  int64_t h[4][256];
  memset(h, 0, sizeof(h));
  int64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    h[0][x[i]]++;
    h[1][x[i + 1]]++;
    h[2][x[i + 2]]++;
    h[3][x[i + 3]]++;
  }
  for (; i < n; i++)
    h[0][x[i]]++;
  for (int b = 0; b < 256; b++)
    hist256[b] = h[0][b] + h[1][b] + h[2][b] + h[3][b];
}

/* definition follows the copy helpers below (shares their AVX2 sweep) */
void sassy_remap_u8(const uint8_t *x, int64_t n, const uint8_t *ab, int64_t A,
                    const uint8_t *lut, uint8_t *out);

/* Padded (n, width) rows matrix straight from Arrow offsets+data buffers:
 * per-row memcpy + tail memset.  The NumPy equivalent (np.repeat row/col
 * index vectors + fancy scatter) moves ~24 bytes of int64 index traffic per
 * text byte and measured ~10 MB/s of payload on big scorer batches — this
 * runs at memory speed.  `out` may be uninitialized; rows are zero-padded
 * to `width`. */
void sassy_rows_from_offsets(const uint8_t *data, const int64_t *off,
                             int64_t n, int64_t width, uint8_t *out) {
  for (int64_t i = 0; i < n; i++) {
    int64_t len = off[i + 1] - off[i];
    if (len > width)
      len = width;
    uint8_t *dst = out + i * width;
    memcpy(dst, data + off[i], (size_t)len);
    memset(dst + len, 0, (size_t)(width - len));
  }
}

/* Chunked-string gather: rows (chunk ci[i], chunk-local li[i]) out of a
 * chunked Arrow string/binary column into ONE fresh contiguous
 * offsets+data pair — the per-chunk pc.take + concat + reorder dance costs
 * ~50us of Arrow call overhead PER CHUNK per batch (measured ~7 ms per
 * 8k-row gather at a 560-chunk broadcast corpus; this is the scorer's
 * per-batch text resolution).  offs[c] points at chunk c's raw offsets
 * buffer (int32 when is64[c]==0, int64 when 1; li is pre-adjusted for the
 * chunk's own slice offset), datas[c] at its data buffer.  Phase 1
 * (out_data == NULL) fills out_off[0..n] cumulatively; the caller
 * allocates out_off[n] bytes and phase 2 memcpys the payloads.  Output
 * rows come back in request order — no reorder pass. */
void sassy_gather_str(const uint8_t **datas, const void **offs,
                      const uint8_t *is64, const int64_t *ci,
                      const int64_t *li, int64_t n, int64_t *out_off,
                      uint8_t *out_data) {
  if (!out_data) {
    out_off[0] = 0;
    for (int64_t i = 0; i < n; i++) {
      int64_t c = ci[i], l = li[i], len;
      if (is64[c]) {
        const int64_t *o = (const int64_t *)offs[c];
        len = o[l + 1] - o[l];
      } else {
        const int32_t *o = (const int32_t *)offs[c];
        len = (int64_t)o[l + 1] - (int64_t)o[l];
      }
      out_off[i + 1] = out_off[i] + len;
    }
    return;
  }
  for (int64_t i = 0; i < n; i++) {
    int64_t c = ci[i], l = li[i], start;
    if (is64[c])
      start = ((const int64_t *)offs[c])[l];
    else
      start = (int64_t)((const int32_t *)offs[c])[l];
    memcpy(out_data + out_off[i], datas[c] + start,
           (size_t)(out_off[i + 1] - out_off[i]));
  }
}

/* Padded rows matrix gathered straight out of TWO parallel Arrow string
 * columns with a per-row side pick — the scorer's "pattern = shorter of
 * (text_a, text_b)" orientation.  Replaces pc.if_else (two full-batch
 * payload copies) + per-chunk pc.take (another copy + Arrow call
 * overhead) + the separate rows build: one pass from the source buffers
 * to the padded matrix.  offA/offB are the raw offsets buffers (int32
 * when a64/b64 == 0); idx selects batch rows; pick_b[idx[i]] != 0 takes
 * the B side. */
void sassy_rows_sel2(const uint8_t *dataA, const void *offA, int32_t a64,
                     const uint8_t *dataB, const void *offB, int32_t b64,
                     const uint8_t *pick_b, const int64_t *idx, int64_t n,
                     int64_t width, uint8_t *out) {
  for (int64_t i = 0; i < n; i++) {
    int64_t j = idx[i], start, len;
    const uint8_t *data;
    if (pick_b[j]) {
      if (b64) {
        const int64_t *o = (const int64_t *)offB;
        start = o[j];
        len = o[j + 1] - start;
      } else {
        const int32_t *o = (const int32_t *)offB;
        start = o[j];
        len = (int64_t)o[j + 1] - start;
      }
      data = dataB;
    } else {
      if (a64) {
        const int64_t *o = (const int64_t *)offA;
        start = o[j];
        len = o[j + 1] - start;
      } else {
        const int32_t *o = (const int32_t *)offA;
        start = o[j];
        len = (int64_t)o[j + 1] - start;
      }
      data = dataA;
    }
    if (len > width)
      len = width;
    uint8_t *dst = out + i * width;
    memcpy(dst, data + start, (size_t)len);
    memset(dst + len, 0, (size_t)(width - len));
  }
}

#ifdef __AVX2__
#include <immintrin.h>
#endif

static void hist_acc_(const uint8_t *x, int64_t n, int64_t h[4][256]) {
  int64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    h[0][x[i]]++;
    h[1][x[i + 1]]++;
    h[2][x[i + 2]]++;
    h[3][x[i + 3]]++;
  }
  for (; i < n; i++)
    h[0][x[i]]++;
}

/* byte histogram over a pointer-array text column (no concat copy) */
void sassy_byte_hist_ptrs(const uint8_t **texts, const int64_t *tlens,
                          int64_t n_texts, int64_t *hist256) {
  int64_t h[4][256];
  memset(h, 0, sizeof(h));
  for (int64_t t = 0; t < n_texts; t++)
    hist_acc_(texts[t], tlens[t], h);
  for (int b = 0; b < 256; b++)
    hist256[b] = h[0][b] + h[1][b] + h[2][b] + h[3][b];
}

/* copy `l` bytes forward, applying the dense remap lut (NULL = verbatim).
 * For A <= 8 the remap runs as an AVX2 cmpeq-select sweep over the present
 * bytes (ab[j] -> code j) — a scalar LUT gather defeats vectorization and
 * runs ~1 GB/s; this runs at memory speed on DNA-like alphabets. */
static inline void copy_remap_fwd_(const uint8_t *src, int64_t l,
                                   const uint8_t *ab, int64_t A,
                                   const uint8_t *lut, uint8_t *dst) {
  if (!lut) {
    memcpy(dst, src, (size_t)l);
    return;
  }
  int64_t i = 0;
#ifdef __AVX2__
  if (A <= 8) {
    __m256i bv[8], cv[8];
    for (int64_t a = 0; a < A; a++) {
      bv[a] = _mm256_set1_epi8((char)ab[a]);
      cv[a] = _mm256_set1_epi8((char)a);
    }
    for (; i + 32 <= l; i += 32) {
      __m256i v = _mm256_loadu_si256((const __m256i *)(src + i));
      __m256i acc = _mm256_setzero_si256();
      for (int64_t a = 0; a < A; a++)
        acc = _mm256_or_si256(
            acc, _mm256_and_si256(_mm256_cmpeq_epi8(v, bv[a]), cv[a]));
      _mm256_storeu_si256((__m256i *)(dst + i), acc);
    }
  }
#endif
  for (; i < l; i++)
    dst[i] = lut[src[i]];
}

/* dense-alphabet remap used by NativeBatch's text prep: AVX2 cmpeq-select
 * for <= 8 distinct bytes (a scalar LUT gather defeats vectorization),
 * scalar LUT otherwise. */
void sassy_remap_u8(const uint8_t *x, int64_t n, const uint8_t *ab, int64_t A,
                    const uint8_t *lut, uint8_t *out) {
  copy_remap_fwd_(x, n, ab, A, lut, out);
}

/* reversed copy: dst[j] = remap(src[l-1-j]).  AVX2 path loads from the
 * tail, byte-reverses in-register (per-lane pshufb + lane swap) and
 * optionally remaps with the same cmpeq-select sweep. */
static inline void copy_remap_rev_(const uint8_t *src, int64_t l,
                                   const uint8_t *ab, int64_t A,
                                   const uint8_t *lut, uint8_t *dst) {
  int64_t i = 0;
#ifdef __AVX2__
  if (!lut || A <= 8) {
    const __m256i revm = _mm256_setr_epi8(
        15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 15, 14, 13, 12,
        11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
    __m256i bv[8], cv[8];
    if (lut)
      for (int64_t a = 0; a < A; a++) {
        bv[a] = _mm256_set1_epi8((char)ab[a]);
        cv[a] = _mm256_set1_epi8((char)a);
      }
    for (; i + 32 <= l; i += 32) {
      __m256i v = _mm256_loadu_si256((const __m256i *)(src + l - 32 - i));
      v = _mm256_shuffle_epi8(v, revm);
      v = _mm256_permute2x128_si256(v, v, 1);
      if (lut) {
        __m256i acc = _mm256_setzero_si256();
        for (int64_t a = 0; a < A; a++)
          acc = _mm256_or_si256(
              acc, _mm256_and_si256(_mm256_cmpeq_epi8(v, bv[a]), cv[a]));
        v = acc;
      }
      _mm256_storeu_si256((__m256i *)(dst + i), v);
    }
  }
#endif
  if (lut)
    for (; i < l; i++)
      dst[i] = lut[src[l - 1 - i]];
  else
    for (; i < l; i++)
      dst[i] = src[l - 1 - i];
}

/* Per-row byte reversal of a padded rows matrix (TextRows.reversed — the
 * rc strand of every scan/search path): AVX2 in-register byte reverse via
 * copy_remap_rev_, zero-padded tails.  The NumPy equivalent
 * (take_along_axis over an index matrix) moves ~8 B of int64 index
 * traffic per payload byte. */
void sassy_reverse_rows(const uint8_t *mat, const int64_t *lens, int64_t n,
                        int64_t w, uint8_t *out) {
  for (int64_t i = 0; i < n; i++) {
    const uint8_t *src = mat + (size_t)i * w;
    uint8_t *dst = out + (size_t)i * w;
    int64_t l = lens[i];
    copy_remap_rev_(src, l, NULL, 0, NULL, dst);
    memset(dst + l, 0, (size_t)(w - l));
  }
}

/* Fused overlapping-chunk-row builder for the long-text scan paths: one
 * read pass over the texts, one write pass into the padded row matrix,
 * with the dense alphabet remap (and, for rc, the text reversal) applied
 * during the copy.  Replaces a NumPy chain that moved ~6 passes per
 * payload byte (per-text reversal bytes, sliding_window_view copy, byte
 * histogram, LUT remap).  Chunk c owns end positions (overlap, chunk_len]
 * (the first chunk owns from 0) — same starts/lengths/ownership as
 * search._fill_chunk_rows.  With emit_rc, row R+r holds chunk r of the
 * REVERSED text (pattern side is complemented by the caller); lens/owner
 * of the rc half mirror the fwd half.  Short-row tails are zero-padded.
 * Returns the number of fwd rows written (the caller asserts == R). */
int64_t sassy_chunk_remap(const uint8_t **texts, const int64_t *tlens,
                          int64_t n_texts, int64_t chunk_len, int64_t overlap,
                          const uint8_t *ab, int64_t A, const uint8_t *lut,
                          int emit_rc, int64_t R, uint8_t *mat, int64_t *lens,
                          int64_t *owner_ti, int64_t *owner_start) {
  int64_t r = 0;
  for (int64_t ti = 0; ti < n_texts; ti++) {
    const uint8_t *t = texts[ti];
    int64_t n = tlens[ti];
    int64_t start = 0;
    for (;;) {
      int64_t end = start + chunk_len;
      if (end > n)
        end = n;
      int64_t l = end - start;
      uint8_t *dst = mat + r * chunk_len;
      copy_remap_fwd_(t + start, l, ab, A, lut, dst);
      memset(dst + l, 0, (size_t)(chunk_len - l));
      lens[r] = l;
      owner_ti[r] = ti;
      owner_start[r] = start;
      if (emit_rc) {
        uint8_t *dr = mat + (R + r) * chunk_len;
        /* chunk [start, end) of the reversed text = t[n-end, n-start)
         * reversed */
        copy_remap_rev_(t + (n - end), l, ab, A, lut, dr);
        memset(dr + l, 0, (size_t)(chunk_len - l));
        lens[R + r] = l;
      }
      r++;
      if (end >= n)
        break;
      start = end - overlap;
    }
  }
  return r;
}

/* One-permutation-hashing minhash bucket minima, the blocking stage's hot
 * loop: for each row (starts[i]..starts[i+1] of buf), hash every q-byte
 * window with the polynomial rolling hash h = sum buf[w+j] * B^(q-1-j)
 * (B = 1099511628211, mod 2^64), optionally canonicalized against the
 * reverse-complement window hash hr = sum comp(buf[w+j]) * B^j, finalize
 * with splitmix64, and keep the min per (row, h & (P-1)) bucket.  sig is
 * (n_docs, P) uint64 pre-filled by the caller (0xFFF..F); rows shorter
 * than q are left untouched (the Python wrapper's single-shingle rule).
 * Bit-identical to blocking._shingle_hashes + np.minimum.at — the NumPy
 * version pays ~24 B of traffic per text byte per polynomial step plus a
 * ufunc.at scatter (~20M elem/s); this is one pass at compute speed. */
static inline uint64_t sassy_splitmix64_(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

void sassy_minhash_rows(const uint8_t *buf, const int64_t *starts,
                        int64_t n_docs, int64_t q, int64_t P, int rc,
                        const uint8_t *comp_lut, uint64_t *sig) {
  const uint64_t B = 1099511628211ULL;
  uint64_t bq = 1; /* B^(q-1) */
  for (int64_t j = 0; j + 1 < q; j++)
    bq *= B;
  uint64_t mask = (uint64_t)(P - 1);
  for (int64_t i = 0; i < n_docs; i++) {
    int64_t lo = starts[i], hi = starts[i + 1];
    int64_t n = hi - lo - q + 1;
    if (n <= 0)
      continue;
    uint64_t *row = sig + i * P;
    const uint8_t *p = buf + lo;
    /* forward rolling state */
    uint64_t h = 0;
    for (int64_t j = 0; j < q; j++)
      h = h * B + p[j];
    if (!rc) {
      for (int64_t w = 0;;) {
        uint64_t f = sassy_splitmix64_(h);
        uint64_t *slot = row + (f & mask);
        if (f < *slot)
          *slot = f;
        if (++w >= n)
          break;
        h = (h - (uint64_t)p[w - 1] * bq) * B + p[w + q - 1];
      }
    } else {
      /* reverse-complement window hash hr_w = sum_j comp(p[w+j]) * B^j,
       * rolled with B's modular inverse mod 2^64 (B is odd, so binv
       * exists; multiplication by binv is exact in mod-2^64 arithmetic):
       * hr_{w+1} = (hr_w - comp(p[w])) * binv + comp(p[w+q-1+1]) * B^(q-1) */
      uint64_t binv = 1; /* Newton: 1 correct bit, doubles per iteration */
      for (int it = 0; it < 6; it++)
        binv *= 2 - B * binv;
      uint64_t hr = 0;
      uint64_t pw = 1;
      for (int64_t j = 0; j < q; j++) {
        hr += (uint64_t)comp_lut[p[j]] * pw;
        pw *= B;
      }
      /* pw now B^q */
      for (int64_t w = 0;;) {
        uint64_t fh = h, fr = hr;
        uint64_t m = fh < fr ? fh : fr;
        uint64_t f = sassy_splitmix64_(m);
        uint64_t *slot = row + (f & mask);
        if (f < *slot)
          *slot = f;
        if (++w >= n)
          break;
        h = (h - (uint64_t)p[w - 1] * bq) * B + p[w + q - 1];
        /* hr_{w+1} = (hr_w - comp(p[w-1])) * binv + comp(p[w+q-1]) * B^(q-1) */
        hr = (hr - (uint64_t)comp_lut[p[w - 1]]) * binv +
             (uint64_t)comp_lut[p[w + q - 1]] * bq;
      }
    }
  }
}

/* Batched traceback twin of trace.py's batch_traceback: per candidate, the
 * full (m+1)x(w+1) DP fill + the greedy  =X > D > I  walk + the RLE cigar,
 * all in one C pass (the NumPy fill pays one dispatch per pattern row and
 * the walk runs on Python lists — measured 27 ms + 5 ms cigar strings for
 * ~1k demux candidates vs ~30 ms of actual scan).  Semantics identical to
 * oracle.traceback (no-overhang case); same walk order, same cigar RLE.
 *
 * pats/wins are pointer arrays; mm is the 256x256 match matrix.  Each
 * candidate's cigar is written at cig_buf + slot_off[c] (caller sizes the
 * slot >= what RLE can emit); its byte length lands in cig_len[c].
 * out_start[c] = alignment start WITHIN the window.  Returns 0, or
 * -(c+1) if candidate c's walk failed (caller raises). */
int64_t sassy_traceback(const uint8_t **pats, const int64_t *m_arr,
                        const uint8_t **wins, const int64_t *w_arr,
                        int64_t C, const uint8_t *mm, int64_t *out_start,
                        int32_t *out_cost, uint8_t *cig_buf,
                        const int64_t *slot_off, int64_t *cig_len) {
  int64_t dcap = 0, ocap = 0;
  int32_t *D = 0;
  uint8_t *ops = 0;
  for (int64_t c = 0; c < C; c++) {
    int64_t m = m_arr[c], wl = w_arr[c];
    int64_t need = (m + 1) * (wl + 1);
    if (need > dcap) {
      free(D);
      dcap = need * 2;
      D = (int32_t *)malloc((size_t)dcap * 4);
    }
    if (m + wl + 1 > ocap) {
      free(ops);
      ocap = (m + wl + 1) * 2;
      ops = (uint8_t *)malloc((size_t)ocap);
    }
    if (!D || !ops) {
      free(D);
      free(ops);
      return -(C + 1); /* OOM: out-of-range index, caller raises */
    }
    const uint8_t *p = pats[c];
    const uint8_t *wn = wins[c];
    int64_t W = wl + 1;
    for (int64_t i = 0; i <= wl; i++)
      D[i] = 0; /* free start anywhere in the window */
    for (int64_t j = 1; j <= m; j++) {
      const uint8_t *mrow = mm + (size_t)p[j - 1] * 256;
      int32_t *cur = D + j * W;
      const int32_t *prev = D + (j - 1) * W;
      cur[0] = (int32_t)j;
      for (int64_t i = 1; i <= wl; i++) {
        int32_t v = prev[i - 1] + (mrow[wn[i - 1]] ? 0 : 1);
        int32_t u = prev[i] + 1;
        if (u < v)
          v = u;
        int32_t l = cur[i - 1] + 1;
        if (l < v)
          v = l;
        cur[i] = v;
      }
    }
    int64_t j = m, i = wl;
    int32_t g = D[j * W + i];
    int32_t total = g;
    int64_t nops = 0;
    while (j != 0) {
      if (i > 0 && D[(j - 1) * W + i - 1] == g &&
          mm[(size_t)p[j - 1] * 256 + wn[i - 1]]) {
        ops[nops++] = '=';
        j--;
        i--;
        continue;
      }
      g -= 1;
      if (i > 0 && D[(j - 1) * W + i - 1] == g) {
        ops[nops++] = 'X';
        j--;
        i--;
        continue;
      }
      if (i > 0 && D[j * W + i - 1] == g) {
        ops[nops++] = 'D';
        i--;
        continue;
      }
      if (D[(j - 1) * W + i] == g) {
        ops[nops++] = 'I';
        j--;
        continue;
      }
      free(D);
      free(ops);
      return -(c + 1);
    }
    if (g != 0) {
      free(D);
      free(ops);
      return -(c + 1);
    }
    out_start[c] = i;
    out_cost[c] = total;
    /* ops are back-to-front; RLE forward into the candidate's slot */
    uint8_t *dst = cig_buf + slot_off[c];
    int64_t wq = 0;
    int64_t t = nops - 1;
    while (t >= 0) {
      uint8_t op = ops[t];
      int64_t run = 1;
      while (t - run >= 0 && ops[t - run] == op)
        run++;
      t -= run;
      /* itoa(run) */
      char tmp[24];
      int tn = 0;
      do {
        tmp[tn++] = (char)('0' + (run % 10));
        run /= 10;
      } while (run);
      while (tn)
        dst[wq++] = (uint8_t)tmp[--tn];
      dst[wq++] = op;
    }
    cig_len[c] = wq;
  }
  free(D);
  free(ops);
  return 0;
}

/* PEQ tables: peq[(p*A + a)*L + l] bit j iff pattern p char (64l+j) matches
 * alphabet byte ab[a].  mm is the 256x256 match matrix (row = pattern char);
 * canon, when non-NULL, is a 256-entry equivalence-class LUT with
 * mm[a][b] == (canon[a] == canon[b]) — the O(m)-per-pattern fast path. */
void sassy_build_peq(const uint8_t *pats, int64_t P, int64_t Wp,
                     const int64_t *m_arr, const uint8_t *mm,
                     const uint8_t *ab, int64_t A, const uint8_t *canon,
                     int64_t L, uint64_t *peq) {
  memset(peq, 0, (size_t)P * (size_t)A * (size_t)L * 8);
  int64_t rep[256];
  if (canon) {
    for (int i = 0; i < 256; i++)
      rep[i] = -1;
    for (int64_t a = A - 1; a >= 0; a--)
      rep[canon[ab[a]]] = a;
  }
  for (int64_t p = 0; p < P; p++) {
    const uint8_t *prow = pats + (size_t)p * Wp;
    uint64_t *base = peq + (size_t)p * A * L;
    int64_t m = m_arr[p];
    if (canon) {
      for (int64_t j = 0; j < m; j++) {
        int64_t a = rep[canon[prow[j]]];
        if (a >= 0)
          base[a * L + (j >> 6)] |= 1ULL << (j & 63);
      }
      for (int64_t a = 0; a < A; a++) {
        int64_t r = rep[canon[ab[a]]];
        if (r != a)
          memcpy(base + a * L, base + r * L, (size_t)L * 8);
      }
    } else {
      for (int64_t j = 0; j < m; j++) {
        const uint8_t *mrow = mm + (size_t)prow[j] * 256;
        uint64_t bit = 1ULL << (j & 63);
        int64_t l = j >> 6;
        for (int64_t a = 0; a < A; a++)
          if (mrow[ab[a]])
            base[a * L + l] |= bit;
      }
    }
  }
}

/* The scan engine.  Inputs:
 *   txt      (T, Wt) row-major text codes (indices into the PEQ alphabet);
 *   n_arr    (T,) text lengths;
 *   peq      (P, A, L) from sassy_build_peq;  m_arr (P,) pattern lengths;
 *   pv0      (L,) initial vertical-positive word per limb, or NULL for the
 *            all-ones default (pv0 encodes the overhang left boundary and
 *            is pattern-independent — the deltas depend on the row only);
 *   score0   (P,) initial score per pattern, or NULL for m;
 *   o_arr    (P,) overhang extension steps per pattern, or NULL for 0;
 *   ov_add   floor(alpha*o) for o=1..ov_max, or NULL when no overhang;
 *   job_p/job_t (J,) job -> pattern/text index; NULL means identity;
 *   k, mode  threshold and mode (see header comment);
 *   out_*    emission buffers (modes 0/1); writes stop at out_cap but the
 *            full count is returned so the caller can retry with room;
 *   out_best (J,) per-job min cost (mode 2);
 *   Pv/Mv/bs (L,) caller-provided scratch.
 *
 * Band activation: no overhang, k + 64 < m.  Values <= k stay exact under
 * the band (blocked-filter invariant); the walk's decisions only depend on
 * exact <= k values and the (banded-preserved) predicate "value > k", so
 * modes 0/1 stay bit-identical to the dense scan (the same argument as the
 * walk gate in myers.batch_scan_minima).
 */
/* Single-limb job: the whole DP state lives in two registers.  This is the
 * scan hot path (grep/demux/screen shapes: patterns <= 64 chars); the walk
 * gate collapses the minima bookkeeping to one predictable branch on the
 * common all-above-k steps. */
static inline int64_t scan_job_l1(
    int64_t j, const uint8_t *trow, int64_t n, const uint64_t *pq, int64_t L,
    int64_t m, int64_t O, uint64_t pv_init, int64_t score, const int32_t *ov_add,
    int64_t k, int32_t mode, int64_t *out_job, int64_t *out_pos,
    int32_t *out_cost, int64_t out_cap, int32_t *out_best, int64_t *w_io) {
  uint64_t shift = (uint64_t)((m - 1) & 63);
  uint64_t pv = pv_init, mv = 0;
  int64_t steps = n + O;
  int64_t prev = score, best = score;
  int dec = 1;
  int64_t w = *w_io;
  if (mode == 1 && prev <= k) {
    if (w < out_cap) {
      out_job[w] = j;
      out_pos[w] = 0;
      out_cost[w] = (int32_t)prev;
    }
    w++;
  }
  for (int64_t tt = 0; tt < steps; tt++) {
    uint64_t eq = tt < n ? pq[(size_t)trow[tt] * L] : ~0ULL;
    uint64_t xv = eq | mv;
    uint64_t xh = (((eq & pv) + pv) ^ pv) | eq;
    uint64_t ph = mv | ~(xh | pv);
    uint64_t mh = pv & xh;
    score += (int64_t)((ph >> shift) & 1) - (int64_t)((mh >> shift) & 1);
    ph <<= 1;
    mh <<= 1;
    pv = mh | ~(xv | ph);
    mv = ph & xv;
    int64_t c = score;
    if (ov_add && tt + 1 > n)
      c += ov_add[tt - n];
    if (mode == 0) {
      if (prev > k) { /* walk gate */
        dec = 1;
        prev = c;
        continue;
      }
      if (c > prev && dec) {
        if (w < out_cap) {
          out_job[w] = j;
          out_pos[w] = tt;
          out_cost[w] = (int32_t)prev;
        }
        w++;
      }
      dec = (c < prev) || (dec && c == prev);
      prev = c;
    } else if (mode == 2) {
      if (c < best)
        best = c;
    } else {
      if (c <= k) {
        if (w < out_cap) {
          out_job[w] = j;
          out_pos[w] = tt + 1;
          out_cost[w] = (int32_t)c;
        }
        w++;
      }
    }
  }
  if (mode == 0) {
    if (dec && prev <= k) {
      if (w < out_cap) {
        out_job[w] = j;
        out_pos[w] = steps;
        out_cost[w] = (int32_t)prev;
      }
      w++;
    }
  } else if (mode == 2) {
    out_best[j] = (int32_t)imin64(best, BIGC);
  }
  *w_io = w;
  return w;
}

/* Four single-limb jobs interleaved in one loop: the Myers step is a ~10-op
 * serial dependency chain, so one job leaves the ALU pipeline mostly idle —
 * four independent chains fill it (the register-level analogue of the
 * reference's SIMD lanes / the NumPy batch axis).  The interleaved phase
 * runs branch-free over the group's shared min-length prefix; each job then
 * finishes its own tail on the scalar body (per-char length checks in the
 * hot loop measured 240 vs 390 MB/s single-core — the tail split is the
 * cheap way to keep the schedule tight).  Emissions interleave across the
 * four jobs; the Python wrapper re-sorts to job-major order. */
__attribute__((always_inline)) static inline void scan_job4_l1(
    const int64_t *jid, const uint8_t *const *trows, const int64_t *ns,
    const uint64_t *const *pqs, int64_t L, const int64_t *ms,
    const int64_t *ks, int32_t mode, int64_t *out_job, int64_t *out_pos,
    int32_t *out_cost, int64_t out_cap, int32_t *out_best, int64_t *w_io) {
  uint64_t pv[4], mv[4];
  int64_t sc[4], prev[4], best[4];
  uint64_t shift[4];
  int dec[4];
  int64_t w = *w_io;
  int64_t nmin = ns[0];
  for (int s = 1; s < 4; s++)
    if (ns[s] < nmin)
      nmin = ns[s];
  for (int s = 0; s < 4; s++) {
    pv[s] = ~0ULL;
    mv[s] = 0;
    sc[s] = ms[s];
    prev[s] = ms[s];
    best[s] = ms[s];
    dec[s] = 1;
    shift[s] = (uint64_t)((ms[s] - 1) & 63);
    if (mode == 1 && ms[s] <= ks[s]) {
      if (w < out_cap) {
        out_job[w] = jid[s];
        out_pos[w] = 0;
        out_cost[w] = (int32_t)ms[s];
      }
      w++;
    }
  }
  const uint8_t *t0 = trows[0], *t1 = trows[1], *t2 = trows[2], *t3 = trows[3];
  const uint64_t *q0 = pqs[0], *q1 = pqs[1], *q2 = pqs[2], *q3 = pqs[3];
  int64_t tt = 0;
  for (; tt < nmin; tt++) {
    uint64_t eqs[4] = {q0[(size_t)t0[tt] * L], q1[(size_t)t1[tt] * L],
                       q2[(size_t)t2[tt] * L], q3[(size_t)t3[tt] * L]};
    for (int s = 0; s < 4; s++) {
      uint64_t eq = eqs[s];
      uint64_t xv = eq | mv[s];
      uint64_t p0 = pv[s];
      uint64_t xh = (((eq & p0) + p0) ^ p0) | eq;
      uint64_t ph = mv[s] | ~(xh | p0);
      uint64_t mh = p0 & xh;
      sc[s] +=
          (int64_t)((ph >> shift[s]) & 1) - (int64_t)((mh >> shift[s]) & 1);
      ph <<= 1;
      mh <<= 1;
      pv[s] = mh | ~(xv | ph);
      mv[s] = ph & xv;
      int64_t c = sc[s];
      if (mode == 0) {
        if (prev[s] > ks[s]) {
          dec[s] = 1;
        } else {
          if (c > prev[s] && dec[s]) {
            if (w < out_cap) {
              out_job[w] = jid[s];
              out_pos[w] = tt;
              out_cost[w] = (int32_t)prev[s];
            }
            w++;
          }
          dec[s] = (c < prev[s]) || (dec[s] && c == prev[s]);
        }
        prev[s] = c;
      } else if (mode == 2) {
        if (c < best[s])
          best[s] = c;
      } else {
        if (c <= ks[s]) {
          if (w < out_cap) {
            out_job[w] = jid[s];
            out_pos[w] = tt + 1;
            out_cost[w] = (int32_t)c;
          }
          w++;
        }
      }
    }
  }
  /* per-slot tails + final rule / best writeback */
  for (int s = 0; s < 4; s++) {
    const uint8_t *tr = trows[s];
    const uint64_t *q = pqs[s];
    uint64_t pvs = pv[s], mvs = mv[s], sh = shift[s];
    int64_t scs = sc[s], prevs = prev[s], bests = best[s];
    int decs = dec[s];
    for (int64_t u = tt; u < ns[s]; u++) {
      uint64_t eq = q[(size_t)tr[u] * L];
      uint64_t xv = eq | mvs;
      uint64_t xh = (((eq & pvs) + pvs) ^ pvs) | eq;
      uint64_t ph = mvs | ~(xh | pvs);
      uint64_t mh = pvs & xh;
      scs += (int64_t)((ph >> sh) & 1) - (int64_t)((mh >> sh) & 1);
      ph <<= 1;
      mh <<= 1;
      pvs = mh | ~(xv | ph);
      mvs = ph & xv;
      int64_t c = scs;
      if (mode == 0) {
        if (prevs > ks[s]) {
          decs = 1;
        } else {
          if (c > prevs && decs) {
            if (w < out_cap) {
              out_job[w] = jid[s];
              out_pos[w] = u;
              out_cost[w] = (int32_t)prevs;
            }
            w++;
          }
          decs = (c < prevs) || (decs && c == prevs);
        }
        prevs = c;
      } else if (mode == 2) {
        if (c < bests)
          bests = c;
      } else {
        if (c <= ks[s]) {
          if (w < out_cap) {
            out_job[w] = jid[s];
            out_pos[w] = u + 1;
            out_cost[w] = (int32_t)c;
          }
          w++;
        }
      }
    }
    if (mode == 0) {
      if (decs && prevs <= ks[s]) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = ns[s];
          out_cost[w] = (int32_t)prevs;
        }
        w++;
      }
    } else if (mode == 2) {
      out_best[jid[s]] = (int32_t)imin64(bests, BIGC);
    }
  }
  *w_io = w;
}

/* One job on the general engine: any limb count, optional band, optional
 * overhang.  Returns the updated emission count. */
static int64_t scan_one(const uint8_t *txt, int64_t Wt, const int64_t *n_arr,
                        const uint64_t *peq, int64_t A, int64_t L,
                        const int64_t *m_arr, const uint64_t *pv0,
                        const int64_t *score0, const int64_t *o_arr,
                        const int32_t *ov_add, const int64_t *job_p,
                        const int64_t *job_t, int64_t j, int64_t k,
                        const int64_t *k_arr, int32_t mode, int64_t *out_job,
                        int64_t *out_pos, int32_t *out_cost, int64_t out_cap,
                        int32_t *out_best, uint64_t *Pv, uint64_t *Mv,
                        int64_t *bs, int64_t w) {
  if (k_arr)
    k = k_arr[j];
  int64_t p = job_p ? job_p[j] : j;
  int64_t t = job_t ? job_t[j] : j;
  int64_t m = m_arr[p];
  int64_t n = n_arr[t];
  int64_t O = o_arr ? o_arr[p] : 0;
  int64_t steps = n + O;
  int64_t lastl = m > 0 ? (m - 1) >> 6 : 0;
  uint64_t shift = (uint64_t)((m - 1) & 63);
  const uint64_t *pq = peq + (size_t)p * A * L;
  const uint8_t *trow = txt + (size_t)t * Wt;
  if (lastl == 0) {
    scan_job_l1(j, trow, n, pq, L, m, O, pv0 ? pv0[0] : ~0ULL,
                score0 ? score0[p] : m, ov_add, k, mode, out_job, out_pos,
                out_cost, out_cap, out_best, &w);
    return w;
  }
  int band = (ov_add == NULL) && (pv0 == NULL) && (k + 64 < m);
  int64_t y = band ? imin64(lastl, (k + 65) >> 6) : lastl;
  for (int64_t l = 0; l <= y; l++) {
    Pv[l] = pv0 ? pv0[l] : ~0ULL;
    Mv[l] = 0;
    bs[l] = 64 * (l + 1);
  }
  int64_t score = score0 ? score0[p] : m;
  int active = lastl <= y;
  int64_t prev = active ? score : BIGC;
  int dec = 1;
  int64_t best = prev;
  if (mode == 1 && prev <= k) {
    if (w < out_cap) {
      out_job[w] = j;
      out_pos[w] = 0;
      out_cost[w] = (int32_t)prev;
    }
    w++;
  }
  for (int64_t tt = 0; tt < steps; tt++) {
    uint64_t hp = 0, hn = 0;
    const uint64_t *eqcol = NULL;
    int in_text = tt < n;
    if (in_text)
      eqcol = pq + (size_t)trow[tt] * L;
    for (int64_t l = 0; l <= y; l++) {
      uint64_t Eq = in_text ? eqcol[l] : ~0ULL;
      uint64_t Pvl = Pv[l], Mvl = Mv[l];
      uint64_t X_v = Eq | Mvl;
      uint64_t Eqh = Eq | hn;
      uint64_t Xh = (((Eqh & Pvl) + Pvl) ^ Pvl) | Eqh;
      uint64_t Ph = Mvl | ~(Xh | Pvl);
      uint64_t Mh = Pvl & Xh;
      if (l == lastl)
        score += (int64_t)((Ph >> shift) & 1) - (int64_t)((Mh >> shift) & 1);
      uint64_t nhp = Ph >> 63, nhn = Mh >> 63;
      bs[l] += (int64_t)nhp - (int64_t)nhn;
      Ph = (Ph << 1) | hp;
      Mh = (Mh << 1) | hn;
      Pv[l] = Mh | ~(X_v | Ph);
      Mv[l] = Ph & X_v;
      hp = nhp;
      hn = nhn;
    }
    if (band) {
      if (y < lastl && bs[y] <= k + 65) {
        int64_t was = y;
        y++;
        Pv[y] = ~0ULL;
        Mv[y] = 0;
        bs[y] = bs[was] + 64;
        if (lastl == y)
          score = bs[was] + (m - 64 * y); /* +1-verticals reseed */
      } else {
        while (y > 0 && bs[y] >= k + 130)
          y--;
      }
      active = lastl <= y;
    }
    int64_t c;
    if (!active)
      c = BIGC;
    else {
      c = score;
      if (ov_add && tt + 1 > n)
        c += ov_add[tt - n]; /* o = (tt+1) - n; table is ov_add[o-1] */
    }
    if (mode == 2) {
      if (c < best)
        best = c;
    } else if (mode == 1) {
      if (c <= k) {
        if (w < out_cap) {
          out_job[w] = j;
          out_pos[w] = tt + 1;
          out_cost[w] = (int32_t)c;
        }
        w++;
      }
    } else {
      if (prev > k) {
        /* walk gate: no emission possible; re-entry to <= k is a strict
         * decrease which re-derives dec = true */
        dec = 1;
      } else {
        if (c > prev && dec) {
          if (w < out_cap) {
            out_job[w] = j;
            out_pos[w] = tt;
            out_cost[w] = (int32_t)prev;
          }
          w++;
        }
        dec = (c < prev) || (dec && c == prev);
      }
      prev = c;
    }
  }
  if (mode == 0) {
    /* final-position rule */
    if (dec && prev <= k) {
      if (w < out_cap) {
        out_job[w] = j;
        out_pos[w] = steps;
        out_cost[w] = (int32_t)prev;
      }
      w++;
    }
  } else if (mode == 2) {
    out_best[j] = (int32_t)imin64(best, BIGC);
  }
  return w;
}


#ifdef __AVX2__
#include <immintrin.h>

/* Sixteen single-limb jobs as 4x(4-lane AVX2 vectors): the same
 * interleaving idea as scan_job4_l1, but each vector op advances four DP
 * states at once (the engine's take on the reference's SIMD text lanes,
 * bitpacking.rs semantics — none of its code).  PEQ lookups are
 * cmpeq-selects over per-(code, vector) constants, so the path requires a
 * dense alphabet (A <= SASSY_AVX_MAX_A, i.e. remapped DNA-like batches);
 * larger alphabets stay on the scalar path.  The minima walk runs as a
 * vectorized gate (one movemask per vector per char on the common
 * all-above-k steps) with a scalar spill only when some lane is <= k.
 * Modes 0 (minima walk) and 2 (best cost); the group runs the shared
 * min-length prefix vectorized, then each job finishes its tail on the
 * scalar body. */
#define SASSY_AVX_MAX_A 8
#define SASSY_AVX_TCHUNK 512

/* 16x16 byte transpose: dst[x*stride..+16) = bytes (rows[0..15])[off+x].
 * The scalar per-byte codesT fill was ~half the shared-pattern kernels'
 * cost (1 move per row per char); the unpack network does 16 loads + 64
 * unpacks + 16 stores per 256 bytes.  Verified identity-mapped (register
 * x = column x). */
__attribute__((always_inline)) static inline void sassy_tr16_(
    const uint8_t *const *rows, int64_t off, uint8_t *dst, int64_t stride) {
  __m128i r[16], a[16], b[16];
  for (int i = 0; i < 16; i++)
    r[i] = _mm_loadu_si128((const __m128i *)(rows[i] + off));
  for (int p = 0; p < 8; p++) {
    a[p] = _mm_unpacklo_epi8(r[2 * p], r[2 * p + 1]);
    a[p + 8] = _mm_unpackhi_epi8(r[2 * p], r[2 * p + 1]);
  }
  for (int h = 0; h < 16; h += 8)
    for (int q = 0; q < 4; q++) {
      b[h + q] = _mm_unpacklo_epi16(a[h + 2 * q], a[h + 2 * q + 1]);
      b[h + q + 4] = _mm_unpackhi_epi16(a[h + 2 * q], a[h + 2 * q + 1]);
    }
  for (int base = 0; base < 16; base += 4)
    for (int hh = 0; hh < 2; hh++) {
      a[base + hh] = _mm_unpacklo_epi32(b[base + 2 * hh], b[base + 2 * hh + 1]);
      a[base + hh + 2] =
          _mm_unpackhi_epi32(b[base + 2 * hh], b[base + 2 * hh + 1]);
    }
  for (int base = 0; base < 16; base += 2) {
    b[base] = _mm_unpacklo_epi64(a[base], a[base + 1]);
    b[base + 1] = _mm_unpackhi_epi64(a[base], a[base + 1]);
  }
  for (int x = 0; x < 16; x++)
    _mm_storeu_si128((__m128i *)(dst + (size_t)x * stride), b[x]);
}

__attribute__((always_inline)) static inline void scan_job16_l1_avx(
    const int64_t *jid, const uint8_t *const *trows, const int64_t *ns,
    const uint64_t *const *pqs, const int64_t LL, const int64_t *ms,
    const int64_t *ks, const int64_t A, const int32_t mode, int64_t *out_job,
    int64_t *out_pos, int32_t *out_cost, int64_t out_cap, int32_t *out_best,
    int64_t *w_io) {
  __m256i peqv[SASSY_AVX_MAX_A][4];
  __m256i aval[SASSY_AVX_MAX_A];
  __m256i pv[4], mv[4], sc[4], prev[4], dec[4], best[4], shv[4], kv[4];
  const __m256i one = _mm256_set1_epi64x(1);
  const __m256i ones = _mm256_set1_epi64x(-1);
  int64_t w = *w_io;
  int64_t nmin = ns[0];
  for (int s = 1; s < 16; s++)
    if (ns[s] < nmin)
      nmin = ns[s];
  for (int64_t a = 0; a < A; a++) {
    aval[a] = _mm256_set1_epi64x(a);
    for (int v = 0; v < 4; v++) {
      int b = v * 4;
      peqv[a][v] = _mm256_set_epi64x(
          (long long)pqs[b + 3][(size_t)a * LL],
          (long long)pqs[b + 2][(size_t)a * LL],
          (long long)pqs[b + 1][(size_t)a * LL],
          (long long)pqs[b + 0][(size_t)a * LL]);
    }
  }
  for (int v = 0; v < 4; v++) {
    int b = v * 4;
    pv[v] = ones;
    mv[v] = _mm256_setzero_si256();
    sc[v] = _mm256_set_epi64x(ms[b + 3], ms[b + 2], ms[b + 1], ms[b + 0]);
    prev[v] = sc[v];
    best[v] = sc[v];
    dec[v] = ones;
    shv[v] = _mm256_set_epi64x((ms[b + 3] - 1) & 63, (ms[b + 2] - 1) & 63,
                               (ms[b + 1] - 1) & 63, (ms[b + 0] - 1) & 63);
    kv[v] = _mm256_set_epi64x(ks[b + 3], ks[b + 2], ks[b + 1], ks[b + 0]);
  }
  uint8_t codesT[SASSY_AVX_TCHUNK][16];
  for (int64_t t0 = 0; t0 < nmin; t0 += SASSY_AVX_TCHUNK) {
    int64_t t1 = t0 + SASSY_AVX_TCHUNK < nmin ? t0 + SASSY_AVX_TCHUNK : nmin;
    {
      int64_t u0 = t0;
      for (; u0 + 16 <= t1; u0 += 16)
        sassy_tr16_(trows, u0, &codesT[u0 - t0][0], 16);
      for (; u0 < t1; u0++)
        for (int s = 0; s < 16; s++)
          codesT[u0 - t0][s] = trows[s][u0];
    }
    for (int64_t tt = t0; tt < t1; tt++) {
      const uint8_t *ct = codesT[tt - t0];
      for (int v = 0; v < 4; v++) {
        __m256i codes = _mm256_cvtepu8_epi64(
            _mm_loadu_si128((const __m128i *)(ct + v * 4)));
        __m256i eq = _mm256_setzero_si256();
        for (int64_t a = 0; a < A; a++)
          eq = _mm256_or_si256(
              eq, _mm256_and_si256(_mm256_cmpeq_epi64(codes, aval[a]),
                                   peqv[a][v]));
        __m256i xv = _mm256_or_si256(eq, mv[v]);
        __m256i eqpv = _mm256_and_si256(eq, pv[v]);
        __m256i xh = _mm256_or_si256(
            _mm256_xor_si256(_mm256_add_epi64(eqpv, pv[v]), pv[v]), eq);
        __m256i ph = _mm256_or_si256(
            mv[v], _mm256_andnot_si256(_mm256_or_si256(xh, pv[v]), ones));
        __m256i mh = _mm256_and_si256(pv[v], xh);
        __m256i phb = _mm256_and_si256(_mm256_srlv_epi64(ph, shv[v]), one);
        __m256i mhb = _mm256_and_si256(_mm256_srlv_epi64(mh, shv[v]), one);
        sc[v] = _mm256_sub_epi64(_mm256_add_epi64(sc[v], phb), mhb);
        ph = _mm256_add_epi64(ph, ph);
        mh = _mm256_add_epi64(mh, mh);
        pv[v] = _mm256_or_si256(
            mh, _mm256_andnot_si256(_mm256_or_si256(xv, ph), ones));
        mv[v] = _mm256_and_si256(ph, xv);
        if (mode == 2) {
          __m256i gt = _mm256_cmpgt_epi64(best[v], sc[v]);
          best[v] = _mm256_blendv_epi8(best[v], sc[v], gt);
        } else {
          /* mode 0 walk: gate when every lane's prev > its k */
          __m256i gt = _mm256_cmpgt_epi64(prev[v], kv[v]);
          if (_mm256_movemask_epi8(gt) == -1) {
            dec[v] = ones;
            prev[v] = sc[v];
          } else {
            int64_t pa[4], ca[4], da[4], ka4[4];
            _mm256_storeu_si256((__m256i *)pa, prev[v]);
            _mm256_storeu_si256((__m256i *)ca, sc[v]);
            _mm256_storeu_si256((__m256i *)da, dec[v]);
            _mm256_storeu_si256((__m256i *)ka4, kv[v]);
            for (int l = 0; l < 4; l++) {
              if (pa[l] > ka4[l]) {
                da[l] = -1;
              } else {
                if (ca[l] > pa[l] && da[l]) {
                  if (w < out_cap) {
                    out_job[w] = jid[v * 4 + l];
                    out_pos[w] = tt;
                    out_cost[w] = (int32_t)pa[l];
                  }
                  w++;
                }
                da[l] =
                    ((ca[l] < pa[l]) || (da[l] && ca[l] == pa[l])) ? -1 : 0;
              }
              pa[l] = ca[l];
            }
            prev[v] = _mm256_loadu_si256((__m256i *)pa);
            dec[v] = _mm256_loadu_si256((__m256i *)da);
          }
        }
      }
    }
  }
  /* extract state; per-slot scalar tails + final rule / best writeback */
  int64_t pva[16], mva[16], sca[16], preva[16], deca[16], besta[16];
  for (int v = 0; v < 4; v++) {
    _mm256_storeu_si256((__m256i *)(pva + v * 4), pv[v]);
    _mm256_storeu_si256((__m256i *)(mva + v * 4), mv[v]);
    _mm256_storeu_si256((__m256i *)(sca + v * 4), sc[v]);
    _mm256_storeu_si256((__m256i *)(preva + v * 4), prev[v]);
    _mm256_storeu_si256((__m256i *)(deca + v * 4), dec[v]);
    _mm256_storeu_si256((__m256i *)(besta + v * 4), best[v]);
  }
  for (int s = 0; s < 16; s++) {
    const uint8_t *tr = trows[s];
    const uint64_t *q = pqs[s];
    uint64_t pvs = (uint64_t)pva[s], mvs = (uint64_t)mva[s];
    uint64_t sh = (uint64_t)((ms[s] - 1) & 63);
    int64_t scs = sca[s], prevs = preva[s], bests = besta[s], kj = ks[s];
    int decs = deca[s] != 0;
    for (int64_t u = nmin; u < ns[s]; u++) {
      uint64_t eq = q[(size_t)tr[u] * LL];
      uint64_t xv = eq | mvs;
      uint64_t xh = (((eq & pvs) + pvs) ^ pvs) | eq;
      uint64_t ph = mvs | ~(xh | pvs);
      uint64_t mh = pvs & xh;
      scs += (int64_t)((ph >> sh) & 1) - (int64_t)((mh >> sh) & 1);
      ph <<= 1;
      mh <<= 1;
      pvs = mh | ~(xv | ph);
      mvs = ph & xv;
      int64_t c = scs;
      if (mode == 0) {
        if (prevs > kj) {
          decs = 1;
        } else {
          if (c > prevs && decs) {
            if (w < out_cap) {
              out_job[w] = jid[s];
              out_pos[w] = u;
              out_cost[w] = (int32_t)prevs;
            }
            w++;
          }
          decs = (c < prevs) || (decs && c == prevs);
        }
        prevs = c;
      } else {
        if (c < bests)
          bests = c;
      }
    }
    if (mode == 0) {
      if (decs && prevs <= kj) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = ns[s];
          out_cost[w] = (int32_t)prevs;
        }
        w++;
      }
    } else {
      out_best[jid[s]] = (int32_t)imin64(bests, BIGC);
    }
  }
  *w_io = w;
}
/* Thirty-two single-limb jobs sharing ONE text row, 8 per 32-bit-lane AVX2
 * vector — pattern tiling, the transposed layout idea of the reference's v2
 * engine (pattern_tiling/ semantics; none of its code).  Because every lane
 * reads the SAME text char, the PEQ lookup collapses from an A-step
 * cmpeq-select to ONE indexed vector load from a per-group transposed
 * table, and the 32-bit lanes double pattern density over the 64-bit
 * interleave (patterns <= 32 chars — the demux/CRISPR guide shapes).
 * Four independent vectors keep the ~10-op serial Myers chains pipelined.
 * Modes 0 (minima walk, vectorized gate + 8-lane scalar spill), 1 (all
 * positions <= k, same gate shape) and 2 (best cost via min_epi32).  All
 * lanes share one n: no tails.  Emissions interleave across lanes; the
 * Python wrapper re-sorts to job-major. */
#define SASSY_TILE_MAX_A 16
__attribute__((always_inline)) static inline void scan_tiled32_l32_avx(
    const int64_t *jid, const uint8_t *trow, int64_t n,
    const uint64_t *const *pqs, const int64_t A, const int64_t *ms,
    const int64_t *ks, const int32_t mode, int64_t *out_job, int64_t *out_pos,
    int32_t *out_cost, int64_t out_cap, int32_t *out_best, int64_t *w_io) {
  __m256i peqT[SASSY_TILE_MAX_A][4];
  __m256i pv[4], mv[4], sc[4], prev[4], dec[4], best[4], shv[4], kv[4];
  const __m256i one = _mm256_set1_epi32(1);
  const __m256i ones = _mm256_set1_epi32(-1);
  int64_t w = *w_io;
  for (int64_t a = 0; a < A; a++)
    for (int v = 0; v < 4; v++) {
      int b = v * 8;
      peqT[a][v] = _mm256_set_epi32(
          (int)(uint32_t)pqs[b + 7][a], (int)(uint32_t)pqs[b + 6][a],
          (int)(uint32_t)pqs[b + 5][a], (int)(uint32_t)pqs[b + 4][a],
          (int)(uint32_t)pqs[b + 3][a], (int)(uint32_t)pqs[b + 2][a],
          (int)(uint32_t)pqs[b + 1][a], (int)(uint32_t)pqs[b + 0][a]);
    }
  for (int v = 0; v < 4; v++) {
    int b = v * 8;
    pv[v] = ones;
    mv[v] = _mm256_setzero_si256();
    sc[v] = _mm256_set_epi32((int)ms[b + 7], (int)ms[b + 6], (int)ms[b + 5],
                             (int)ms[b + 4], (int)ms[b + 3], (int)ms[b + 2],
                             (int)ms[b + 1], (int)ms[b + 0]);
    prev[v] = sc[v];
    best[v] = sc[v];
    dec[v] = ones;
    shv[v] = _mm256_set_epi32(
        (int)(ms[b + 7] - 1), (int)(ms[b + 6] - 1), (int)(ms[b + 5] - 1),
        (int)(ms[b + 4] - 1), (int)(ms[b + 3] - 1), (int)(ms[b + 2] - 1),
        (int)(ms[b + 1] - 1), (int)(ms[b + 0] - 1));
    kv[v] = _mm256_set_epi32((int)ks[b + 7], (int)ks[b + 6], (int)ks[b + 5],
                             (int)ks[b + 4], (int)ks[b + 3], (int)ks[b + 2],
                             (int)ks[b + 1], (int)ks[b + 0]);
  }
  if (mode == 1)
    for (int s = 0; s < 32; s++)
      if (ms[s] <= ks[s]) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = 0;
          out_cost[w] = (int32_t)ms[s];
        }
        w++;
      }
  for (int64_t tt = 0; tt < n; tt++) {
    size_t c = trow[tt];
    for (int v = 0; v < 4; v++) {
      __m256i eq = peqT[c][v];
      __m256i xv = _mm256_or_si256(eq, mv[v]);
      __m256i eqpv = _mm256_and_si256(eq, pv[v]);
      __m256i xh = _mm256_or_si256(
          _mm256_xor_si256(_mm256_add_epi32(eqpv, pv[v]), pv[v]), eq);
      __m256i ph = _mm256_or_si256(
          mv[v], _mm256_andnot_si256(_mm256_or_si256(xh, pv[v]), ones));
      __m256i mh = _mm256_and_si256(pv[v], xh);
      __m256i phb = _mm256_and_si256(_mm256_srlv_epi32(ph, shv[v]), one);
      __m256i mhb = _mm256_and_si256(_mm256_srlv_epi32(mh, shv[v]), one);
      sc[v] = _mm256_sub_epi32(_mm256_add_epi32(sc[v], phb), mhb);
      ph = _mm256_add_epi32(ph, ph);
      mh = _mm256_add_epi32(mh, mh);
      pv[v] = _mm256_or_si256(
          mh, _mm256_andnot_si256(_mm256_or_si256(xv, ph), ones));
      mv[v] = _mm256_and_si256(ph, xv);
      if (mode == 2) {
        best[v] = _mm256_min_epi32(best[v], sc[v]);
      } else if (mode == 1) {
        /* all positions <= k: gate on every lane's score > its k */
        __m256i gt = _mm256_cmpgt_epi32(sc[v], kv[v]);
        if (_mm256_movemask_epi8(gt) != -1) {
          int32_t ca[8], ka8[8];
          _mm256_storeu_si256((__m256i *)ca, sc[v]);
          _mm256_storeu_si256((__m256i *)ka8, kv[v]);
          for (int l = 0; l < 8; l++)
            if (ca[l] <= ka8[l]) {
              if (w < out_cap) {
                out_job[w] = jid[v * 8 + l];
                out_pos[w] = tt + 1;
                out_cost[w] = ca[l];
              }
              w++;
            }
        }
      } else {
        /* mode 0 walk: gate when every lane's prev > its k */
        __m256i gt = _mm256_cmpgt_epi32(prev[v], kv[v]);
        if (_mm256_movemask_epi8(gt) == -1) {
          dec[v] = ones;
          prev[v] = sc[v];
        } else {
          int32_t pa[8], ca[8], da[8], ka8[8];
          _mm256_storeu_si256((__m256i *)pa, prev[v]);
          _mm256_storeu_si256((__m256i *)ca, sc[v]);
          _mm256_storeu_si256((__m256i *)da, dec[v]);
          _mm256_storeu_si256((__m256i *)ka8, kv[v]);
          for (int l = 0; l < 8; l++) {
            if (pa[l] > ka8[l]) {
              da[l] = -1;
            } else {
              if (ca[l] > pa[l] && da[l]) {
                if (w < out_cap) {
                  out_job[w] = jid[v * 8 + l];
                  out_pos[w] = tt;
                  out_cost[w] = pa[l];
                }
                w++;
              }
              da[l] = ((ca[l] < pa[l]) || (da[l] && ca[l] == pa[l])) ? -1 : 0;
            }
            pa[l] = ca[l];
          }
          prev[v] = _mm256_loadu_si256((__m256i *)pa);
          dec[v] = _mm256_loadu_si256((__m256i *)da);
        }
      }
    }
  }
  /* final rule (mode 0) / best writeback (mode 2) */
  int32_t preva[32], deca[32], besta[32];
  for (int v = 0; v < 4; v++) {
    _mm256_storeu_si256((__m256i *)(preva + v * 8), prev[v]);
    _mm256_storeu_si256((__m256i *)(deca + v * 8), dec[v]);
    _mm256_storeu_si256((__m256i *)(besta + v * 8), best[v]);
  }
  for (int s = 0; s < 32; s++) {
    if (mode == 0) {
      if (deca[s] && preva[s] <= (int32_t)ks[s]) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = n;
          out_cost[w] = preva[s];
        }
        w++;
      }
    } else if (mode == 2) {
      out_best[jid[s]] = besta[s];
    }
  }
  *w_io = w;
}
#if defined(__AVX512F__)
/* Sixty-four single-limb jobs sharing ONE text row, 16 per 32-bit-lane
 * AVX-512 vector — the 512-bit widening of scan_tiled32_l32_avx below
 * (same transposed-PEQ pattern tiling; the reference's own v2 numbers
 * come from AVX-512 the same way).  Mask registers replace the
 * movemask+spill dance: the walk gate is one cmp producing a 16-bit
 * mask.  Modes 0/1/2. */
__attribute__((always_inline)) static inline void scan_tiled64_l32_avx512(
    const int64_t *jid, const uint8_t *trow, int64_t n,
    const uint64_t *const *pqs, const int64_t A, const int64_t *ms,
    const int64_t *ks, const int32_t mode, int64_t *out_job, int64_t *out_pos,
    int32_t *out_cost, int64_t out_cap, int32_t *out_best, int64_t *w_io) {
  __m512i peqT[SASSY_TILE_MAX_A][4];
  __m512i pv[4], mv[4], sc[4], prev[4], dec[4], best[4], shv[4], kv[4],
      bitv[4];
  const __m512i one = _mm512_set1_epi32(1);
  const __m512i ones = _mm512_set1_epi32(-1);
  int64_t w = *w_io;
  for (int64_t a = 0; a < A; a++)
    for (int v = 0; v < 4; v++) {
      int32_t tmp[16];
      for (int l = 0; l < 16; l++)
        tmp[l] = (int32_t)(uint32_t)pqs[v * 16 + l][a];
      peqT[a][v] = _mm512_loadu_si512((const void *)tmp);
    }
  for (int v = 0; v < 4; v++) {
    int32_t tm[16], ts[16], tk[16];
    for (int l = 0; l < 16; l++) {
      tm[l] = (int32_t)ms[v * 16 + l];
      ts[l] = (int32_t)(ms[v * 16 + l] - 1);
      tk[l] = (int32_t)ks[v * 16 + l];
    }
    pv[v] = ones;
    mv[v] = _mm512_setzero_si512();
    sc[v] = _mm512_loadu_si512((const void *)tm);
    prev[v] = sc[v];
    best[v] = sc[v];
    dec[v] = ones;
    shv[v] = _mm512_loadu_si512((const void *)ts);
    bitv[v] = _mm512_sllv_epi32(one, shv[v]); /* score tap bit m-1 per lane */
    kv[v] = _mm512_loadu_si512((const void *)tk);
  }
  if (mode == 1)
    for (int s = 0; s < 64; s++)
      if (ms[s] <= ks[s]) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = 0;
          out_cost[w] = (int32_t)ms[s];
        }
        w++;
      }
  for (int64_t tt = 0; tt < n; tt++) {
    size_t c = trow[tt];
    for (int v = 0; v < 4; v++) {
      __m512i eq = peqT[c][v];
      __m512i xv = _mm512_or_si512(eq, mv[v]);
      __m512i eqpv = _mm512_and_si512(eq, pv[v]);
      __m512i xh = _mm512_or_si512(
          _mm512_xor_si512(_mm512_add_epi32(eqpv, pv[v]), pv[v]), eq);
      __m512i ph = _mm512_or_si512(
          mv[v], _mm512_andnot_si512(_mm512_or_si512(xh, pv[v]), ones));
      __m512i mh = _mm512_and_si512(pv[v], xh);
      /* score tap via test-mask + masked add/sub: 4 ops vs 6, and the
       * variable shifts leave port 0 (test runs on port 5) */
      __mmask16 tp = _mm512_test_epi32_mask(ph, bitv[v]);
      __mmask16 tm = _mm512_test_epi32_mask(mh, bitv[v]);
      sc[v] = _mm512_mask_add_epi32(sc[v], tp, sc[v], one);
      sc[v] = _mm512_mask_sub_epi32(sc[v], tm, sc[v], one);
      ph = _mm512_add_epi32(ph, ph);
      mh = _mm512_add_epi32(mh, mh);
      pv[v] = _mm512_or_si512(
          mh, _mm512_andnot_si512(_mm512_or_si512(xv, ph), ones));
      mv[v] = _mm512_and_si512(ph, xv);
      if (mode == 2) {
        best[v] = _mm512_min_epi32(best[v], sc[v]);
      } else if (mode == 1) {
        __mmask16 le = _mm512_cmple_epi32_mask(sc[v], kv[v]);
        if (le) {
          int32_t ca[16];
          _mm512_storeu_si512((void *)ca, sc[v]);
          for (int l = 0; l < 16; l++)
            if (le & (1u << l)) {
              if (w < out_cap) {
                out_job[w] = jid[v * 16 + l];
                out_pos[w] = tt + 1;
                out_cost[w] = ca[l];
              }
              w++;
            }
        }
      } else {
        __mmask16 le = _mm512_cmple_epi32_mask(prev[v], kv[v]);
        if (!le) {
          dec[v] = ones;
          prev[v] = sc[v];
        } else {
          int32_t pa[16], ca[16], da[16], ka16[16];
          _mm512_storeu_si512((void *)pa, prev[v]);
          _mm512_storeu_si512((void *)ca, sc[v]);
          _mm512_storeu_si512((void *)da, dec[v]);
          _mm512_storeu_si512((void *)ka16, kv[v]);
          for (int l = 0; l < 16; l++) {
            if (pa[l] > ka16[l]) {
              da[l] = -1;
            } else {
              if (ca[l] > pa[l] && da[l]) {
                if (w < out_cap) {
                  out_job[w] = jid[v * 16 + l];
                  out_pos[w] = tt;
                  out_cost[w] = pa[l];
                }
                w++;
              }
              da[l] = ((ca[l] < pa[l]) || (da[l] && ca[l] == pa[l])) ? -1 : 0;
            }
            pa[l] = ca[l];
          }
          prev[v] = _mm512_loadu_si512((void *)pa);
          dec[v] = _mm512_loadu_si512((void *)da);
        }
      }
    }
  }
  int32_t preva[64], deca[64], besta[64];
  for (int v = 0; v < 4; v++) {
    _mm512_storeu_si512((void *)(preva + v * 16), prev[v]);
    _mm512_storeu_si512((void *)(deca + v * 16), dec[v]);
    _mm512_storeu_si512((void *)(besta + v * 16), best[v]);
  }
  for (int s = 0; s < 64; s++) {
    if (mode == 0) {
      if (deca[s] && preva[s] <= (int32_t)ks[s]) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = n;
          out_cost[w] = preva[s];
        }
        w++;
      }
    } else if (mode == 2) {
      out_best[jid[s]] = besta[s];
    }
  }
  *w_io = w;
}
#endif /* __AVX512F__ */

/* Thirty-two single-limb jobs sharing ONE pattern (m <= 32) over 32
 * DIFFERENT text rows, 8 per 32-bit-lane AVX2 vector — the dual of the
 * pattern-tiled kernel above, for the grep / chunked-long-text shape
 * (thousands of chunk rows sharing one pattern).  Per-lane codes differ,
 * so the PEQ lookup stays a cmpeq-select over A per-code constants (dense
 * alphabet, A <= SASSY_AVX_MAX_A), but every constant is shared across
 * vectors (one pattern) and the 32-bit lanes double job density over the
 * 64-bit 16-job path.  Modes 0/1/2; shared min-length prefix vectorized,
 * per-lane scalar tails. */
__attribute__((always_inline)) static inline void scan_job32_1pat_l32_avx(
    const int64_t *jid, const uint8_t *const *trows, const int64_t *ns,
    const uint64_t *pq, const int64_t A, const int64_t m, const int64_t *ks,
    const int32_t mode, int64_t *out_job, int64_t *out_pos, int32_t *out_cost,
    int64_t out_cap, int32_t *out_best, int64_t *w_io) {
  __m256i peqval[SASSY_AVX_MAX_A], aval[SASSY_AVX_MAX_A];
  __m256i pv[4], mv[4], sc[4], prev[4], dec[4], best[4], kv[4];
  const __m256i one = _mm256_set1_epi32(1);
  const __m256i ones = _mm256_set1_epi32(-1);
  const __m256i shv = _mm256_set1_epi32((int)(m - 1));
  int64_t w = *w_io;
  int64_t nmin = ns[0];
  for (int s = 1; s < 32; s++)
    if (ns[s] < nmin)
      nmin = ns[s];
  for (int64_t a = 0; a < A; a++) {
    aval[a] = _mm256_set1_epi32((int)a);
    peqval[a] = _mm256_set1_epi32((int)(uint32_t)pq[a]);
  }
  for (int v = 0; v < 4; v++) {
    int b = v * 8;
    pv[v] = ones;
    mv[v] = _mm256_setzero_si256();
    sc[v] = _mm256_set1_epi32((int)m);
    prev[v] = sc[v];
    best[v] = sc[v];
    dec[v] = ones;
    kv[v] = _mm256_set_epi32((int)ks[b + 7], (int)ks[b + 6], (int)ks[b + 5],
                             (int)ks[b + 4], (int)ks[b + 3], (int)ks[b + 2],
                             (int)ks[b + 1], (int)ks[b + 0]);
  }
  if (mode == 1)
    for (int s = 0; s < 32; s++)
      if (m <= ks[s]) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = 0;
          out_cost[w] = (int32_t)m;
        }
        w++;
      }
  uint8_t codesT[SASSY_AVX_TCHUNK][32];
  for (int64_t t0 = 0; t0 < nmin; t0 += SASSY_AVX_TCHUNK) {
    int64_t t1 = t0 + SASSY_AVX_TCHUNK < nmin ? t0 + SASSY_AVX_TCHUNK : nmin;
    {
      int64_t u0 = t0;
      for (; u0 + 16 <= t1; u0 += 16)
        for (int g = 0; g < 2; g++)
          sassy_tr16_(trows + g * 16, u0, &codesT[u0 - t0][g * 16], 32);
      for (; u0 < t1; u0++)
        for (int s = 0; s < 32; s++)
          codesT[u0 - t0][s] = trows[s][u0];
    }
    for (int64_t tt = t0; tt < t1; tt++) {
      const uint8_t *ct = codesT[tt - t0];
      for (int v = 0; v < 4; v++) {
        __m256i codes = _mm256_cvtepu8_epi32(
            _mm_loadl_epi64((const __m128i *)(ct + v * 8)));
        __m256i eq = _mm256_setzero_si256();
        for (int64_t a = 0; a < A; a++)
          eq = _mm256_or_si256(
              eq, _mm256_and_si256(_mm256_cmpeq_epi32(codes, aval[a]),
                                   peqval[a]));
        __m256i xv = _mm256_or_si256(eq, mv[v]);
        __m256i eqpv = _mm256_and_si256(eq, pv[v]);
        __m256i xh = _mm256_or_si256(
            _mm256_xor_si256(_mm256_add_epi32(eqpv, pv[v]), pv[v]), eq);
        __m256i ph = _mm256_or_si256(
            mv[v], _mm256_andnot_si256(_mm256_or_si256(xh, pv[v]), ones));
        __m256i mh = _mm256_and_si256(pv[v], xh);
        __m256i phb = _mm256_and_si256(_mm256_srlv_epi32(ph, shv), one);
        __m256i mhb = _mm256_and_si256(_mm256_srlv_epi32(mh, shv), one);
        sc[v] = _mm256_sub_epi32(_mm256_add_epi32(sc[v], phb), mhb);
        ph = _mm256_add_epi32(ph, ph);
        mh = _mm256_add_epi32(mh, mh);
        pv[v] = _mm256_or_si256(
            mh, _mm256_andnot_si256(_mm256_or_si256(xv, ph), ones));
        mv[v] = _mm256_and_si256(ph, xv);
        if (mode == 2) {
          best[v] = _mm256_min_epi32(best[v], sc[v]);
        } else if (mode == 1) {
          __m256i gt = _mm256_cmpgt_epi32(sc[v], kv[v]);
          if (_mm256_movemask_epi8(gt) != -1) {
            int32_t ca[8], ka8[8];
            _mm256_storeu_si256((__m256i *)ca, sc[v]);
            _mm256_storeu_si256((__m256i *)ka8, kv[v]);
            for (int l = 0; l < 8; l++)
              if (ca[l] <= ka8[l]) {
                if (w < out_cap) {
                  out_job[w] = jid[v * 8 + l];
                  out_pos[w] = tt + 1;
                  out_cost[w] = ca[l];
                }
                w++;
              }
          }
        } else {
          __m256i gt = _mm256_cmpgt_epi32(prev[v], kv[v]);
          if (_mm256_movemask_epi8(gt) == -1) {
            dec[v] = ones;
            prev[v] = sc[v];
          } else {
            int32_t pa[8], ca[8], da[8], ka8[8];
            _mm256_storeu_si256((__m256i *)pa, prev[v]);
            _mm256_storeu_si256((__m256i *)ca, sc[v]);
            _mm256_storeu_si256((__m256i *)da, dec[v]);
            _mm256_storeu_si256((__m256i *)ka8, kv[v]);
            for (int l = 0; l < 8; l++) {
              if (pa[l] > ka8[l]) {
                da[l] = -1;
              } else {
                if (ca[l] > pa[l] && da[l]) {
                  if (w < out_cap) {
                    out_job[w] = jid[v * 8 + l];
                    out_pos[w] = tt;
                    out_cost[w] = pa[l];
                  }
                  w++;
                }
                da[l] =
                    ((ca[l] < pa[l]) || (da[l] && ca[l] == pa[l])) ? -1 : 0;
              }
              pa[l] = ca[l];
            }
            prev[v] = _mm256_loadu_si256((__m256i *)pa);
            dec[v] = _mm256_loadu_si256((__m256i *)da);
          }
        }
      }
    }
  }
  /* extract state; per-lane scalar tails + final rule / best writeback */
  int32_t pva[32], mva[32], sca[32], preva[32], deca[32], besta[32];
  for (int v = 0; v < 4; v++) {
    _mm256_storeu_si256((__m256i *)(pva + v * 8), pv[v]);
    _mm256_storeu_si256((__m256i *)(mva + v * 8), mv[v]);
    _mm256_storeu_si256((__m256i *)(sca + v * 8), sc[v]);
    _mm256_storeu_si256((__m256i *)(preva + v * 8), prev[v]);
    _mm256_storeu_si256((__m256i *)(deca + v * 8), dec[v]);
    _mm256_storeu_si256((__m256i *)(besta + v * 8), best[v]);
  }
  uint64_t shift = (uint64_t)((m - 1) & 31);
  for (int s = 0; s < 32; s++) {
    const uint8_t *tr = trows[s];
    uint32_t pvs = (uint32_t)pva[s], mvs = (uint32_t)mva[s];
    int64_t scs = sca[s], prevs = preva[s], bests = besta[s], kj = ks[s];
    int decs = deca[s] != 0;
    for (int64_t u = nmin; u < ns[s]; u++) {
      uint32_t eq = (uint32_t)pq[tr[u]];
      uint32_t xv = eq | mvs;
      uint32_t xh = (((eq & pvs) + pvs) ^ pvs) | eq;
      uint32_t ph = mvs | ~(xh | pvs);
      uint32_t mh = pvs & xh;
      scs += (int64_t)((ph >> shift) & 1) - (int64_t)((mh >> shift) & 1);
      ph <<= 1;
      mh <<= 1;
      pvs = mh | ~(xv | ph);
      mvs = ph & xv;
      int64_t c = scs;
      if (mode == 0) {
        if (prevs > kj) {
          decs = 1;
        } else {
          if (c > prevs && decs) {
            if (w < out_cap) {
              out_job[w] = jid[s];
              out_pos[w] = u;
              out_cost[w] = (int32_t)prevs;
            }
            w++;
          }
          decs = (c < prevs) || (decs && c == prevs);
        }
        prevs = c;
      } else if (mode == 1) {
        if (c <= kj) {
          if (w < out_cap) {
            out_job[w] = jid[s];
            out_pos[w] = u + 1;
            out_cost[w] = (int32_t)c;
          }
          w++;
        }
      } else {
        if (c < bests)
          bests = c;
      }
    }
    if (mode == 0) {
      if (decs && prevs <= kj) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = ns[s];
          out_cost[w] = (int32_t)prevs;
        }
        w++;
      }
    } else if (mode == 2) {
      out_best[jid[s]] = (int32_t)imin64(bests, BIGC);
    }
  }
  *w_io = w;
}
#if defined(__AVX512F__)
/* 512-bit widening of the shared-pattern kernel: 64 jobs (one <= 32-char
 * pattern over 64 different texts), 16 per 32-bit-lane zmm.  The per-lane
 * PEQ select becomes cmpeq-mask + masked-move (2 ops/code vs 3), and the
 * walk gates are mask compares.  Modes 0/1/2; shared min-length prefix
 * vectorized, per-lane scalar tails. */
__attribute__((always_inline)) static inline void scan_job64_1pat_l32_avx512(
    const int64_t *jid, const uint8_t *const *trows, const int64_t *ns,
    const uint64_t *pq, const int64_t A, const int64_t m, const int64_t *ks,
    const int32_t mode, int64_t *out_job, int64_t *out_pos, int32_t *out_cost,
    int64_t out_cap, int32_t *out_best, int64_t *w_io) {
  __m512i peqval[SASSY_AVX_MAX_A], aval[SASSY_AVX_MAX_A];
  __m512i pv[4], mv[4], sc[4], prev[4], dec[4], best[4], kv[4];
  const __m512i one = _mm512_set1_epi32(1);
  const __m512i ones = _mm512_set1_epi32(-1);
  const __m512i shv = _mm512_set1_epi32((int)(m - 1));
  const __m512i bitv = _mm512_set1_epi32((int)(1u << ((m - 1) & 31)));
  int64_t w = *w_io;
  int64_t nmin = ns[0];
  for (int s = 1; s < 64; s++)
    if (ns[s] < nmin)
      nmin = ns[s];
  for (int64_t a = 0; a < A; a++) {
    aval[a] = _mm512_set1_epi32((int)a);
    peqval[a] = _mm512_set1_epi32((int)(uint32_t)pq[a]);
  }
  for (int v = 0; v < 4; v++) {
    int b = v * 16;
    int32_t tk[16];
    for (int l = 0; l < 16; l++)
      tk[l] = (int32_t)ks[b + l];
    pv[v] = ones;
    mv[v] = _mm512_setzero_si512();
    sc[v] = _mm512_set1_epi32((int)m);
    prev[v] = sc[v];
    best[v] = sc[v];
    dec[v] = ones;
    kv[v] = _mm512_loadu_si512((const void *)tk);
  }
  if (mode == 1)
    for (int s = 0; s < 64; s++)
      if (m <= ks[s]) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = 0;
          out_cost[w] = (int32_t)m;
        }
        w++;
      }
  uint8_t codesT[SASSY_AVX_TCHUNK][64];
  for (int64_t t0 = 0; t0 < nmin; t0 += SASSY_AVX_TCHUNK) {
    int64_t t1 = t0 + SASSY_AVX_TCHUNK < nmin ? t0 + SASSY_AVX_TCHUNK : nmin;
    {
      int64_t u0 = t0;
      for (; u0 + 16 <= t1; u0 += 16)
        for (int g = 0; g < 4; g++)
          sassy_tr16_(trows + g * 16, u0, &codesT[u0 - t0][g * 16], 64);
      for (; u0 < t1; u0++)
        for (int s = 0; s < 64; s++)
          codesT[u0 - t0][s] = trows[s][u0];
    }
    for (int64_t tt = t0; tt < t1; tt++) {
      const uint8_t *ct = codesT[tt - t0];
      for (int v = 0; v < 4; v++) {
        __m512i codes = _mm512_cvtepu8_epi32(
            _mm_loadu_si128((const __m128i *)(ct + v * 16)));
        __m512i eq = _mm512_setzero_si512();
        for (int64_t a = 0; a < A; a++)
          eq = _mm512_mask_mov_epi32(
              eq, _mm512_cmpeq_epi32_mask(codes, aval[a]), peqval[a]);
        __m512i xv = _mm512_or_si512(eq, mv[v]);
        __m512i eqpv = _mm512_and_si512(eq, pv[v]);
        __m512i xh = _mm512_or_si512(
            _mm512_xor_si512(_mm512_add_epi32(eqpv, pv[v]), pv[v]), eq);
        __m512i ph = _mm512_or_si512(
            mv[v], _mm512_andnot_si512(_mm512_or_si512(xh, pv[v]), ones));
        __m512i mh = _mm512_and_si512(pv[v], xh);
        __mmask16 tp = _mm512_test_epi32_mask(ph, bitv);
        __mmask16 tm = _mm512_test_epi32_mask(mh, bitv);
        sc[v] = _mm512_mask_add_epi32(sc[v], tp, sc[v], one);
        sc[v] = _mm512_mask_sub_epi32(sc[v], tm, sc[v], one);
        ph = _mm512_add_epi32(ph, ph);
        mh = _mm512_add_epi32(mh, mh);
        pv[v] = _mm512_or_si512(
            mh, _mm512_andnot_si512(_mm512_or_si512(xv, ph), ones));
        mv[v] = _mm512_and_si512(ph, xv);
        if (mode == 2) {
          best[v] = _mm512_min_epi32(best[v], sc[v]);
        } else if (mode == 1) {
          __mmask16 le = _mm512_cmple_epi32_mask(sc[v], kv[v]);
          if (le) {
            int32_t ca[16];
            _mm512_storeu_si512((void *)ca, sc[v]);
            for (int l = 0; l < 16; l++)
              if (le & (1u << l)) {
                if (w < out_cap) {
                  out_job[w] = jid[v * 16 + l];
                  out_pos[w] = tt + 1;
                  out_cost[w] = ca[l];
                }
                w++;
              }
          }
        } else {
          __mmask16 le = _mm512_cmple_epi32_mask(prev[v], kv[v]);
          if (!le) {
            dec[v] = ones;
            prev[v] = sc[v];
          } else {
            int32_t pa[16], ca[16], da[16], ka16[16];
            _mm512_storeu_si512((void *)pa, prev[v]);
            _mm512_storeu_si512((void *)ca, sc[v]);
            _mm512_storeu_si512((void *)da, dec[v]);
            _mm512_storeu_si512((void *)ka16, kv[v]);
            for (int l = 0; l < 16; l++) {
              if (pa[l] > ka16[l]) {
                da[l] = -1;
              } else {
                if (ca[l] > pa[l] && da[l]) {
                  if (w < out_cap) {
                    out_job[w] = jid[v * 16 + l];
                    out_pos[w] = tt;
                    out_cost[w] = pa[l];
                  }
                  w++;
                }
                da[l] = ((ca[l] < pa[l]) || (da[l] && ca[l] == pa[l])) ? -1 : 0;
              }
              pa[l] = ca[l];
            }
            prev[v] = _mm512_loadu_si512((void *)pa);
            dec[v] = _mm512_loadu_si512((void *)da);
          }
        }
      }
    }
  }
  /* extract state; per-lane scalar tails + final rule / best writeback */
  int32_t pva[64], mva[64], sca[64], preva[64], deca[64], besta[64];
  for (int v = 0; v < 4; v++) {
    _mm512_storeu_si512((void *)(pva + v * 16), pv[v]);
    _mm512_storeu_si512((void *)(mva + v * 16), mv[v]);
    _mm512_storeu_si512((void *)(sca + v * 16), sc[v]);
    _mm512_storeu_si512((void *)(preva + v * 16), prev[v]);
    _mm512_storeu_si512((void *)(deca + v * 16), dec[v]);
    _mm512_storeu_si512((void *)(besta + v * 16), best[v]);
  }
  uint64_t shift = (uint64_t)((m - 1) & 31);
  for (int s = 0; s < 64; s++) {
    const uint8_t *tr = trows[s];
    uint32_t pvs = (uint32_t)pva[s], mvs = (uint32_t)mva[s];
    int64_t scs = sca[s], prevs = preva[s], bests = besta[s], kj = ks[s];
    int decs = deca[s] != 0;
    for (int64_t u = nmin; u < ns[s]; u++) {
      uint32_t eq = (uint32_t)pq[tr[u]];
      uint32_t xv = eq | mvs;
      uint32_t xh = (((eq & pvs) + pvs) ^ pvs) | eq;
      uint32_t ph = mvs | ~(xh | pvs);
      uint32_t mh = pvs & xh;
      scs += (int64_t)((ph >> shift) & 1) - (int64_t)((mh >> shift) & 1);
      ph <<= 1;
      mh <<= 1;
      pvs = mh | ~(xv | ph);
      mvs = ph & xv;
      int64_t c = scs;
      if (mode == 0) {
        if (prevs > kj) {
          decs = 1;
        } else {
          if (c > prevs && decs) {
            if (w < out_cap) {
              out_job[w] = jid[s];
              out_pos[w] = u;
              out_cost[w] = (int32_t)prevs;
            }
            w++;
          }
          decs = (c < prevs) || (decs && c == prevs);
        }
        prevs = c;
      } else if (mode == 1) {
        if (c <= kj) {
          if (w < out_cap) {
            out_job[w] = jid[s];
            out_pos[w] = u + 1;
            out_cost[w] = (int32_t)c;
          }
          w++;
        }
      } else {
        if (c < bests)
          bests = c;
      }
    }
    if (mode == 0) {
      if (decs && prevs <= kj) {
        if (w < out_cap) {
          out_job[w] = jid[s];
          out_pos[w] = ns[s];
          out_cost[w] = (int32_t)prevs;
        }
        w++;
      }
    } else if (mode == 2) {
      out_best[jid[s]] = (int32_t)imin64(bests, BIGC);
    }
  }
  *w_io = w;
}
#endif /* __AVX512F__ */
#endif /* __AVX2__ */

int64_t sassy_scan(const uint8_t *txt, int64_t Wt, const int64_t *n_arr,
                   const uint64_t *peq, int64_t A, int64_t L,
                   const int64_t *m_arr, const uint64_t *pv0,
                   const int64_t *score0, const int64_t *o_arr,
                   const int32_t *ov_add, int64_t ov_max, const int64_t *job_p,
                   const int64_t *job_t, int64_t J, int64_t k,
                   const int64_t *k_arr, int32_t mode,
                   int64_t *out_job, int64_t *out_pos, int32_t *out_cost,
                   int64_t out_cap, int32_t *out_best, uint64_t *Pv,
                   uint64_t *Mv, int64_t *bs) {
  int64_t w = 0;
  (void)ov_max;
  /* Fast path (no overhang): ONE unified dispatch loop that, at each job
   * position, picks the best applicable group kernel and falls through to
   * the next cheaper one — never a per-kernel `while` that consumes the
   * rest of the batch on a weaker path (a sequence of loops did exactly
   * that: a sorted scan batch with job_t set but no same-text runs burned
   * every job on the 4-job fallback of the tiled loop, 2.3x slower than
   * its own shared-pattern kernel).  Group workers are force-inlined with
   * literal (L, mode) so gcc clones a constant-folded loop per shape (the
   * runtime-argument form measured 254 vs 395 MB/s for identical code).
   * Kernel ladder per position:
   *   1. same-text pattern-tiled 64/32-job groups (m <= 32, A <= 16);
   *   2. shared-pattern 64/32-job groups (m <= 32, A <= 8);
   *   3. 16-job AVX2 interleave (m <= 64, A <= 8, modes 0/2);
   *   4. 4-job scalar interleave (m <= 64);
   *   5. single-job scalar; m > 64 sends the remainder to the general
   *      multi-limb engine.
   * Shape checks fail on the FIRST mismatching job (O(1) for batches that
   * lack the shape entirely). */
  if (pv0 == NULL && ov_add == NULL && o_arr == NULL) {
    int64_t j = 0;
    while (j < J) {
#ifdef __AVX2__
      /* 1. same-text pattern tiling (cartesian demux/CRISPR shape) */
      if (L == 1 && A <= SASSY_TILE_MAX_A && mode <= 2 && job_t &&
          j + 32 <= J) {
        int64_t t0j = job_t[j];
        int64_t jid[128], msg[128], ksg[128];
        const uint64_t *pqs[128];
        int gok = 1;
        for (int s = 0; s < 32; s++) {
          int64_t jj = j + s;
          int64_t p = job_p ? job_p[jj] : jj;
          if (job_t[jj] != t0j || m_arr[p] < 1 || m_arr[p] > 32) {
            gok = 0;
            break;
          }
          jid[s] = jj;
          msg[s] = m_arr[p];
          ksg[s] = k_arr ? k_arr[jj] : k;
          pqs[s] = peq + (size_t)p * A; /* L == 1 */
        }
        if (gok) {
          const uint8_t *trow = txt + (size_t)t0j * Wt;
#if defined(__AVX512F__)
          if (j + 64 <= J) {
            int g64 = 1;
            for (int s = 32; s < 64; s++) {
              int64_t jj = j + s;
              int64_t p = job_p ? job_p[jj] : jj;
              if (job_t[jj] != t0j || m_arr[p] < 1 || m_arr[p] > 32) {
                g64 = 0;
                break;
              }
              jid[s] = jj;
              msg[s] = m_arr[p];
              ksg[s] = k_arr ? k_arr[jj] : k;
              pqs[s] = peq + (size_t)p * A;
            }
            if (g64) {
              if (mode == 0)
                scan_tiled64_l32_avx512(jid, trow, n_arr[t0j], pqs, A, msg,
                                        ksg, 0, out_job, out_pos, out_cost,
                                        out_cap, out_best, &w);
              else if (mode == 1)
                scan_tiled64_l32_avx512(jid, trow, n_arr[t0j], pqs, A, msg,
                                        ksg, 1, out_job, out_pos, out_cost,
                                        out_cap, out_best, &w);
              else
                scan_tiled64_l32_avx512(jid, trow, n_arr[t0j], pqs, A, msg,
                                        ksg, 2, out_job, out_pos, out_cost,
                                        out_cap, out_best, &w);
              j += 64;
              continue;
            }
          }
#endif
          if (mode == 0)
            scan_tiled32_l32_avx(jid, trow, n_arr[t0j], pqs, A, msg, ksg, 0,
                                 out_job, out_pos, out_cost, out_cap,
                                 out_best, &w);
          else if (mode == 1)
            scan_tiled32_l32_avx(jid, trow, n_arr[t0j], pqs, A, msg, ksg, 1,
                                 out_job, out_pos, out_cost, out_cap,
                                 out_best, &w);
          else
            scan_tiled32_l32_avx(jid, trow, n_arr[t0j], pqs, A, msg, ksg, 2,
                                 out_job, out_pos, out_cost, out_cap,
                                 out_best, &w);
          j += 32;
          continue;
        }
      }
      /* 2. shared-pattern groups (grep / chunked-long-text shape) */
      if (L == 1 && A <= SASSY_AVX_MAX_A && mode <= 2 && job_p &&
          j + 32 <= J) {
        int64_t p0 = job_p[j];
        int gok = (m_arr[p0] >= 1 && m_arr[p0] <= 32);
        if (gok)
          for (int s = 1; s < 32; s++)
            if (job_p[j + s] != p0) {
              gok = 0;
              break;
            }
        if (gok) {
          int64_t jid[64], nsg[64], ksg[64];
          const uint8_t *trows[64];
          for (int s = 0; s < 32; s++) {
            int64_t jj = j + s;
            int64_t t = job_t ? job_t[jj] : jj;
            jid[s] = jj;
            nsg[s] = n_arr[t];
            ksg[s] = k_arr ? k_arr[jj] : k;
            trows[s] = txt + (size_t)t * Wt;
          }
          const uint64_t *pq = peq + (size_t)p0 * A; /* L == 1 */
#if defined(__AVX512F__)
          if (j + 64 <= J) {
            int g64 = 1;
            for (int s = 32; s < 64; s++)
              if (job_p[j + s] != p0) {
                g64 = 0;
                break;
              }
            if (g64) {
              for (int s = 32; s < 64; s++) {
                int64_t jj = j + s;
                int64_t t = job_t ? job_t[jj] : jj;
                jid[s] = jj;
                nsg[s] = n_arr[t];
                ksg[s] = k_arr ? k_arr[jj] : k;
                trows[s] = txt + (size_t)t * Wt;
              }
              if (mode == 0)
                scan_job64_1pat_l32_avx512(jid, trows, nsg, pq, A, m_arr[p0],
                                           ksg, 0, out_job, out_pos, out_cost,
                                           out_cap, out_best, &w);
              else if (mode == 1)
                scan_job64_1pat_l32_avx512(jid, trows, nsg, pq, A, m_arr[p0],
                                           ksg, 1, out_job, out_pos, out_cost,
                                           out_cap, out_best, &w);
              else
                scan_job64_1pat_l32_avx512(jid, trows, nsg, pq, A, m_arr[p0],
                                           ksg, 2, out_job, out_pos, out_cost,
                                           out_cap, out_best, &w);
              j += 64;
              continue;
            }
          }
#endif
          if (mode == 0)
            scan_job32_1pat_l32_avx(jid, trows, nsg, pq, A, m_arr[p0], ksg, 0,
                                    out_job, out_pos, out_cost, out_cap,
                                    out_best, &w);
          else if (mode == 1)
            scan_job32_1pat_l32_avx(jid, trows, nsg, pq, A, m_arr[p0], ksg, 1,
                                    out_job, out_pos, out_cost, out_cap,
                                    out_best, &w);
          else
            scan_job32_1pat_l32_avx(jid, trows, nsg, pq, A, m_arr[p0], ksg, 2,
                                    out_job, out_pos, out_cost, out_cap,
                                    out_best, &w);
          j += 32;
          continue;
        }
      }
      /* 3. 16-job 64-bit AVX2 interleave */
      if (L == 1 && A <= SASSY_AVX_MAX_A && (mode == 0 || mode == 2) &&
          j + 16 <= J) {
        int64_t jid[16], nsg[16], msg[16], ksg[16];
        const uint8_t *trows[16];
        const uint64_t *pqs[16];
        int gok = 1;
        for (int s = 0; s < 16; s++) {
          int64_t jj = j + s;
          int64_t p = job_p ? job_p[jj] : jj;
          int64_t t = job_t ? job_t[jj] : jj;
          if (m_arr[p] > 64 || m_arr[p] < 1) {
            gok = 0;
            break;
          }
          jid[s] = jj;
          nsg[s] = n_arr[t];
          msg[s] = m_arr[p];
          ksg[s] = k_arr ? k_arr[jj] : k;
          trows[s] = txt + (size_t)t * Wt;
          pqs[s] = peq + (size_t)p * A;
        }
        if (gok) {
          if (mode == 0)
            scan_job16_l1_avx(jid, trows, nsg, pqs, 1, msg, ksg, A, 0,
                              out_job, out_pos, out_cost, out_cap, out_best,
                              &w);
          else
            scan_job16_l1_avx(jid, trows, nsg, pqs, 1, msg, ksg, A, 2,
                              out_job, out_pos, out_cost, out_cap, out_best,
                              &w);
          j += 16;
          continue;
        }
      }
#endif /* __AVX2__ */
      /* 4. 4-job scalar interleave */
      if (j + 4 <= J) {
        int64_t jid[4], nsg[4], msg[4], ksg[4];
        const uint8_t *trows[4];
        const uint64_t *pqs[4];
        int gok = 1;
        for (int s = 0; s < 4; s++) {
          int64_t jj = j + s;
          int64_t p = job_p ? job_p[jj] : jj;
          int64_t t = job_t ? job_t[jj] : jj;
          if (m_arr[p] > 64 || m_arr[p] < 1) {
            gok = 0;
            break;
          }
          jid[s] = jj;
          nsg[s] = n_arr[t];
          msg[s] = m_arr[p];
          ksg[s] = k_arr ? k_arr[jj] : k;
          trows[s] = txt + (size_t)t * Wt;
          pqs[s] = peq + (size_t)p * A * L;
        }
        if (gok) {
          if (L == 1 && mode == 0) {
            scan_job4_l1(jid, trows, nsg, pqs, 1, msg, ksg, 0, out_job,
                         out_pos, out_cost, out_cap, out_best, &w);
          } else if (L == 1 && mode == 2) {
            scan_job4_l1(jid, trows, nsg, pqs, 1, msg, ksg, 2, out_job,
                         out_pos, out_cost, out_cap, out_best, &w);
          } else if (L == 1 && mode == 1) {
            scan_job4_l1(jid, trows, nsg, pqs, 1, msg, ksg, 1, out_job,
                         out_pos, out_cost, out_cap, out_best, &w);
          } else {
            scan_job4_l1(jid, trows, nsg, pqs, L, msg, ksg, mode, out_job,
                         out_pos, out_cost, out_cap, out_best, &w);
          }
          j += 4;
          continue;
        }
        goto general_rest; /* an m out of [1, 64] in this group */
      }
      /* 5. scalar remainder */
      {
        int64_t p = job_p ? job_p[j] : j;
        int64_t t = job_t ? job_t[j] : j;
        int64_t m = m_arr[p];
        if (m > 64 || m < 1)
          goto general_rest;
        scan_job_l1(j, txt + (size_t)t * Wt, n_arr[t],
                    peq + (size_t)p * A * L, L, m, 0, ~0ULL, m, NULL,
                    k_arr ? k_arr[j] : k, mode, out_job, out_pos, out_cost,
                    out_cap, out_best, &w);
        j++;
        continue;
      }
    }
    return w;
  general_rest:;
    /* m > 64 encountered: the rest of the batch runs the general engine */
    for (int64_t jj = j; jj < J; jj++) {
      w = scan_one(txt, Wt, n_arr, peq, A, L, m_arr, pv0, score0, o_arr,
                   ov_add, job_p, job_t, jj, k, k_arr, mode, out_job, out_pos,
                   out_cost, out_cap, out_best, Pv, Mv, bs, w);
    }
    return w;
  }
  for (int64_t j = 0; j < J; j++) {
    w = scan_one(txt, Wt, n_arr, peq, A, L, m_arr, pv0, score0, o_arr, ov_add,
                 job_p, job_t, j, k, k_arr, mode, out_job, out_pos, out_cost,
                 out_cap, out_best, Pv, Mv, bs, w);
  }
  return w;
}
