// Native per-read .out line formatter for the fast (device-scorer) path.
//
// Mirrors lmat_tpu/apps/read_label_fast.FastClassifier._finish_read, which
// itself replicates the reference's per-read output logic
// (/root/reference/src/read_label.cpp:894-937, 1211-1277).  Float printing
// uses printf "%g" on the f32 value widened to double — identical to both
// the reference's ostream<<float and the Python "%g" fallback.
//
// The host-side summary bookkeeping is returned as per-read arrays
// (track_tid/track_score/nomatch_kind) so the Python caller can keep its
// dict-based tallies byte-identical (f32 accumulation order preserved by
// iterating reads in order).

#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

constexpr int DIRECT = 0, MULTI = 1, PARTIAL = 2, NOMATCH = 3;
constexpr int READ_TOO_SHORT = 0, NO_DB_HITS = 1, LOW_SCORE = 2;
constexpr int32_t ART_SEQ_TID = 32630;

const char* MATCH_STR[3] = {"DirectMatch", "MultiMatch", "PartialMultiMatch"};

struct Buf {
  char* p;
  size_t cap;
  size_t len;
  bool overflow;
  void put(const char* s, size_t n) {
    if (len + n > cap) { overflow = true; return; }
    std::memcpy(p + len, s, n);
    len += n;
  }
  void puts(const char* s) { put(s, std::strlen(s)); }
  void putf(const char* fmt, ...) {
    char tmp[256];
    va_list ap;
    va_start(ap, fmt);
    int n = vsnprintf(tmp, sizeof tmp, fmt, ap);
    va_end(ap);
    if (n > 0) put(tmp, (size_t)n);
  }
};

}  // namespace

extern "C" {

// Returns the number of bytes written into outbuf, or -1 if outbuf was too
// small (caller retries with a bigger buffer).
//
//   ints  [B,7] int32: call_tid, match, n_cand, cand_kmer_cnt, cnt_fnd,
//                      valid_kmers, fnd_phix
//   flts  [B,5] f32:   call_score, log_avg, stdev, top_score, phix_score
//   tids  [B,C] int32  sorted candidates (padding first, last n_cand valid)
//   score [B,C] f32
//   hdrs/seqs: concatenated NUL-separated strings with [B] offsets
//   cfg: k, min_kmer, min_fnd_kmer, screen_phix; min_score f32
// Outputs per read: track_tid (-1 = none), track_score, nomatch_kind (-1 =
// none).
int64_t fmt_out_lines(
    const int32_t* ints, const float* flts,
    const int32_t* tids, const float* score, int64_t B, int64_t C,
    const char* hdrs, const int64_t* hdr_off,
    const char* seqs, const int64_t* seq_off,
    int32_t k, int32_t min_kmer, int32_t min_fnd_kmer, int32_t screen_phix,
    float min_score,
    int32_t* track_tid, float* track_score, int8_t* nomatch_kind,
    char* outbuf, int64_t outcap) {
  Buf buf{outbuf, (size_t)outcap, 0, false};
  for (int64_t i = 0; i < B; i++) {
    const int32_t call_tid = ints[i * 7 + 0];
    const int32_t match = ints[i * 7 + 1];
    const int32_t n_cand = ints[i * 7 + 2];
    const int32_t cand_kmer_cnt = ints[i * 7 + 3];
    const int32_t cnt_fnd = ints[i * 7 + 4];
    const int32_t valid_kmers = ints[i * 7 + 5];
    const int32_t fnd_phix = ints[i * 7 + 6];
    const float call_score = flts[i * 5 + 0];
    const float log_avg = flts[i * 5 + 1];
    const float stdev = flts[i * 5 + 2];
    const float top_score = flts[i * 5 + 3];
    const float phix_score = flts[i * 5 + 4];
    const char* hdr = hdrs + hdr_off[i];
    const char* seq = seqs + seq_off[i];
    const int64_t seq_len = (int64_t)std::strlen(seq);

    track_tid[i] = -1;
    track_score[i] = 0.0f;
    nomatch_kind[i] = -1;

    buf.puts(hdr);
    buf.puts("\t");
    buf.puts(seq);
    buf.puts("\t");

    bool ends_tab = false;
    if (seq_len < k) {
      buf.putf("-1 -1 -1\t-1 -1\t%lld %d ReadTooShort", (long long)seq_len, k);
      nomatch_kind[i] = READ_TOO_SHORT;
    } else if (valid_kmers < min_kmer) {
      buf.putf("-1 -1 -1\t-1 -1\t%d %d ReadTooShort", valid_kmers, min_kmer);
      nomatch_kind[i] = READ_TOO_SHORT;
    } else if (n_cand == 0) {
      buf.putf("-1 -1 %d\t-1 -1\t%lld %d NoDbHits", valid_kmers,
               (long long)seq_len, k);
      nomatch_kind[i] = NO_DB_HITS;
    } else if (cnt_fnd < min_fnd_kmer || cand_kmer_cnt < min_kmer) {
      // reference quirk: the row is abandoned after the hdr/seq prefix with
      // no newline (read_label.cpp:727-733)
      nomatch_kind[i] = NO_DB_HITS;
      ends_tab = true;
    } else if (screen_phix && fnd_phix && phix_score >= top_score) {
      buf.putf("-1 -1 %d\t%d %g\t%d %g DirectMatch", cand_kmer_cnt,
               ART_SEQ_TID, (double)phix_score, ART_SEQ_TID,
               (double)phix_score);
      track_tid[i] = ART_SEQ_TID;
      track_score[i] = phix_score;
    } else {
      buf.putf("%g %g %d\t", (double)log_avg, (double)stdev, cand_kmer_cnt);
      bool printed = false;
      const int32_t* trow = tids + i * C;
      const float* srow = score + i * C;
      for (int64_t j = C - 1; j >= C - n_cand; j--) {
        if (srow[j] >= 0.0f) {
          buf.putf(" %d %g", trow[j], (double)srow[j]);
          printed = true;
        }
      }
      if (!printed) buf.puts("-1 -1");
      buf.puts("\t");
      if (match == DIRECT || match == MULTI || match == PARTIAL) {
        buf.putf("%d %g %s", call_tid, (double)call_score, MATCH_STR[match]);
        if (call_score >= min_score && valid_kmers >= min_kmer) {
          track_tid[i] = call_tid;
          track_score[i] = call_score;
        } else if (call_score < min_score) {
          nomatch_kind[i] = LOW_SCORE;
        }
      } else if (match == NOMATCH) {
        buf.puts("-1 -1 NoMatch");
        nomatch_kind[i] = NO_DB_HITS;
      } else {
        buf.puts("-1 -1 Unmatched");
        nomatch_kind[i] = LOW_SCORE;
      }
    }
    if (!ends_tab) buf.puts("\n");
    if (buf.overflow) return -1;
  }
  return (int64_t)buf.len;
}

}  // extern "C"
