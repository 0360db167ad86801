// Single-pass pileup accumulation for the score-chain engine.
//
// Native transcription of the reference's per-read pileup walk
// (contig_parse_read + contig_cut_read, lib/contig.c:247-358) over the cell
// chain defined in ops/pileup.py.  Replaces the vectorized-numpy event
// expansion on the hot path: one pass over the selected reads, a rolling
// 9-bit compact 3-mer, and direct increments into a dense
// [n_cells * 512] uint16 count table (saturating) + int32 per-cell totals.
//
// Semantics must match ops/pileup.py::expand_reads + build_pileup_sparse
// exactly (both are property-tested against the slow oracle and the
// reference .so); see the comments there for why emissions form a
// contiguous cell range per read.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int CMATCH = 0, CINS = 1, CDEL = 2, CSOFT = 4, CHARD = 5;
constexpr int SYM_DEL = 3;  // compact DEL (ops/symbols.py)
constexpr uint16_t SAT = 0xFFFF;

// BAM nibble -> compact symbol (ops/symbols.py NIB_TO_SYM)
constexpr uint8_t NIB2SYM[16] = {0, 1, 2, 3, 4, 7, 7, 7,
                                 5, 7, 7, 7, 7, 7, 7, 6};

inline int kshift(int kmer, int sym) { return ((kmer & 63) << 3) | sym; }

struct Acc {
  uint16_t *counts;
  int32_t *totals;
  uint16_t *cellrank;          // next first-observation ordinal per cell
  std::vector<int64_t> dirty;  // key<<9 | rank, pushed on the 0 -> 1
                               // transition (observation order = the
                               // reference's SeqList data insertion order,
                               // lib/base.c:60-71; rank < 512 since a cell
                               // has at most 512 distinct 3-mers)
  inline void add(long long cell, int kmer) {
    const long long key = cell * 512 + kmer;
    uint16_t &c = counts[key];
    if (c == 0) dirty.push_back((key << 9) | cellrank[cell]++);
    if (c != SAT) c++;
    totals[cell]++;
  }
};

}  // namespace

extern "C" {

// Accumulate the pileup of the selected reads (+ optional contig-as-read)
// into counts[n_cells*512] / totals[n_cells].  `counts` must be all-zero on
// entry; this function restores it to all-zero before returning (the caller
// keeps one persistent scratch buffer — no per-call zeroing of the full
// table).  Emits the sorted nonzero (key, count, first-observation rank)
// triples via out_uk/out_cn/out_rk (malloc'd; free with npt_cns_free).
// Returns nnz, or -1 on bad input.
long long npt_pileup_sgs(
    const int64_t *ridx, long long n_sel, const int32_t *rpos,
    const uint32_t *cigar, const int64_t *cigar_off, const int32_t *cigar_len,
    const uint8_t *seq_nib, const int64_t *seq_off, const int32_t *lqseq,
    long long start, long long end, const int64_t *cell_of,
    const int64_t *ins_len, long long n_cells, long long n_dp,
    const int32_t *refkmer, int trim_len_edge, uint16_t *counts,
    int32_t *totals, int64_t **out_uk, int64_t **out_cn, int64_t **out_rk) {
  if (end < start || n_cells <= 0) return -1;
  std::vector<uint16_t> cellrank((size_t)n_cells, 0);
  Acc acc{counts, totals, cellrank.data(), {}};
  acc.dirty.reserve(4096 + 3 * (size_t)n_cells);

  // contig-as-read (lib/contig.c:373-383): one emission per DP cell
  if (refkmer) {
    for (long long c = 0; c < n_dp; c++) acc.add(c, refkmer[c] & 0x1FF);
  }

  for (long long s = 0; s < n_sel; s++) {
    const long long r = ridx[s];
    const int32_t lq = lqseq[r];
    const int32_t ncig = cigar_len[r];
    if (ncig <= 0 || lq <= 0) continue;
    const uint32_t *cig = cigar + cigar_off[r];
    const uint8_t *nib = seq_nib + seq_off[r];

    // trims (contig_cut_read, lib/contig.c:333-358)
    long long lsoft = ((cig[0] & 0xF) == CSOFT) ? (cig[0] >> 4) : 0;
    const uint32_t lastw = cig[ncig - 1];
    long long rsoft = ((lastw & 0xF) == CSOFT) ? (lastw >> 4) : 0;
    long long qstart = trim_len_edge + lsoft;
    long long qend = (long long)lq - trim_len_edge - rsoft - 1;
    if (trim_len_edge > 0) {
      // homopolymer extension over raw nibbles (as _read_trims does)
      while (qstart > 0 && qstart < lq && nib[qstart] == nib[qstart - 1])
        qstart++;
      while (qend >= 0 && qend < lq - 1 && nib[qend] == nib[qend + 1]) qend--;
    }

    long long pos = rpos[r];
    long long qpos = 0;
    int kmer = 0;
    int lastcig = CINS;
    for (int32_t w = 0; w < ncig; w++) {
      const int op = cig[w] & 0xF;
      const long long ln = cig[w] >> 4;
      if (op == CMATCH || op == CDEL) {
        for (long long b = 0; b < ln; b++) {
          if (pos >= start && pos <= end && qpos >= qstart && qpos <= qend) {
            if (lastcig != CINS && pos > start &&
                (qpos > qstart || (qpos == qstart && lastcig == CDEL))) {
              // pass-through DEL padding of the previous anchor's slots
              const long long a = pos - 1 - start;
              const long long cell = cell_of[a];
              const long long il = ins_len[a];
              for (long long k = 0; k < il; k++) {
                kmer = kshift(kmer, SYM_DEL);
                acc.add(cell + 1 + k, kmer);
              }
            }
            const int sym = (op == CDEL) ? SYM_DEL : NIB2SYM[nib[qpos] & 0xF];
            kmer = kshift(kmer, sym);
            acc.add(cell_of[pos - start], kmer);
          }
          if (op != CDEL) qpos++;
          pos++;
          lastcig = op;
        }
      } else if (op == CINS) {
        if (pos) {
          const long long a = pos - 1 - start;
          const bool inr = (pos > start && pos <= end);
          const long long il = inr ? ins_len[a] : 0;
          const long long cell = inr ? cell_of[a] : 0;
          for (long long j = 0; j < ln; j++) {
            // the j < il clip mirrors expand_reads' slot-count guard
            if (inr && qpos >= qstart && qpos <= qend && j < il) {
              kmer = kshift(kmer, NIB2SYM[nib[qpos] & 0xF]);
              acc.add(cell + 1 + j, kmer);
            }
            qpos++;
          }
          if (inr && qpos > qstart && qpos <= qend + 1) {
            for (long long j = ln; j < il; j++) {
              kmer = kshift(kmer, SYM_DEL);
              acc.add(cell + 1 + j, kmer);
            }
          }
          lastcig = op;
        } else {
          qpos += ln;
          qstart += ln;
          lastcig = op;
        }
      } else if (op == CSOFT || op == CHARD) {
        qpos += ln;
      }
      if (pos > end) break;
    }
  }

  // compact + self-clean: dirty holds exactly the nonzero keys; the rank in
  // the low 9 bits is unique per key so sorting packed values sorts by key
  std::sort(acc.dirty.begin(), acc.dirty.end());
  const long long nnz = (long long)acc.dirty.size();
  int64_t *uk = (int64_t *)malloc(sizeof(int64_t) * (nnz ? nnz : 1));
  int64_t *cn = (int64_t *)malloc(sizeof(int64_t) * (nnz ? nnz : 1));
  int64_t *rk = (int64_t *)malloc(sizeof(int64_t) * (nnz ? nnz : 1));
  if (!uk || !cn || !rk) {
    free(uk);
    free(cn);
    free(rk);
    for (int64_t packed : acc.dirty) counts[packed >> 9] = 0;
    return -1;
  }
  for (long long i = 0; i < nnz; i++) {
    const int64_t key = acc.dirty[i] >> 9;
    uk[i] = key;
    cn[i] = counts[key];
    rk[i] = acc.dirty[i] & 0x1FF;
    counts[key] = 0;
  }
  *out_uk = uk;
  *out_cn = cn;
  *out_rk = rk;
  return nnz;
}

}  // extern "C"
