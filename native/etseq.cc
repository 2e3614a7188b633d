// etseq: native sequence data-loader kernels for expecto-tpu.
//
// The host-side hot loops of the pipelines — FASTA flat-file building,
// byte->base-code encoding, windowed gathers, and variant allele splicing —
// implemented as a small C library consumed via ctypes
// (expecto_tpu/genome/native.py). These replace the per-character Python
// loops of the reference (expecto_utils.py:30-34, chromatin.py:248-254) on
// the feeding side of the TPU runner; the numpy fallback remains for
// environments without a compiler.
//
// Build: make -C native   (produces libetseq.so)

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

// base -> code lookup (AGCT channel order, N_CODE=4), mirrors
// expecto_tpu.genome.encode._BYTE_LUT.
struct Lut {
  int8_t t[256];
  Lut() {
    memset(t, 4, sizeof(t));
    t[(unsigned char)'A'] = t[(unsigned char)'a'] = 0;
    t[(unsigned char)'G'] = t[(unsigned char)'g'] = 1;
    t[(unsigned char)'C'] = t[(unsigned char)'c'] = 2;
    t[(unsigned char)'T'] = t[(unsigned char)'t'] = 3;
  }
};
const Lut kLut;

const int8_t kComplement[5] = {3, 2, 1, 0, 4};

}  // namespace

extern "C" {

// Encode raw sequence bytes to int8 base codes. out must hold n bytes.
void etseq_encode(const uint8_t* seq, int64_t n, int8_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = kLut.t[seq[i]];
}

// Reverse-complement codes in[0..n) into out[0..n).
void etseq_revcomp(const int8_t* in, int64_t n, int8_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = kComplement[(int)in[n - 1 - i]];
}

// Gather fixed-length windows from a flat contig byte buffer into codes.
// starts are 0-based offsets into `flat` (length flat_len); out is
// (n_windows, window_len) int8, row-major. Out-of-range bases encode as 4
// (N) — matching the clamped-fetch + N-pad semantics of the Python layer.
void etseq_gather_windows(const uint8_t* flat, int64_t flat_len,
                          const int64_t* starts, int64_t n_windows,
                          int64_t window_len, int8_t* out) {
  for (int64_t w = 0; w < n_windows; ++w) {
    int8_t* row = out + w * window_len;
    int64_t s = starts[w];
    for (int64_t i = 0; i < window_len; ++i) {
      int64_t p = s + i;
      row[i] = (p >= 0 && p < flat_len) ? kLut.t[flat[p]] : (int8_t)4;
    }
  }
}

// Variant window splice: take a fetched (oversized) window's bytes, replace
// [mutpos, mutpos+ref_len) with the alt allele bytes, then center-crop to
// inputsize codes (reference fetchSeqs + encodeSeqs semantics,
// chromatin.py:203-209 + expecto_utils.py:31). Returns the spliced length.
// out must hold inputsize bytes.
int64_t etseq_splice_encode(const uint8_t* window, int64_t window_len,
                            int64_t mutpos, int64_t ref_len,
                            const uint8_t* allele, int64_t allele_len,
                            int64_t inputsize, int8_t* out) {
  // a ref allele running past the window end splices away only the bases
  // that exist (Python string slicing clamps: window[:mutpos] + alt +
  // window[mutpos+ref_len:] with mutpos+ref_len > len just drops the tail)
  if (ref_len > window_len - mutpos) ref_len = window_len - mutpos;
  if (ref_len < 0) ref_len = 0;
  int64_t spliced_len = window_len - ref_len + allele_len;
  // Same contract as the numpy fallback (encode.seqs_to_codes): center-crop
  // when the spliced sequence covers the input, otherwise keep the WHOLE
  // short sequence left-aligned and N-pad the right (deletions longer than
  // the window's 100 bp slack; the reference's negative-slice arithmetic
  // would keep only the tail few bases there — a documented divergence).
  int64_t start = 0;
  int64_t count = spliced_len;
  if (spliced_len >= inputsize) {
    start = (spliced_len - inputsize) / 2;  // floor: spliced_len-inputsize >= 0
    count = inputsize;
  }
  for (int64_t j = 0; j < inputsize; ++j) {
    int8_t code = 4;
    if (j < count) {
      int64_t i = start + j;
      uint8_t b;
      if (i < mutpos) {
        b = window[i];
      } else if (i < mutpos + allele_len) {
        b = allele[i - mutpos];
      } else {
        b = window[i - allele_len + ref_len];
      }
      code = kLut.t[b];
    }
    out[j] = code;
  }
  return spliced_len;
}

// FASTA flat-file builder: strip headers and newlines from `src` (FASTA
// bytes, length n) into `dst`. Records contig boundaries: for contig k,
// name_offsets[k]/name_lens[k] locate the name inside src and
// flat_offsets[k] its start in dst. Returns the number of contigs (or -1
// if capacity exceeded). flat_out_len receives the flat byte count.
int64_t etseq_build_flat(const uint8_t* src, int64_t n, uint8_t* dst,
                         int64_t* flat_out_len, int64_t* name_offsets,
                         int64_t* name_lens, int64_t* flat_offsets,
                         int64_t max_contigs) {
  int64_t out = 0, k = -1;
  int64_t i = 0;
  while (i < n) {
    if (src[i] == '>') {
      ++k;
      if (k >= max_contigs) return -1;
      int64_t j = i + 1;
      while (j < n && src[j] != '\n' && src[j] != '\r' && src[j] != ' ' && src[j] != '\t') ++j;
      name_offsets[k] = i + 1;
      name_lens[k] = j - (i + 1);
      flat_offsets[k] = out;
      while (i < n && src[i] != '\n') ++i;
      ++i;
    } else {
      int64_t line_start = i;
      while (i < n && src[i] != '\n' && src[i] != '\r') ++i;
      int64_t len = i - line_start;
      memcpy(dst + out, src + line_start, len);
      out += len;
      while (i < n && (src[i] == '\n' || src[i] == '\r')) ++i;
    }
  }
  *flat_out_len = out;
  return k + 1;
}

}  // extern "C"
