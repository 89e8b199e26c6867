// swtpu native host runtime: fused FASTA parse+encode and batch packing.
//
// TPU-native counterpart of the reference's host-side C++ (the FASTA parsers
// in src/FASTAParsers.h:33-138 and the packing loop in
// src/SWSolver.cu:309-359).  Unlike the reference, which builds a
// std::map<int, vector<string>> of per-record strings, these routines emit
// the flat-buffer layout the TPU batch packer wants directly: one contiguous
// int8 residue array plus an int64 offsets array, residues already encoded
// to alphabet indices (reference encoding: convertStringToFloat,
// src/SWSolver.cu:91-120 — unknown bytes -> STAR=24).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// Parsing semantics mirror swtpu.io.fasta._split_records exactly; the Python
// module remains the source of truth and the fallback.

#include <cstdint>
#include <cstring>

namespace {

constexpr int8_t STAR = 24;

// byte -> residue index table (BLAST order "ARNDCQEGHILKMFPSTWYVBJZX*";
// everything else -> STAR), mirroring swtpu.alphabet._ENCODE_TABLE.
struct EncodeTable {
  int8_t t[256];
  bool ws[256];
  EncodeTable() {
    const char* alphabet = "ARNDCQEGHILKMFPSTWYVBJZX*";
    for (int i = 0; i < 256; ++i) t[i] = STAR;
    for (int i = 0; alphabet[i]; ++i) t[(unsigned char)alphabet[i]] = (int8_t)i;
    for (int i = 0; i < 256; ++i) ws[i] = false;
    ws[(unsigned char)'\r'] = ws[(unsigned char)'\n'] = true;
    ws[(unsigned char)'\t'] = ws[(unsigned char)' '] = true;
  }
};
const EncodeTable kTable;

// Append the cleaned+encoded body [begin, end) to out; returns new length.
inline int64_t encode_body(const char* begin, const char* end, int8_t* out,
                           int64_t pos) {
  for (const char* p = begin; p < end; ++p) {
    unsigned char c = (unsigned char)*p;
    if (!kTable.ws[c]) out[pos++] = kTable.t[c];
  }
  return pos;
}

}  // namespace

extern "C" {

// Parse FASTA bytes into encoded residues + offsets.
//
//   data, n          : raw file bytes
//   residues_out     : caller-allocated, capacity >= n
//   offsets_out      : caller-allocated int64, capacity >= max_records + 1
//   max_records      : capacity bound (count of '>' + 1 is always enough)
//
// Returns the number of records (>= 0), or -1 if capacity was insufficient.
// offsets_out[0] = 0 and offsets_out[k] = end of record k-1's residues.
//
// Record semantics (parity with swtpu.io.fasta._split_records):
//   * no '>' anywhere: the whole cleaned file is one record (if non-empty),
//   * otherwise records start at the first '>' and after every "\n>";
//     bytes before the first '>' are ignored,
//   * each record's header line (to the first '\n') is skipped; the body is
//     whitespace-stripped and encoded,
//   * records with an empty header AND empty body are dropped.
int64_t sw_parse_fasta(const char* data, int64_t n, int8_t* residues_out,
                       int64_t* offsets_out, int64_t max_records) {
  int64_t n_rec = 0;
  int64_t pos = 0;
  offsets_out[0] = 0;

  // Find the first '>'.
  const char* first = (const char*)memchr(data, '>', (size_t)n);
  if (first == nullptr) {
    pos = encode_body(data, data + n, residues_out, 0);
    if (pos == 0) return 0;
    if (max_records < 1) return -1;
    offsets_out[1] = pos;
    return 1;
  }

  const char* end = data + n;
  const char* rec = first + 1;  // just past '>'
  while (rec <= end) {
    // Record chunk spans [rec, next "\n>" or end).
    const char* chunk_end = end;
    const char* next_rec = nullptr;
    for (const char* q = rec; q + 1 < end;) {
      const char* nl = (const char*)memchr(q, '\n', (size_t)(end - q));
      if (nl == nullptr) break;
      if (nl + 1 < end && nl[1] == '>') {
        chunk_end = nl;
        next_rec = nl + 2;
        break;
      }
      q = nl + 1;
    }
    // Header = to first '\n' within the chunk (strip '\r'); body after it.
    const char* nl = (const char*)memchr(rec, '\n', (size_t)(chunk_end - rec));
    const char* header_end = nl ? nl : chunk_end;
    const char* body_begin = nl ? nl + 1 : chunk_end;
    int64_t header_len = header_end - rec;
    if (header_len > 0 && header_end[-1] == '\r') header_len--;

    int64_t new_pos = encode_body(body_begin, chunk_end, residues_out, pos);
    if (header_len > 0 || new_pos > pos) {  // drop fully-empty records
      if (n_rec + 1 > max_records) return -1;
      pos = new_pos;
      offsets_out[++n_rec] = pos;
    }
    if (next_rec == nullptr) break;
    rec = next_rec;
  }
  return n_rec;
}

// Pack a batch of subjects into a (rows, width) int8 array.
//
// TPU-shaped replacement for the reference's interleaved per-residue packing
// loop (src/SWSolver.cu:316-322): row-major memcpy per subject, pad slots
// pre-filled with `pad`.
void sw_pack_batch(const int8_t* residues, const int64_t* offsets,
                   const int32_t* ids, int64_t n_ids, int64_t rows,
                   int64_t width, int8_t pad, int8_t* out) {
  memset(out, pad, (size_t)(rows * width));
  for (int64_t r = 0; r < n_ids; ++r) {
    int64_t id = ids[r];
    int64_t beg = offsets[id];
    int64_t len = offsets[id + 1] - beg;
    if (len > width) len = width;
    memcpy(out + r * width, residues + beg, (size_t)len);
  }
}

// Pack segment-shared rows: several subjects per row at given column
// starts (TPU-native segment packing, swtpu/utils/segpack.py).
//
//   ids    : (rows * s_max) int64, -1 = empty slot
//   starts : (rows * s_max) int32 first column per segment
//   out    : (rows * width) int8, pre-filled with `pad` here
void sw_pack_segments(const int8_t* residues, const int64_t* offsets,
                      const int64_t* ids, const int32_t* starts,
                      int64_t rows, int64_t s_max, int64_t width, int8_t pad,
                      int8_t* out) {
  memset(out, pad, (size_t)(rows * width));
  for (int64_t r = 0; r < rows; ++r) {
    int8_t* row = out + r * width;
    for (int64_t s = 0; s < s_max; ++s) {
      int64_t id = ids[r * s_max + s];
      if (id < 0) break;
      int64_t beg = offsets[id];
      int64_t len = offsets[id + 1] - beg;
      int64_t col = starts[r * s_max + s];
      if (col + len > width) len = width - col;
      memcpy(row + col, residues + beg, (size_t)len);
    }
  }
}

// Pack a wavefront bucket DIRECTLY in transposed (L2, Bpad) layout
// (swtpu/ops/wave_sw.py: subjects on lanes, residue position on rows).
//
// Blocked by 128 subjects so each output row segment is a contiguous
// 128-byte write and each subject's source stream stays cache-resident —
// ~3x the NumPy gather + .T copy it replaces.
void sw_pack_bucket_T(const int8_t* residues, const int64_t* offsets,
                      const int32_t* ids, int64_t n_ids, int64_t l2,
                      int64_t bpad, int8_t pad, int8_t* out) {
  memset(out, pad, (size_t)(l2 * bpad));
  const int64_t TB = 128;
  for (int64_t b0 = 0; b0 < n_ids; b0 += TB) {
    int64_t bend = b0 + TB < n_ids ? b0 + TB : n_ids;
    int64_t kmax = 0;
    const int8_t* src[TB];
    int64_t len[TB];
    for (int64_t b = b0; b < bend; ++b) {
      int64_t id = ids[b];
      int64_t beg = offsets[id];
      int64_t l = offsets[id + 1] - beg;
      if (l > l2) l = l2;
      src[b - b0] = residues + beg;
      len[b - b0] = l;
      if (l > kmax) kmax = l;
    }
    for (int64_t k = 0; k < kmax; ++k) {
      int8_t* row = out + k * bpad + b0;
      for (int64_t b = 0; b < bend - b0; ++b) {
        if (k < len[b]) row[b] = src[b][k];
      }
    }
  }
}

// Batched max over the packed residue lengths (utility for planners).
int64_t sw_total_residues(const int64_t* offsets, int64_t n) {
  return n >= 0 ? offsets[n] : 0;
}

// k-mer presence signatures for the heuristic prefilter
// (swtpu/ops/prefilter.py): one pass over the flat residue buffer,
// hashing every in-record k-mer window into a dim-bucket presence bit
// per sequence.  Replaces a ~1.8 us/residue NumPy pass (which also
// materialises an 8-byte record-id per residue) with ~2 ns/residue.
// mix: per-position odd multipliers (must match prefilter._MIX);
// hash = ((acc >> 20) ^ acc) & (dim - 1) on uint32 wrap-around.
void sw_build_signatures(const int8_t* residues, const int64_t* offsets,
                         int64_t n, int64_t dim, int64_t k,
                         const uint32_t* mix, int8_t* out) {
  memset(out, 0, (size_t)(n * dim));
  const uint32_t mask = (uint32_t)(dim - 1);
  for (int64_t i = 0; i < n; ++i) {
    const int8_t* seq = residues + offsets[i];
    int64_t len = offsets[i + 1] - offsets[i];
    int8_t* sig = out + i * dim;
    for (int64_t p = 0; p + k <= len; ++p) {
      uint32_t acc = 0;
      for (int64_t j = 0; j < k; ++j) acc += (uint32_t)(uint8_t)seq[p + j] * mix[j];
      sig[((acc >> 20) ^ acc) & mask] = 1;
    }
  }
}

}  // extern "C"
