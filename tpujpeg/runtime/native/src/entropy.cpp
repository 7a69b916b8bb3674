// Native host entropy decoder for baseline JPEG scans.
//
// This is the TPU framework's equivalent of the reference's host-side C++
// decode path (the cudaH strategy: Huffman on the host CPU feeding device
// kernels, reference legacy_versions/cudaH-implementation/src/parser.cu:281-311,
// and the serial oracle cpp-decoder/src/parser.cpp:105-142).  Unlike the
// reference's bit-by-bit tree walk (huffmanTree.cpp:110-123) or 256-way
// linear code scan (cuda-decoder/src/parser.cu:5-19), each symbol is decoded
// with ONE lookup into a direct-indexed 16-bit-peek table, and the bit reader
// keeps a 64-bit buffer so refills touch memory once per ~6 symbols.
//
// Semantics are bit-identical to tpujpeg.oracle.decoder.entropy_decode:
//   - JPEG EXTEND per reference utils.cu:34-41 (size==0 -> 0),
//   - AC RLE with EOB / ZRL and the reference's "consume size bits even when
//     the run overflows the block" behavior (cpp parser.cpp:130-135),
//   - DC DPCM accumulated per component, reset at restart boundaries
//     (ITU T.81 E.1.2; the reference does not support DRI at all).
//
// Exported C ABI (loaded via ctypes; no pybind11 in this image):
//   tpj_entropy_decode        - decode one scan into int32 coefficients
//   tpj_version               - ABI version tag
#include <cstdint>
#include <cstring>

namespace {

constexpr int kLutBits = 16;
constexpr int64_t kLutSize = int64_t(1) << kLutBits;

// Error codes (keep in sync with runtime/native/lib.py).
enum : int32_t {
  kOk = 0,
  kErrInvalidCode = -1,
  kErrMissingSegment = -2,
  kErrTruncated = -3,
};

struct BitReader {
  const uint8_t* data;  // caller guarantees >= 8 bytes of zero padding
  int64_t nbits;        // total real bits
  int64_t byte_pos;     // next byte to refill from
  uint64_t buf;         // MSB-first bit buffer
  int bits;             // valid bits in buf

  inline void reset(const uint8_t* d, int64_t total_bits, int64_t start_byte) {
    data = d;
    nbits = total_bits;
    byte_pos = start_byte;
    buf = 0;
    bits = 0;
  }

  inline void refill() {
    while (bits <= 56) {
      buf |= uint64_t(data[byte_pos++]) << (56 - bits);
      bits += 8;
    }
  }

  inline uint32_t peek16() {
    if (bits < 16) refill();
    return uint32_t(buf >> 48);
  }

  inline void consume(int n) {
    buf <<= n;
    bits -= n;
  }

  // n in [0, 16]; peek16() must have been called since the last consume.
  inline uint32_t get_bits(int n) {
    uint32_t v = uint32_t((buf >> 48) & 0xFFFF) >> (16 - n);
    if (n == 0) return 0;
    consume(n);
    return v;
  }

  inline int64_t bit_position() const { return byte_pos * 8 - bits; }
};

// JPEG EXTEND (reference decodeNumber, utils.cu:34-41).
static inline int32_t extend(int size, uint32_t raw) {
  if (size == 0) return 0;
  int32_t half = int32_t(1) << (size - 1);
  int32_t v = int32_t(raw);
  return v >= half ? v : v - (2 * half - 1);
}

}  // namespace

extern "C" {

int32_t tpj_version() { return 1; }

// Decode one de-stuffed entropy scan into zigzag-order coefficient blocks.
//
//   scan         de-stuffed entropy bytes, padded with >= 8 zero bytes
//   scan_len     number of real bytes (excluding padding)
//   seg_offsets  [n_segments] byte offset of each restart segment start
//   ri           restart interval in MCUs (0 = none)
//   n_mcus       total MCU count
//   pattern      [bpm] component index of each block within an MCU
//   bpm          blocks per MCU
//   dc_rows      [n_comp] row of each component's DC table in lut_sym/lut_len
//   ac_rows      [n_comp] row of each component's AC table
//   n_comp       component count (<= 4)
//   lut_sym      [n_luts * 65536] uint8 symbol per 16-bit window
//   lut_len      [n_luts * 65536] uint8 code length per window (0 = invalid)
//   out          [n_mcus * bpm * 64] int32, written in scan order (zeroed here)
int32_t tpj_entropy_decode(
    const uint8_t* scan, int64_t scan_len,
    const int64_t* seg_offsets, int64_t n_segments,
    int64_t ri, int64_t n_mcus,
    const int32_t* pattern, int64_t bpm,
    const int32_t* dc_rows, const int32_t* ac_rows, int64_t n_comp,
    const uint8_t* lut_sym, const uint8_t* lut_len,
    int32_t* out) {
  const int64_t total_bits = scan_len * 8;
  std::memset(out, 0, size_t(n_mcus) * bpm * 64 * sizeof(int32_t));

  const uint8_t* dc_sym[4];
  const uint8_t* dc_len[4];
  const uint8_t* ac_sym[4];
  const uint8_t* ac_len[4];
  for (int64_t c = 0; c < n_comp; ++c) {
    dc_sym[c] = lut_sym + int64_t(dc_rows[c]) * kLutSize;
    dc_len[c] = lut_len + int64_t(dc_rows[c]) * kLutSize;
    ac_sym[c] = lut_sym + int64_t(ac_rows[c]) * kLutSize;
    ac_len[c] = lut_len + int64_t(ac_rows[c]) * kLutSize;
  }

  BitReader br;
  br.reset(scan, total_bits, 0);
  int32_t dc_pred[4] = {0, 0, 0, 0};
  int64_t seg = 0;
  int32_t* block = out;

  for (int64_t mcu = 0; mcu < n_mcus; ++mcu) {
    if (ri && mcu && mcu % ri == 0) {
      if (++seg >= n_segments) return kErrMissingSegment;
      br.reset(scan, total_bits, seg_offsets[seg]);
      dc_pred[0] = dc_pred[1] = dc_pred[2] = dc_pred[3] = 0;
    }
    for (int64_t b = 0; b < bpm; ++b, block += 64) {
      const int ci = pattern[b];
      // DC: size symbol, then EXTEND (cpp parser.cpp:105-110).
      uint32_t peek = br.peek16();
      int len = dc_len[ci][peek];
      if (len == 0) return kErrInvalidCode;
      int size = dc_sym[ci][peek];
      br.consume(len);
      br.refill();
      dc_pred[ci] += extend(size, br.get_bits(size));
      block[0] = dc_pred[ci];
      // AC: run/size symbols (cpp parser.cpp:113-135).
      const uint8_t* asym = ac_sym[ci];
      const uint8_t* alen = ac_len[ci];
      int k = 1;
      while (k < 64) {
        peek = br.peek16();
        len = alen[peek];
        if (len == 0) return kErrInvalidCode;
        int sym = asym[peek];
        br.consume(len);
        if (sym == 0) break;  // EOB
        k += sym >> 4;
        size = sym & 0x0F;
        br.refill();
        uint32_t raw = br.get_bits(size);
        if (k < 64) {
          block[k] = extend(size, raw);
          ++k;
        }
        // else: bits consumed, value dropped (reference parser.cpp:130-135)
      }
      if (br.bit_position() > total_bits + 16) return kErrTruncated;
    }
  }
  return kOk;
}

}  // extern "C"
