// LZ4 frame/block decompressor — first-party native data-path component.
//
// The reference reads lz4-frame-compressed .npy MRI volumes through the
// python `lz4` wheel (/root/reference/dataset/ipmsa.py:45-52). That wheel is
// not in this image, so the decoder is implemented here from the public LZ4
// frame/block format specifications (clean-room; no reference code involved)
// and exposed to Python over a C ABI via ctypes
// (diffusion_classifier_tpu/utils/lz4io.py).
//
// Build: `make -C native` → liblz4dec.so.
//
// Error codes: 0 ok; -1 malformed input; -2 output buffer too small;
// -3 unsupported frame feature.

#include <cstddef>
#include <cstdint>
#include <cstring>

namespace {

// Decompress one LZ4 block. Returns bytes written or negative error.
long block_decompress(const uint8_t* src, size_t src_len, uint8_t* dst,
                      size_t dst_cap) {
  const uint8_t* sp = src;
  const uint8_t* const send = src + src_len;
  uint8_t* dp = dst;
  uint8_t* const dend = dst + dst_cap;

  while (sp < send) {
    const uint8_t token = *sp++;

    // Literals
    size_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (sp >= send) return -1;
        b = *sp++;
        lit += b;
      } while (b == 255);
    }
    if (sp + lit > send || dp + lit > dend) return (dp + lit > dend) ? -2 : -1;
    std::memcpy(dp, sp, lit);
    sp += lit;
    dp += lit;

    if (sp >= send) break;  // last sequence has no match part

    // Match
    if (sp + 2 > send) return -1;
    const size_t offset = sp[0] | (static_cast<size_t>(sp[1]) << 8);
    sp += 2;
    if (offset == 0 || static_cast<size_t>(dp - dst) < offset) return -1;

    size_t mlen = (token & 0x0F) + 4;
    if ((token & 0x0F) == 15) {
      uint8_t b;
      do {
        if (sp >= send) return -1;
        b = *sp++;
        mlen += b;
      } while (b == 255);
    }
    if (dp + mlen > dend) return -2;
    const uint8_t* mp = dp - offset;
    // Byte-wise copy: overlapping matches are the normal case (RLE).
    for (size_t i = 0; i < mlen; ++i) dp[i] = mp[i];
    dp += mlen;
  }
  return static_cast<long>(dp - dst);
}

inline uint32_t read_le32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

}  // namespace

extern "C" {

// Returns 0 on success with *out_len set; negative error code otherwise.
int lz4_frame_decompress(const uint8_t* src, size_t src_len, uint8_t* dst,
                         size_t dst_cap, size_t* out_len) {
  const uint8_t* sp = src;
  const uint8_t* const send = src + src_len;
  uint8_t* dp = dst;

  if (sp + 7 > send) return -1;
  if (read_le32(sp) != 0x184D2204u) return -1;  // frame magic
  sp += 4;

  const uint8_t flg = *sp++;
  /* BD byte (block max size) — size hint only */ sp++;
  if ((flg >> 6) != 0x01) return -3;  // version must be 01
  const bool block_checksum = flg & 0x10;
  const bool content_size = flg & 0x08;
  const bool dict_id = flg & 0x01;
  if (content_size) sp += 8;
  if (dict_id) sp += 4;
  sp += 1;  // header checksum (HC) — not verified
  if (sp > send) return -1;

  while (true) {
    if (sp + 4 > send) return -1;
    const uint32_t bsize_raw = read_le32(sp);
    sp += 4;
    if (bsize_raw == 0) break;  // EndMark
    const bool uncompressed = bsize_raw & 0x80000000u;
    const size_t bsize = bsize_raw & 0x7FFFFFFFu;
    if (sp + bsize > send) return -1;

    if (uncompressed) {
      if (dp + bsize > dst + dst_cap) return -2;
      std::memcpy(dp, sp, bsize);
      dp += bsize;
    } else {
      const long written =
          block_decompress(sp, bsize, dp, dst_cap - (dp - dst));
      if (written < 0) return static_cast<int>(written);
      dp += written;
    }
    sp += bsize;
    if (block_checksum) sp += 4;  // skipped, not verified
  }

  *out_len = static_cast<size_t>(dp - dst);
  return 0;
}

// Extract the content-size hint from a frame header; 0 if absent/invalid.
unsigned long long lz4_frame_content_size(const uint8_t* src, size_t src_len) {
  if (src_len < 15 || read_le32(src) != 0x184D2204u) return 0;
  const uint8_t flg = src[4];
  if (!(flg & 0x08)) return 0;
  unsigned long long v = 0;
  for (int i = 0; i < 8; ++i)
    v |= static_cast<unsigned long long>(src[6 + i]) << (8 * i);
  return v;
}

}  // extern "C"
