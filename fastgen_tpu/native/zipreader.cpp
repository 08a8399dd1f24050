// fastgen-tpu native data-loader core.
//
// The reference's hot data path rides torch's C++ DataLoader workers
// (fastgen/datasets/class_cond_dataloader.py:10-49 wraps
// torch.utils.data.DataLoader); this is the TPU build's native equivalent:
// a zip-archive reader (central-directory parse + raw-deflate via zlib) and
// a from-scratch PNG decoder (IDAT inflate + per-row unfilter), decoding
// whole batches into one contiguous uint8 NHWC buffer with the GIL released
// (callers bind via ctypes, so every call below runs GIL-free).
//
// Supported PNGs: 8-bit, colortype 0 (gray), 2 (RGB), 6 (RGBA), no
// interlace — exactly what EDM-style dataset zips contain. Everything else
// returns an error so Python can fall back to PIL.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 zipreader.cpp -lz -o libfgnative.so

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Entry {
  std::string name;
  uint16_t method = 0;        // 0 = stored, 8 = deflate
  uint32_t comp_size = 0;
  uint32_t raw_size = 0;
  uint64_t data_offset = 0;   // resolved lazily from the local header
  uint64_t local_offset = 0;
  bool resolved = false;
};

struct Archive {
  FILE* f = nullptr;
  std::vector<Entry> entries;
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint32_t rd32be(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}

bool read_at(FILE* f, uint64_t off, void* buf, size_t n) {
  if (fseeko(f, off, SEEK_SET) != 0) return false;
  return fread(buf, 1, n, f) == n;
}

int inflate_raw(const uint8_t* src, size_t src_len, uint8_t* dst,
                size_t dst_len, int window_bits) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, window_bits) != Z_OK) return -1;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dst_len);
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return (rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0)) ? 0 : -2;
}

int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  return (pb <= pc) ? b : c;
}

// 8-bit non-interlaced PNG -> tightly packed native-channel pixels.
// Returns 0 on success; fills w/h/ch.
int png_decode(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
               uint32_t* w, uint32_t* h, uint32_t* ch) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || std::memcmp(buf, kSig, 8) != 0) return -1;
  size_t pos = 8;
  uint32_t width = 0, height = 0, channels = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t clen = rd32be(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + clen > len) return -2;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      width = rd32be(data);
      height = rd32be(data + 4);
      uint8_t depth = data[8], color = data[9], interlace = data[12];
      if (depth != 8 || interlace != 0) return -3;
      if (color == 0) channels = 1;
      else if (color == 2) channels = 3;
      else if (color == 6) channels = 4;
      else return -3;  // palette / gray+alpha: fall back to PIL
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + clen);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  if (!width || !height || !channels || idat.empty()) return -4;

  const size_t stride = size_t(width) * channels;
  std::vector<uint8_t> raw((stride + 1) * height);
  if (inflate_raw(idat.data(), idat.size(), raw.data(), raw.size(),
                  /*zlib header*/ MAX_WBITS) != 0)
    return -5;

  out->resize(stride * height);
  const int bpp = channels;  // 8-bit
  for (uint32_t y = 0; y < height; y++) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    src++;
    uint8_t* cur = out->data() + y * stride;
    const uint8_t* up = (y > 0) ? out->data() + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(cur, src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; i++)
          cur[i] = src[i] + (i >= size_t(bpp) ? cur[i - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; i++)
          cur[i] = src[i] + (up ? up[i] : 0);
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; i++) {
          int a = i >= size_t(bpp) ? cur[i - bpp] : 0;
          int b = up ? up[i] : 0;
          cur[i] = src[i] + ((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; i++) {
          int a = i >= size_t(bpp) ? cur[i - bpp] : 0;
          int b = up ? up[i] : 0;
          int c = (up && i >= size_t(bpp)) ? up[i - bpp] : 0;
          cur[i] = src[i] + paeth(a, b, c);
        }
        break;
      default:
        return -6;
    }
  }
  *w = width;
  *h = height;
  *ch = channels;
  return 0;
}

bool resolve_offset(Archive* a, Entry* e) {
  if (e->resolved) return true;
  uint8_t lh[30];
  if (!read_at(a->f, e->local_offset, lh, 30)) return false;
  if (rd32(lh) != 0x04034b50) return false;
  uint16_t nlen = rd16(lh + 26), xlen = rd16(lh + 28);
  e->data_offset = e->local_offset + 30 + nlen + xlen;
  e->resolved = true;
  return true;
}

int read_entry_raw(Archive* a, Entry* e, std::vector<uint8_t>* out) {
  if (!resolve_offset(a, e)) return -1;
  std::vector<uint8_t> comp(e->comp_size);
  if (!read_at(a->f, e->data_offset, comp.data(), comp.size())) return -2;
  if (e->method == 0) {
    *out = std::move(comp);
    return 0;
  }
  if (e->method != 8) return -3;
  out->resize(e->raw_size);
  return inflate_raw(comp.data(), comp.size(), out->data(), out->size(),
                     -MAX_WBITS) == 0 ? 0 : -4;
}

}  // namespace

extern "C" {

// Open a zip archive; returns a handle (or null). Parses the central
// directory eagerly (EOCD scan from the file tail, no zip64).
void* fg_zip_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseeko(f, 0, SEEK_END);
  uint64_t fsize = ftello(f);
  const size_t kMaxScan = 1 << 16;
  size_t scan = fsize < kMaxScan + 22 ? size_t(fsize) : kMaxScan + 22;
  std::vector<uint8_t> tail(scan);
  if (!read_at(f, fsize - scan, tail.data(), scan)) { fclose(f); return nullptr; }
  int64_t eocd = -1;
  for (int64_t i = int64_t(scan) - 22; i >= 0; i--) {
    if (rd32(tail.data() + i) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd < 0) { fclose(f); return nullptr; }
  uint16_t count = rd16(tail.data() + eocd + 10);
  uint32_t cd_size = rd32(tail.data() + eocd + 12);
  uint32_t cd_off = rd32(tail.data() + eocd + 16);
  std::vector<uint8_t> cd(cd_size);
  if (!read_at(f, cd_off, cd.data(), cd_size)) { fclose(f); return nullptr; }

  auto* a = new Archive;
  a->f = f;
  size_t p = 0;
  for (uint32_t i = 0; i < count && p + 46 <= cd_size; i++) {
    if (rd32(cd.data() + p) != 0x02014b50) break;
    Entry e;
    e.method = rd16(cd.data() + p + 10);
    e.comp_size = rd32(cd.data() + p + 20);
    e.raw_size = rd32(cd.data() + p + 24);
    uint16_t nlen = rd16(cd.data() + p + 28);
    uint16_t xlen = rd16(cd.data() + p + 30);
    uint16_t clen = rd16(cd.data() + p + 32);
    e.local_offset = rd32(cd.data() + p + 42);
    e.name.assign(reinterpret_cast<char*>(cd.data() + p + 46), nlen);
    a->entries.push_back(std::move(e));
    p += 46 + nlen + xlen + clen;
  }
  return a;
}

void fg_zip_close(void* h) {
  auto* a = static_cast<Archive*>(h);
  if (!a) return;
  fclose(a->f);
  delete a;
}

int64_t fg_zip_count(void* h) {
  return static_cast<Archive*>(h)->entries.size();
}

// Copies the i-th entry name into buf (NUL-terminated); returns its length.
int64_t fg_zip_name(void* h, int64_t i, char* buf, int64_t cap) {
  auto& e = static_cast<Archive*>(h)->entries[i];
  int64_t n = int64_t(e.name.size()) < cap - 1 ? e.name.size() : cap - 1;
  std::memcpy(buf, e.name.data(), n);
  buf[n] = 0;
  return int64_t(e.name.size());
}

int64_t fg_zip_raw_size(void* h, int64_t i) {
  return static_cast<Archive*>(h)->entries[i].raw_size;
}

// Reads + inflates the i-th entry into out (cap bytes). Returns bytes
// written or a negative error.
int64_t fg_zip_read(void* h, int64_t i, uint8_t* out, int64_t cap) {
  auto* a = static_cast<Archive*>(h);
  std::vector<uint8_t> data;
  int rc = read_entry_raw(a, &a->entries[i], &data);
  if (rc != 0) return -100 + rc;
  if (int64_t(data.size()) > cap) return -1;
  std::memcpy(out, data.data(), data.size());
  return int64_t(data.size());
}

// Decodes the i-th entry as PNG into out_rgb [h*w*3] uint8 (gray broadcast,
// alpha dropped). h/w must match the expected resolution. Returns 0 or a
// negative error (caller falls back to PIL).
int fg_zip_decode_png_rgb(void* h, int64_t i, uint8_t* out_rgb,
                          int64_t exp_h, int64_t exp_w) {
  auto* a = static_cast<Archive*>(h);
  std::vector<uint8_t> file;
  int rc = read_entry_raw(a, &a->entries[i], &file);
  if (rc != 0) return -200 + rc;
  std::vector<uint8_t> px;
  uint32_t w, hh, ch;
  rc = png_decode(file.data(), file.size(), &px, &w, &hh, &ch);
  if (rc != 0) return rc;
  if (int64_t(hh) != exp_h || int64_t(w) != exp_w) return -7;
  const size_t n = size_t(exp_h) * exp_w;
  if (ch == 3) {
    std::memcpy(out_rgb, px.data(), n * 3);
  } else if (ch == 1) {
    for (size_t p = 0; p < n; p++)
      out_rgb[p * 3] = out_rgb[p * 3 + 1] = out_rgb[p * 3 + 2] = px[p];
  } else {  // RGBA
    for (size_t p = 0; p < n; p++) {
      out_rgb[p * 3] = px[p * 4];
      out_rgb[p * 3 + 1] = px[p * 4 + 1];
      out_rgb[p * 3 + 2] = px[p * 4 + 2];
    }
  }
  return 0;
}

// Batch decode: indices[n] -> out [n, h, w, 3] contiguous. Returns the
// number decoded, stopping at the first failure (caller falls back for the
// rest). Runs entirely GIL-free under ctypes.
int64_t fg_zip_decode_batch(void* h, const int64_t* indices, int64_t n,
                            uint8_t* out, int64_t exp_h, int64_t exp_w) {
  const size_t img = size_t(exp_h) * exp_w * 3;
  for (int64_t k = 0; k < n; k++) {
    if (fg_zip_decode_png_rgb(h, indices[k], out + k * img, exp_h, exp_w) != 0)
      return k;
  }
  return n;
}

// ---- bytes-level PNG entry points (WDS tar members ride these; the zip
// ones above keep their archive-handle fast path) ------------------------

// Probe dims without decoding. Returns 0 and fills w/h, or negative.
int fg_png_probe(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 33 || std::memcmp(buf, kSig, 8) != 0) return -1;
  if (std::memcmp(buf + 12, "IHDR", 4) != 0) return -2;
  *w = int32_t(rd32be(buf + 16));
  *h = int32_t(rd32be(buf + 20));
  return 0;
}

// Decode an in-memory PNG to RGB (gray broadcast, alpha dropped).
// out must hold w*h*3 bytes (from fg_png_probe). Returns 0 or negative.
int fg_png_decode_rgb(const uint8_t* buf, int64_t len, uint8_t* out_rgb,
                      int64_t out_cap) {
  std::vector<uint8_t> px;
  uint32_t w, hh, ch;
  int rc = png_decode(buf, size_t(len), &px, &w, &hh, &ch);
  if (rc != 0) return rc;
  const size_t n = size_t(w) * hh;
  if (int64_t(n * 3) > out_cap) return -8;
  if (ch == 3) {
    std::memcpy(out_rgb, px.data(), n * 3);
  } else if (ch == 1) {
    for (size_t p = 0; p < n; p++)
      out_rgb[p * 3] = out_rgb[p * 3 + 1] = out_rgb[p * 3 + 2] = px[p];
  } else {  // RGBA
    for (size_t p = 0; p < n; p++) {
      out_rgb[p * 3] = px[p * 4];
      out_rgb[p * 3 + 1] = px[p * 4 + 1];
      out_rgb[p * 3 + 2] = px[p * 4 + 2];
    }
  }
  return 0;
}

}  // extern "C"
