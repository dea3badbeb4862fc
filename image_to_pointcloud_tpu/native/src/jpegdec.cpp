// Baseline JPEG entropy decoder — the HOST half of the hybrid decode
// path. Huffman-decodes quantized DCT coefficients and stops: the
// dequantize + IDCT + chroma upsample + YCbCr→RGB math runs on the TPU
// as 8x8 matmuls inside the jitted pipeline graph (ops/jpeg.py).
//
// Why: the reference decodes JPEGs fully on the host (cv2.imdecode,
// reference backend/app.py:433) and ships raw pixels to the device. On
// a link-bound serving topology the coefficients ARE the compact
// representation (~10-20x smaller than the pixels for photographic
// inputs), so entropy-decode is the only work that must stay on the
// CPU ("Accelerating JPEG Decompression on GPUs", arxiv 2111.09219,
// splits the codec at exactly this point).
//
// Supported: baseline sequential (SOF0) and extended sequential (SOF1)
// Huffman JPEGs, 8-bit precision, 1 or 3 components, interleaved
// 3-component or single-component scans, restart intervals.
// Anything else (progressive SOF2, arithmetic coding, 12-bit, CMYK)
// returns IPC_JPEG_UNSUPPORTED and the caller falls back to the full
// host decode.
//
// C ABI for the ctypes binding in native/__init__.py.

#include <cstdint>
#include <cstring>

namespace {

constexpr int32_t IPC_JPEG_OK = 0;
constexpr int32_t IPC_JPEG_NOT_JPEG = -1;
constexpr int32_t IPC_JPEG_UNSUPPORTED = -2;
constexpr int32_t IPC_JPEG_CORRUPT = -3;

// Zigzag index -> natural (row-major) index.
constexpr uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
};

struct HuffTable {
  int32_t mincode[17];
  int32_t maxcode[18];
  int32_t valptr[17];
  uint8_t vals[256];
  bool present = false;

  void build(const uint8_t counts[16], const uint8_t* symbols) {
    int code = 0, k = 0;
    for (int l = 1; l <= 16; l++) {
      valptr[l] = k;
      mincode[l] = code;
      if (counts[l - 1]) {
        code += counts[l - 1];
        maxcode[l] = code - 1;
      } else {
        maxcode[l] = -1;
      }
      k += counts[l - 1];
      code <<= 1;
    }
    maxcode[17] = 0x7fffffff;
    for (int i = 0; i < k && i < 256; i++) vals[i] = symbols[i];
    present = true;
  }
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint32_t cur = 0;
  int nbits = 0;
  int pending_marker = 0;  // 0xDn (or other) marker hit inside the stream

  // Next entropy-coded byte with 0xFF00 unstuffing; -1 = end of data,
  // -2 = marker encountered (recorded in pending_marker).
  int next_byte() {
    if (pending_marker) return -2;
    if (p >= end) return -1;
    uint8_t b = *p++;
    if (b != 0xFF) return b;
    // Skip fill bytes (any run of 0xFF).
    while (p < end && *p == 0xFF) p++;
    if (p >= end) return -1;
    uint8_t m = *p++;
    if (m == 0x00) return 0xFF;
    pending_marker = m;
    return -2;
  }

  int next_bit() {
    if (nbits == 0) {
      int b = next_byte();
      if (b < 0) return b;
      cur = static_cast<uint32_t>(b);
      nbits = 8;
    }
    nbits--;
    return (cur >> nbits) & 1;
  }

  // Read n bits MSB-first; negative on end/marker.
  int receive(int n) {
    int v = 0;
    for (int i = 0; i < n; i++) {
      int b = next_bit();
      if (b < 0) return b;
      v = (v << 1) | b;
    }
    return v;
  }
};

inline int extend(int v, int t) {
  if (t == 0) return 0;
  return v < (1 << (t - 1)) ? v - (1 << t) + 1 : v;
}

int huff_decode(BitReader& br, const HuffTable& ht) {
  int code = br.next_bit();
  if (code < 0) return -100;
  int l = 1;
  while (code > ht.maxcode[l]) {
    int b = br.next_bit();
    if (b < 0) return -100;
    code = (code << 1) | b;
    if (++l > 16) return -101;
  }
  int idx = ht.valptr[l] + code - ht.mincode[l];
  if (idx < 0 || idx > 255) return -101;
  return ht.vals[idx];
}

// out: 64 int16 in NATURAL order, pre-zeroed by caller.
int decode_block(BitReader& br, const HuffTable& dc, const HuffTable& ac,
                 int& pred, int16_t* out) {
  int t = huff_decode(br, dc);
  if (t < 0) return t;
  if (t > 15) return -101;
  int diff = 0;
  if (t) {
    int v = br.receive(t);
    if (v < 0) return -100;
    diff = extend(v, t);
  }
  pred += diff;
  out[0] = static_cast<int16_t>(pred);
  int k = 1;
  while (k < 64) {
    int rs = huff_decode(br, ac);
    if (rs < 0) return rs;
    int r = rs >> 4, s = rs & 15;
    if (s == 0) {
      if (r == 15) {
        k += 16;
        continue;
      }
      break;  // EOB
    }
    k += r;
    if (k > 63) return -101;
    int v = br.receive(s);
    if (v < 0) return -100;
    out[kZigzag[k]] = static_cast<int16_t>(extend(v, s));
    k++;
  }
  return 0;
}

struct Parsed {
  int width = 0, height = 0, ncomp = 0;
  int comp_id[3] = {0, 0, 0};
  int h[3] = {1, 1, 1}, v[3] = {1, 1, 1};
  int tq[3] = {0, 0, 0};
  uint16_t qtab[4][64] = {};  // natural order
  bool qtab_present[4] = {};
  HuffTable dc_tab[4], ac_tab[4];
  int restart_interval = 0;
  // scan
  int ns = 0;
  int scan_comp[3] = {0, 0, 0};  // indices into comp arrays
  int td[3] = {0, 0, 0}, ta[3] = {0, 0, 0};
  const uint8_t* entropy = nullptr;  // start of entropy-coded data
};

inline int u16be(const uint8_t* p) { return (p[0] << 8) | p[1]; }

// Parse headers up to (and including) SOS. Returns IPC_JPEG_* code.
int parse_headers(const uint8_t* data, int64_t len, Parsed& out) {
  if (len < 4 || data[0] != 0xFF || data[1] != 0xD8) return IPC_JPEG_NOT_JPEG;
  const uint8_t* p = data + 2;
  const uint8_t* end = data + len;
  bool have_sof = false;
  while (p + 4 <= end) {
    if (*p != 0xFF) return IPC_JPEG_CORRUPT;
    while (p < end && *p == 0xFF) p++;  // fill bytes
    if (p >= end) return IPC_JPEG_CORRUPT;
    uint8_t m = *p++;
    if (m == 0xD8) continue;             // stray SOI
    if (m == 0xD9) return IPC_JPEG_CORRUPT;  // EOI before SOS
    if (p + 2 > end) return IPC_JPEG_CORRUPT;
    int L = u16be(p);
    if (L < 2 || p + L > end) return IPC_JPEG_CORRUPT;
    const uint8_t* seg = p + 2;
    int seg_len = L - 2;
    switch (m) {
      case 0xC0:  // SOF0 baseline
      case 0xC1:  // SOF1 extended sequential, Huffman
      {
        if (seg_len < 6) return IPC_JPEG_CORRUPT;
        int prec = seg[0];
        if (prec != 8) return IPC_JPEG_UNSUPPORTED;
        out.height = u16be(seg + 1);
        out.width = u16be(seg + 3);
        out.ncomp = seg[5];
        if (out.ncomp != 1 && out.ncomp != 3) return IPC_JPEG_UNSUPPORTED;
        if (seg_len < 6 + 3 * out.ncomp) return IPC_JPEG_CORRUPT;
        for (int c = 0; c < out.ncomp; c++) {
          const uint8_t* cp = seg + 6 + 3 * c;
          out.comp_id[c] = cp[0];
          out.h[c] = cp[1] >> 4;
          out.v[c] = cp[1] & 15;
          out.tq[c] = cp[2];
          if (out.h[c] < 1 || out.h[c] > 4 || out.v[c] < 1 || out.v[c] > 4 ||
              out.tq[c] > 3)
            return IPC_JPEG_CORRUPT;
        }
        if (out.ncomp == 1) out.h[0] = out.v[0] = 1;  // libjpeg semantics
        have_sof = true;
        break;
      }
      case 0xC2:  // progressive
      case 0xC3:
      case 0xC5:
      case 0xC6:
      case 0xC7:
      case 0xC9:
      case 0xCA:
      case 0xCB:
      case 0xCD:
      case 0xCE:
      case 0xCF:
        return IPC_JPEG_UNSUPPORTED;  // other SOFs / arithmetic coding
      case 0xC4: {  // DHT
        const uint8_t* q = seg;
        while (q + 17 <= seg + seg_len) {
          int tc = q[0] >> 4, th = q[0] & 15;
          if (tc > 1 || th > 3) return IPC_JPEG_CORRUPT;
          int total = 0;
          for (int i = 1; i <= 16; i++) total += q[i];
          if (total > 256 || q + 17 + total > seg + seg_len)
            return IPC_JPEG_CORRUPT;
          (tc == 0 ? out.dc_tab[th] : out.ac_tab[th]).build(q + 1, q + 17);
          q += 17 + total;
        }
        break;
      }
      case 0xDB: {  // DQT
        const uint8_t* q = seg;
        while (q < seg + seg_len) {
          int pq = q[0] >> 4, tq = q[0] & 15;
          if (tq > 3) return IPC_JPEG_CORRUPT;
          q++;
          int need = pq ? 128 : 64;
          if (q + need > seg + seg_len) return IPC_JPEG_CORRUPT;
          for (int i = 0; i < 64; i++) {
            uint16_t val = pq ? static_cast<uint16_t>(u16be(q + 2 * i))
                              : static_cast<uint16_t>(q[i]);
            out.qtab[tq][kZigzag[i]] = val;
          }
          out.qtab_present[tq] = true;
          q += need;
        }
        break;
      }
      case 0xDD:  // DRI
        if (seg_len < 2) return IPC_JPEG_CORRUPT;
        out.restart_interval = u16be(seg);
        break;
      case 0xDA: {  // SOS
        if (!have_sof) return IPC_JPEG_CORRUPT;
        if (seg_len < 1) return IPC_JPEG_CORRUPT;
        out.ns = seg[0];
        if (out.ns != out.ncomp) return IPC_JPEG_UNSUPPORTED;
        if (seg_len < 1 + 2 * out.ns + 3) return IPC_JPEG_CORRUPT;
        for (int s = 0; s < out.ns; s++) {
          int cs = seg[1 + 2 * s];
          int found = -1;
          for (int c = 0; c < out.ncomp; c++)
            if (out.comp_id[c] == cs) found = c;
          if (found < 0) return IPC_JPEG_CORRUPT;
          out.scan_comp[s] = found;
          out.td[s] = seg[2 + 2 * s] >> 4;
          out.ta[s] = seg[2 + 2 * s] & 15;
          if (out.td[s] > 3 || out.ta[s] > 3) return IPC_JPEG_CORRUPT;
        }
        // Ss/Se/Ah/Al must be the sequential values.
        const uint8_t* sp = seg + 1 + 2 * out.ns;
        if (sp[0] != 0 || sp[1] != 63) return IPC_JPEG_UNSUPPORTED;
        out.entropy = p + L;
        return IPC_JPEG_OK;
      }
      default:
        break;  // APPn, COM, others: skip
    }
    p += L;
  }
  return IPC_JPEG_CORRUPT;
}

int decode_scan(const Parsed& hdr, const uint8_t* end, int16_t* comp_out[3]) {
  int hmax = 1, vmax = 1;
  for (int c = 0; c < hdr.ncomp; c++) {
    if (hdr.h[c] > hmax) hmax = hdr.h[c];
    if (hdr.v[c] > vmax) vmax = hdr.v[c];
  }
  const int mcus_x = (hdr.width + 8 * hmax - 1) / (8 * hmax);
  const int mcus_y = (hdr.height + 8 * vmax - 1) / (8 * vmax);

  BitReader br{hdr.entropy, end};
  int pred[3] = {0, 0, 0};
  const int ri = hdr.restart_interval;
  int mcu_count = 0;
  int next_rst = 0;

  for (int my = 0; my < mcus_y; my++) {
    for (int mx = 0; mx < mcus_x; mx++) {
      if (ri && mcu_count && mcu_count % ri == 0) {
        // Byte-align and consume the expected RSTn marker.
        br.nbits = 0;
        if (!br.pending_marker) {
          // The marker bytes are next in the raw stream.
          while (br.p < br.end && *br.p == 0xFF &&
                 br.p + 1 < br.end && br.p[1] == 0xFF)
            br.p++;
          if (br.p + 1 < br.end && *br.p == 0xFF) {
            br.pending_marker = br.p[1];
            br.p += 2;
          }
        }
        if (br.pending_marker != 0xD0 + next_rst) return IPC_JPEG_CORRUPT;
        br.pending_marker = 0;
        next_rst = (next_rst + 1) & 7;
        pred[0] = pred[1] = pred[2] = 0;
      }
      for (int s = 0; s < hdr.ns; s++) {
        int c = hdr.scan_comp[s];
        const HuffTable& dc = hdr.dc_tab[hdr.td[s]];
        const HuffTable& ac = hdr.ac_tab[hdr.ta[s]];
        if (!dc.present || !ac.present) return IPC_JPEG_CORRUPT;
        const int bw = mcus_x * hdr.h[c];
        for (int by = 0; by < hdr.v[c]; by++) {
          for (int bx = 0; bx < hdr.h[c]; bx++) {
            const int row = my * hdr.v[c] + by;
            const int col = mx * hdr.h[c] + bx;
            int16_t* out = comp_out[c] + (static_cast<int64_t>(row) * bw + col) * 64;
            int rc = decode_block(br, dc, ac, pred[c], out);
            if (rc < 0) return IPC_JPEG_CORRUPT;
          }
        }
      }
      mcu_count++;
    }
  }
  return IPC_JPEG_OK;
}

}  // namespace

extern "C" {

// info[14]: [0]=width [1]=height [2]=ncomp [3..5]=h_i [6..8]=v_i
//           [9..11]=quant-table index per comp [12]=Hmax [13]=Vmax
int32_t ipc_jpeg_probe(const uint8_t* data, int64_t len, int32_t* info) {
  Parsed hdr;
  int rc = parse_headers(data, len, hdr);
  if (rc != IPC_JPEG_OK) return rc;
  int hmax = 1, vmax = 1;
  for (int c = 0; c < hdr.ncomp; c++) {
    if (hdr.h[c] > hmax) hmax = hdr.h[c];
    if (hdr.v[c] > vmax) vmax = hdr.v[c];
  }
  info[0] = hdr.width;
  info[1] = hdr.height;
  info[2] = hdr.ncomp;
  for (int c = 0; c < 3; c++) {
    info[3 + c] = c < hdr.ncomp ? hdr.h[c] : 0;
    info[6 + c] = c < hdr.ncomp ? hdr.v[c] : 0;
    info[9 + c] = c < hdr.ncomp ? hdr.tq[c] : 0;
  }
  info[12] = hmax;
  info[13] = vmax;
  return IPC_JPEG_OK;
}

// Decode quantized DCT coefficients. Caller allocates, per component c:
//   blocks = (ceil(h/(8*Vmax))*v_c) * (ceil(w/(8*Hmax))*h_c)
//   c{0,1,2}: int16[blocks*64], MUST be zero-initialized (EOB leaves
//   trailing coefficients untouched). qt: uint16[3*64], the component's
//   dequantization table in natural order.
int32_t ipc_jpeg_coeffs(const uint8_t* data, int64_t len, int16_t* c0,
                        int16_t* c1, int16_t* c2, uint16_t* qt) {
  Parsed hdr;
  int rc = parse_headers(data, len, hdr);
  if (rc != IPC_JPEG_OK) return rc;
  int16_t* outs[3] = {c0, c1, c2};
  for (int c = 0; c < hdr.ncomp; c++) {
    if (outs[c] == nullptr) return IPC_JPEG_CORRUPT;
    if (!hdr.qtab_present[hdr.tq[c]]) return IPC_JPEG_CORRUPT;
    std::memcpy(qt + 64 * c, hdr.qtab[hdr.tq[c]], 64 * sizeof(uint16_t));
  }
  return decode_scan(hdr, data + len, outs);
}

}  // extern "C"
