// Native slice-data finalizer: decision tensors -> CABAC slice bytes.
//
// This is the framework's serial native component (SURVEY.md §7.2): the
// analysis runs as batched TPU computation, and this C++ walker re-derives
// normative integer predictions/residuals and emits the entropy-coded
// slice. Mirrors x265's compressCTU/encodeCTU split (frameencoder.cpp:1519
// vs 1533) with the decide stage replaced by precomputed decision maps.
//
// Behavior is pinned bin-exactly to the Python reference writer
// (x265_tpu/engine/ctu_writer.py) by differential tests.

#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <vector>
#include <algorithm>

#include "tables_gen.h"

namespace {

static inline int clip3(int lo, int hi, int v) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// ---------------- CABAC engine (HM carry-buffer formulation) -------------

struct Cabac {
  uint8_t ctx[NUM_CONTEXTS];
  uint32_t low = 0;
  int range = 510;
  int bits_left = 23;
  int num_buffered = 0;
  int buffered_byte = 0xFF;
  std::vector<uint8_t> out;

  void init_slice(int init_type, int qp) {
    qp = clip3(0, 51, qp);
    for (int i = 0; i < NUM_CONTEXTS; i++) {
      int iv = kInitVals[init_type * NUM_CONTEXTS + i];
      int slope = (iv >> 4) * 5 - 45;
      int offset = ((iv & 15) << 3) - 16;
      int pre = clip3(1, 126, ((slope * qp) >> 4) + offset);
      int mps = pre > 63 ? 1 : 0;
      int pstate = mps ? pre - 64 : 63 - pre;
      ctx[i] = (uint8_t)((pstate << 1) | mps);
    }
    low = 0; range = 510; bits_left = 23;
    num_buffered = 0; buffered_byte = 0xFF; out.clear();
  }

  void write_out() {
    uint32_t lead = low >> (24 - bits_left);
    bits_left += 8;
    low &= 0xFFFFFFFFu >> bits_left;
    if (lead == 0xFF) {
      num_buffered++;
    } else if (num_buffered > 0) {
      int carry = lead >> 8;
      out.push_back((uint8_t)(buffered_byte + carry));
      uint8_t fill = (uint8_t)(0xFF + carry);
      for (int i = 0; i < num_buffered - 1; i++) out.push_back(fill);
      buffered_byte = lead & 0xFF;
      num_buffered = 1;
    } else {
      num_buffered = 1;
      buffered_byte = lead & 0xFF;
    }
  }

  void bin(int ctx_idx, int b) {
    uint8_t st = ctx[ctx_idx];
    int lps = kLps[(st >> 1) * 4 + ((range >> 6) & 3)];
    range -= lps;
    if (b != (st & 1)) {
      int n = kRenorm[lps >> 3];
      low = (low + (uint32_t)range) << n;
      range = lps << n;
      ctx[ctx_idx] = kNextLps[st];
      bits_left -= n;
    } else {
      ctx[ctx_idx] = kNextMps[st];
      if (range >= 256) return;
      low <<= 1;
      range <<= 1;
      bits_left -= 1;
    }
    if (bits_left < 12) write_out();
  }

  void ep(int b) {
    low <<= 1;
    if (b) low += (uint32_t)range;
    bits_left -= 1;
    if (bits_left < 12) write_out();
  }

  void eps(uint32_t pattern, int nbins) {
    while (nbins > 8) {
      nbins -= 8;
      uint32_t chunk = (pattern >> nbins) & 0xFF;
      low = (low << 8) + (uint32_t)range * chunk;
      bits_left -= 8;
      if (bits_left < 12) write_out();
    }
    if (nbins > 0) {
      uint32_t chunk = pattern & ((1u << nbins) - 1);
      low = (low << nbins) + (uint32_t)range * chunk;
      bits_left -= nbins;
      if (bits_left < 12) write_out();
    }
  }

  void trm(int b) {
    range -= 2;
    if (b) {
      low = (low + (uint32_t)range) << 7;
      range = 2 << 7;
      bits_left -= 7;
    } else if (range >= 256) {
      return;
    } else {
      low <<= 1;
      range <<= 1;
      bits_left -= 1;
    }
    if (bits_left < 12) write_out();
  }

  void finish() {
    if ((low >> (32 - bits_left)) & 1) {
      out.push_back((uint8_t)(buffered_byte + 1));
      for (int i = 0; i < num_buffered - 1; i++) out.push_back(0x00);
      low -= 1u << (32 - bits_left);
    } else {
      if (num_buffered > 0) out.push_back((uint8_t)buffered_byte);
      for (int i = 0; i < num_buffered - 1; i++) out.push_back(0xFF);
    }
    int nbits = 24 - bits_left;
    uint32_t val = nbits > 0 ? (low >> 8) & ((1u << nbits) - 1) : 0;
    nbits += 1;
    val = (val << 1) | 1;               // rbsp stop bit
    int pad = (8 - (nbits & 7)) & 7;
    val <<= pad;
    nbits += pad;
    while (nbits >= 8) {
      nbits -= 8;
      out.push_back((uint8_t)((val >> nbits) & 0xFF));
    }
  }
};

// ---------------- intra prediction (normative integer) -------------------

// ref layout: ref[0..2n-1] left bottom-up, ref[2n] corner, ref[2n+1..4n] top
static void get_ref_samples(const int16_t* plane, int stride, int pw, int ph,
                            const uint8_t* avail4, int a4stride,
                            int x0, int y0, int nt, int bd, int32_t* ref) {
  int n2 = 2 * nt;
  int R = 4 * nt + 1;
  std::vector<uint8_t> av(R, 0);
  auto sample_ok = [&](int x, int y) -> bool {
    if (x < 0 || y < 0 || x >= pw || y >= ph) return false;
    return avail4[(y >> 2) * a4stride + (x >> 2)] != 0;
  };
  for (int i = 0; i < n2; i++) {
    int y = y0 + n2 - 1 - i, x = x0 - 1;
    if (sample_ok(x, y)) { ref[i] = plane[y * stride + x]; av[i] = 1; }
  }
  if (sample_ok(x0 - 1, y0 - 1)) { ref[n2] = plane[(y0 - 1) * stride + x0 - 1]; av[n2] = 1; }
  for (int i = 0; i < n2; i++) {
    int x = x0 + i, y = y0 - 1;
    if (sample_ok(x, y)) { ref[n2 + 1 + i] = plane[y * stride + x]; av[n2 + 1 + i] = 1; }
  }
  int any = 0;
  for (int i = 0; i < R; i++) any |= av[i];
  if (!any) {
    for (int i = 0; i < R; i++) ref[i] = 1 << (bd - 1);
    return;
  }
  int all = 1;
  for (int i = 0; i < R; i++) all &= av[i];
  if (!all) {
    int first = 0;
    while (!av[first]) first++;
    if (!av[0]) ref[0] = ref[first];
    for (int i = 1; i < R; i++)
      if (!av[i]) ref[i] = ref[i - 1];
  }
}

static bool filter_flag(int mode, int log2) {
  if (mode == 1 || mode == 10 || mode == 26) return false;
  if (log2 == 2) return false;
  if (mode == 0) return true;
  int d = std::min(abs(mode - 26), abs(mode - 10));
  int thresh = log2 == 3 ? 7 : (log2 == 4 ? 1 : 0);
  return d > thresh;
}

static void filter_refs(int32_t* ref, int nt, int mode, bool strong, int bd) {
  int log2 = 0; while ((1 << log2) < nt) log2++;
  if (!filter_flag(mode, log2)) return;
  int n2 = 2 * nt, corner = n2, R = 4 * nt + 1;
  if (strong && nt == 32 &&
      abs(ref[corner] + ref[4 * nt] - 2 * ref[corner + nt]) < (1 << (bd - 5)) &&
      abs(ref[corner] + ref[0] - 2 * ref[nt]) < (1 << (bd - 5))) {
    int c = ref[corner], topend = ref[4 * nt], leftend = ref[0];
    std::vector<int32_t> out(ref, ref + R);
    for (int x = 0; x < n2 - 1; x++)
      out[corner + 1 + x] = ((63 - x) * c + (x + 1) * topend + 32) >> 6;
    for (int i = 1; i < n2; i++) {
      int y = n2 - 1 - i;
      out[i] = ((63 - y) * c + (y + 1) * leftend + 32) >> 6;
    }
    out[4 * nt] = topend; out[0] = leftend; out[corner] = c;
    memcpy(ref, out.data(), R * sizeof(int32_t));
  } else {
    std::vector<int32_t> out(ref, ref + R);
    for (int i = 1; i < R - 1; i++)
      out[i] = (ref[i - 1] + 2 * ref[i] + ref[i + 1] + 2) >> 2;
    memcpy(ref, out.data(), R * sizeof(int32_t));
  }
}

static void predict_intra(const int32_t* ref, int nt, int mode, int c_idx,
                          int bd, int32_t* dst /*nt*nt*/) {
  int n2 = 2 * nt, corner = n2;
  int maxval = (1 << bd) - 1;
  const int32_t* topp = ref + corner + 1;     // p[x][-1]
  // left: p[-1][y] = ref[n2-1-y]
  auto leftv = [&](int y) { return ref[n2 - 1 - y]; };
  int pc = ref[corner];
  int log2 = 0; while ((1 << log2) < nt) log2++;

  if (mode == 0) {  // planar
    int tr = topp[nt], bl = leftv(nt);
    for (int y = 0; y < nt; y++)
      for (int x = 0; x < nt; x++)
        dst[y * nt + x] = ((nt - 1 - x) * leftv(y) + (x + 1) * tr +
                           (nt - 1 - y) * topp[x] + (y + 1) * bl + nt) >> (log2 + 1);
    return;
  }
  if (mode == 1) {  // DC
    int sum = nt;
    for (int i = 0; i < nt; i++) sum += topp[i] + leftv(i);
    int dc = sum >> (log2 + 1);
    for (int i = 0; i < nt * nt; i++) dst[i] = dc;
    if (c_idx == 0 && nt < 32) {
      for (int x = 1; x < nt; x++) dst[x] = (topp[x] + 3 * dc + 2) >> 2;
      for (int y = 1; y < nt; y++) dst[y * nt] = (leftv(y) + 3 * dc + 2) >> 2;
      dst[0] = (leftv(0) + 2 * dc + topp[0] + 2) >> 2;
    }
    return;
  }
  int angle = kAngle[mode - 2];
  bool vertical = mode >= 18;
  std::vector<int32_t> main(2 * n2 + 8, 0);
  int base;
  if (angle < 0) {
    int inv = angle == -32 ? -256 : (int)(8192.0 / angle + (8192.0 / angle >= 0 ? 0.5 : -0.5));
    int lo = (nt * angle) >> 5;
    base = -lo;
    for (int x = lo + 1; x < 0; x++) {
      int k = ((x * inv + 128) >> 8) - 1;
      main[x - lo] = k < 0 ? pc : (vertical ? leftv(k) : topp[k]);
    }
    main[base] = pc;
    for (int i = 0; i < n2; i++)
      main[base + 1 + i] = vertical ? topp[i] : leftv(i);
  } else {
    base = 0;
    main[0] = pc;
    for (int i = 0; i < n2; i++)
      main[1 + i] = vertical ? topp[i] : leftv(i);
    main[n2 + 1] = vertical ? topp[n2 - 1] : leftv(n2 - 1);  // pad
  }
  for (int j = 1; j <= nt; j++) {
    int iidx = (j * angle) >> 5;
    int ifact = (j * angle) & 31;
    for (int i = 0; i < nt; i++) {
      int k = i + iidx + 1 + base;
      int v = ((32 - ifact) * main[k] + ifact * main[k + 1] + 16) >> 5;
      if (vertical) dst[(j - 1) * nt + i] = v;
      else dst[i * nt + (j - 1)] = v;
    }
  }
  if (c_idx == 0 && nt < 32) {
    if (mode == 26) {
      for (int y = 0; y < nt; y++)
        dst[y * nt] = clip3(0, maxval, topp[0] + ((leftv(y) - pc) >> 1));
    } else if (mode == 10) {
      for (int x = 0; x < nt; x++)
        dst[x] = clip3(0, maxval, leftv(0) + ((topp[x] - pc) >> 1));
    }
  }
}

// ---------------- transforms / quant (for the CQP path) ------------------

static const int kCC[33] = {64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78,
                            75, 73, 70, 67, 64, 61, 57, 54, 50, 46, 43, 38,
                            36, 31, 25, 22, 18, 13, 9, 4, 0};
static int cosval(int s) {
  s &= 127;
  if (s <= 32) return kCC[s];
  if (s <= 64) return -kCC[64 - s];
  if (s <= 96) return -kCC[s - 64];
  return kCC[128 - s];
}
static const int kDst4[16] = {29, 55, 74, 84, 74, 74, 0, -74,
                              84, -29, -74, 55, 55, -84, 74, -29};

static void tmatrix(int n, bool dst, int32_t* t) {
  if (dst && n == 4) { for (int i = 0; i < 16; i++) t[i] = kDst4[i]; return; }
  int stride = 32 / n;
  for (int k = 0; k < n; k++)
    for (int j = 0; j < n; j++)
      t[k * n + j] = cosval(k * (2 * j + 1) * stride);
}

// coeff = (T @ resi @ T^T) with stage shifts (HM forward scaling)
static void fwd_transform(const int32_t* resi, int n, bool dst, int bd, int32_t* coeff) {
  std::vector<int32_t> t(n * n), tmp(n * n);
  tmatrix(n, dst, t.data());
  int log2 = 0; while ((1 << log2) < n) log2++;
  int s1 = log2 + bd - 9, s2 = log2 + 6;
  // tmp[k][y] = sum_x T[k][x] * resi[y][x]  >> s1
  for (int k = 0; k < n; k++)
    for (int y = 0; y < n; y++) {
      int64_t acc = 0;
      for (int x = 0; x < n; x++) acc += (int64_t)t[k * n + x] * resi[y * n + x];
      tmp[k * n + y] = (int32_t)((acc + (1 << (s1 - 1))) >> s1);
    }
  // coeff[ky][kx] = sum_y T[ky][y] * tmp[kx][y] >> s2
  for (int ky = 0; ky < n; ky++)
    for (int kx = 0; kx < n; kx++) {
      int64_t acc = 0;
      for (int y = 0; y < n; y++) acc += (int64_t)t[ky * n + y] * tmp[kx * n + y];
      coeff[ky * n + kx] = (int32_t)((acc + (1 << (s2 - 1))) >> s2);
    }
}

static void inv_transform(const int32_t* coeff, int n, bool dst, int bd, int32_t* resi) {
  std::vector<int32_t> t(n * n), tmp(n * n);
  tmatrix(n, dst, t.data());
  int s1 = 7, s2 = 20 - bd;
  // tmp[y][kx] = sum_ky T[ky][y] * coeff[ky][kx] >> 7, clamp16
  for (int y = 0; y < n; y++)
    for (int kx = 0; kx < n; kx++) {
      int64_t acc = 0;
      for (int ky = 0; ky < n; ky++) acc += (int64_t)t[ky * n + y] * coeff[ky * n + kx];
      tmp[y * n + kx] = clip3(-32768, 32767, (int)((acc + 64) >> s1));
    }
  for (int x = 0; x < n; x++)
    for (int y = 0; y < n; y++) {
      int64_t acc = 0;
      for (int kx = 0; kx < n; kx++) acc += (int64_t)t[kx * n + x] * tmp[y * n + kx];
      resi[y * n + x] = clip3(-32768, 32767, (int)((acc + (1 << (s2 - 1))) >> s2));
    }
}

static void quantize(const int32_t* coeff, int n, int qp, int bd, int32_t* lvl) {
  int log2 = 0; while ((1 << log2) < n) log2++;
  int per = qp / 6, rem = qp % 6;
  int tr_shift = 15 - bd - log2;
  int qbits = 14 + per + tr_shift;
  int64_t offset = (int64_t)171 << (qbits - 9);   // intra rounding
  for (int i = 0; i < n * n; i++) {
    int64_t a = coeff[i] < 0 ? -(int64_t)coeff[i] : coeff[i];
    int v = (int)std::min<int64_t>((a * kQuantScale[rem] + offset) >> qbits, 32767);
    lvl[i] = coeff[i] < 0 ? -v : v;
  }
}

static void dequantize(const int32_t* lvl, int n, int qp, int bd, int32_t* out) {
  int log2 = 0; while ((1 << log2) < n) log2++;
  int per = qp / 6, rem = qp % 6;
  int bd_shift = bd + log2 - 5;
  int64_t scale = (int64_t)kDequantScale[rem] * 16;
  for (int i = 0; i < n * n; i++) {
    int64_t d = ((int64_t)lvl[i] * (scale << per)) + (1LL << (bd_shift - 1));
    out[i] = clip3(-32768, 32767, (int)(d >> bd_shift));
  }
}

// sign-bit-hiding pre-adjust (encoder choice; matches python reference)
static void sbh_adjust(int32_t* lvl, int n, const uint16_t* scan) {
  for (int cg = 0; cg < n * n; cg += 16) {
    int first = -1, last = -1;
    int64_t asum = 0;
    for (int k = 0; k < 16; k++) {
      int v = lvl[scan[cg + k]];
      if (v) {
        if (first < 0) first = k;
        last = k;
        asum += v < 0 ? -v : v;
      }
    }
    if (first < 0 || last - first <= 3) continue;
    int want = lvl[scan[cg + first]] < 0 ? 1 : 0;
    if ((asum & 1) != want) {
      int32_t& v = lvl[scan[cg + first]];
      if (v == 1) v = 2;
      else if (v == -1) v = -2;
      else v += v > 0 ? -1 : 1;
    }
  }
}

// ---------------- residual_coding --------------------------------------

static const uint16_t* scan_tab(int log2, int si) {
  switch (log2) {
    case 2: return si == 0 ? kScan4_0 : (si == 1 ? kScan4_1 : kScan4_2);
    case 3: return si == 0 ? kScan8_0 : (si == 1 ? kScan8_1 : kScan8_2);
    case 4: return kScan16_0;
    default: return kScan32_0;
  }
}
static const uint16_t* cg_scan_tab(int log2, int si) {
  switch (log2) {
    case 2: return si == 0 ? kScanCG4_0 : (si == 1 ? kScanCG4_1 : kScanCG4_2);
    case 3: return si == 0 ? kScanCG8_0 : (si == 1 ? kScanCG8_1 : kScanCG8_2);
    case 4: return kScanCG16_0;
    default: return kScanCG32_0;
  }
}

static int scan_index(int log2, int c_idx, int mode, bool is_intra) {
  if (is_intra && (log2 == 2 || (log2 == 3 && c_idx == 0))) {
    if (mode >= 6 && mode <= 14) return 2;   // vertical
    if (mode >= 22 && mode <= 30) return 1;  // horizontal
  }
  return 0;
}

static int sig_ctx(int x, int y, int log2, bool luma, int si, int prev_csbf) {
  if (log2 == 2) return kSigCtx4x4[(y << 2) + x];
  if (x + y == 0) return 0;
  int xp = x & 3, yp = y & 3, cnt;
  if (prev_csbf == 0) {
    int s = xp + yp;
    cnt = s == 0 ? 2 : (s <= 2 ? 1 : 0);
  } else if (prev_csbf == 1) {
    cnt = yp == 0 ? 2 : (yp == 1 ? 1 : 0);
  } else if (prev_csbf == 2) {
    cnt = xp == 0 ? 2 : (xp == 1 ? 1 : 0);
  } else {
    cnt = 2;
  }
  int base = ((x >> 2) + (y >> 2)) == 0 ? 0 : (luma ? 3 : 0);
  int offset = luma ? (log2 == 3 ? (si == 0 ? 9 : 15) : 21)
                    : (log2 == 3 ? 9 : 12);
  return base + offset + cnt;
}

static void encode_remain(Cabac& cab, int value, int rice) {
  if (value < (3 << rice)) {
    int length = value >> rice;
    cab.eps((1u << (length + 1)) - 2, length + 1);
    if (rice) cab.eps(value & ((1 << rice) - 1), rice);
  } else {
    int length = rice;
    value -= 3 << rice;
    while (value >= (1 << length)) { value -= 1 << length; length++; }
    int npre = 3 + length + 1 - rice;
    cab.eps((1u << npre) - 2, npre);
    cab.eps(value, length);
  }
}

static void encode_residual(Cabac& cab, const int32_t* coeff, int log2,
                            int c_idx, int si, bool sign_hiding, bool tqb) {
  int n = 1 << log2;
  bool luma = c_idx == 0;
  const uint16_t* scan = scan_tab(log2, si);
  const uint16_t* cgs = cg_scan_tab(log2, si);
  int ncoef = n * n;
  std::vector<int32_t> levels(ncoef);
  int last_scan = -1;
  for (int i = 0; i < ncoef; i++) {
    levels[i] = coeff[scan[i]];
    if (levels[i]) last_scan = i;
  }
  // last position
  int lr = scan[last_scan];
  int lx = lr % n, ly = lr / n;
  if (si == 2) std::swap(lx, ly);
  {
    int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
    int offset = luma ? 3 * (log2 - 2) + ((log2 - 1) >> 2) : 0;
    int shift = luma ? (log2 + 1) >> 2 : log2 - 2;
    int cmax = (log2 << 1) - 1;
    int ox = luma ? CTX_LAST_X_LUMA : CTX_LAST_X_CHROMA;
    int oy = luma ? CTX_LAST_Y_LUMA : CTX_LAST_Y_CHROMA;
    for (int i = 0; i < gx; i++) cab.bin(ox + offset + (i >> shift), 1);
    if (gx < cmax) cab.bin(ox + offset + (gx >> shift), 0);
    for (int i = 0; i < gy; i++) cab.bin(oy + offset + (i >> shift), 1);
    if (gy < cmax) cab.bin(oy + offset + (gy >> shift), 0);
    if (gx > 3) cab.eps(lx - kMinInGroup[gx], (gx >> 1) - 1);
    if (gy > 3) cab.eps(ly - kMinInGroup[gy], (gy >> 1) - 1);
  }
  int ng = n >> 2 ? n >> 2 : 1;
  int num_cgs = (last_scan >> 4) + 1;
  std::vector<uint8_t> csbf(ng * ng, 0);
  for (int ci = 0; ci < num_cgs; ci++) {
    for (int k = 0; k < 16; k++)
      if (levels[(ci << 4) + k]) { csbf[cgs[ci]] = 1; break; }
  }
  int c1 = 1;
  int csbf_base = luma ? CTX_CSBF_LUMA : CTX_CSBF_CHROMA;
  int sig_base = luma ? CTX_SIG_LUMA : CTX_SIG_CHROMA;
  int g1_base = luma ? CTX_GT1_LUMA : CTX_GT1_CHROMA;
  int g2_base = luma ? CTX_GT2_LUMA : CTX_GT2_CHROMA;
  for (int ci = num_cgs - 1; ci >= 0; ci--) {
    int cgr = cgs[ci];
    int cgx = cgr % ng, cgy = cgr / ng;
    int right = cgx + 1 < ng ? csbf[cgy * ng + cgx + 1] : 0;
    int below = cgy + 1 < ng ? csbf[(cgy + 1) * ng + cgx] : 0;
    bool is_last = ci == num_cgs - 1;
    bool infer_dc = false;
    if (is_last || ci == 0) {
      csbf[cgr] = 1;
    } else {
      cab.bin(csbf_base + ((right || below) ? 1 : 0), csbf[cgr]);
      infer_dc = csbf[cgr] != 0;
    }
    if (!csbf[cgr]) continue;
    int start = is_last ? (last_scan & 15) - 1 : 15;
    int sig_pos[16], nsig = 0;
    if (is_last) sig_pos[nsig++] = last_scan & 15;
    int prev_csbf = right + 2 * below;
    for (int k = start; k >= 0; k--) {
      if (k == 0 && infer_dc && nsig == 0) { sig_pos[nsig++] = 0; break; }
      int r = scan[(ci << 4) + k];
      int x = r % n, y = r / n;
      int sig = levels[(ci << 4) + k] != 0;
      cab.bin(sig_base + sig_ctx(x, y, log2, luma, si, prev_csbf), sig);
      if (sig) sig_pos[nsig++] = k;
    }
    // sort positions descending (they already are, by construction)
    int nnz = nsig;
    int abs_vals[16], signs[16];
    for (int i = 0; i < nnz; i++) {
      int v = levels[(ci << 4) + sig_pos[i]];
      abs_vals[i] = v < 0 ? -v : v;
      signs[i] = v < 0 ? 1 : 0;
    }
    int ctx_set = ((ci > 0 && luma) ? 2 : 0) + (c1 == 0 ? 1 : 0);
    c1 = 1;
    int num_c1 = std::min(nnz, 8);
    int first_g2 = -1;
    for (int i = 0; i < num_c1; i++) {
      int sym = abs_vals[i] > 1;
      cab.bin(g1_base + 4 * ctx_set + c1, sym);
      if (sym) {
        c1 = 0;
        if (first_g2 < 0) first_g2 = i;
      } else if (c1 > 0 && c1 < 3) {
        c1++;
      }
    }
    if (first_g2 >= 0) cab.bin(g2_base + ctx_set, abs_vals[first_g2] > 2);
    if (nnz == 0) { c1 = 1; continue; }
    bool hidden = sign_hiding && !tqb &&
                  sig_pos[0] - sig_pos[nnz - 1] > 3;
    int n_signs = hidden ? nnz - 1 : nnz;
    for (int i = 0; i < n_signs; i++) cab.ep(signs[i]);
    int rice = 0;
    for (int i = 0; i < nnz; i++) {
      int base = i < 8 ? (i == first_g2 ? 3 : 2) : 1;
      if (abs_vals[i] >= base) encode_remain(cab, abs_vals[i] - base, rice);
      if (abs_vals[i] > (3 << rice)) rice = std::min(rice + 1, 4);
    }
  }
}

// ---------------- frame walker ------------------------------------------

struct Writer {
  // picture geometry / params
  int width, height, ctb_log2, min_cb_log2;
  int qp, bd;
  bool lossless, sign_hiding, strong_smooth;
  int cb_qp_off, cr_qp_off;
  // planes (int16 working recon)
  std::vector<int16_t> y, cb, cr;
  const uint8_t *src_y, *src_cb, *src_cr;
  // maps
  const int32_t *cu_log2_map, *luma_mode8, *chroma_mode8;
  int w8;
  // state
  std::vector<uint8_t> avail4, isintra4;
  std::vector<int16_t> mode4;
  std::vector<uint8_t> depth4;
  int w4, h4;
  Cabac cab;

  int chroma_qp(int qpy, int off) const {
    int q = clip3(0, 57, qpy + off);
    return kChromaQp[q];
  }

  void run() {
    int cw = width >> 1, ch = height >> 1;
    y.assign(width * height, 0);
    cb.assign(cw * ch, 0);
    cr.assign(cw * ch, 0);
    w4 = (width + 3) >> 2; h4 = (height + 3) >> 2;
    avail4.assign(w4 * h4, 0);
    isintra4.assign(w4 * h4, 0);
    mode4.assign(w4 * h4, -1);
    depth4.assign(w4 * h4, 0);
    cab.init_slice(0, qp);

    int ctb = 1 << ctb_log2;
    int wc = (width + ctb - 1) / ctb, hc = (height + ctb - 1) / ctb;
    int n_ctbs = wc * hc;
    for (int addr = 0; addr < n_ctbs; addr++) {
      int x0 = (addr % wc) * ctb, y0 = (addr / wc) * ctb;
      quadtree(x0, y0, ctb_log2, 0);
      cab.trm(addr == n_ctbs - 1 ? 1 : 0);
    }
    cab.finish();
  }

  void quadtree(int x0, int y0, int log2_cb, int depth) {
    int size = 1 << log2_cb;
    bool inside = x0 + size <= width && y0 + size <= height;
    bool split;
    if (inside && log2_cb > min_cb_log2) {
      int ctxi = 0;
      if (x0 > 0 && avail4[(y0 >> 2) * w4 + ((x0 - 1) >> 2)])
        ctxi += depth4[(y0 >> 2) * w4 + ((x0 - 1) >> 2)] > depth;
      if (y0 > 0 && avail4[((y0 - 1) >> 2) * w4 + (x0 >> 2)])
        ctxi += depth4[((y0 - 1) >> 2) * w4 + (x0 >> 2)] > depth;
      split = cu_log2_map[(y0 >> 3) * w8 + (x0 >> 3)] < log2_cb;
      cab.bin(CTX_SPLIT_CU + ctxi, split);
    } else {
      split = log2_cb > min_cb_log2;
    }
    if (split) {
      int half = size >> 1;
      static const int off[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
      for (auto& o : off) {
        int x1 = x0 + o[0] * half, y1 = y0 + o[1] * half;
        if (x1 < width && y1 < height) quadtree(x1, y1, log2_cb - 1, depth + 1);
      }
    } else {
      coding_unit(x0, y0, log2_cb, depth);
    }
  }

  void mpm(int xpb, int ypb, int* cands) const {
    auto nb = [&](int x, int yy) -> int {
      if (x < 0 || yy < 0) return 1;
      int idx = (yy >> 2) * w4 + (x >> 2);
      if (!avail4[idx] || !isintra4[idx]) return 1;
      return mode4[idx];
    };
    int a = nb(xpb - 1, ypb);
    int b = (ypb % (1 << ctb_log2)) == 0 ? 1 : nb(xpb, ypb - 1);
    if (a == b) {
      if (a < 2) { cands[0] = 0; cands[1] = 1; cands[2] = 26; }
      else {
        cands[0] = a;
        cands[1] = 2 + ((a + 29) % 32);
        cands[2] = 2 + ((a - 2 + 1) % 32);
      }
    } else {
      cands[0] = a; cands[1] = b;
      if (a != 0 && b != 0) cands[2] = 0;
      else if (a != 1 && b != 1) cands[2] = 1;
      else cands[2] = 26;
    }
  }

  void coding_unit(int x0, int y0, int log2_cb, int depth) {
    int size = 1 << log2_cb;
    // cu_transquant_bypass_flag present iff PPS bypass enabled
    // (our PPS enables it exactly when the encode is lossless)
    if (lossless) cab.bin(CTX_CU_TRANSQUANT_BYPASS, 1);
    if (log2_cb == min_cb_log2) cab.bin(CTX_PART_MODE, 1);  // 2Nx2N

    int mode = luma_mode8[(y0 >> 3) * w8 + (x0 >> 3)];
    int cands[3];
    mpm(x0, y0, cands);
    int idx = -1;
    for (int i = 0; i < 3; i++)
      if (cands[i] == mode) idx = i;
    if (idx >= 0) {
      cab.bin(CTX_PREV_INTRA_LUMA_PRED, 1);
      if (idx == 0) cab.ep(0);
      else { cab.ep(1); cab.ep(idx - 1); }
    } else {
      cab.bin(CTX_PREV_INTRA_LUMA_PRED, 0);
      int s[3] = {cands[0], cands[1], cands[2]};
      std::sort(s, s + 3);
      int rem = mode;
      for (int i = 2; i >= 0; i--)
        if (rem > s[i]) rem--;
      cab.eps(rem, 5);
    }
    for (int yy = y0 >> 2; yy < (y0 + size) >> 2; yy++)
      for (int xx = x0 >> 2; xx < (x0 + size) >> 2; xx++) {
        mode4[yy * w4 + xx] = (int16_t)mode;
        isintra4[yy * w4 + xx] = 1;
        depth4[yy * w4 + xx] = (uint8_t)depth;
      }

    int chroma_mode = mode;
    if (chroma_mode8) {
      int cm = chroma_mode8[(y0 >> 3) * w8 + (x0 >> 3)];
      if (cm == mode) {
        cab.bin(CTX_INTRA_CHROMA_PRED, 0);
      } else {
        int cand[4] = {0, 26, 10, 1};
        for (int i = 0; i < 4; i++)
          if (cand[i] == mode) cand[i] = 34;
        int m = 0;
        for (int i = 0; i < 4; i++)
          if (cand[i] == cm) m = i;
        cab.bin(CTX_INTRA_CHROMA_PRED, 1);
        cab.eps(m, 2);
        chroma_mode = cm;
      }
    } else {
      cab.bin(CTX_INTRA_CHROMA_PRED, 0);
    }
    transform_leaf(x0, y0, log2_cb, mode, chroma_mode);
  }

  // predict + residual/coeffs for one TB; returns cbf, fills recon
  // plane: 0=y 1=cb 2=cr
  bool tb_process(int plane, int x0, int y0, int log2, int mode,
                  int32_t* coeff_out, int32_t* resi_out) {
    int nt = 1 << log2;
    int pw = plane == 0 ? width : width >> 1;
    int ph = plane == 0 ? height : height >> 1;
    int16_t* rec = plane == 0 ? y.data() : (plane == 1 ? cb.data() : cr.data());
    const uint8_t* src = plane == 0 ? src_y : (plane == 1 ? src_cb : src_cr);
    std::vector<int32_t> ref(4 * nt + 1), pred(nt * nt);
    if (plane == 0) {
      get_ref_samples(rec, pw, pw, ph, avail4.data(), w4, x0, y0, nt, bd, ref.data());
      filter_refs(ref.data(), nt, mode, strong_smooth, bd);
      predict_intra(ref.data(), nt, mode, 0, bd, pred.data());
    } else {
      // chroma availability: sample luma avail map at (2x, 2y)
      // build a local chroma avail view on the fly in get_ref via trick:
      // use a lambda-free variant: temporary avail array at chroma 4x4 grid
      int cw4 = (pw + 3) >> 2, chh4 = (ph + 3) >> 2;
      std::vector<uint8_t> ca(cw4 * chh4);
      for (int j = 0; j < chh4; j++)
        for (int i = 0; i < cw4; i++) {
          int ly = std::min(j * 2, h4 - 1), lx = std::min(i * 2, w4 - 1);
          ca[j * cw4 + i] = avail4[ly * w4 + lx];
        }
      get_ref_samples(rec, pw, pw, ph, ca.data(), cw4, x0, y0, nt, bd, ref.data());
      predict_intra(ref.data(), nt, mode, 1, bd, pred.data());
    }
    std::vector<int32_t> resi(nt * nt);
    bool any = false;
    for (int j = 0; j < nt; j++)
      for (int i = 0; i < nt; i++) {
        resi[j * nt + i] = src[(y0 + j) * pw + (x0 + i)] - pred[j * nt + i];
        if (resi[j * nt + i]) any = true;
      }
    int maxv = (1 << bd) - 1;
    if (lossless) {
      memcpy(coeff_out, resi.data(), nt * nt * sizeof(int32_t));
      for (int j = 0; j < nt; j++)
        for (int i = 0; i < nt; i++)
          rec[(y0 + j) * pw + (x0 + i)] =
              (int16_t)clip3(0, maxv, pred[j * nt + i] + resi[j * nt + i]);
      return any;
    }
    int qpc = plane == 0 ? qp : chroma_qp(qp, plane == 1 ? cb_qp_off : cr_qp_off);
    bool use_dst = plane == 0 && log2 == 2;
    std::vector<int32_t> cf(nt * nt), lvl(nt * nt);
    fwd_transform(resi.data(), nt, use_dst, bd, cf.data());
    quantize(cf.data(), nt, qpc, bd, lvl.data());
    bool nz = false;
    for (int i = 0; i < nt * nt; i++) if (lvl[i]) { nz = true; break; }
    if (nz && sign_hiding) {
      int si = scan_index(log2, plane == 0 ? 0 : 1, mode, true);
      sbh_adjust(lvl.data(), nt, scan_tab(log2, si));
      nz = false;
      for (int i = 0; i < nt * nt; i++) if (lvl[i]) { nz = true; break; }
    }
    std::vector<int32_t> rres(nt * nt, 0);
    if (nz) {
      std::vector<int32_t> deq(nt * nt);
      dequantize(lvl.data(), nt, qpc, bd, deq.data());
      inv_transform(deq.data(), nt, use_dst, bd, rres.data());
    }
    memcpy(coeff_out, lvl.data(), nt * nt * sizeof(int32_t));
    for (int j = 0; j < nt; j++)
      for (int i = 0; i < nt; i++)
        rec[(y0 + j) * pw + (x0 + i)] =
            (int16_t)clip3(0, maxv, pred[j * nt + i] + rres[j * nt + i]);
    return nz;
  }

  void transform_leaf(int x0, int y0, int log2_tb, int mode, int chroma_mode) {
    int nt = 1 << log2_tb;
    std::vector<int32_t> ycf(nt * nt), ccf((nt / 2) * (nt / 2)), rcf((nt / 2) * (nt / 2));
    std::vector<int32_t> dummy;
    // chroma first (cbf_cb/cr precede cbf_luma), matching python writer order
    bool cbf_cb = tb_process(1, x0 >> 1, y0 >> 1, log2_tb - 1, chroma_mode,
                             ccf.data(), nullptr);
    bool cbf_cr = tb_process(2, x0 >> 1, y0 >> 1, log2_tb - 1, chroma_mode,
                             rcf.data(), nullptr);
    bool cbf_y = tb_process(0, x0, y0, log2_tb, mode, ycf.data(), nullptr);
    // NOTE: tb_process also reconstructed; chroma recon done before luma is
    // fine (no cross-plane dependency; see python writer commentary)
    cab.bin(CTX_CBF_CHROMA + 0, cbf_cb);
    cab.bin(CTX_CBF_CHROMA + 0, cbf_cr);
    cab.bin(CTX_CBF_LUMA + 1, cbf_y);
    if (cbf_y) {
      int si = scan_index(log2_tb, 0, mode, true);
      encode_residual(cab, ycf.data(), log2_tb, 0, si, sign_hiding, lossless);
    }
    if (cbf_cb) {
      int si = scan_index(log2_tb - 1, 1, chroma_mode, true);
      encode_residual(cab, ccf.data(), log2_tb - 1, 1, si, sign_hiding, lossless);
    }
    if (cbf_cr) {
      int si = scan_index(log2_tb - 1, 2, chroma_mode, true);
      encode_residual(cab, rcf.data(), log2_tb - 1, 2, si, sign_hiding, lossless);
    }
    for (int yy = y0 >> 2; yy < (y0 + nt) >> 2; yy++)
      for (int xx = x0 >> 2; xx < (x0 + nt) >> 2; xx++)
        avail4[yy * w4 + xx] = 1;
  }
};

}  // namespace

extern "C" {

// returns number of slice-data bytes written to out, or -1 on error
int encode_slice_intra(const uint8_t* src_y, const uint8_t* src_cb,
                       const uint8_t* src_cr, int width, int height,
                       const int32_t* cu_log2_map, const int32_t* luma_mode8,
                       const int32_t* chroma_mode8,  // may be NULL => DM
                       int ctb_log2, int min_cb_log2, int slice_qp,
                       int lossless, int sign_hiding, int strong_smooth,
                       int cb_qp_off, int cr_qp_off,
                       uint8_t* out, int out_cap,
                       int16_t* rec_y, int16_t* rec_cb, int16_t* rec_cr) {
  Writer w;
  w.width = width; w.height = height;
  w.ctb_log2 = ctb_log2; w.min_cb_log2 = min_cb_log2;
  w.qp = slice_qp; w.bd = 8;
  w.lossless = lossless != 0;
  w.sign_hiding = sign_hiding != 0;
  w.strong_smooth = strong_smooth != 0;
  w.cb_qp_off = cb_qp_off; w.cr_qp_off = cr_qp_off;
  w.src_y = src_y; w.src_cb = src_cb; w.src_cr = src_cr;
  w.cu_log2_map = cu_log2_map; w.luma_mode8 = luma_mode8;
  w.chroma_mode8 = chroma_mode8;
  w.w8 = width >> 3;
  w.run();
  if ((int)w.cab.out.size() > out_cap) return -1;
  memcpy(out, w.cab.out.data(), w.cab.out.size());
  if (rec_y) memcpy(rec_y, w.y.data(), w.y.size() * sizeof(int16_t));
  if (rec_cb) memcpy(rec_cb, w.cb.data(), w.cb.size() * sizeof(int16_t));
  if (rec_cr) memcpy(rec_cr, w.cr.data(), w.cr.size() * sizeof(int16_t));
  return (int)w.cab.out.size();
}

// recon export for the closed loop (optional; call right after encode)
// -- omitted: recon is recomputed identically by the python reference when
//    needed; a get_recon API can be added with a persistent handle later.

}  // extern "C"

extern "C" {
// debug: transform+quant one block, return levels (for differential tests)
int debug_tq(const int32_t* resi, int n, int qp, int use_dst, int32_t* lvl_out) {
  std::vector<int32_t> cf(n * n);
  fwd_transform(resi, n, use_dst != 0, 8, cf.data());
  quantize(cf.data(), n, qp, 8, lvl_out);
  return 0;
}
}

extern "C" {
int debug_itq(const int32_t* lvl, int n, int qp, int use_dst, int32_t* resi_out) {
  std::vector<int32_t> deq(n * n);
  dequantize(lvl, n, qp, 8, deq.data());
  inv_transform(deq.data(), n, use_dst != 0, 8, resi_out);
  return 0;
}
int debug_pred(const int32_t* ref, int nt, int mode, int c_idx, int strong,
               int32_t* dst) {
  std::vector<int32_t> r(ref, ref + 4 * nt + 1);
  if (c_idx == 0) filter_refs(r.data(), nt, mode, strong != 0, 8);
  predict_intra(r.data(), nt, mode, c_idx, 8, dst);
  return 0;
}
}
