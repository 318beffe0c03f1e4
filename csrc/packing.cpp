// Native host-side int4 packing / repacking kernels.
//
// These are the hot host loops when loading or saving multi-GB checkpoints:
// AutoAWQ-order <-> TPU planar layout conversion touches every nibble of
// every weight tensor. The numpy implementations in core/packing.py allocate
// several full-size temporaries per conversion; these single-pass C++ loops
// are both faster and allocation-free. Loaded via ctypes
// (autoawq_tpu/core/native.py) with the numpy path as fallback and oracle.
//
// Layout contract (must match core/packing.py exactly):
//  * planar (row-paired): out int32 [ceil(R/2), N_pad/4]; nibble (p + 4h)
//    of word (rp, b*L + c) = q4[2rp + h, b*4L + p*L + c], L = lane_block.
//  * AutoAWQ GEMM: out int32 [K, N/8]; nibble i of word (k, j) =
//    q4[k, 8j + AWQ_ORDER[i]], AWQ_ORDER = {0,2,4,6,1,3,5,7}.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

static const int AWQ_ORDER[8] = {0, 2, 4, 6, 1, 3, 5, 7};

static inline int64_t lane_block(int64_t n_pad) {
    if (n_pad >= 1024 && n_pad % 1024 == 0) return 256;
    return n_pad / 4;
}

// q4: int32 [r, n] (low nibble used); out: int32 [(r+1)/2, n_pad/4]
// zero-filled by the caller. Padded columns stay 0.
void pack_planar(const int32_t* q4, int64_t r, int64_t n, int64_t n_pad,
                 int32_t* out) {
    const int64_t lb = lane_block(n_pad);
    const int64_t n4 = n_pad / 4;
    const int64_t r2 = (r + 1) / 2;
    const int64_t nb = n_pad / (4 * lb);  // superblocks
    for (int64_t rp = 0; rp < r2; ++rp) {
        int32_t* dst_row = out + rp * n4;
        for (int h = 0; h < 2; ++h) {
            const int64_t row = 2 * rp + h;
            if (row >= r) continue;
            const int32_t* src_row = q4 + row * n;
            for (int64_t b = 0; b < nb; ++b) {
                int32_t* dst = dst_row + b * lb;
                for (int p = 0; p < 4; ++p) {
                    const int64_t col0 = b * 4 * lb + p * lb;
                    const int64_t cmax =
                        std::max<int64_t>(0, std::min(lb, n - col0));
                    const int shift = 4 * p + 16 * h;
                    const int32_t* src = src_row + col0;
                    for (int64_t c = 0; c < cmax; ++c) {
                        dst[c] |= (int32_t)(src[c] & 0xF) << shift;
                    }
                }
            }
        }
    }
}

// packed: int32 [r2, n4]; out: int8 [rows, n] (caller sizes rows <= 2*r2).
void unpack_planar(const int32_t* packed, int64_t r2, int64_t n4,
                   int64_t rows, int64_t n, int8_t* out) {
    const int64_t n_pad = 4 * n4;
    const int64_t lb = lane_block(n_pad);
    const int64_t nb = n_pad / (4 * lb);
    for (int64_t rp = 0; rp < r2; ++rp) {
        const uint32_t* src_row = (const uint32_t*)(packed + rp * n4);
        for (int h = 0; h < 2; ++h) {
            const int64_t row = 2 * rp + h;
            if (row >= rows) continue;
            int8_t* dst_row = out + row * n;
            for (int64_t b = 0; b < nb; ++b) {
                const uint32_t* src = src_row + b * lb;
                for (int p = 0; p < 4; ++p) {
                    const int64_t col0 = b * 4 * lb + p * lb;
                    const int64_t cmax =
                        std::max<int64_t>(0, std::min(lb, n - col0));
                    const int shift = 4 * p + 16 * h;
                    int8_t* dst = dst_row + col0;
                    for (int64_t c = 0; c < cmax; ++c) {
                        dst[c] = (int8_t)((src[c] >> shift) & 0xF);
                    }
                }
            }
        }
    }
}

// q4: int32 [k, n] (n % 8 == 0, low nibble used); out: int32 [k, n/8].
void pack_awq(const int32_t* q4, int64_t k, int64_t n, int32_t* out) {
    const int64_t n8 = n / 8;
    for (int64_t row = 0; row < k; ++row) {
        const int32_t* src = q4 + row * n;
        int32_t* dst = out + row * n8;
        for (int64_t j = 0; j < n8; ++j) {
            const int32_t* s = src + 8 * j;
            uint32_t w = (uint32_t)(s[0] & 0xF);
            w |= (uint32_t)(s[2] & 0xF) << 4;
            w |= (uint32_t)(s[4] & 0xF) << 8;
            w |= (uint32_t)(s[6] & 0xF) << 12;
            w |= (uint32_t)(s[1] & 0xF) << 16;
            w |= (uint32_t)(s[3] & 0xF) << 20;
            w |= (uint32_t)(s[5] & 0xF) << 24;
            w |= (uint32_t)(s[7] & 0xF) << 28;
            dst[j] = (int32_t)w;
        }
    }
}

// packed: int32 [k, n8]; out: int8 [k, n] with n <= 8*n8.
void unpack_awq(const int32_t* packed, int64_t k, int64_t n8, int64_t n,
                int8_t* out) {
    for (int64_t row = 0; row < k; ++row) {
        const uint32_t* src = (const uint32_t*)(packed + row * n8);
        int8_t* dst = out + row * n;
        const int64_t jfull = n / 8;
        for (int64_t j = 0; j < jfull; ++j) {
            const uint32_t w = src[j];
            int8_t* d = dst + 8 * j;
            d[0] = (int8_t)(w & 0xF);
            d[2] = (int8_t)((w >> 4) & 0xF);
            d[4] = (int8_t)((w >> 8) & 0xF);
            d[6] = (int8_t)((w >> 12) & 0xF);
            d[1] = (int8_t)((w >> 16) & 0xF);
            d[3] = (int8_t)((w >> 20) & 0xF);
            d[5] = (int8_t)((w >> 24) & 0xF);
            d[7] = (int8_t)((w >> 28) & 0xF);
        }
        for (int64_t col = jfull * 8; col < n; ++col) {
            const uint32_t w = src[col / 8];
            static const int INV[8] = {0, 4, 1, 5, 2, 6, 3, 7};
            dst[col] = (int8_t)((w >> (4 * INV[col % 8])) & 0xF);
        }
    }
}

// Fused AutoAWQ -> planar repack without the int8 intermediate in Python:
// awq int32 [k, n/8] -> planar int32 [(k+1)/2, n_pad/4].
void awq_to_planar(const int32_t* awq, int64_t k, int64_t n, int64_t n_pad,
                   int32_t* out) {
    const int64_t n8 = n / 8;
    const int64_t lb = lane_block(n_pad);
    const int64_t n4 = n_pad / 4;
    static const int INV[8] = {0, 4, 1, 5, 2, 6, 3, 7};  // col%8 -> nibble
    for (int64_t row = 0; row < k; ++row) {
        const uint32_t* src = (const uint32_t*)(awq + row * n8);
        const int64_t rp = row / 2;
        const int hshift = 16 * (int)(row % 2);
        int32_t* dst_row = out + rp * n4;
        const int64_t nb = n_pad / (4 * lb);
        for (int64_t b = 0; b < nb; ++b) {
            int32_t* dst = dst_row + b * lb;
            for (int p = 0; p < 4; ++p) {
                const int64_t col0 = b * 4 * lb + p * lb;
                const int64_t cmax =
                    std::max<int64_t>(0, std::min(lb, n - col0));
                const int shift = 4 * p + hshift;
                for (int64_t c = 0; c < cmax; ++c) {
                    const int64_t col = col0 + c;
                    const uint32_t w = src[col >> 3];
                    const uint32_t nib = (w >> (4 * INV[col & 7])) & 0xF;
                    dst[c] |= (int32_t)(nib << shift);
                }
            }
        }
    }
}

}  // extern "C"
