// Native data plane for the IMC2021 HDF5 scene feed.
//
// The reference's host data path runs inside torch DataLoader worker
// processes (native decode via PIL's C modules; train_imc.py:503). This is
// the framework's native equivalent: JPEG/PNG16 decode, PIL-semantics
// pad-square + bicubic resize, and certainty-weighted correspondence
// sampling with grid_sample-bilinear depth lookup — all exposed through a
// C ABI consumed via ctypes (native/dataplane.py). Every entry point is
// GIL-free by construction, so the python wrapper parallelises scene loads
// with an ordinary thread pool.
//
// Semantics mirrored (and golden-tested) against:
//   self_supervise_sfm_tpu/data/preprocess.py  (itself mirroring
//   train/utils/io.py:75-360 of the reference)
//
// Build: g++ -O3 -shared -fPIC -o libdataplane.so dataplane.cpp -ljpeg -lpng -lz

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg — the same decoder PIL links, so output is identical)
// ---------------------------------------------------------------------------

struct dp_jpeg_err {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void dp_jpeg_abort(j_common_ptr cinfo) {
    dp_jpeg_err* e = reinterpret_cast<dp_jpeg_err*>(cinfo->err);
    longjmp(e->jb, 1);
}

int dp_jpeg_info(const unsigned char* buf, size_t n, int* w, int* h) {
    jpeg_decompress_struct cinfo;
    dp_jpeg_err jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = dp_jpeg_abort;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), n);
    jpeg_read_header(&cinfo, TRUE);
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// out: h*w*3 RGB u8 (grayscale sources are expanded).
int dp_jpeg_decode(const unsigned char* buf, size_t n, unsigned char* out) {
    jpeg_decompress_struct cinfo;
    dp_jpeg_err jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = dp_jpeg_abort;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), n);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = cinfo.output_width;
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row = out + size_t(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// ---------------------------------------------------------------------------
// 16-bit grayscale PNG decode (libpng)
// ---------------------------------------------------------------------------

struct dp_png_reader {
    const unsigned char* buf;
    size_t n;
    size_t pos;
};

static void dp_png_read(png_structp png, png_bytep out, png_size_t count) {
    dp_png_reader* r = static_cast<dp_png_reader*>(png_get_io_ptr(png));
    if (r->pos + count > r->n) {
        png_error(png, "read past end");
        return;
    }
    std::memcpy(out, r->buf + r->pos, count);
    r->pos += count;
}

int dp_png16_info(const unsigned char* buf, size_t n, int* w, int* h) {
    if (n < 8 || png_sig_cmp(buf, 0, 8)) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -1;
    }
    dp_png_reader r{buf, n, 0};
    png_set_read_fn(png, &r, dp_png_read);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
}

// out: h*w uint16 (native endianness).
int dp_png16_decode(const unsigned char* buf, size_t n, uint16_t* out) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -1;
    }
    dp_png_reader r{buf, n, 0};
    png_set_read_fn(png, &r, dp_png_read);
    png_read_info(png, info);
    const int w = png_get_image_width(png, info);
    const int h = png_get_image_height(png, info);
    const int depth = png_get_bit_depth(png, info);
    const int color = png_get_color_type(png, info);
    if (color != PNG_COLOR_TYPE_GRAY) {
        png_destroy_read_struct(&png, &info, nullptr);
        return -2;
    }
    if (depth == 16) {
        const uint16_t one = 1;
        if (*reinterpret_cast<const uint8_t*>(&one))  // little-endian host
            png_set_swap(png);
    }
    png_read_update_info(png, info);
    std::vector<png_bytep> rows(h);
    std::vector<uint8_t> tmp;
    if (depth == 16) {
        for (int y = 0; y < h; y++)
            rows[y] = reinterpret_cast<png_bytep>(out + size_t(y) * w);
        png_read_image(png, rows.data());
    } else {  // 8-bit gray: widen
        tmp.resize(size_t(h) * w);
        for (int y = 0; y < h; y++) rows[y] = tmp.data() + size_t(y) * w;
        png_read_image(png, rows.data());
        for (size_t i = 0; i < tmp.size(); i++) out[i] = tmp[i];
    }
    png_destroy_read_struct(&png, &info, nullptr);
    // plain 0 on success: packing (h << 16) | w would set the sign bit for
    // h >= 32768 and trip callers' `< 0` error checks on valid tall images
    return 0;
}

// ---------------------------------------------------------------------------
// Pillow-semantics bicubic resize (Resampling.BICUBIC)
//
// Matches Pillow's ImagingResample: per-axis separable filtering with the
// a=-0.5 cubic kernel, support scaled by the downscale factor (antialias),
// double-precision coefficients normalised per output pixel. Pillow's u8
// path quantises coefficients to 1<<22 fixed point; we compute in double and
// round identically at the end — golden tests allow |err| <= 1 LSB.
// ---------------------------------------------------------------------------

static double dp_cubic(double x) {
    // Pillow bicubic_filter, a = -0.5
    const double a = -0.5;
    if (x < 0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

struct dp_coeffs {
    std::vector<int> bounds;     // (xmin, size) per output pixel
    std::vector<double> kk;      // ksize coefficients per output pixel
    int ksize;
};

static dp_coeffs dp_precompute(int in_size, int out_size) {
    const double support_base = 2.0;  // bicubic
    dp_coeffs c;
    double scale = double(in_size) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = support_base * filterscale;
    c.ksize = int(std::ceil(support)) * 2 + 1;
    c.bounds.resize(2 * out_size);
    c.kk.assign(size_t(c.ksize) * out_size, 0.0);
    for (int xx = 0; xx < out_size; xx++) {
        double center = (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = int(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = int(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double* k = &c.kk[size_t(xx) * c.ksize];
        for (int x = 0; x < xmax; x++) {
            double w = dp_cubic((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        for (int x = 0; x < xmax; x++)
            if (ww != 0.0) k[x] /= ww;
        c.bounds[xx * 2 + 0] = xmin;
        c.bounds[xx * 2 + 1] = xmax;
    }
    return c;
}

// Pillow 8bpc path: coefficients quantised to 1<<22 fixed point, u8 clip
// after EACH pass (ImagingResampleHorizontal/Vertical_8bpc) — bit-identical
// to PIL's Image.resize on uint8 images.
static const int DP_PRECISION_BITS = 32 - 8 - 2;

static std::vector<int32_t> dp_quantize(const dp_coeffs& c, int out_size) {
    std::vector<int32_t> k(size_t(c.ksize) * out_size);
    for (size_t i = 0; i < k.size(); i++) {
        double w = c.kk[i] * (1 << DP_PRECISION_BITS);
        k[i] = int32_t(w < 0 ? w - 0.5 : w + 0.5);
    }
    return k;
}

static inline uint8_t dp_clip8(int64_t ss) {
    ss >>= DP_PRECISION_BITS;
    if (ss < 0) return 0;
    if (ss > 255) return 255;
    return uint8_t(ss);
}

static void dp_resize_u8(const uint8_t* in, int w_in, int h_in, int ch,
                         uint8_t* out, int w_out, int h_out) {
    dp_coeffs cx = dp_precompute(w_in, w_out);
    dp_coeffs cy = dp_precompute(h_in, h_out);
    std::vector<int32_t> kx = dp_quantize(cx, w_out);
    std::vector<int32_t> ky = dp_quantize(cy, h_out);
    std::vector<uint8_t> mid(size_t(h_in) * w_out * ch);
    const int64_t half = int64_t(1) << (DP_PRECISION_BITS - 1);
    for (int y = 0; y < h_in; y++) {
        const uint8_t* row = in + size_t(y) * w_in * ch;
        uint8_t* orow = mid.data() + size_t(y) * w_out * ch;
        for (int xx = 0; xx < w_out; xx++) {
            int xmin = cx.bounds[xx * 2], xmax = cx.bounds[xx * 2 + 1];
            const int32_t* k = &kx[size_t(xx) * cx.ksize];
            for (int c = 0; c < ch; c++) {
                int64_t ss = half;
                for (int x = 0; x < xmax; x++)
                    ss += int64_t(row[(size_t(x) + xmin) * ch + c]) * k[x];
                orow[size_t(xx) * ch + c] = dp_clip8(ss);
            }
        }
    }
    for (int yy = 0; yy < h_out; yy++) {
        int ymin = cy.bounds[yy * 2], ymax = cy.bounds[yy * 2 + 1];
        const int32_t* k = &ky[size_t(yy) * cy.ksize];
        uint8_t* orow = out + size_t(yy) * w_out * ch;
        for (int xx = 0; xx < w_out * ch; xx++) {
            int64_t ss = half;
            for (int y = 0; y < ymax; y++)
                ss += int64_t(mid[size_t(y + ymin) * w_out * ch + xx]) * k[y];
            orow[xx] = dp_clip8(ss);
        }
    }
}

// Pillow I;16 path (modern Pillow opens 16-bit gray PNGs as mode I;16):
// double coefficients, rounded and CLAMPED to [0, 65535] after EACH pass
// (filter ringing at dark/bright edges saturates, matching PIL output).
static void dp_resize_i32(const int32_t* in, int w_in, int h_in,
                          int32_t* out, int w_out, int h_out) {
    dp_coeffs cx = dp_precompute(w_in, w_out);
    dp_coeffs cy = dp_precompute(h_in, h_out);
    std::vector<int32_t> mid(size_t(h_in) * w_out);
    auto round_up = [](double d) {
        int32_t v = int32_t(d >= 0.0 ? d + 0.5 : d - 0.5);
        if (v < 0) v = 0;
        if (v > 65535) v = 65535;
        return v;
    };
    for (int y = 0; y < h_in; y++) {
        const int32_t* row = in + size_t(y) * w_in;
        int32_t* orow = mid.data() + size_t(y) * w_out;
        for (int xx = 0; xx < w_out; xx++) {
            int xmin = cx.bounds[xx * 2], xmax = cx.bounds[xx * 2 + 1];
            const double* k = &cx.kk[size_t(xx) * cx.ksize];
            double ss = 0.0;
            for (int x = 0; x < xmax; x++)
                ss += double(row[size_t(x) + xmin]) * k[x];
            orow[xx] = round_up(ss);
        }
    }
    for (int yy = 0; yy < h_out; yy++) {
        int ymin = cy.bounds[yy * 2], ymax = cy.bounds[yy * 2 + 1];
        const double* k = &cy.kk[size_t(yy) * cy.ksize];
        int32_t* orow = out + size_t(yy) * w_out;
        for (int xx = 0; xx < w_out; xx++) {
            double ss = 0.0;
            for (int y = 0; y < ymax; y++)
                ss += double(mid[size_t(y + ymin) * w_out + xx]) * k[y];
            orow[xx] = round_up(ss);
        }
    }
}

static void dp_recovery(int w, int h, int target, float* k2kp, float* kp2k) {
    int max_side = w > h ? w : h;
    int pad_left = (max_side - w) / 2;
    int pad_top = (max_side - h) / 2;
    double scale = double(target) / max_side;
    double ox = pad_left * scale, oy = pad_top * scale;
    float a[9] = {float(scale), 0, float(ox), 0, float(scale), float(oy), 0, 0, 1};
    float b[9] = {float(1 / scale), 0, float(-ox / scale),
                  0, float(1 / scale), float(-oy / scale), 0, 0, 1};
    std::memcpy(k2kp, a, sizeof a);
    std::memcpy(kp2k, b, sizeof b);
}

// JPEG bytes -> (target, target, 3) float32 in [0,1] + 3x3 recovery mats.
// Pad-to-square (centre, zeros) then bicubic to target (preprocess.py:50-73).
int dp_preprocess_rgb(const unsigned char* buf, size_t n, int target,
                      float* out, float* k2kp, float* kp2k) {
    int w, h;
    if (dp_jpeg_info(buf, n, &w, &h) != 0) return -1;
    std::vector<unsigned char> rgb(size_t(w) * h * 3);
    if (dp_jpeg_decode(buf, n, rgb.data()) != 0) return -1;
    int m = w > h ? w : h;
    int pl = (m - w) / 2, pt = (m - h) / 2;
    std::vector<uint8_t> sq(size_t(m) * m * 3, 0);
    for (int y = 0; y < h; y++)
        std::memcpy(sq.data() + (size_t(y + pt) * m + pl) * 3,
                    rgb.data() + size_t(y) * w * 3, size_t(w) * 3);
    std::vector<uint8_t> res(size_t(target) * target * 3);
    dp_resize_u8(sq.data(), m, m, 3, res.data(), target, target);
    for (size_t i = 0; i < res.size(); i++) out[i] = res[i] / 255.0f;
    dp_recovery(w, h, target, k2kp, kp2k);
    return 0;
}

// u16-mm PNG -> resized (target, target) float32 metres, full-res raw
// metres (h*w, optional), and recovery matrices. raw may be null.
int dp_preprocess_depth(const unsigned char* buf, size_t n, int target,
                        float* out, float* raw, float* k2kp, float* kp2k) {
    int w, h;
    if (dp_png16_info(buf, n, &w, &h) != 0) return -1;
    std::vector<uint16_t> u16(size_t(w) * h);
    if (dp_png16_decode(buf, n, u16.data()) < 0) return -1;
    if (raw)
        for (size_t i = 0; i < u16.size(); i++) raw[i] = u16[i] / 1000.0f;
    int m = w > h ? w : h;
    int pl = (m - w) / 2, pt = (m - h) / 2;
    std::vector<int32_t> sq(size_t(m) * m, 0);
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            sq[size_t(y + pt) * m + (x + pl)] = u16[size_t(y) * w + x];
    std::vector<int32_t> res(size_t(target) * target);
    dp_resize_i32(sq.data(), m, m, res.data(), target, target);
    // python converts the int pixels: /1000 -> metres
    for (size_t i = 0; i < res.size(); i++) out[i] = res[i] / 1000.0f;
    dp_recovery(w, h, target, k2kp, kp2k);
    return 0;
}

// ---------------------------------------------------------------------------
// Certainty-weighted correspondence sampling + bilinear depth lookup
// (preprocess.py:108-148; torch grid_sample align_corners=False semantics)
// ---------------------------------------------------------------------------

static inline uint64_t dp_splitmix64(uint64_t* s) {
    uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

static float dp_grid_sample(const float* img, int H, int W, float nx,
                            float ny) {
    double x = (double(nx) + 1.0) * W / 2.0 - 0.5;
    double y = (double(ny) + 1.0) * H / 2.0 - 0.5;
    int x0 = int(std::floor(x)), y0 = int(std::floor(y));
    double acc = 0.0;
    for (int dy = 0; dy <= 1; dy++)
        for (int dx = 0; dx <= 1; dx++) {
            int xi = x0 + dx, yi = y0 + dy;
            double wgt = (1.0 - std::fabs(x - xi)) * (1.0 - std::fabs(y - yi));
            if (xi >= 0 && xi < W && yi >= 0 && yi < H)
                acc += wgt * img[size_t(yi) * W + xi];
        }
    return float(acc);
}

// Decode the RoMa warp triplet and emit sample_num weighted draws.
//   xbuf/ybuf/cbuf: u16 PNG bytes of _x/_y/_conf (identical dims hs x ws)
//   depth_*: full-res rasters in metres
//   Outputs: src/dst pixel coords (K, 2) and depths (K,).
// Weighted sampling = inverse-CDF on the certainty mass over kept points
// (threshold min_conf), driven by splitmix64(seed) — same distribution as
// numpy Generator.choice(p=...), different stream.
int dp_sample_pair(const unsigned char* xbuf, size_t xn,
                   const unsigned char* ybuf, size_t yn,
                   const unsigned char* cbuf, size_t cn,
                   const float* depth_src, int sh, int sw,
                   const float* depth_dst, int dh, int dw,
                   int sample_num, float min_conf, uint64_t seed,
                   float* src_xy, float* dst_xy,
                   float* src_d, float* dst_d) {
    int ws, hs, tmpw, tmph;
    if (dp_png16_info(cbuf, cn, &ws, &hs) != 0) return -1;
    if (dp_png16_info(xbuf, xn, &tmpw, &tmph) != 0 || tmpw != ws || tmph != hs)
        return -2;
    // _y must match too: decoding writes through row pointers sized by the
    // y image's OWN header, so a dims mismatch would overflow cy
    if (dp_png16_info(ybuf, yn, &tmpw, &tmph) != 0 || tmpw != ws || tmph != hs)
        return -2;
    size_t npix = size_t(ws) * hs;
    std::vector<uint16_t> cx(npix), cy(npix), cc(npix);
    if (dp_png16_decode(xbuf, xn, cx.data()) < 0) return -1;
    if (dp_png16_decode(ybuf, yn, cy.data()) < 0) return -1;
    if (dp_png16_decode(cbuf, cn, cc.data()) < 0) return -1;

    // cumulative certainty over kept points
    std::vector<double> cdf;
    std::vector<uint32_t> keep;
    cdf.reserve(npix);
    keep.reserve(npix);
    double total = 0.0;
    for (size_t i = 0; i < npix; i++) {
        float conf = cc[i] / 1000.0f;
        if (conf > min_conf) {
            total += conf;
            cdf.push_back(total);
            keep.push_back(uint32_t(i));
        }
    }
    if (keep.empty()) return -3;

    uint64_t state = seed ? seed : 0x853c49e6748fea9bULL;
    for (int k = 0; k < sample_num; k++) {
        double u = (dp_splitmix64(&state) >> 11) * (1.0 / 9007199254740992.0);
        double target_mass = u * total;
        size_t lo = std::lower_bound(cdf.begin(), cdf.end(), target_mass) -
                    cdf.begin();
        if (lo >= keep.size()) lo = keep.size() - 1;
        size_t i = keep[lo];
        int py = int(i / ws), px = int(i % ws);
        // source grid coords: linspace(-1 + 1/w, 1 - 1/w, w)
        float sx = -1.0f + (2.0f * px + 1.0f) / ws;
        float sy = -1.0f + (2.0f * py + 1.0f) / hs;
        float dx = cx[i] / 65535.0f * 2.0f - 1.0f;
        float dy = cy[i] / 65535.0f * 2.0f - 1.0f;
        src_d[k] = dp_grid_sample(depth_src, sh, sw, sx, sy);
        dst_d[k] = dp_grid_sample(depth_dst, dh, dw, dx, dy);
        // normalised -> pixel (ncoords_to_pixels: (x+1)(w-1)/2)
        src_xy[k * 2 + 0] = (sx + 1.0f) * (sw - 1) / 2.0f;
        src_xy[k * 2 + 1] = (sy + 1.0f) * (sh - 1) / 2.0f;
        dst_xy[k * 2 + 0] = (dx + 1.0f) * (dw - 1) / 2.0f;
        dst_xy[k * 2 + 1] = (dy + 1.0f) * (dh - 1) / 2.0f;
    }
    return 0;
}

}  // extern "C"
