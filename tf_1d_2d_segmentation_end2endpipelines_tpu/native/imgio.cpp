// Native image IO: decode (libpng/libjpeg) + channel convert + resize +
// normalize in one C pass — the host-side hot path of the input pipeline.
//
// The reference's loader is synchronous per-image PIL inside the batch
// step (utils/DataGenerator.py:68-114); this framework already fans
// decodes out over a thread pool (data/generators.py::PrefetchLoader).
// This file removes the remaining Python/PIL overhead per decode while
// staying BIT-EXACT with the PIL path so numerics are identical whether
// or not a toolchain is present:
//   - RGB->L uses PIL's fixed-point luma (L24 = 19595R+38470G+7471B+0x8000,
//     L = L24>>16)
//   - NEAREST replicates ImagingScaleAffine's cumulative float64 stepping
//     (xo = 0.5*scale; idx = (int)xo; xo += scale) including its fp drift
//   - LANCZOS replicates ImagingResample 8bpc: float64 coeffs normalized
//     then quantized to 22-bit fixed point, horizontal-then-vertical
//     passes each rounding to uint8 through clip8
// (Algorithms re-derived from Pillow's documented resampling behavior and
// verified bit-exact in tests/test_native_io.py; PIL remains the fallback
// whenever this library is unavailable or a format is unsupported.)
//
// Exactness caveat (documented, tested): 16-bit PNGs decode via libpng's
// simplified-API 8-bit scaling which differs from PIL's I;16 handling —
// the wrapper routes only 8-bit PNG/JPEG here.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <png.h>
#include <jpeglib.h>

namespace {

constexpr int PRECISION_BITS = 32 - 8 - 2;  // Pillow 8bpc fixed point

inline uint8_t clip8(int in) {
    if (in >= (1 << (PRECISION_BITS + 8))) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> PRECISION_BITS);
}

inline double sinc_filter(double x) {
    if (x == 0.0) return 1.0;
    x *= M_PI;
    return std::sin(x) / x;
}

inline double lanczos_filter(double x) {  // support = 3
    if (-3.0 <= x && x < 3.0) return sinc_filter(x) * sinc_filter(x / 3.0);
    return 0.0;
}

// Pillow precompute_coeffs + normalize_coeffs_8bpc for one axis.
void lanczos_coeffs(int in_size, int out_size, std::vector<int> &bounds,
                    std::vector<int> &kk, int &ksize) {
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = scale < 1.0 ? 1.0 : scale;
    const double support = 3.0 * filterscale;
    ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    bounds.assign(out_size * 2, 0);
    std::vector<double> prekk(static_cast<size_t>(out_size) * ksize, 0.0);
    for (int xx = 0; xx < out_size; xx++) {
        const double center = (xx + 0.5) * scale;
        double ww = 0.0;
        const double ss = 1.0 / filterscale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double *k = &prekk[static_cast<size_t>(xx) * ksize];
        for (int x = 0; x < xmax; x++) {
            const double w = lanczos_filter((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        if (ww != 0.0)
            for (int x = 0; x < xmax; x++) k[x] /= ww;
        bounds[xx * 2 + 0] = xmin;
        bounds[xx * 2 + 1] = xmax;
    }
    kk.resize(prekk.size());
    for (size_t i = 0; i < prekk.size(); i++)
        kk[i] = static_cast<int>(
            prekk[i] < 0 ? -0.5 + prekk[i] * (1 << PRECISION_BITS)
                         : 0.5 + prekk[i] * (1 << PRECISION_BITS));
}

// Two-pass 8bpc Lanczos resample, interleaved C channels (C = 1 or 3).
void resize_lanczos(const uint8_t *src, int in_h, int in_w, int C,
                    uint8_t *dst, int out_h, int out_w) {
    std::vector<int> hb, hk, vb, vk;
    int hks = 0, vks = 0;
    lanczos_coeffs(in_w, out_w, hb, hk, hks);
    lanczos_coeffs(in_h, out_h, vb, vk, vks);
    // horizontal pass (full height), then vertical — Pillow's order
    std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w * C);
    for (int yy = 0; yy < in_h; yy++) {
        const uint8_t *row = src + static_cast<size_t>(yy) * in_w * C;
        uint8_t *orow = &tmp[static_cast<size_t>(yy) * out_w * C];
        for (int xx = 0; xx < out_w; xx++) {
            const int xmin = hb[xx * 2], xmax = hb[xx * 2 + 1];
            const int *k = &hk[static_cast<size_t>(xx) * hks];
            for (int c = 0; c < C; c++) {
                int ss = 1 << (PRECISION_BITS - 1);
                for (int x = 0; x < xmax; x++)
                    ss += row[(x + xmin) * C + c] * k[x];
                orow[xx * C + c] = clip8(ss);
            }
        }
    }
    // vertical pass: accumulate whole rows sequentially (SIMD-friendly
    // u8 -> i32 widening MAC) instead of per-pixel column gathers
    const int rowlen = out_w * C;
    std::vector<int32_t> acc(rowlen);
    for (int yy = 0; yy < out_h; yy++) {
        const int ymin = vb[yy * 2], ymax = vb[yy * 2 + 1];
        const int *k = &vk[static_cast<size_t>(yy) * vks];
        std::fill(acc.begin(), acc.end(), 1 << (PRECISION_BITS - 1));
        for (int y = 0; y < ymax; y++) {
            const uint8_t *row =
                &tmp[static_cast<size_t>(y + ymin) * rowlen];
            const int wgt = k[y];
            for (int i = 0; i < rowlen; i++) acc[i] += row[i] * wgt;
        }
        uint8_t *orow = dst + static_cast<size_t>(yy) * rowlen;
        for (int i = 0; i < rowlen; i++) orow[i] = clip8(acc[i]);
    }
}

// PIL ImagingScaleAffine NEAREST: cumulative float64 stepping, truncation.
void resize_nearest(const uint8_t *src, int in_h, int in_w, int C,
                    uint8_t *dst, int out_h, int out_w) {
    const double sx = static_cast<double>(in_w) / out_w;
    const double sy = static_cast<double>(in_h) / out_h;
    std::vector<int> xtab(out_w);
    double xo = 0.5 * sx;
    for (int x = 0; x < out_w; x++) {
        int xi = static_cast<int>(xo);  // xo >= 0 always
        if (xi > in_w - 1) xi = in_w - 1;
        xtab[x] = xi;
        xo += sx;
    }
    double yo = 0.5 * sy;
    for (int y = 0; y < out_h; y++) {
        int yi = static_cast<int>(yo);
        if (yi > in_h - 1) yi = in_h - 1;
        yo += sy;
        const uint8_t *row = src + static_cast<size_t>(yi) * in_w * C;
        uint8_t *orow = dst + static_cast<size_t>(y) * out_w * C;
        for (int x = 0; x < out_w; x++)
            std::memcpy(orow + x * C, row + xtab[x] * C, C);
    }
}

// PIL convert("L") from RGB: fixed-point ITU-R 601 luma.
inline uint8_t pil_luma(uint8_t r, uint8_t g, uint8_t b) {
    const uint32_t l24 =
        19595u * r + 38470u * g + 7471u * b + 0x8000u;
    return static_cast<uint8_t>(l24 >> 16);
}

struct jpeg_err_mgr {
    jpeg_error_mgr pub;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    longjmp(reinterpret_cast<jpeg_err_mgr *>(cinfo->err)->jump, 1);
}

// Decode an in-memory PNG/JPEG to an interleaved 8-bit buffer: gray
// sources come back with c_src=1 (no wasted 3x traffic), color sources
// with c_src=3.  Alpha is DROPPED (PIL convert() semantics), never
// composited.  Returns 0 ok, <0 error.
int decode_rgb_mem(const uint8_t *buf, size_t len, std::vector<uint8_t> &rgb,
                   int &h, int &w, int &c_src) {
    c_src = 3;
    if (len < 2) return -2;
    if (buf[0] == 0x89 && buf[1] == 'P') {  // PNG, simplified API
        png_image image;
        std::memset(&image, 0, sizeof image);
        image.version = PNG_IMAGE_VERSION;
        if (!png_image_begin_read_from_memory(&image, buf, len)) return -3;
        // 16-bit PNGs: libpng's 8-bit scaling differs from PIL's I;16
        // handling — refuse so the wrapper falls back to PIL
        if (image.format & PNG_FORMAT_FLAG_LINEAR) {
            png_image_free(&image);
            return -6;
        }
        // PIL convert() DROPS alpha; the simplified API's opaque formats
        // would COMPOSITE it — read with alpha and strip manually.  Gray
        // sources stay single-channel (PIL opens them as "L")
        const bool has_alpha = image.format & PNG_FORMAT_FLAG_ALPHA;
        const bool is_color = image.format & PNG_FORMAT_FLAG_COLOR;
        c_src = is_color ? 3 : 1;
        image.format = is_color ? (has_alpha ? PNG_FORMAT_RGBA
                                             : PNG_FORMAT_RGB)
                                : (has_alpha ? PNG_FORMAT_GA
                                             : PNG_FORMAT_GRAY);
        h = image.height;
        w = image.width;
        std::vector<uint8_t> raw(PNG_IMAGE_SIZE(image));
        if (!png_image_finish_read(&image, nullptr, raw.data(), 0,
                                   nullptr)) {
            png_image_free(&image);
            return -4;
        }
        if (has_alpha) {
            rgb.resize(static_cast<size_t>(h) * w * c_src);
            const int cs = c_src;
            for (size_t i = 0, n = static_cast<size_t>(h) * w; i < n; i++)
                std::memcpy(&rgb[i * cs], &raw[i * (cs + 1)], cs);
        } else {
            rgb = std::move(raw);
        }
        return 0;
    }
    if (buf[0] == 0xFF && buf[1] == 0xD8) {  // JPEG
        jpeg_decompress_struct cinfo;
        jpeg_err_mgr jerr;
        cinfo.err = jpeg_std_error(&jerr.pub);
        jerr.pub.error_exit = jpeg_err_exit;
        if (setjmp(jerr.jump)) {
            jpeg_destroy_decompress(&cinfo);
            return -5;
        }
        jpeg_create_decompress(&cinfo);
        jpeg_mem_src(&cinfo, buf, len);
        jpeg_read_header(&cinfo, TRUE);
        // gray JPEGs decode single-channel (PIL opens them as "L");
        // everything else goes through RGB
        const bool gray_src = cinfo.jpeg_color_space == JCS_GRAYSCALE;
        c_src = gray_src ? 1 : 3;
        cinfo.out_color_space = gray_src ? JCS_GRAYSCALE : JCS_RGB;
        jpeg_start_decompress(&cinfo);
        h = cinfo.output_height;
        w = cinfo.output_width;
        rgb.resize(static_cast<size_t>(h) * w * c_src);
        while (cinfo.output_scanline < cinfo.output_height) {
            uint8_t *row = rgb.data()
                + static_cast<size_t>(cinfo.output_scanline) * w * c_src;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
        jpeg_finish_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return 0;
    }
    return -2;  // unsupported container (BMP/TIFF...) -> PIL fallback
}

// File variant: slurp, then decode from memory (small images; libpng's
// simplified API buffers internally anyway).
int decode_rgb(const char *path, std::vector<uint8_t> &rgb,
               int &h, int &w, int &c_src) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    const long sz = std::ftell(f);
    if (sz <= 0) { std::fclose(f); return -2; }
    std::rewind(f);
    std::vector<uint8_t> data(static_cast<size_t>(sz));
    const size_t got = std::fread(data.data(), 1, data.size(), f);
    std::fclose(f);
    if (got != data.size()) return -1;
    return decode_rgb_mem(data.data(), data.size(), rgb, h, w, c_src);
}

}  // namespace

extern "C" {

// Peek dimensions without a full decode (cheap header read).
int64_t imgio_probe(const char *path, int64_t *h, int64_t *w) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    unsigned char magic[2] = {0, 0};
    size_t got = std::fread(magic, 1, 2, f);
    std::fclose(f);
    if (got != 2) return -2;
    if (magic[0] == 0x89 && magic[1] == 'P') {
        png_image image;
        std::memset(&image, 0, sizeof image);
        image.version = PNG_IMAGE_VERSION;
        if (!png_image_begin_read_from_file(&image, path)) return -3;
        *h = image.height;
        *w = image.width;
        png_image_free(&image);
        return 0;
    }
    return -2;
}

namespace {

// Shared convert -> resize -> normalize tail of the load entry points.
int64_t finish_load(std::vector<uint8_t> &rgb, int h, int w, int c_src,
                    int64_t out_h, int64_t out_w, int64_t channels,
                    int64_t resample, float norm, float *out) {
    if (h <= 0 || w <= 0) return -2;
    const int C = static_cast<int>(channels);
    // convert FIRST, then resize — PIL's order (convert("L"/"RGB") on the
    // full-size image, then .resize())
    std::vector<uint8_t> conv;
    const uint8_t *pix = rgb.data();
    if (C == 1 && c_src == 3) {  // PIL convert("L"): fixed-point luma
        conv.resize(static_cast<size_t>(h) * w);
        for (size_t i = 0, n = conv.size(); i < n; i++)
            conv[i] = pil_luma(rgb[i * 3], rgb[i * 3 + 1], rgb[i * 3 + 2]);
        pix = conv.data();
    } else if (C == 3 && c_src == 1) {  // PIL convert("RGB"): replicate
        conv.resize(static_cast<size_t>(h) * w * 3);
        for (size_t i = 0, n = static_cast<size_t>(h) * w; i < n; i++)
            conv[i * 3] = conv[i * 3 + 1] = conv[i * 3 + 2] = rgb[i];
        pix = conv.data();
    }
    std::vector<uint8_t> resized;
    if (h != out_h || w != out_w) {
        resized.resize(static_cast<size_t>(out_h) * out_w * C);
        if (resample == 1)
            resize_lanczos(pix, h, w, C, resized.data(),
                           static_cast<int>(out_h),
                           static_cast<int>(out_w));
        else
            resize_nearest(pix, h, w, C, resized.data(),
                           static_cast<int>(out_h),
                           static_cast<int>(out_w));
        pix = resized.data();
    }
    // divide (not multiply by a reciprocal): the Python path is float32
    // `arr / norm`, and x/n vs x*(1/n) differ in the last ulp
    const size_t n = static_cast<size_t>(out_h) * out_w * C;
    for (size_t i = 0; i < n; i++)
        out[i] = static_cast<float>(pix[i]) / norm;
    return 0;
}

}  // namespace

// Decode `path`, convert to `channels` (1=PIL "L", 3=PIL "RGB"), resize
// to (out_h, out_w) with `resample` (0=NEAREST, 1=LANCZOS) when the
// decoded size differs, then write float32 pixel/`norm` to `out`
// ((out_h, out_w, channels), C-order).  Returns 0 ok, <0 error (caller
// falls back to PIL).
int64_t imgio_load(const char *path, int64_t out_h, int64_t out_w,
                   int64_t channels, int64_t resample, float norm,
                   float *out) {
    if ((channels != 1 && channels != 3) || out_h <= 0 || out_w <= 0)
        return -7;
    std::vector<uint8_t> rgb;
    int h = 0, w = 0, c_src = 3;
    const int rc = decode_rgb(path, rgb, h, w, c_src);
    if (rc) return rc;
    return finish_load(rgb, h, w, c_src, out_h, out_w, channels,
                       resample, norm, out);
}

// Same pipeline from an in-memory PNG/JPEG byte buffer (the HTTP
// serving path decodes request bodies without touching disk).
int64_t imgio_load_mem(const uint8_t *buf, int64_t len, int64_t out_h,
                       int64_t out_w, int64_t channels, int64_t resample,
                       float norm, float *out) {
    if ((channels != 1 && channels != 3) || out_h <= 0 || out_w <= 0 ||
        len <= 0)
        return -7;
    std::vector<uint8_t> rgb;
    int h = 0, w = 0, c_src = 3;
    const int rc = decode_rgb_mem(buf, static_cast<size_t>(len), rgb,
                                  h, w, c_src);
    if (rc) return rc;
    return finish_load(rgb, h, w, c_src, out_h, out_w, channels,
                       resample, norm, out);
}

}  // extern "C"
