// Native data-loader core: JPEG/PNG decode + BOX-halving + bicubic resize +
// crop/flip/normalize, with an internal thread pool for whole-batch calls.
//
// This is the TPU-framework equivalent of the native worker the reference
// gets from torch's DataLoader (image_datasets.py:64-71): the Python
// pipeline stays in charge of ordering/pairing/CLIP lookup, and hands the
// pixel work to this library through ctypes (the GIL is released for the
// entire batch).
//
// Resize semantics follow the reference chain (image_datasets.py:167-208):
// halve with BOX while min(side) >= 2*target, then one BICUBIC step to make
// min(side) == target, then crop. Both filters run PIL's exact resample
// algorithm (Pillow Resample.c, 8bpc path): separable horizontal-then-
// vertical passes, antialias-stretched kernels normalized in double, weights
// quantized to 22-bit fixed point (PRECISION_BITS), int32 accumulation with
// a half-ulp rounding bias, and truncating clip to uint8 BETWEEN passes —
// so output pixels are bit-identical to the PIL path (pinned by
// tests/test_native_loader.py). The Python PIL path remains the default;
// this is the opt-in fast path.
//
// Build: make -C native   (produces libgdc_loader.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct ImageU8 {
    int w = 0, h = 0;
    std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------------------------------------------------------- decoding

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, ImageU8* out) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    out->w = cinfo.output_width;
    out->h = cinfo.output_height;
    out->rgb.resize(size_t(out->w) * out->h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

bool decode_png(FILE* f, ImageU8* out) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    out->w = int(w);
    out->h = int(h);
    out->rgb.resize(size_t(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; ++y)
        rows[y] = out->rgb.data() + size_t(y) * w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_file(const char* path, ImageU8* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    uint8_t magic[8] = {0};
    size_t got = fread(magic, 1, 8, f);
    rewind(f);
    bool ok = false;
    if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
        ok = decode_jpeg(f, out);
    } else if (got >= 8 && !memcmp(magic, "\x89PNG\r\n\x1a\n", 8)) {
        ok = decode_png(f, out);
    }
    fclose(f);
    return ok;
}

// ---------------------------------------------------------------- resizing
//
// Exact replication of Pillow's Resample.c 8bpc path (the PIL functions the
// reference chain calls, image_datasets.py:167-208). Parity requires every
// detail below: double-precision kernel normalization, 22-bit fixed-point
// weight quantization, int32 accumulation with a half-ulp bias, truncating
// uint8 clip BETWEEN the horizontal and vertical passes, and PIL's
// window-bound arithmetic.

constexpr int PRECISION_BITS = 32 - 8 - 2;  // Pillow Resample.c

inline double filter_bicubic(double x) {  // Pillow bicubic_filter, a = -0.5
    const double a = -0.5;
    if (x < 0.0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

inline double filter_box(double x) {  // Pillow box_filter, support 0.5
    if (x > -0.5 && x <= 0.5) return 1.0;
    return 0.0;
}

struct Coeffs {
    int ksize = 0;
    std::vector<int> xmin;       // per output index: first source tap
    std::vector<int> xmax;       // per output index: tap count
    std::vector<int32_t> kk;     // per output index: ksize fixed-point weights
};

Coeffs precompute_coeffs(int in_size, int out_size, double support0,
                         double (*filter)(double)) {
    Coeffs co;
    double scale = double(in_size) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = support0 * filterscale;
    co.ksize = int(std::ceil(support)) * 2 + 1;
    co.xmin.resize(out_size);
    co.xmax.resize(out_size);
    std::vector<double> k(co.ksize);
    co.kk.assign(size_t(out_size) * co.ksize, 0);
    for (int xx = 0; xx < out_size; ++xx) {
        double center = (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = int(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = int(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        int x;
        for (x = 0; x < xmax; ++x) {
            double w = filter((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        for (x = 0; x < xmax; ++x)
            if (ww != 0.0) k[x] /= ww;
        // quantize to fixed point exactly like normalize_coeffs_8bpc
        int32_t* kq = &co.kk[size_t(xx) * co.ksize];
        for (x = 0; x < xmax; ++x) {
            if (k[x] < 0)
                kq[x] = int32_t(-0.5 + k[x] * (1 << PRECISION_BITS));
            else
                kq[x] = int32_t(0.5 + k[x] * (1 << PRECISION_BITS));
        }
        co.xmin[xx] = xmin;
        co.xmax[xx] = xmax;
    }
    return co;
}

inline uint8_t clip8(int32_t in) {  // Pillow clip8
    if (in >= (1 << PRECISION_BITS << 8)) return 255;
    if (in <= 0) return 0;
    return uint8_t(in >> PRECISION_BITS);
}

void resample_horizontal(const ImageU8& src, ImageU8* dst, const Coeffs& co) {
    dst->h = src.h;
    dst->rgb.resize(size_t(dst->w) * dst->h * 3);
    for (int y = 0; y < src.h; ++y) {
        const uint8_t* srow = src.rgb.data() + size_t(y) * src.w * 3;
        uint8_t* drow = dst->rgb.data() + size_t(y) * dst->w * 3;
        for (int x = 0; x < dst->w; ++x) {
            const int32_t* k = &co.kk[size_t(x) * co.ksize];
            int x0 = co.xmin[x];
            int32_t acc[3];
            acc[0] = acc[1] = acc[2] = 1 << (PRECISION_BITS - 1);
            for (int i = 0; i < co.xmax[x]; ++i) {
                const uint8_t* p = srow + size_t(x0 + i) * 3;
                acc[0] += p[0] * k[i];
                acc[1] += p[1] * k[i];
                acc[2] += p[2] * k[i];
            }
            uint8_t* d = drow + size_t(x) * 3;
            d[0] = clip8(acc[0]);
            d[1] = clip8(acc[1]);
            d[2] = clip8(acc[2]);
        }
    }
}

void resample_vertical(const ImageU8& src, ImageU8* dst, const Coeffs& co) {
    dst->w = src.w;
    dst->rgb.resize(size_t(dst->w) * dst->h * 3);
    for (int y = 0; y < dst->h; ++y) {
        const int32_t* k = &co.kk[size_t(y) * co.ksize];
        int y0 = co.xmin[y];
        uint8_t* drow = dst->rgb.data() + size_t(y) * dst->w * 3;
        for (int x = 0; x < dst->w; ++x) {
            int32_t acc[3];
            acc[0] = acc[1] = acc[2] = 1 << (PRECISION_BITS - 1);
            for (int i = 0; i < co.xmax[y]; ++i) {
                const uint8_t* p =
                    src.rgb.data() + size_t(y0 + i) * src.w * 3 + size_t(x) * 3;
                acc[0] += p[0] * k[i];
                acc[1] += p[1] * k[i];
                acc[2] += p[2] * k[i];
            }
            uint8_t* d = drow + size_t(x) * 3;
            d[0] = clip8(acc[0]);
            d[1] = clip8(acc[1]);
            d[2] = clip8(acc[2]);
        }
    }
}

enum class Filter { BOX, BICUBIC };

// PIL Image.resize semantics: horizontal pass then vertical pass, each
// skipped when that axis size is unchanged (ImagingResampleInner).
void pil_resize(const ImageU8& src, ImageU8* dst, int nw, int nh, Filter f) {
    double support = f == Filter::BOX ? 0.5 : 2.0;
    double (*filter)(double) = f == Filter::BOX ? filter_box : filter_bicubic;
    bool need_h = nw != src.w;
    bool need_v = nh != src.h;
    if (!need_h && !need_v) {
        *dst = src;
        return;
    }
    if (need_h && need_v) {
        ImageU8 tmp;
        tmp.w = nw;
        resample_horizontal(src, &tmp, precompute_coeffs(src.w, nw, support, filter));
        dst->h = nh;
        resample_vertical(tmp, dst, precompute_coeffs(src.h, nh, support, filter));
    } else if (need_h) {
        dst->w = nw;
        resample_horizontal(src, dst, precompute_coeffs(src.w, nw, support, filter));
    } else {
        dst->h = nh;
        resample_vertical(src, dst, precompute_coeffs(src.h, nh, support, filter));
    }
}

void box_halve(ImageU8* img) {  // PIL .resize((w//2, h//2), BOX)
    ImageU8 out;
    pil_resize(*img, &out, img->w / 2, img->h / 2, Filter::BOX);
    *img = std::move(out);
}

// xorshift for reproducible per-sample randomness
struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ull) {}
    uint64_t next() {
        s ^= s << 13;
        s ^= s >> 7;
        s ^= s << 17;
        return s;
    }
    int randrange(int n) { return n > 0 ? int(next() % uint64_t(n)) : 0; }
    float uniform() { return float(next() >> 11) * (1.0f / 9007199254740992.0f); }
};

// one sample: decode -> resize chain -> crop -> flip -> [-1,1] f32 NHWC
bool process_one(const char* path, int image_size, int random_crop, int do_flip,
                 uint64_t seed, float* out, uint8_t* flipped_out) {
    ImageU8 img;
    if (!decode_file(path, &img)) return false;
    Rng rng(seed);

    int target_small = image_size;
    if (random_crop) {
        // random smaller-dim in [ceil(size/1.0), ceil(size/0.8)] (reference :187-190)
        int lo = image_size;
        int hi = int(std::ceil(image_size / 0.8));
        target_small = lo + rng.randrange(hi - lo + 1);
    }
    while (std::min(img.w, img.h) >= 2 * target_small) box_halve(&img);
    if (std::min(img.w, img.h) != target_small) {
        // Python computes round(x * scale) — round-half-EVEN (banker's);
        // nearbyint under the default FE_TONEAREST mode matches it
        double scale = double(target_small) / std::min(img.w, img.h);
        ImageU8 resized;
        pil_resize(img, &resized, int(std::nearbyint(img.w * scale)),
                   int(std::nearbyint(img.h * scale)), Filter::BICUBIC);
        img = std::move(resized);
    }
    int cy, cx;
    if (random_crop) {
        cy = rng.randrange(img.h - image_size + 1);
        cx = rng.randrange(img.w - image_size + 1);
    } else {
        cy = (img.h - image_size) / 2;
        cx = (img.w - image_size) / 2;
    }
    int flip = do_flip && (rng.uniform() < 0.5f);
    if (flipped_out) *flipped_out = uint8_t(flip);

    for (int y = 0; y < image_size; ++y) {
        const uint8_t* srow = img.rgb.data() + size_t(cy + y) * img.w * 3 + size_t(cx) * 3;
        float* drow = out + size_t(y) * image_size * 3;
        for (int x = 0; x < image_size; ++x) {
            int sxp = flip ? (image_size - 1 - x) : x;
            for (int c = 0; c < 3; ++c)
                drow[x * 3 + c] = srow[sxp * 3 + c] / 127.5f - 1.0f;
        }
    }
    return true;
}

}  // namespace

extern "C" {

// Decode+process one image. Returns 1 on success.
int gdc_process_image(const char* path, int image_size, int random_crop, int do_flip,
                      uint64_t seed, float* out, uint8_t* flipped_out) {
    return process_one(path, image_size, random_crop, do_flip, seed, out, flipped_out) ? 1 : 0;
}

// Batch API with an internal thread pool; paths is a NULL-free array of n
// C strings; out has n*size*size*3 floats; flipped has n bytes.
// Returns the number of successfully processed images.
int gdc_process_batch(const char** paths, int n, int image_size, int random_crop,
                      int do_flip, const uint64_t* seeds, float* out,
                      uint8_t* flipped, int num_threads) {
    if (num_threads <= 0)
        num_threads = std::max(1u, std::thread::hardware_concurrency());
    num_threads = std::min(num_threads, n);
    std::atomic<int> next{0}, ok{0};
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            float* o = out + size_t(i) * image_size * image_size * 3;
            uint8_t* fl = flipped ? flipped + i : nullptr;
            if (process_one(paths[i], image_size, random_crop, do_flip,
                            seeds ? seeds[i] : uint64_t(i + 1), o, fl))
                ok.fetch_add(1);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return ok.load();
}

}  // extern "C"
