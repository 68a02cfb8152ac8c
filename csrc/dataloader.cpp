// sdvar_tpu native data-loader runtime.
//
// The reference's input pipeline rides torchvision's C++ DatasetFolder +
// PIL (reference: utils/data.py:12-38). This is the first-party TPU-side
// equivalent: a multithreaded JPEG/PNG decode + Lanczos-resize + crop +
// normalize pipeline with a bounded prefetch queue, exposed through a C ABI
// for ctypes (no pybind11 in the image).
//
// Pipeline per sample (mirrors utils/data.py semantics):
//   decode -> resize shorter edge to round(1.125 * reso) (Lanczos3)
//          -> random crop (train, seeded) / center crop (val)
//          -> optional hflip -> float32 CHW in [-1, 1]
//
// Also ships a threaded PNG writer for the FID 50k-sample dump
// (reference: utils/misc.py:360-381 packs PNGs; writing them is the
// bottleneck at scale).
//
// Build: g++ -O3 -march=native -shared -fPIC dataloader.cpp -o libsdvar_data.so
//        -ljpeg -lpng -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
};

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadCtx {
  const uint8_t* buf;
  size_t len, pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + n > ctx->len) png_error(png, "png: short read");
  std::memcpy(out, ctx->buf + ctx->pos, n);
  ctx->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadCtx ctx{buf, len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* buf, size_t len, Image* out) {
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len, out);
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) return decode_png(buf, len, out);
  return decode_jpeg(buf, len, out) || decode_png(buf, len, out);
}

// ---------------------------------------------------------------------------
// Lanczos3 separable resize (PIL-style), uint8 HWC
// ---------------------------------------------------------------------------

double lanczos3(double x) {
  if (x == 0.0) return 1.0;
  if (x <= -3.0 || x >= 3.0) return 0.0;
  double px = M_PI * x;
  return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
}

// Precomputed 1-D resampling weights for in->out (PIL ImagingResampleHorizontal
// semantics: support scaled by downscale factor; weights normalized).
struct ResampleAxis {
  std::vector<int> start;          // first source index per output pixel
  std::vector<int> size;           // number of taps
  std::vector<std::vector<double>> w;
};

ResampleAxis plan_axis(int in, int out) {
  ResampleAxis ax;
  ax.start.resize(out);
  ax.size.resize(out);
  ax.w.resize(out);
  double scale = double(in) / out;
  double support = 3.0 * std::max(scale, 1.0);
  for (int i = 0; i < out; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(0, int(std::floor(center - support)));
    int hi = std::min(in, int(std::ceil(center + support)));
    ax.start[i] = lo;
    ax.size[i] = hi - lo;
    ax.w[i].resize(hi - lo);
    double sum = 0.0;
    for (int j = lo; j < hi; ++j) {
      double v = lanczos3((j + 0.5 - center) / std::max(scale, 1.0));
      ax.w[i][j - lo] = v;
      sum += v;
    }
    if (sum != 0.0)
      for (auto& v : ax.w[i]) v /= sum;
  }
  return ax;
}

Image resize_lanczos(const Image& src, int out_w, int out_h) {
  ResampleAxis axw = plan_axis(src.w, out_w);
  ResampleAxis axh = plan_axis(src.h, out_h);
  // horizontal pass into float
  std::vector<float> tmp(size_t(src.h) * out_w * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.data.data() + size_t(y) * src.w * 3;
    for (int x = 0; x < out_w; ++x) {
      double acc[3] = {0, 0, 0};
      int s = axw.start[x], n = axw.size[x];
      for (int j = 0; j < n; ++j) {
        double wgt = axw.w[x][j];
        const uint8_t* px = row + size_t(s + j) * 3;
        acc[0] += wgt * px[0];
        acc[1] += wgt * px[1];
        acc[2] += wgt * px[2];
      }
      float* o = tmp.data() + (size_t(y) * out_w + x) * 3;
      o[0] = float(acc[0]); o[1] = float(acc[1]); o[2] = float(acc[2]);
    }
  }
  // vertical pass
  Image dst;
  dst.w = out_w; dst.h = out_h; dst.c = 3;
  dst.data.resize(size_t(out_w) * out_h * 3);
  for (int y = 0; y < out_h; ++y) {
    int s = axh.start[y], n = axh.size[y];
    for (int x = 0; x < out_w; ++x) {
      double acc[3] = {0, 0, 0};
      for (int j = 0; j < n; ++j) {
        double wgt = axh.w[y][j];
        const float* px = tmp.data() + (size_t(s + j) * out_w + x) * 3;
        acc[0] += wgt * px[0];
        acc[1] += wgt * px[1];
        acc[2] += wgt * px[2];
      }
      uint8_t* o = dst.data.data() + (size_t(y) * out_w + x) * 3;
      for (int k = 0; k < 3; ++k)
        o[k] = uint8_t(std::clamp(int(std::lround(acc[k])), 0, 255));
    }
  }
  return dst;
}

// ---------------------------------------------------------------------------
// loader
// ---------------------------------------------------------------------------

struct Sample {
  std::vector<float> chw;  // 3*reso*reso in [-1, 1]
  int32_t label;
  int64_t index;
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<int32_t> labels;
  int reso = 256;
  int mid = 288;
  bool train = true;
  bool hflip = false;
  uint64_t seed = 0;

  std::deque<int64_t> pending;     // sample indices to produce
  std::deque<Sample> ready;
  size_t max_ready = 64;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> errors{0};

  void worker() {
    while (!stop.load()) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() ||
                 (!pending.empty() && ready.size() < max_ready);
        });
        if (stop.load()) return;
        idx = pending.front();
        pending.pop_front();
      }
      Sample s;
      s.index = idx;
      if (!produce(idx, &s)) {
        errors.fetch_add(1);
        s.chw.assign(size_t(3) * reso * reso, 0.0f);
        s.label = -1;
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        ready.push_back(std::move(s));
      }
      cv_ready.notify_one();
    }
  }

  bool produce(int64_t idx, Sample* s) {
    const std::string& path = paths[idx % paths.size()];
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long len = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(len);
    size_t rd = std::fread(buf.data(), 1, len, f);
    std::fclose(f);
    if (rd != size_t(len)) return false;

    Image img;
    if (!decode_any(buf.data(), buf.size(), &img)) return false;

    // resize shorter edge to mid (utils/data.py:21-24)
    double sc = double(mid) / std::min(img.w, img.h);
    int nw = int(std::lround(img.w * sc));
    int nh = int(std::lround(img.h * sc));
    Image rs = resize_lanczos(img, nw, nh);

    // crop
    std::mt19937_64 rng(seed * 1000003ULL + uint64_t(idx));
    int x0, y0;
    bool flip = false;
    if (train) {
      x0 = int(rng() % uint64_t(rs.w - reso + 1));
      y0 = int(rng() % uint64_t(rs.h - reso + 1));
      if (hflip) flip = (rng() & 1) != 0;
    } else {
      x0 = (rs.w - reso) / 2;
      y0 = (rs.h - reso) / 2;
    }

    s->chw.resize(size_t(3) * reso * reso);
    s->label = labels[idx % labels.size()];
    for (int y = 0; y < reso; ++y) {
      const uint8_t* row = rs.data.data() + (size_t(y0 + y) * rs.w + x0) * 3;
      for (int x = 0; x < reso; ++x) {
        int sx = flip ? (reso - 1 - x) : x;
        const uint8_t* px = row + size_t(sx) * 3;
        for (int c = 0; c < 3; ++c) {
          s->chw[size_t(c) * reso * reso + size_t(y) * reso + x] =
              float(px[c]) / 255.0f * 2.0f - 1.0f;
        }
      }
    }
    return true;
  }
};

}  // namespace

extern "C" {

void* sdvar_loader_create(const char** paths, const int32_t* labels,
                          int64_t n, int reso, int mid, int train, int hflip,
                          uint64_t seed, int num_threads, int queue_cap) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->labels.assign(labels, labels + n);
  L->reso = reso;
  L->mid = mid;
  L->train = train != 0;
  L->hflip = hflip != 0;
  L->seed = seed;
  L->max_ready = std::max(queue_cap, 2);
  int nt = std::max(1, num_threads);
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// enqueue sample indices (an epoch slice from the Python sampler)
void sdvar_loader_enqueue(void* h, const int64_t* indices, int64_t n) {
  auto* L = static_cast<Loader*>(h);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    for (int64_t i = 0; i < n; ++i) L->pending.push_back(indices[i]);
  }
  L->cv_space.notify_all();
}

// blocking: fill out (batch, 3, reso, reso) float32 + labels + src indices
int64_t sdvar_loader_next(void* h, float* out, int32_t* out_labels,
                          int64_t* out_indices, int64_t batch) {
  auto* L = static_cast<Loader*>(h);
  size_t stride = size_t(3) * L->reso * L->reso;
  for (int64_t i = 0; i < batch; ++i) {
    Sample s;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_ready.wait(lk, [&] { return L->stop.load() || !L->ready.empty(); });
      if (L->stop.load()) return i;
      s = std::move(L->ready.front());
      L->ready.pop_front();
    }
    L->cv_space.notify_all();
    std::memcpy(out + i * stride, s.chw.data(), stride * sizeof(float));
    out_labels[i] = s.label;
    out_indices[i] = s.index;
  }
  return batch;
}

int64_t sdvar_loader_errors(void* h) {
  return static_cast<Loader*>(h)->errors.load();
}

void sdvar_loader_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

// ---------------------------------------------------------------------------
// threaded PNG writer for FID sample dumps (uint8 HWC images)
// ---------------------------------------------------------------------------

static bool write_png_file(const char* path, const uint8_t* hwc, int w, int h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_set_compression_level(png, 1);  // fast: FID reads, nobody archives
  png_write_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<uint8_t*>(hwc) + size_t(y) * w * 3;
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return true;
}

// images: (n, h, w, 3) uint8; files written as {dir}/{start+i:06d}.png
int64_t sdvar_write_pngs(const char* dir, const uint8_t* images, int64_t n,
                         int h, int w, int64_t start_idx, int num_threads) {
  std::atomic<int64_t> next{0}, ok{0};
  int nt = std::max(1, num_threads);
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([&] {
      char path[4096];
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        std::snprintf(path, sizeof(path), "%s/%06lld.png", dir,
                      static_cast<long long>(start_idx + i));
        if (write_png_file(path, images + size_t(i) * h * w * 3, w, h))
          ok.fetch_add(1);
      }
    });
  }
  for (auto& th : ts) th.join();
  return ok.load();
}

}  // extern "C"
