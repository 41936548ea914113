// Native dataset loader: threaded PNG/JPEG decode + prefetch ring.
//
// The reference's driver loads images synchronously on the tracking thread
// (cv::imread in the frame loop, Examples/Monocular/mono_tum.cc:68-109),
// stalling tracking on disk + decode. This library is the runtime-native
// replacement: a pool of decoder threads fills a bounded ring of grayscale
// float frames ahead of the consumer, so the SLAM loop never waits on I/O.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   void* eao_loader_open(const char* dir, const char** files,
//                         const double* stamps, int n, int w, int h,
//                         int n_threads, int ring);
//   int   eao_loader_next(void* h, float* out /* h*w */, double* stamp);
//         -> frame index >= 0, or -1 at end of sequence
//   void  eao_loader_close(void* h);
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC, links libpng + libjpeg).

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> pix;
  double stamp = 0.0;
  int index = -1;
  bool ok = false;
};

// ---------------------------------------------------------------------------
// decoders -> grayscale float (0..255), resized by nearest drop if needed
// ---------------------------------------------------------------------------

bool decode_png_gray(const std::string& path, int w, int h, float* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 iw = png_get_image_width(png, info);
  png_uint_32 ih = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    // ITU-R BT.601 luma, like cv::IMREAD_GRAYSCALE
    png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
  png_read_update_info(png, info);

  std::vector<png_byte> row(png_get_rowbytes(png, info));
  std::vector<uint8_t> gray(iw * ih);
  for (png_uint_32 y = 0; y < ih; y++) {
    png_read_row(png, row.data(), nullptr);
    for (png_uint_32 x = 0; x < iw; x++) gray[y * iw + x] = row[x];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  for (int y = 0; y < h; y++) {
    int sy = (int)((int64_t)y * ih / h);
    for (int x = 0; x < w; x++) {
      int sx = (int)((int64_t)x * iw / w);
      out[y * w + x] = (float)gray[sy * iw + sx];
    }
  }
  return true;
}

bool decode_jpeg_gray(const std::string& path, int w, int h, float* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  int iw = cinfo.output_width, ih = cinfo.output_height;
  std::vector<uint8_t> gray((size_t)iw * ih);
  while ((int)cinfo.output_scanline < ih) {
    uint8_t* rowp = gray.data() + (size_t)cinfo.output_scanline * iw;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  for (int y = 0; y < h; y++) {
    int sy = (int)((int64_t)y * ih / h);
    for (int x = 0; x < w; x++) {
      int sx = (int)((int64_t)x * iw / w);
      out[y * w + x] = (float)gray[sy * iw + sx];
    }
  }
  return true;
}

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  for (auto& c : tail) c = (char)tolower(c);
  return tail == suf;
}

// ---------------------------------------------------------------------------
// prefetching loader
// ---------------------------------------------------------------------------

struct Loader {
  std::string dir;
  std::vector<std::string> files;
  std::vector<double> stamps;
  int w = 0, h = 0;
  size_t ring = 8;

  std::mutex mu;
  std::condition_variable cv_full, cv_space;
  std::vector<Frame> done;      // decoded frames, delivered in order
  std::atomic<int> next_decode{0};
  int next_deliver = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      int i = next_decode.fetch_add(1);
      if (i >= (int)files.size()) return;
      Frame f;
      f.index = i;
      f.stamp = stamps[i];
      f.pix.resize((size_t)w * h);
      std::string path = dir + "/" + files[i];
      if (has_suffix(path, ".png"))
        f.ok = decode_png_gray(path, w, h, f.pix.data());
      else if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
        f.ok = decode_jpeg_gray(path, w, h, f.pix.data());
      else
        f.ok = false;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || (int)done.size() < (int)ring ||
                 f.index < next_deliver + (int)ring;
        });
        if (stop) return;
        done.push_back(std::move(f));
        cv_full.notify_all();
      }
    }
  }

  int next(float* out, double* stamp) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_deliver >= (int)files.size()) return -1;
    int want = next_deliver;
    cv_full.wait(lk, [&] {
      if (stop) return true;
      for (auto& f : done)
        if (f.index == want) return true;
      return false;
    });
    if (stop) return -1;
    for (size_t k = 0; k < done.size(); k++) {
      if (done[k].index == want) {
        if (done[k].ok) {
          memcpy(out, done[k].pix.data(), sizeof(float) * (size_t)w * h);
          if (stamp) *stamp = done[k].stamp;
        }
        int rc = done[k].ok ? want : -2;
        done.erase(done.begin() + k);
        next_deliver++;
        cv_space.notify_all();
        return rc;
      }
    }
    return -1;
  }
};

}  // namespace

extern "C" {

void* eao_loader_open(const char* dir, const char** files, const double* stamps,
                      int n, int w, int h, int n_threads, int ring) {
  auto* L = new Loader();
  L->dir = dir;
  L->files.assign(files, files + n);
  L->stamps.assign(stamps, stamps + n);
  L->w = w;
  L->h = h;
  L->ring = ring > 0 ? (size_t)ring : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; i++) L->workers.emplace_back(&Loader::worker, L);
  return L;
}

int eao_loader_next(void* handle, float* out, double* stamp) {
  return ((Loader*)handle)->next(out, stamp);
}

void eao_loader_close(void* handle) {
  auto* L = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_full.notify_all();
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
