// tdloader — native streaming frame loader for tdnet_tpu.
//
// The reference pipeline decodes PNGs and preprocesses frames in Python
// (Testing/dataloader.py: imageio + cv2.resize + normalize; Training uses
// torch DataLoader worker processes). This library replaces that host
// path with a C++ thread pool: PNG decode (zlib inflate + defilter),
// bilinear resize (half-pixel convention, cv2-compatible), ImageNet
// normalization to float32, and a bounded ring of prefetched frames so
// the accelerator never waits on the host.
//
// Python binding: ctypes (tdnet_tpu/data/native.py).

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fstream>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> px;  // HWC
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Minimal PNG decoder: 8-bit depth, color types 0 (gray), 2 (RGB),
// 3 (palette), 4 (gray+alpha), 6 (RGBA); no interlace.
bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || std::memcmp(buf, sig, 8) != 0) return false;
  size_t pos = 8;
  int w = 0, h = 0, depth = 0, ctype = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;
  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const uint8_t* ctag = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + clen > len) return false;
    if (!std::memcmp(ctag, "IHDR", 4)) {
      w = be32(data);
      h = be32(data + 4);
      depth = data[8];
      ctype = data[9];
      interlace = data[12];
      if (depth != 8 || interlace != 0) return false;
    } else if (!std::memcmp(ctag, "PLTE", 4)) {
      palette.assign(data, data + clen);
    } else if (!std::memcmp(ctag, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!std::memcmp(ctag, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (w <= 0 || h <= 0 || idat.empty()) return false;
  int nch;
  switch (ctype) {
    case 0: nch = 1; break;
    case 2: nch = 3; break;
    case 3: nch = 1; break;  // palette index
    case 4: nch = 2; break;
    case 6: nch = 4; break;
    default: return false;
  }
  const size_t stride = size_t(w) * nch;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf rawlen = raw.size();
  if (uncompress(raw.data(), &rawlen, idat.data(), idat.size()) != Z_OK ||
      rawlen != raw.size())
    return false;

  // defilter in place into out->px
  out->w = w;
  out->h = h;
  out->c = (ctype == 3) ? 3 : nch;
  out->px.resize(size_t(w) * h * out->c);
  std::vector<uint8_t> prev(stride, 0), cur(stride);
  const int bpp = nch;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = row[0];
    const uint8_t* src = row + 1;
    switch (filter) {
      case 0:
        std::memcpy(cur.data(), src, stride);
        break;
      case 1:
        for (size_t i = 0; i < stride; ++i)
          cur[i] = src[i] + (i >= size_t(bpp) ? cur[i - bpp] : 0);
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i) cur[i] = src[i] + prev[i];
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? cur[i - bpp] : 0;
          cur[i] = src[i] + uint8_t((a + prev[i]) / 2);
        }
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(bpp) ? cur[i - bpp] : 0;
          int c2 = i >= size_t(bpp) ? prev[i - bpp] : 0;
          cur[i] = src[i] + uint8_t(paeth(a, prev[i], c2));
        }
        break;
      default:
        return false;
    }
    uint8_t* dst = out->px.data() + size_t(y) * w * out->c;
    if (ctype == 3) {
      if (palette.empty()) return false;
      for (int x = 0; x < w; ++x) {
        int idx = cur[x] * 3;
        if (size_t(idx) + 2 >= palette.size()) idx = 0;
        dst[x * 3 + 0] = palette[idx];
        dst[x * 3 + 1] = palette[idx + 1];
        dst[x * 3 + 2] = palette[idx + 2];
      }
    } else {
      std::memcpy(dst, cur.data(), stride);
    }
    std::swap(prev, cur);
  }
  return true;
}

// Bilinear resize, half-pixel centers (cv2 INTER_LINEAR convention).
void resize_bilinear_u8(const Image& in, int oh, int ow,
                        std::vector<uint8_t>* out) {
  const int c = in.c;
  out->resize(size_t(oh) * ow * c);
  const float sy = float(in.h) / oh, sx = float(in.w) / ow;
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    int xi = int(fx);
    if (xi > in.w - 2) xi = in.w - 2;
    x0[x] = xi;
    x1[x] = xi + 1;
    wx[x] = fx - xi;
  }
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int yi = int(fy);
    if (yi > in.h - 2) yi = in.h - 2;
    float dy = fy - yi;
    const uint8_t* r0 = in.px.data() + size_t(yi) * in.w * c;
    const uint8_t* r1 = r0 + size_t(in.w) * c;
    uint8_t* dst = out->data() + size_t(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      const float dx = wx[x];
      const uint8_t* p00 = r0 + size_t(x0[x]) * c;
      const uint8_t* p01 = r0 + size_t(x1[x]) * c;
      const uint8_t* p10 = r1 + size_t(x0[x]) * c;
      const uint8_t* p11 = r1 + size_t(x1[x]) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] + (p01[k] - p00[k]) * dx;
        float bot = p10[k] + (p11[k] - p10[k]) * dx;
        float v = top + (bot - top) * dy;
        dst[x * c + k] = uint8_t(v + 0.5f);
      }
    }
  }
}

const float kMean[3] = {0.485f, 0.456f, 0.406f};
const float kStd[3] = {0.229f, 0.224f, 0.225f};

struct Frame {
  std::vector<float> data;  // out_h*out_w*3 normalized
  int ori_h = 0, ori_w = 0;
  int index = -1;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> paths;
  int out_h, out_w, normalize;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<Frame> ready;
  std::atomic<int> next_submit{0};
  int next_emit = 0;
  size_t max_queue = 8;
  bool stop = false;
  // out-of-order completion buffer
  std::vector<Frame> pending;

  void worker() {
    for (;;) {
      int idx = next_submit.fetch_add(1);
      if (idx >= int(paths.size())) return;
      Frame f;
      f.index = idx;
      f.ok = load_one(paths[idx], &f);
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || pending.size() + ready.size() < max_queue +
                             workers.size();
        });
        if (stop) return;
        pending.push_back(std::move(f));
        // emit in submission order
        bool emitted = true;
        while (emitted) {
          emitted = false;
          for (size_t i = 0; i < pending.size(); ++i) {
            if (pending[i].index == next_emit) {
              ready.push(std::move(pending[i]));
              pending.erase(pending.begin() + i);
              ++next_emit;
              emitted = true;
              break;
            }
          }
        }
        cv_ready.notify_all();
      }
    }
  }

  bool load_one(const std::string& path, Frame* f) {
    std::ifstream in(path, std::ios::binary);
    if (!in) return false;
    std::vector<uint8_t> buf((std::istreambuf_iterator<char>(in)),
                             std::istreambuf_iterator<char>());
    Image img;
    if (!decode_png(buf.data(), buf.size(), &img)) return false;
    f->ori_h = img.h;
    f->ori_w = img.w;
    if (img.c == 1) {  // gray -> rgb
      Image rgb;
      rgb.w = img.w; rgb.h = img.h; rgb.c = 3;
      rgb.px.resize(size_t(img.w) * img.h * 3);
      for (size_t i = 0; i < img.px.size(); ++i) {
        rgb.px[i * 3] = rgb.px[i * 3 + 1] = rgb.px[i * 3 + 2] = img.px[i];
      }
      img = std::move(rgb);
    } else if (img.c == 4 || img.c == 2) {  // drop alpha
      Image rgb;
      rgb.w = img.w; rgb.h = img.h; rgb.c = 3;
      rgb.px.resize(size_t(img.w) * img.h * 3);
      int c = img.c;
      for (size_t i = 0; i < size_t(img.w) * img.h; ++i)
        for (int k = 0; k < 3; ++k)
          rgb.px[i * 3 + k] = img.px[i * c + (c == 2 ? 0 : k)];
      img = std::move(rgb);
    }
    std::vector<uint8_t> resized;
    const std::vector<uint8_t>* src = &img.px;
    int h = img.h, w = img.w;
    if (h != out_h || w != out_w) {
      resize_bilinear_u8(img, out_h, out_w, &resized);
      src = &resized;
      h = out_h;
      w = out_w;
    }
    f->data.resize(size_t(h) * w * 3);
    const uint8_t* p = src->data();
    if (normalize) {
      for (size_t i = 0; i < size_t(h) * w; ++i)
        for (int k = 0; k < 3; ++k)
          f->data[i * 3 + k] =
              (p[i * 3 + k] / 255.0f - kMean[k]) / kStd[k];
    } else {
      for (size_t i = 0; i < size_t(h) * w * 3; ++i) f->data[i] = p[i];
    }
    return true;
  }
};

}  // namespace

extern "C" {

void* tdl_create(const char** paths, int n, int out_h, int out_w,
                 int n_threads, int normalize, int max_queue) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->out_h = out_h;
  l->out_w = out_w;
  l->normalize = normalize;
  l->max_queue = max_queue > 0 ? size_t(max_queue) : 8;
  int nt = n_threads > 0 ? n_threads : 4;
  for (int i = 0; i < nt; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

// Returns 1 on success, 0 on decode failure (frame skipped upstream),
// -1 when the stream is exhausted.
int tdl_next(void* handle, float* out, int* ori_h, int* ori_w) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_ready.wait(lk, [&] {
    return !l->ready.empty() || l->next_emit >= int(l->paths.size());
  });
  if (l->ready.empty()) return -1;
  Frame f = std::move(l->ready.front());
  l->ready.pop();
  l->cv_space.notify_all();
  if (!f.ok) return 0;
  std::memcpy(out, f.data.data(), f.data.size() * sizeof(float));
  *ori_h = f.ori_h;
  *ori_w = f.ori_w;
  return 1;
}

void tdl_destroy(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
    l->next_submit.store(int(l->paths.size()));
    l->cv_space.notify_all();
  }
  for (auto& t : l->workers) t.join();
  delete l;
}

// One-shot PNG decode into caller buffer (HWC uint8, RGB or gray).
// Returns channel count, or 0 on failure. Query mode: out == nullptr.
int tdl_decode_png(const uint8_t* buf, long len, uint8_t* out, int* w,
                   int* h) {
  Image img;
  if (!decode_png(buf, size_t(len), &img)) return 0;
  *w = img.w;
  *h = img.h;
  if (out) std::memcpy(out, img.px.data(), img.px.size());
  return img.c;
}

}  // extern "C"
