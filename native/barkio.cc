// barkio: native image IO runtime for the TPU bark calculator.
//
// The reference consumes native codecs through PIL (dataset.py:82-90,
// models.py:203) and feeds the model one image at a time from Python.
// This library is the TPU-side equivalent of that native layer: fast
// single-pass BMP decode (the 4096x4096 capture format, ~50 MB/file),
// PNG decode/encode (processed images and dual masks) over system zlib,
// and a pthread prefetch pool so decode overlaps device compute even
// when Python threads are GIL-bound.
//
// Exposed as a plain C ABI consumed via ctypes (native/__init__.py in
// neuralbarkcalculator_tpu/io). All functions return 0 on success,
// negative error codes on failure. Buffers are caller-allocated where
// sizes are known (query first with *_info).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------- errors

enum {
  BARKIO_OK = 0,
  BARKIO_E_OPEN = -1,
  BARKIO_E_FORMAT = -2,
  BARKIO_E_UNSUPPORTED = -3,
  BARKIO_E_ZLIB = -4,
  BARKIO_E_ARG = -5,
  BARKIO_E_IO = -6,
};

// ------------------------------------------------------------------ BMP

// Windows BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (>= 40 bytes).
// Supports the capture format: uncompressed 24/32-bit, any row order.
static int read_file(const char* path, uint8_t** out, long* size) {
  FILE* f = fopen(path, "rb");
  if (!f) return BARKIO_E_OPEN;
  fseek(f, 0, SEEK_END);
  *size = ftell(f);
  fseek(f, 0, SEEK_SET);
  *out = (uint8_t*)malloc(*size);
  if (!*out) { fclose(f); return BARKIO_E_IO; }
  if (fread(*out, 1, *size, f) != (size_t)*size) {
    free(*out); fclose(f); return BARKIO_E_IO;
  }
  fclose(f);
  return BARKIO_OK;
}

static uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static int32_t rd32s(const uint8_t* p) { return (int32_t)rd32(p); }
static uint16_t rd16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

int bmp_info(const char* path, int32_t* width, int32_t* height) {
  uint8_t hdr[54];
  FILE* f = fopen(path, "rb");
  if (!f) return BARKIO_E_OPEN;
  if (fread(hdr, 1, 54, f) != 54 || hdr[0] != 'B' || hdr[1] != 'M') {
    fclose(f); return BARKIO_E_FORMAT;
  }
  fclose(f);
  *width = rd32s(hdr + 18);
  int32_t h = rd32s(hdr + 22);
  *height = h < 0 ? -h : h;
  return BARKIO_OK;
}

// Decode to tightly-packed RGB [height * width * 3], top-down row order.
int bmp_decode_rgb(const char* path, uint8_t* out, int64_t out_size) {
  uint8_t* buf; long size;
  int rc = read_file(path, &buf, &size);
  if (rc) return rc;
  if (size < 54 || buf[0] != 'B' || buf[1] != 'M') {
    free(buf); return BARKIO_E_FORMAT;
  }
  uint32_t data_off = rd32(buf + 10);
  uint32_t hdr_size = rd32(buf + 14);
  int32_t w = rd32s(buf + 18);
  int32_t h = rd32s(buf + 22);
  uint16_t bpp = rd16(buf + 28);
  uint32_t compression = rd32(buf + 30);
  int top_down = h < 0;
  if (top_down) h = -h;
  if (hdr_size < 40 || (bpp != 24 && bpp != 32) || compression != 0) {
    free(buf); return BARKIO_E_UNSUPPORTED;
  }
  if ((int64_t)w * h * 3 > out_size || data_off >= (uint32_t)size) {
    free(buf); return BARKIO_E_ARG;
  }
  int64_t stride = ((int64_t)w * (bpp / 8) + 3) & ~3LL;
  if (data_off + stride * h > (int64_t)size) {
    free(buf); return BARKIO_E_FORMAT;
  }
  const int pix = bpp / 8;
  for (int32_t row = 0; row < h; ++row) {
    const uint8_t* src =
        buf + data_off + stride * (top_down ? row : (h - 1 - row));
    uint8_t* dst = out + (int64_t)row * w * 3;
    for (int32_t col = 0; col < w; ++col) {
      dst[3 * col + 0] = src[pix * col + 2];  // BGR(A) -> RGB
      dst[3 * col + 1] = src[pix * col + 1];
      dst[3 * col + 2] = src[pix * col + 0];
    }
  }
  free(buf);
  return BARKIO_OK;
}

// ------------------------------------------------------------------ PNG

static const uint8_t PNG_SIG[8] = {137, 'P', 'N', 'G', 13, 10, 26, 10};

static uint32_t be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}
static void wr_be32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

int png_info(const char* path, int32_t* width, int32_t* height,
             int32_t* channels) {
  uint8_t hdr[33];
  FILE* f = fopen(path, "rb");
  if (!f) return BARKIO_E_OPEN;
  size_t n = fread(hdr, 1, 33, f);
  fclose(f);
  if (n != 33 || memcmp(hdr, PNG_SIG, 8) != 0 ||
      memcmp(hdr + 12, "IHDR", 4) != 0)
    return BARKIO_E_FORMAT;
  *width = be32(hdr + 16);
  *height = be32(hdr + 20);
  int color = hdr[25];
  *channels = color == 0 ? 1 : color == 2 ? 3 : color == 4 ? 2 :
              color == 6 ? 4 : -1;
  if (hdr[24] != 8 || *channels < 0) return BARKIO_E_UNSUPPORTED;
  return BARKIO_OK;
}

static inline int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  return (pa <= pb && pa <= pc) ? a : (pb <= pc) ? b : c;
}

// Decode 8-bit gray/RGB/GA/RGBA PNG into [h * w * channels], top-down.
int png_decode(const char* path, uint8_t* out, int64_t out_size) {
  uint8_t* buf; long size;
  int rc = read_file(path, &buf, &size);
  if (rc) return rc;
  if (size < 45 || memcmp(buf, PNG_SIG, 8) != 0) {
    free(buf); return BARKIO_E_FORMAT;
  }
  int32_t w = 0, h = 0, ch = 0;
  uint8_t *idat = nullptr; int64_t idat_len = 0, idat_cap = 0;
  for (long off = 8; off + 12 <= size;) {
    uint32_t len = be32(buf + off);
    const uint8_t* type = buf + off + 4;
    const uint8_t* data = buf + off + 8;
    if (off + 12 + (long)len > size) { rc = BARKIO_E_FORMAT; break; }
    if (!memcmp(type, "IHDR", 4)) {
      w = be32(data); h = be32(data + 4);
      int bit = data[8], color = data[9], interlace = data[12];
      ch = color == 0 ? 1 : color == 2 ? 3 : color == 4 ? 2 :
           color == 6 ? 4 : -1;
      if (bit != 8 || ch < 0 || interlace != 0) {
        rc = BARKIO_E_UNSUPPORTED; break;
      }
    } else if (!memcmp(type, "IDAT", 4)) {
      if (idat_len + len > idat_cap) {
        idat_cap = (idat_len + len) * 2;
        uint8_t* grown = (uint8_t*)realloc(idat, idat_cap);
        if (!grown) { rc = BARKIO_E_IO; break; }
        idat = grown;
      }
      memcpy(idat + idat_len, data, len);
      idat_len += len;
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  if (!rc && ((int64_t)w * h * ch > out_size || !idat)) rc = BARKIO_E_ARG;
  if (rc) { free(buf); free(idat); return rc; }

  int64_t stride = (int64_t)w * ch;
  int64_t raw_size = (stride + 1) * h;
  uint8_t* raw = (uint8_t*)malloc(raw_size);
  if (!raw) { free(buf); free(idat); return BARKIO_E_IO; }
  uLongf dest_len = (uLongf)raw_size;
  if (uncompress(raw, &dest_len, idat, idat_len) != Z_OK ||
      dest_len != (uLongf)raw_size) {
    free(buf); free(idat); free(raw); return BARKIO_E_ZLIB;
  }
  free(idat);
  // unfilter
  for (int32_t row = 0; row < h; ++row) {
    uint8_t filter = raw[(stride + 1) * row];
    const uint8_t* src = raw + (stride + 1) * row + 1;
    uint8_t* dst = out + stride * row;
    const uint8_t* up = row ? out + stride * (row - 1) : nullptr;
    switch (filter) {
      case 0: memcpy(dst, src, stride); break;
      case 1:
        for (int64_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (i >= ch ? dst[i - ch] : 0);
        break;
      case 2:
        for (int64_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (up ? up[i] : 0);
        break;
      case 3:
        for (int64_t i = 0; i < stride; ++i) {
          int a = i >= ch ? dst[i - ch] : 0, b = up ? up[i] : 0;
          dst[i] = src[i] + ((a + b) >> 1);
        }
        break;
      case 4:
        for (int64_t i = 0; i < stride; ++i) {
          int a = i >= ch ? dst[i - ch] : 0, b = up ? up[i] : 0,
              c = (up && i >= ch) ? up[i - ch] : 0;
          dst[i] = src[i] + paeth(a, b, c);
        }
        break;
      default:
        free(buf); free(raw); return BARKIO_E_FORMAT;
    }
  }
  free(buf);
  free(raw);
  return BARKIO_OK;
}

// Encode 8-bit gray (channels=1) or RGB (channels=3), filter 0 (the dual
// masks and processed textures compress fine; encode speed matters more
// than ratio in the pipeline), zlib level configurable.
int png_encode(const char* path, const uint8_t* img, int32_t w, int32_t h,
               int32_t channels, int32_t zlevel) {
  if (channels != 1 && channels != 3) return BARKIO_E_UNSUPPORTED;
  int64_t stride = (int64_t)w * channels;
  int64_t raw_size = (stride + 1) * h;
  uint8_t* raw = (uint8_t*)malloc(raw_size);
  if (!raw) return BARKIO_E_IO;
  // Sub filter (1) for RGB textures, None (0) for masks: cheap + effective
  uint8_t filter = channels == 3 ? 1 : 0;
  for (int32_t row = 0; row < h; ++row) {
    uint8_t* dst = raw + (stride + 1) * row;
    const uint8_t* src = img + stride * row;
    *dst++ = filter;
    if (filter == 0) {
      memcpy(dst, src, stride);
    } else {
      for (int64_t i = 0; i < stride; ++i)
        dst[i] = src[i] - (i >= channels ? src[i - channels] : 0);
    }
  }
  uLongf comp_cap = compressBound(raw_size);
  uint8_t* comp = (uint8_t*)malloc(comp_cap);
  if (!comp) { free(raw); return BARKIO_E_IO; }
  if (compress2(comp, &comp_cap, raw, raw_size, zlevel) != Z_OK) {
    free(raw); free(comp); return BARKIO_E_ZLIB;
  }
  free(raw);

  FILE* f = fopen(path, "wb");
  if (!f) { free(comp); return BARKIO_E_OPEN; }
  fwrite(PNG_SIG, 1, 8, f);
  uint8_t chunk[25];
  // IHDR
  wr_be32(chunk, 13);
  memcpy(chunk + 4, "IHDR", 4);
  wr_be32(chunk + 8, w);
  wr_be32(chunk + 12, h);
  chunk[16] = 8;                            // bit depth
  chunk[17] = channels == 1 ? 0 : 2;        // gray / truecolor
  chunk[18] = chunk[19] = chunk[20] = 0;    // compression/filter/interlace
  wr_be32(chunk + 21, crc32(0, chunk + 4, 17));
  fwrite(chunk, 1, 25, f);
  // IDAT
  uint8_t lenbuf[8];
  wr_be32(lenbuf, (uint32_t)comp_cap);
  memcpy(lenbuf + 4, "IDAT", 4);
  fwrite(lenbuf, 1, 8, f);
  fwrite(comp, 1, comp_cap, f);
  uint32_t crc = crc32(0, (const Bytef*)"IDAT", 4);
  crc = crc32(crc, comp, comp_cap);
  wr_be32(lenbuf, crc);
  fwrite(lenbuf, 1, 4, f);
  // IEND
  wr_be32(lenbuf, 0);
  memcpy(lenbuf + 4, "IEND", 4);
  fwrite(lenbuf, 1, 8, f);
  wr_be32(lenbuf, crc32(0, (const Bytef*)"IEND", 4));
  fwrite(lenbuf, 1, 4, f);
  free(comp);
  fclose(f);
  return BARKIO_OK;
}

// -------------------------------------------------- threaded batch decode

typedef struct {
  const char** paths;
  uint8_t* out;        // contiguous [n, item_size]
  int64_t item_size;
  int32_t n;
  int32_t next;        // work index
  int32_t* status;     // per-item rc
  int32_t is_png;
  pthread_mutex_t lock;
} batch_job;

static void* batch_worker(void* arg) {
  batch_job* job = (batch_job*)arg;
  for (;;) {
    pthread_mutex_lock(&job->lock);
    int32_t i = job->next++;
    pthread_mutex_unlock(&job->lock);
    if (i >= job->n) return nullptr;
    uint8_t* dst = job->out + (int64_t)i * job->item_size;
    job->status[i] = job->is_png
        ? png_decode(job->paths[i], dst, job->item_size)
        : bmp_decode_rgb(job->paths[i], dst, job->item_size);
  }
}

// Decode n same-shaped files into a contiguous batch with `threads`
// pthreads (GIL-free). status must hold n int32s.
int batch_decode(const char** paths, int32_t n, int32_t is_png,
                 uint8_t* out, int64_t item_size, int32_t* status,
                 int32_t threads) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  batch_job job = {paths, out, item_size, n, 0, status, is_png,
                   PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[64];
  if (threads > 64) threads = 64;
  for (int t = 0; t < threads; ++t)
    pthread_create(&tids[t], nullptr, batch_worker, &job);
  for (int t = 0; t < threads; ++t) pthread_join(tids[t], nullptr);
  for (int32_t i = 0; i < n; ++i)
    if (status[i] != BARKIO_OK) return status[i];
  return BARKIO_OK;
}

}  // extern "C"

// ------------------------------------------------- connected components

// Exact reference remove_small_zones (utils.py:135-148): on a {0,1,2}
// class map, fill non-zero components < min_size (remove_small_holes on
// the class-0 mask), drop class-0 components < min_size
// (remove_small_objects), then write back: dropped class-0 islands ->
// bark (1), filled holes -> 0. 8-connectivity, strict < thresholds —
// skimage-equivalent union-find, two label passes, O(pixels).

extern "C" {

typedef struct {
  int32_t* parent;
  int64_t n;
} uf_t;

static int32_t uf_find(int32_t* parent, int32_t x) {
  int32_t root = x;
  while (parent[root] != root) root = parent[root];
  while (parent[x] != root) { int32_t up = parent[x]; parent[x] = root; x = up; }
  return root;
}

static inline void uf_union(int32_t* parent, int32_t a, int32_t b) {
  a = uf_find(parent, a); b = uf_find(parent, b);
  if (a < b) parent[b] = a; else if (b < a) parent[a] = b;
}

// Label 8-connected true pixels of mask [h, w]; labels[i] = root flat
// index, or -1 for false pixels. parent is caller scratch of h*w int32.
static void label8(const uint8_t* mask, int32_t h, int32_t w,
                   int32_t* parent, int32_t* labels) {
  for (int64_t i = 0; i < (int64_t)h * w; ++i) parent[i] = (int32_t)i;
  for (int32_t r = 0; r < h; ++r) {
    const uint8_t* row = mask + (int64_t)r * w;
    for (int32_t c = 0; c < w; ++c) {
      if (!row[c]) continue;
      int32_t i = r * w + c;
      if (c > 0 && row[c - 1]) uf_union(parent, i, i - 1);
      if (r > 0) {
        const uint8_t* up = mask + (int64_t)(r - 1) * w;
        if (up[c]) uf_union(parent, i, i - w);
        if (c > 0 && up[c - 1]) uf_union(parent, i, i - w - 1);
        if (c + 1 < w && up[c + 1]) uf_union(parent, i, i - w + 1);
      }
    }
  }
  for (int64_t i = 0; i < (int64_t)h * w; ++i)
    labels[i] = mask[i] ? uf_find(parent, (int32_t)i) : -1;
}

// In-place capable (img may equal out). Scratch-free public API.
int remove_small_zones_u8(const uint8_t* img, int32_t h, int32_t w,
                          int32_t min_size, uint8_t* out) {
  int64_t n = (int64_t)h * w;
  int32_t* parent = (int32_t*)malloc(n * 4);
  int32_t* labels = (int32_t*)malloc(n * 4);
  int32_t* area = (int32_t*)malloc(n * 4);
  uint8_t* mask = (uint8_t*)malloc(n);
  uint8_t* filled = (uint8_t*)malloc(n);
  if (!parent || !labels || !area || !mask || !filled) {
    free(parent); free(labels); free(area); free(mask); free(filled);
    return BARKIO_E_IO;
  }
  // pass 1: label the non-zero ("hole") components, fill small ones
  for (int64_t i = 0; i < n; ++i) mask[i] = img[i] != 0;
  label8(mask, h, w, parent, labels);
  memset(area, 0, n * 4);
  for (int64_t i = 0; i < n; ++i) if (labels[i] >= 0) area[labels[i]]++;
  for (int64_t i = 0; i < n; ++i)
    filled[i] = (labels[i] < 0) || (area[labels[i]] < min_size);
  // pass 2: label the (filled) class-0 mask, drop small components
  label8(filled, h, w, parent, labels);
  memset(area, 0, n * 4);
  for (int64_t i = 0; i < n; ++i) if (labels[i] >= 0) area[labels[i]]++;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t cleaned = filled[i] && area[labels[i]] >= min_size;
    uint8_t v = img[i];
    if (!cleaned && v == 0) v = 1;        // dropped class-0 island -> bark
    else if (cleaned && v != 0) v = 0;    // filled hole -> background
    out[i] = v;
  }
  free(parent); free(labels); free(area); free(mask); free(filled);
  return BARKIO_OK;
}

typedef struct {
  const uint8_t* imgs;
  uint8_t* outs;
  const int32_t* valid_h;
  int32_t batch, h, w, min_size;
  int32_t next;
  pthread_mutex_t lock;
} ccl_job;

static void* ccl_worker(void* arg) {
  ccl_job* job = (ccl_job*)arg;
  for (;;) {
    pthread_mutex_lock(&job->lock);
    int32_t i = job->next++;
    pthread_mutex_unlock(&job->lock);
    if (i >= job->batch) return nullptr;
    int64_t off = (int64_t)i * job->h * job->w;
    int32_t vh = job->valid_h ? job->valid_h[i] : job->h;
    if (vh > job->h) vh = job->h;
    remove_small_zones_u8(job->imgs + off, vh, job->w, job->min_size,
                          job->outs + off);
    // zero the padded rows
    if (vh < job->h)
      memset(job->outs + off + (int64_t)vh * job->w, 0,
             (int64_t)(job->h - vh) * job->w);
  }
}

// Batched + ragged (valid_h may be NULL for full-height), threaded.
int remove_small_zones_batch(const uint8_t* imgs, int32_t batch, int32_t h,
                             int32_t w, const int32_t* valid_h,
                             int32_t min_size, uint8_t* outs,
                             int32_t threads) {
  if (threads < 1) threads = 1;
  if (threads > batch) threads = batch;
  if (threads > 64) threads = 64;
  ccl_job job = {imgs, outs, valid_h, batch, h, w, min_size, 0,
                 PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[64];
  for (int t = 0; t < threads; ++t)
    pthread_create(&tids[t], nullptr, ccl_worker, &job);
  for (int t = 0; t < threads; ++t) pthread_join(tids[t], nullptr);
  return BARKIO_OK;
}

}  // extern "C"
