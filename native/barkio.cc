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
#include <cmath>
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

// ---- run-length connected components ------------------------------------
// A label pass touches every pixel; real class maps are blobby, so rows
// decompose into few long runs. Unioning RUNS instead of pixels cuts the
// union-find work from O(pixels) finds to O(runs) (measured ~4x on bench
// content). 8-connectivity between rows: half-open runs a=[a0,a1) and
// b=[b0,b1) in adjacent rows touch iff b0 <= a1 && b1 >= a0 (a dilated by
// one column on each side).

typedef struct {
  int32_t* c0;       // run start column (inclusive)
  int32_t* c1;       // run end column (exclusive)
  int32_t* parent;   // union-find over run indices
  int32_t* area;     // per-root pixel count (filled after label)
  int32_t* row_off;  // [h + 1] run index range per row
  int32_t n;
} rsz_runs;

static int rsz_runs_alloc(rsz_runs* R, int32_t cap, int32_t h) {
  R->c0 = (int32_t*)malloc((int64_t)cap * 4);
  R->c1 = (int32_t*)malloc((int64_t)cap * 4);
  R->parent = (int32_t*)malloc((int64_t)cap * 4);
  R->area = (int32_t*)malloc((int64_t)cap * 4);
  R->row_off = (int32_t*)malloc(((int64_t)h + 1) * 4);
  R->n = 0;
  return R->c0 && R->c1 && R->parent && R->area && R->row_off;
}

static void rsz_runs_free(rsz_runs* R) {
  free(R->c0); free(R->c1); free(R->parent); free(R->area);
  free(R->row_off);
}

// Union adjacent-row runs and accumulate per-root areas.
static void rsz_runs_label(rsz_runs* R, int32_t h) {
  for (int32_t i = 0; i < R->n; ++i) R->parent[i] = i;
  for (int32_t r = 1; r < h; ++r) {
    int32_t pb = R->row_off[r - 1], pe = R->row_off[r];
    int32_t pi = pb;
    for (int32_t a = R->row_off[r]; a < R->row_off[r + 1]; ++a) {
      while (pi < pe && R->c1[pi] < R->c0[a]) pi++;
      int32_t k = pi;
      while (k < pe && R->c0[k] <= R->c1[a]) {
        uf_union(R->parent, a, k);
        k++;
      }
      if (k > pi) pi = k - 1;  // the last run may also touch the next a
    }
  }
  memset(R->area, 0, (int64_t)R->n * 4);
  for (int32_t i = 0; i < R->n; ++i)
    R->area[uf_find(R->parent, i)] += R->c1[i] - R->c0[i];
}

// In-place capable (img may equal out). Scratch-free public API.
int remove_small_zones_u8(const uint8_t* img, int32_t h, int32_t w,
                          int32_t min_size, uint8_t* out) {
  // worst case: alternating pixels -> (w/2 + 1) runs per row. Size in
  // 64-bit: at h*w/2 > 2^31 a 32-bit product would wrap and undersize
  // the run buffers (heap overflow in the run-recording loops below).
  int64_t cap64 = (int64_t)(w / 2 + 1) * h;
  if (cap64 > INT32_MAX) return BARKIO_E_IO;  // >~4 gigapixel masks
  int32_t cap = (int32_t)cap64;
  rsz_runs nz, fl;  // pass 1: non-zero runs; pass 2: "filled" runs
  if (!rsz_runs_alloc(&nz, cap, h)) { rsz_runs_free(&nz); return BARKIO_E_IO; }
  if (!rsz_runs_alloc(&fl, cap, h)) {
    rsz_runs_free(&nz); rsz_runs_free(&fl); return BARKIO_E_IO;
  }

  // pass 1: runs of non-zero pixels ("holes" in the class-0 mask)
  for (int32_t r = 0; r < h; ++r) {
    const uint8_t* row = img + (int64_t)r * w;
    nz.row_off[r] = nz.n;
    int32_t c = 0;
    while (c < w) {
      while (c < w && row[c] == 0) c++;
      if (c >= w) break;
      int32_t c0 = c;
      while (c < w && row[c] != 0) c++;
      nz.c0[nz.n] = c0; nz.c1[nz.n] = c; nz.n++;
    }
  }
  nz.row_off[h] = nz.n;
  rsz_runs_label(&nz, h);

  // pass 2: the "filled" mask = zeros plus small non-zero components;
  // its runs are the per-row complement of the BIG non-zero runs.
  for (int32_t r = 0; r < h; ++r) {
    fl.row_off[r] = fl.n;
    int32_t cur = 0;  // start of the pending filled interval
    for (int32_t i = nz.row_off[r]; i < nz.row_off[r + 1]; ++i) {
      if (nz.area[uf_find(nz.parent, i)] < min_size) continue;  // filled
      if (nz.c0[i] > cur) {
        fl.c0[fl.n] = cur; fl.c1[fl.n] = nz.c0[i]; fl.n++;
      }
      cur = nz.c1[i];
    }
    if (cur < w) { fl.c0[fl.n] = cur; fl.c1[fl.n] = w; fl.n++; }
  }
  fl.row_off[h] = fl.n;
  rsz_runs_label(&fl, h);

  // write-back (reference utils.py:145-146 semantics):
  //   kept (big) filled run:   cleaned -> non-zero pixels become 0
  //   dropped (small) one:     !cleaned -> zero pixels become 1 (bark)
  //   outside filled runs (big non-zero components): unchanged
  for (int32_t r = 0; r < h; ++r) {
    const uint8_t* irow = img + (int64_t)r * w;
    uint8_t* orow = out + (int64_t)r * w;
    if (orow != irow) memcpy(orow, irow, w);
    for (int32_t i = fl.row_off[r]; i < fl.row_off[r + 1]; ++i) {
      int32_t kept = fl.area[uf_find(fl.parent, i)] >= min_size;
      if (kept) {
        for (int32_t c = fl.c0[i]; c < fl.c1[i]; ++c)
          if (irow[c] != 0) orow[c] = 0;
      } else {
        for (int32_t c = fl.c0[i]; c < fl.c1[i]; ++c)
          if (irow[c] == 0) orow[c] = 1;
      }
    }
  }
  rsz_runs_free(&nz);
  rsz_runs_free(&fl);
  return BARKIO_OK;
}

// ---- v2: packed input + fused remap/count -------------------------------
// The predict engine pulls class maps from the device 2-bit packed (4
// pixels/byte) to quarter the device->host bytes, then needs the cleaned
// map, the exclude_nodes remap, and per-class pixel counts for the CSV.
// Doing all of that in the same native pass kills three separate numpy
// sweeps over the batch (LUT unpack gather, np.where remap, bincount) and
// the 4x unpacked intermediate they allocate.

typedef struct {
  const uint8_t* imgs;  // [b, h, w] u8, or [b, h, w/4] packed (2-bit LE)
  uint8_t* outs;        // [b, h, w] cleaned (always unpacked)
  int64_t* counts;      // [b, 3] per-class pixel counts over valid rows,
                        // post-clean/post-remap; may be NULL
  const int32_t* valid_h;
  int32_t packed, exclude_nodes;
  int32_t batch, h, w, min_size;
  int32_t next;
  int32_t rc;  // first per-image error (BARKIO_OK if none)
  pthread_mutex_t lock;
} ccl2_job;

static void* ccl2_worker(void* arg) {
  ccl2_job* job = (ccl2_job*)arg;
  // 2-bit unpack table: byte -> 4 pixel values (little-endian pixel
  // order, matching the device packing: pixel k in bits [2k, 2k+2))
  static uint32_t lut[256];
  static pthread_once_t once = PTHREAD_ONCE_INIT;
  struct init {
    static void fill() {
      for (uint32_t v = 0; v < 256; ++v) {
        uint8_t p[4];
        for (int k = 0; k < 4; ++k) p[k] = (v >> (2 * k)) & 3;
        memcpy(&lut[v], p, 4);
      }
    }
  };
  pthread_once(&once, init::fill);
  for (;;) {
    pthread_mutex_lock(&job->lock);
    int32_t i = job->next++;
    pthread_mutex_unlock(&job->lock);
    if (i >= job->batch) return nullptr;
    int64_t off = (int64_t)i * job->h * job->w;
    int32_t vh = job->valid_h ? job->valid_h[i] : job->h;
    if (vh > job->h) vh = job->h;
    uint8_t* out = job->outs + off;
    int32_t rc;
    if (job->packed) {
      // unpack the valid rows straight into the output buffer, then
      // clean in place (remove_small_zones_u8 is in-place capable)
      const uint8_t* src = job->imgs + (int64_t)i * job->h * (job->w / 4);
      int64_t n = (int64_t)vh * (job->w / 4);
      if (((uintptr_t)out & 3) == 0) {  // w % 4 == 0 keeps rows aligned
        uint32_t* dst = (uint32_t*)out;
        for (int64_t k = 0; k < n; ++k) dst[k] = lut[src[k]];
      } else {  // unaligned base (never for numpy-allocated buffers)
        for (int64_t k = 0; k < n; ++k)
          memcpy(out + 4 * k, &lut[src[k]], 4);
      }
      rc = remove_small_zones_u8(out, vh, job->w, job->min_size, out);
    } else {
      rc = remove_small_zones_u8(job->imgs + off, vh, job->w,
                                 job->min_size, out);
    }
    if (rc != BARKIO_OK) {  // malloc failure / gigapixel guard: surface
      pthread_mutex_lock(&job->lock);
      if (job->rc == BARKIO_OK) job->rc = rc;
      pthread_mutex_unlock(&job->lock);
      continue;  // out may be unwritten — skip the remap/count sweep
    }
    if (vh < job->h)
      memset(out + (int64_t)vh * job->w, 0,
             (int64_t)(job->h - vh) * job->w);
    // fused remap + count over the valid rows (one sequential sweep).
    // c has 256 slots: cleaned engine maps only hold {0,1,2}, but this
    // is a public C entry and arbitrary u8 values must count safely
    // (like the np.bincount this replaces), not index past the array.
    int64_t c[256] = {0};
    int64_t nv = (int64_t)vh * job->w;
    if (job->exclude_nodes) {  // node class 2 -> 1 (ref models.py:273-276)
      for (int64_t k = 0; k < nv; ++k) {
        if (out[k] == 2) out[k] = 1;
        c[out[k]]++;
      }
    } else if (job->counts) {
      for (int64_t k = 0; k < nv; ++k) c[out[k]]++;
    }
    if (job->counts)
      memcpy(job->counts + (int64_t)i * 3, c, 3 * sizeof(int64_t));
  }
}

// Packed (2-bit, w % 4 == 0) or plain batched remove_small_zones with the
// exclude_nodes remap and per-class counts fused into the same pass.
int remove_small_zones_batch2(const uint8_t* imgs, int32_t packed,
                              int32_t batch, int32_t h, int32_t w,
                              const int32_t* valid_h, int32_t min_size,
                              int32_t exclude_nodes, uint8_t* outs,
                              int64_t* counts, int32_t threads) {
  if (packed && (w % 4)) return BARKIO_E_ARG;
  if (threads < 1) threads = 1;
  if (threads > batch) threads = batch;
  if (threads > 64) threads = 64;
  ccl2_job job = {imgs, outs, counts, valid_h, packed, exclude_nodes,
                  batch, h, w, min_size, 0, BARKIO_OK,
                  PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[64];
  for (int t = 0; t < threads; ++t)
    pthread_create(&tids[t], nullptr, ccl2_worker, &job);
  for (int t = 0; t < threads; ++t) pthread_join(tids[t], nullptr);
  return job.rc;
}

// Batched + ragged (valid_h may be NULL for full-height), threaded.
// Kept as the v1 ABI; delegates to the v2 machinery (plain input, no
// remap, no counts) so there is one worker implementation to maintain.
int remove_small_zones_batch(const uint8_t* imgs, int32_t batch, int32_t h,
                             int32_t w, const int32_t* valid_h,
                             int32_t min_size, uint8_t* outs,
                             int32_t threads) {
  return remove_small_zones_batch2(imgs, 0, batch, h, w, valid_h,
                                   min_size, 0, outs, nullptr, threads);
}

}  // extern "C"

// ----------------------------- native preprocess (resize + trim) --------
// The reference preprocessor (models.py:191-203) resizes 4096^2 captures
// to 1024^2 with skimage's prefiltered cubic B-spline and trims dark
// bands. The Python host backend reproduces that with scipy
// (ops/resize.py:spline_resize_host) — exact, but single-threaded scipy
// IIR + numpy tap sweeps. This is the same math as one fused native
// pass: per-line double-precision IIR prefilter (pole z = sqrt(3)-2,
// exact mirror-boundary initialization — Unser's formulas, matching
// scipy.ndimage.spline_filter1d mode='mirror'), float32 4-tap B-spline
// evaluation in numpy's accumulation order, clip to the input range
// (skimage clip=True), dark-band trim bounds, and uint8 quantization
// (rint(clip(x,0,1)*255)) — threaded over rows/columns with the same
// pthread pool pattern as the batch decoder.

namespace {

constexpr double kPole = -0.26794919243112270647;  // sqrt(3) - 2
constexpr double kGain = 6.0;  // (1 - z) * (1 - 1/z) for the cubic pole
// scipy truncates the causal mirror init to ceil(log(eps)/log|z|) terms
// when the line is longer than that (= 28 for the cubic pole at double
// eps); below it, the exact closed form. Same branch here.
constexpr int64_t kInitHorizon = 28;

// generic static-partition parallel_for over [0, n)
typedef struct {
  void (*fn)(void* ctx, int64_t begin, int64_t end);
  void* ctx;
  int64_t n;
  int32_t threads;
  int32_t next_chunk;
  int64_t chunk;
  pthread_mutex_t lock;
} pfor_job;

void* pfor_worker(void* arg) {
  pfor_job* job = (pfor_job*)arg;
  for (;;) {
    pthread_mutex_lock(&job->lock);
    int64_t begin = (int64_t)job->next_chunk * job->chunk;
    job->next_chunk++;
    pthread_mutex_unlock(&job->lock);
    if (begin >= job->n) return nullptr;
    int64_t end = begin + job->chunk;
    if (end > job->n) end = job->n;
    job->fn(job->ctx, begin, end);
  }
}

void parallel_for(int64_t n, int32_t threads,
                  void (*fn)(void* ctx, int64_t begin, int64_t end),
                  void* ctx) {
  if (threads < 1) threads = 1;
  if (threads > 64) threads = 64;
  if ((int64_t)threads > n) threads = (int32_t)(n > 0 ? n : 1);
  if (threads == 1) { fn(ctx, 0, n); return; }
  // ~4 chunks per thread: cheap dynamic balance without contention
  int64_t chunk = n / (4 * threads);
  if (chunk < 1) chunk = 1;
  pfor_job job = {fn, ctx, n, threads, 0, chunk,
                  PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[64];
  for (int t = 0; t < threads; ++t)
    pthread_create(&tids[t], nullptr, pfor_worker, &job);
  for (int t = 0; t < threads; ++t) pthread_join(tids[t], nullptr);
}

// IIR prefilter along axis 0 (rows direction) for a block of columns
// [c_begin, c_end) of an [h, w3] f32 image (w3 = w * channels).
// Vectorized row-wise over sub-blocks of <= 256 columns whose causal
// coefficients live in a [h, 256] double scratch, so the arithmetic is
// scipy's whole-line-in-double (bit-exact) while memory access stays
// sequential and the scratch stays cache-sized (8 MB at h = 4096).
typedef struct {
  float* img;
  int64_t h, w3;
} filt0_ctx;

void filter_axis0_subblock(float* img, int64_t h, int64_t w3,
                           int64_t c_begin, int64_t nb, double* dbuf) {
  double acc[256];
  if (kInitHorizon < h) {
    // truncated causal mirror init: c0 = sum_{j<horizon} z^j (g x[j])
    // (the reflected tail is below double eps at this horizon)
    for (int64_t c = 0; c < nb; ++c) acc[c] = 0.0;
    double zj = 1.0;
    for (int64_t j = 0; j < kInitHorizon; ++j) {
      const double wgt = kGain * zj;
      const float* row = img + j * w3 + c_begin;
      for (int64_t c = 0; c < nb; ++c) acc[c] += wgt * row[c];
      zj *= kPole;
    }
  } else {
    // exact closed form: c0 = (g x0 + z^{n-1} g x_{n-1} +
    //   sum_{j=1}^{n-2} (z^j + z^{2n-2-j}) g x_j) / (1 - z^{2n-2})
    const double zn1 = pow(kPole, (double)(h - 1));
    const double denom = 1.0 - zn1 * zn1;
    const float* r0 = img + c_begin;
    const float* rl = img + (h - 1) * w3 + c_begin;
    for (int64_t c = 0; c < nb; ++c)
      acc[c] = kGain * (r0[c] + zn1 * rl[c]);
    double zj = kPole, z2nj = zn1 * zn1 / kPole;
    for (int64_t j = 1; j < h - 1; ++j) {
      const double wgt = kGain * (zj + z2nj);
      const float* row = img + j * w3 + c_begin;
      for (int64_t c = 0; c < nb; ++c) acc[c] += wgt * row[c];
      zj *= kPole;
      z2nj /= kPole;
    }
    for (int64_t c = 0; c < nb; ++c) acc[c] /= denom;
  }
  // causal: c[i] = g x[i] + z c[i-1], kept in double
  for (int64_t c = 0; c < nb; ++c) dbuf[c] = acc[c];
  for (int64_t i = 1; i < h; ++i) {
    const float* row = img + i * w3 + c_begin;
    double* cur = dbuf + i * nb;
    const double* prev = dbuf + (i - 1) * nb;
    for (int64_t c = 0; c < nb; ++c)
      cur[c] = kGain * row[c] + kPole * prev[c];
  }
  // anticausal init (mirror): c[n-1] = z/(z^2-1) (z c[n-2] + c[n-1]),
  // then c[i] = z (c[i+1] - c[i]); f32 write-back happens once here
  {
    const double f = kPole / (kPole * kPole - 1.0);
    double* last = dbuf + (h - 1) * nb;
    const double* pen = dbuf + (h - 2) * nb;
    float* row = img + (h - 1) * w3 + c_begin;
    for (int64_t c = 0; c < nb; ++c) {
      last[c] = f * (kPole * pen[c] + last[c]);
      row[c] = (float)last[c];
    }
  }
  for (int64_t i = h - 2; i >= 0; --i) {
    double* cur = dbuf + i * nb;
    const double* nxt = dbuf + (i + 1) * nb;
    float* row = img + i * w3 + c_begin;
    for (int64_t c = 0; c < nb; ++c) {
      cur[c] = kPole * (nxt[c] - cur[c]);
      row[c] = (float)cur[c];
    }
  }
}

void filter_axis0_block(void* vctx, int64_t c_begin, int64_t c_end) {
  filt0_ctx* ctx = (filt0_ctx*)vctx;
  const int64_t h = ctx->h;
  if (h == 1) return;  // coefficients equal samples
  double* dbuf = (double*)malloc((size_t)h * 256 * sizeof(double));
  if (!dbuf) return;
  for (int64_t c0 = c_begin; c0 < c_end; c0 += 256) {
    const int64_t nb = (c_end - c0) < 256 ? (c_end - c0) : 256;
    filter_axis0_subblock(ctx->img, h, ctx->w3, c0, nb, dbuf);
  }
  free(dbuf);
}

// IIR prefilter along axis 1 for rows [r_begin, r_end): each row is a
// contiguous [w, ch] strip; the recursion runs per channel with stride
// ch inside a double line buffer (whole line in double, like scipy).
typedef struct {
  float* img;
  int64_t w, ch, w3;
} filt1_ctx;

void filter_axis1_rows(void* vctx, int64_t r_begin, int64_t r_end) {
  filt1_ctx* ctx = (filt1_ctx*)vctx;
  const int64_t w = ctx->w, ch = ctx->ch, w3 = ctx->w3;
  if (w == 1) return;
  double* line = (double*)malloc(w3 * sizeof(double));
  if (!line) return;
  const double zn1 = pow(kPole, (double)(w - 1));
  const double denom = 1.0 - zn1 * zn1;
  const double af = kPole / (kPole * kPole - 1.0);
  for (int64_t r = r_begin; r < r_end; ++r) {
    float* row = ctx->img + r * w3;
    for (int64_t i = 0; i < w3; ++i) line[i] = kGain * row[i];
    for (int64_t c = 0; c < ch; ++c) {
      double* l = line + c;
      double acc;
      if (kInitHorizon < w) {  // truncated causal mirror init
        acc = 0.0;
        double zj = 1.0;
        for (int64_t j = 0; j < kInitHorizon; ++j) {
          acc += zj * l[j * ch];
          zj *= kPole;
        }
      } else {  // exact closed form
        acc = l[0] + zn1 * l[(w - 1) * ch];
        double zj = kPole, z2nj = zn1 * zn1 / kPole;
        for (int64_t j = 1; j < w - 1; ++j) {
          acc += (zj + z2nj) * l[j * ch];
          zj *= kPole;
          z2nj /= kPole;
        }
        acc /= denom;
      }
      l[0] = acc;
      for (int64_t i = 1; i < w; ++i)
        l[i * ch] += kPole * l[(i - 1) * ch];
      l[(w - 1) * ch] = af * (kPole * l[(w - 2) * ch] + l[(w - 1) * ch]);
      for (int64_t i = w - 2; i >= 0; --i)
        l[i * ch] = kPole * (l[(i + 1) * ch] - l[i * ch]);
    }
    for (int64_t i = 0; i < w3; ++i) row[i] = (float)line[i];
  }
  free(line);
}

// 4-tap cubic B-spline evaluation taps at half-pixel coordinates with
// scipy 'mirror' indices (ops/resize.py:_bspline_taps parity: weights
// computed in double, stored f32).
void bspline_taps(int64_t in_size, int64_t out_size, int32_t* idx,
                  float* wgt) {
  const double scale = (double)in_size / (double)out_size;
  const int64_t period = in_size > 1 ? 2 * in_size - 2 : 1;
  for (int64_t o = 0; o < out_size; ++o) {
    const double x = ((double)o + 0.5) * scale - 0.5;
    const int64_t base = (int64_t)floor(x);
    for (int k = 0; k < 4; ++k) {
      const int64_t tap = base + k - 1;
      int64_t m = tap >= 0 ? tap % period : (-tap) % period;
      if (m >= in_size) m = period - m;
      idx[4 * o + k] = (int32_t)m;
      const double u = fabs(x - (double)tap);
      double bw = 0.0;
      if (u < 1.0)
        bw = (4.0 - 6.0 * u * u + 3.0 * u * u * u) / 6.0;
      else if (u < 2.0)
        bw = (2.0 - u) * (2.0 - u) * (2.0 - u) / 6.0;
      wgt[4 * o + k] = (float)bw;
    }
  }
}

// rows tap pass: out[o, :] = sum_k w[k,o] * coef[idx[k,o], :]
typedef struct {
  const float* coef;
  float* out;
  const int32_t* idx;
  const float* wgt;
  int64_t w3;
} rows_ctx;

void resize_rows_pass(void* vctx, int64_t o_begin, int64_t o_end) {
  rows_ctx* ctx = (rows_ctx*)vctx;
  const int64_t w3 = ctx->w3;
  for (int64_t o = o_begin; o < o_end; ++o) {
    float* dst = ctx->out + o * w3;
    const float w0 = ctx->wgt[4 * o], w1 = ctx->wgt[4 * o + 1],
                w2 = ctx->wgt[4 * o + 2], w3f = ctx->wgt[4 * o + 3];
    const float* s0 = ctx->coef + (int64_t)ctx->idx[4 * o] * w3;
    const float* s1 = ctx->coef + (int64_t)ctx->idx[4 * o + 1] * w3;
    const float* s2 = ctx->coef + (int64_t)ctx->idx[4 * o + 2] * w3;
    const float* s3 = ctx->coef + (int64_t)ctx->idx[4 * o + 3] * w3;
    // numpy accumulation order: ((w0*s0 + w1*s1) + w2*s2) + w3*s3
    for (int64_t i = 0; i < w3; ++i)
      dst[i] = ((w0 * s0[i] + w1 * s1[i]) + w2 * s2[i]) + w3f * s3[i];
  }
}

// cols tap pass + clip: out2[r, j, :] = clip(sum_k w[k,j] *
// tmp[r, idx[k,j], :], lo, hi)
typedef struct {
  const float* tmp;
  float* out;
  const int32_t* idx;
  const float* wgt;
  int64_t in_w, out_w, ch;
  float lo, hi;
} cols_ctx;

void resize_cols_pass(void* vctx, int64_t r_begin, int64_t r_end) {
  cols_ctx* ctx = (cols_ctx*)vctx;
  const int64_t ch = ctx->ch;
  for (int64_t r = r_begin; r < r_end; ++r) {
    const float* src = ctx->tmp + r * ctx->in_w * ch;
    float* dst = ctx->out + r * ctx->out_w * ch;
    for (int64_t j = 0; j < ctx->out_w; ++j) {
      const float w0 = ctx->wgt[4 * j], w1 = ctx->wgt[4 * j + 1],
                  w2 = ctx->wgt[4 * j + 2], w3f = ctx->wgt[4 * j + 3];
      const float* s0 = src + (int64_t)ctx->idx[4 * j] * ch;
      const float* s1 = src + (int64_t)ctx->idx[4 * j + 1] * ch;
      const float* s2 = src + (int64_t)ctx->idx[4 * j + 2] * ch;
      const float* s3 = src + (int64_t)ctx->idx[4 * j + 3] * ch;
      for (int64_t c = 0; c < ch; ++c) {
        float v = ((w0 * s0[c] + w1 * s1[c]) + w2 * s2[c]) + w3f * s3[c];
        if (v < ctx->lo) v = ctx->lo;
        if (v > ctx->hi) v = ctx->hi;
        dst[j * ch + c] = v;
      }
    }
  }
}

// u8 -> f32/255 conversion
typedef struct {
  const uint8_t* src;
  float* dst;
} u8f_ctx;

void u8_to_f32_pass(void* vctx, int64_t begin, int64_t end) {
  u8f_ctx* ctx = (u8f_ctx*)vctx;
  // f32 division, not reciprocal multiply: numpy's astype(f32)/255.0
  // rounds the division result, and 1-ulp input deltas can cross the
  // rint boundary after the resize
  for (int64_t i = begin; i < end; ++i)
    ctx->dst[i] = (float)ctx->src[i] / 255.0f;
}

// trim row flags + quantize: keep[r] = mean_w(sum_c(v) > thr) > frac;
// out u8 = rint(clip(v, 0, 1) * 255) (rint = ties to even, like np.rint)
typedef struct {
  const float* img;
  uint8_t* out;
  uint8_t* keep;  // may be NULL (no trim decision needed)
  int64_t w, ch;
  float thr;     // pixel channel-sum threshold: numpy compares f32 > f32
  double frac;   // row fraction: numpy mean() is f64, compared in f64
} quant_ctx;

void quantize_trim_pass(void* vctx, int64_t r_begin, int64_t r_end) {
  quant_ctx* ctx = (quant_ctx*)vctx;
  const int64_t w = ctx->w, ch = ctx->ch;
  for (int64_t r = r_begin; r < r_end; ++r) {
    const float* src = ctx->img + r * w * ch;
    uint8_t* dst = ctx->out + r * w * ch;
    int64_t nonblack = 0;
    for (int64_t j = 0; j < w; ++j) {
      float s = 0.0f;
      for (int64_t c = 0; c < ch; ++c) {
        float v = src[j * ch + c];
        s += v;
        if (v < 0.0f) v = 0.0f;
        if (v > 1.0f) v = 1.0f;
        dst[j * ch + c] = (uint8_t)(int)rintf(v * 255.0f);
      }
      if (s > ctx->thr) nonblack++;
    }
    if (ctx->keep)
      ctx->keep[r] = ((double)nonblack / (double)w) > ctx->frac;
  }
}

}  // namespace

extern "C" {

// Full preprocess of one decoded RGB image (reference models.py:191-203
// semantics; twin of pipeline/preprocess._preprocess_host_one):
//   f32 = img / 255
//   if max(h, w) > target: prefiltered cubic B-spline resize to
//     target x target (scipy/skimage parity), clipped to the input range
//   if resized or h == w: compute trim bounds over the float image
//     (channel-sum > thr per pixel; row kept when the nonblack fraction
//     > frac); *first/*last get the kept row range, caller crops
//   out u8 = rint(clip(f32, 0, 1) * 255)
// out must hold target*target*3 bytes when resizing, else h*w*3.
// When no trim decision applies, *first = -1. Threaded across
// rows/columns with `threads` pthreads.
int preprocess_image_u8(const uint8_t* img, int32_t in_h, int32_t in_w,
                        int32_t target, double trim_thr, double trim_frac,
                        uint8_t* out, int32_t* first, int32_t* last,
                        int32_t threads) {
  if (!img || !out || !first || !last || in_h < 1 || in_w < 1 ||
      target < 2)
    return BARKIO_E_ARG;
  const int64_t ch = 3;
  const int do_resize = (in_h > target || in_w > target);
  const int do_trim = do_resize || (in_h == in_w);
  const int64_t oh = do_resize ? target : in_h;
  const int64_t ow = do_resize ? target : in_w;

  // input range for the resize clip (skimage clip=True): min/max of the
  // u8 source, exact in f32 after /255
  float lo = 1.0f, hi = 0.0f;
  if (do_resize) {
    uint8_t mn = 255, mx = 0;
    const int64_t n = (int64_t)in_h * in_w * ch;
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t v = img[i];
      if (v < mn) mn = v;
      if (v > mx) mx = v;
    }
    lo = (float)mn * (1.0f / 255.0f);
    hi = (float)mx * (1.0f / 255.0f);
  }

  float* fimg = (float*)malloc((int64_t)in_h * in_w * ch * sizeof(float));
  if (!fimg) return BARKIO_E_IO;
  u8f_ctx uc = {img, fimg};
  parallel_for((int64_t)in_h * in_w * ch, threads, u8_to_f32_pass, &uc);

  float* final_f = fimg;
  float* resized = nullptr;
  float* tmp = nullptr;
  int32_t* ridx = nullptr;
  float* rwgt = nullptr;
  if (do_resize) {
    // prefilter both axes in place
    filt0_ctx f0 = {fimg, in_h, (int64_t)in_w * ch};
    parallel_for((int64_t)in_w * ch, threads, filter_axis0_block, &f0);
    filt1_ctx f1 = {fimg, in_w, ch, (int64_t)in_w * ch};
    parallel_for(in_h, threads, filter_axis1_rows, &f1);

    tmp = (float*)malloc((int64_t)target * in_w * ch * sizeof(float));
    resized = (float*)malloc((int64_t)target * target * ch *
                             sizeof(float));
    ridx = (int32_t*)malloc(4 * (int64_t)target * sizeof(int32_t));
    rwgt = (float*)malloc(4 * (int64_t)target * sizeof(float));
    if (!tmp || !resized || !ridx || !rwgt) {
      free(fimg); free(tmp); free(resized); free(ridx); free(rwgt);
      return BARKIO_E_IO;
    }
    bspline_taps(in_h, target, ridx, rwgt);
    rows_ctx rc = {fimg, tmp, ridx, rwgt, (int64_t)in_w * ch};
    parallel_for(target, threads, resize_rows_pass, &rc);
    bspline_taps(in_w, target, ridx, rwgt);
    cols_ctx cc = {tmp, resized, ridx, rwgt, in_w, target, ch, lo, hi};
    parallel_for(target, threads, resize_cols_pass, &cc);
    free(tmp); tmp = nullptr;
    free(fimg); fimg = nullptr;
    final_f = resized;
  }

  uint8_t* keep = do_trim ? (uint8_t*)malloc(oh) : nullptr;
  if (do_trim && !keep) {
    free(fimg); free(resized); free(ridx); free(rwgt);
    return BARKIO_E_IO;
  }
  quant_ctx qc = {final_f, out, keep, ow, ch, (float)trim_thr,
                  trim_frac};
  parallel_for(oh, threads, quantize_trim_pass, &qc);

  if (do_trim) {
    // np.argmax semantics: first True, all-False -> 0 (no trim)
    int32_t f = 0, l = (int32_t)oh;
    while (f < (int32_t)oh && !keep[f]) f++;
    if (f == (int32_t)oh) f = 0;  // all-False: argmax = 0
    int32_t back = 0;
    while (back < (int32_t)oh && !keep[oh - 1 - back]) back++;
    if (back == (int32_t)oh) back = 0;
    l = (int32_t)oh - back;
    *first = f;
    *last = l;
  } else {
    *first = -1;
    *last = -1;
  }
  free(keep);
  free(resized);
  free(fimg);
  free(ridx);
  free(rwgt);
  return BARKIO_OK;
}

}  // extern "C"
