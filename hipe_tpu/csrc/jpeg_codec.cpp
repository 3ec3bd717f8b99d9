// Native JPEG codec for hipe_tpu — the TPU-native replacement for the
// reference's vendored CImg image IO (/root/reference/CImg/CImg.h load_jpeg /
// save_jpeg entry points used by heterogeneous_blur.c:106-137). Decodes
// directly to interleaved HWC uint8 (the layout the reference converts to by
// hand, heterogeneous_blur.c:128-135) and encodes back. A pthread pool
// provides batched decode for the streaming input pipeline so host decode
// can keep up with the TPU.
//
// Built as a shared library and bound via ctypes (see hipe_tpu/io_/jpeg.py).

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit_handler(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

}  // namespace

extern "C" {

// Returns 0 on success. Fills w/h/c from the JPEG header.
int hipe_jpeg_dims(const unsigned char* buf, size_t len, int* w, int* h,
                   int* c) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  *c = cinfo.num_components >= 3 ? 3 : 1;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode into caller-allocated out (h*w*c bytes, interleaved HWC).
// Returns 0 on success.
int hipe_jpeg_decode(const unsigned char* buf, size_t len, unsigned char* out,
                     int expect_w, int expect_h, int expect_c) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = expect_c == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != expect_w ||
      static_cast<int>(cinfo.output_height) != expect_h ||
      static_cast<int>(cinfo.output_components) != expect_c) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const size_t stride = static_cast<size_t>(expect_w) * expect_c;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Encode interleaved HWC uint8 to JPEG. Caller provides out buffer of
// capacity out_cap; written length returned in *out_len. Returns 0 on
// success, 3 if the output did not fit.
int hipe_jpeg_encode(const unsigned char* img, int w, int h, int c,
                     int quality, unsigned char* out, size_t out_cap,
                     size_t* out_len) {
  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;
  unsigned char* mem = nullptr;
  unsigned long mem_len = 0;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_compress(&cinfo);
    if (mem) free(mem);
    return 1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &mem, &mem_len);
  cinfo.image_width = static_cast<JDIMENSION>(w);
  cinfo.image_height = static_cast<JDIMENSION>(h);
  cinfo.input_components = c;
  cinfo.in_color_space = c == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  const size_t stride = static_cast<size_t>(w) * c;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<unsigned char*>(img) +
                   cinfo.next_scanline * stride;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  int rc = 0;
  if (mem_len <= out_cap) {
    memcpy(out, mem, mem_len);
    *out_len = mem_len;
  } else {
    rc = 3;
  }
  free(mem);
  return rc;
}

// ---- Batched multithreaded decode (input pipeline hot path) ----

struct BatchTask {
  const unsigned char* const* bufs;
  const size_t* lens;
  unsigned char* out;      // batch * h*w*c, contiguous
  size_t image_bytes;
  int w, h, c;
  int count;
  int* rcs;                // per-image return codes
  // work queue
  pthread_mutex_t mu;
  int next;
};

void* batch_worker(void* arg) {
  BatchTask* t = static_cast<BatchTask*>(arg);
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int i = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (i >= t->count) break;
    t->rcs[i] = hipe_jpeg_decode(t->bufs[i], t->lens[i],
                                 t->out + static_cast<size_t>(i) * t->image_bytes,
                                 t->w, t->h, t->c);
  }
  return nullptr;
}

// Decode `count` JPEGs concurrently into one contiguous HWC batch buffer.
// Returns the number of failed images (0 == all good).
int hipe_jpeg_decode_batch(const unsigned char* const* bufs,
                           const size_t* lens, int count, unsigned char* out,
                           int w, int h, int c, int num_threads) {
  BatchTask t;
  t.bufs = bufs;
  t.lens = lens;
  t.out = out;
  t.image_bytes = static_cast<size_t>(w) * h * c;
  t.w = w;
  t.h = h;
  t.c = c;
  t.count = count;
  t.next = 0;
  t.rcs = static_cast<int*>(calloc(count, sizeof(int)));
  pthread_mutex_init(&t.mu, nullptr);

  if (num_threads < 1) num_threads = 1;
  if (num_threads > count) num_threads = count;
  pthread_t* threads =
      static_cast<pthread_t*>(malloc(sizeof(pthread_t) * num_threads));
  for (int i = 0; i < num_threads; ++i)
    pthread_create(&threads[i], nullptr, batch_worker, &t);
  for (int i = 0; i < num_threads; ++i) pthread_join(threads[i], nullptr);

  int failures = 0;
  for (int i = 0; i < count; ++i) failures += (t.rcs[i] != 0);
  free(t.rcs);
  free(threads);
  pthread_mutex_destroy(&t.mu);
  return failures;
}

}  // extern "C"
