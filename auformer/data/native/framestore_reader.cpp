// FrameStore native reader + batched JPEG decode.
//
// The reference's per-sample hot loop does 16 LMDB gets + 16 cv2.imdecode
// calls from Python (SURVEY.md §3.2, aff2compdataset.py:126-155). This
// module is the TPU build's native replacement for that dependency surface
// (LMDB C library + OpenCV/libjpeg decode, SURVEY.md §2.3): it mmaps the
// framestore shard format (see data/framestore.py for the layout), resolves
// keys through an open-addressing hash table, and decodes whole clips of
// JPEGs into a caller-provided uint8 buffer on a worker pool — one Python
// call (GIL released by ctypes) per clip or per batch of clips.
//
// C ABI (consumed via ctypes in native/__init__.py):
//   void*  fs_open(const char* dir);
//   void   fs_close(void* h);
//   long   fs_num_entries(void* h);
//   int    fs_get_raw(void* h, const char* key, const uint8_t** ptr,
//                     long* size);
//   int    fs_decode_batch(void* h, const char** keys, int n,
//                          uint8_t* out, int height, int width,
//                          int channels, uint8_t* ok, int n_threads);
//
// fs_decode_batch decodes keys[i] into out[i*H*W*C]; ok[i]=1 on success,
// 0 on missing key / decode failure / size mismatch (caller leaves the
// frame black — the reference's fallback semantics).

#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <atomic>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct Entry {
  uint16_t shard;
  uint64_t offset;
  uint32_t length;
};

struct Store {
  std::unordered_map<std::string, Entry> index;
  std::vector<const uint8_t*> maps;
  std::vector<size_t> sizes;
};

bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = fread(out->data(), 1, n, f);
  fclose(f);
  return got == static_cast<size_t>(n);
}

// -- libjpeg error handling: longjmp instead of exit() ----------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// decode one JPEG into dst (H*W*C, RGB or grayscale). Returns success.
bool decode_jpeg(const uint8_t* data, size_t size, uint8_t* dst, int height,
                 int width, int channels) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (channels == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != height ||
      static_cast<int>(cinfo.output_width) != width ||
      static_cast<int>(cinfo.output_components) != channels) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  const int stride = width * channels;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = dst + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

extern "C" {

void* fs_open(const char* dir) {
  std::string base(dir);
  std::vector<uint8_t> idx;
  if (!read_file(base + "/index.bin", &idx)) return nullptr;

  Store* s = new Store();
  size_t pos = 0, n = idx.size();
  while (pos + 2 <= n) {
    uint16_t klen;
    memcpy(&klen, idx.data() + pos, 2);
    pos += 2;
    if (pos + klen + 14 > n) break;
    std::string key(reinterpret_cast<const char*>(idx.data() + pos), klen);
    pos += klen;
    Entry e;
    memcpy(&e.shard, idx.data() + pos, 2);
    memcpy(&e.offset, idx.data() + pos + 2, 8);
    memcpy(&e.length, idx.data() + pos + 10, 4);
    pos += 14;
    s->index.emplace(std::move(key), e);
  }
  // mmap shards until one is missing
  for (int i = 0;; ++i) {
    char name[64];
    snprintf(name, sizeof(name), "/shard-%05d.bin", i);
    std::string p = base + name;
    int fd = open(p.c_str(), O_RDONLY);
    if (fd < 0) break;
    struct stat st;
    fstat(fd, &st);
    const uint8_t* m = nullptr;
    if (st.st_size > 0) {
      m = static_cast<const uint8_t*>(
          mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
      if (m == MAP_FAILED) m = nullptr;
    }
    close(fd);
    s->maps.push_back(m);
    s->sizes.push_back(st.st_size);
  }
  if (s->maps.empty()) {
    delete s;
    return nullptr;
  }
  return s;
}

void fs_close(void* h) {
  Store* s = static_cast<Store*>(h);
  if (!s) return;
  for (size_t i = 0; i < s->maps.size(); ++i)
    if (s->maps[i]) munmap(const_cast<uint8_t*>(s->maps[i]), s->sizes[i]);
  delete s;
}

long fs_num_entries(void* h) {
  return static_cast<Store*>(h)->index.size();
}

int fs_get_raw(void* h, const char* key, const uint8_t** ptr, long* size) {
  Store* s = static_cast<Store*>(h);
  auto it = s->index.find(key);
  if (it == s->index.end()) return 0;
  const Entry& e = it->second;
  if (e.shard >= s->maps.size() || !s->maps[e.shard]) return 0;
  *ptr = s->maps[e.shard] + e.offset;
  *size = e.length;
  return 1;
}

int fs_decode_batch(void* h, const char** keys, int n, uint8_t* out,
                    int height, int width, int channels, uint8_t* ok,
                    int n_threads) {
  Store* s = static_cast<Store*>(h);
  const size_t frame_bytes =
      static_cast<size_t>(height) * width * channels;
  std::atomic<int> next(0);
  int workers = n_threads < 1 ? 1 : n_threads;
  if (workers > n) workers = n;

  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      ok[i] = 0;
      if (!keys[i] || !keys[i][0]) continue;  // empty key = skip (black)
      auto it = s->index.find(keys[i]);
      if (it == s->index.end()) continue;
      const Entry& e = it->second;
      if (e.shard >= s->maps.size() || !s->maps[e.shard]) continue;
      if (decode_jpeg(s->maps[e.shard] + e.offset, e.length,
                      out + frame_bytes * i, height, width, channels))
        ok[i] = 1;
    }
  };

  if (workers <= 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int w = 0; w < workers; ++w) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  }
  return 1;
}

}  // extern "C"
