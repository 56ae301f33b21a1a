// Native write-ahead log: CRC32-framed binary records, fsync'd batches,
// torn-tail-tolerant replay.
//
// The host-side durability engine standing where the reference uses the
// native redb crate (reference: src/index/embedded/mod.rs:37-88 — single
// file, one fsync per committed transaction, crash-consistent). Scope is
// a Bitcask-style log rather than a COW B-tree because the backend keeps
// its tables in memory and rebuilds on boot; the log only needs ordered,
// checksummed, durable frames.
//
// Frame layout (little-endian):
//   u32 magic 0x55434650 ("UCFP") | u32 len | u32 crc32(payload) | payload
//
// Replay stops at the first bad magic/len/crc — a torn tail from a crash
// is dropped, matching the JSON WAL fallback's last-complete-line rule.
//
// C ABI for ctypes; every function returns 0 on success, negative errno
// style on failure.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

#include <fcntl.h>
#include <unistd.h>
#include <sys/stat.h>

namespace {

constexpr uint32_t kMagic = 0x55434650;  // "UCFP"

uint32_t crc32_table[256];
bool crc_init_done = false;

void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int j = 0; j < 8; j++) c = (c & 1) ? (0xEDB88320u ^ (c >> 1)) : (c >> 1);
    crc32_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t crc32(const uint8_t* data, size_t len) {
  crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < len; i++) c = crc32_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

struct Store {
  int fd = -1;
  std::string path;
  std::vector<uint8_t> pending;  // buffered frames awaiting commit
};

}  // namespace

extern "C" {

// Open (create if missing) the log at `path`. Returns handle or null.
void* ucfp_wal_open(const char* path) {
  Store* s = new Store();
  s->path = path;
  s->fd = ::open(path, O_RDWR | O_CREAT | O_APPEND, 0644);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  return s;
}

// Buffer one frame; durable only after ucfp_wal_commit.
int ucfp_wal_append(void* h, const uint8_t* data, uint32_t len) {
  Store* s = static_cast<Store*>(h);
  if (!s || s->fd < 0) return -1;
  uint32_t header[3] = {kMagic, len, crc32(data, len)};
  const uint8_t* hb = reinterpret_cast<const uint8_t*>(header);
  s->pending.insert(s->pending.end(), hb, hb + sizeof(header));
  s->pending.insert(s->pending.end(), data, data + len);
  return 0;
}

// Write buffered frames and fsync — one durability point per batch,
// matching the reference's one-commit-per-txn.
int ucfp_wal_commit(void* h) {
  Store* s = static_cast<Store*>(h);
  if (!s || s->fd < 0) return -1;
  if (s->pending.empty()) return 0;
  size_t off = 0;
  while (off < s->pending.size()) {
    ssize_t n = ::write(s->fd, s->pending.data() + off, s->pending.size() - off);
    if (n < 0) return -2;
    off += static_cast<size_t>(n);
  }
  s->pending.clear();
  if (::fsync(s->fd) != 0) return -3;
  return 0;
}

// Replay all complete frames through `cb(ctx, data, len)`; returns the
// number of frames delivered, or negative on I/O error. Stops silently
// at a torn tail.
typedef void (*ucfp_wal_cb)(void* ctx, const uint8_t* data, uint32_t len);

long ucfp_wal_replay(const char* path, ucfp_wal_cb cb, void* ctx) {
  FILE* f = ::fopen(path, "rb");
  if (!f) return 0;  // no log yet: nothing to replay
  long count = 0;
  std::vector<uint8_t> buf;
  for (;;) {
    uint32_t header[3];
    if (::fread(header, 1, sizeof(header), f) != sizeof(header)) break;
    if (header[0] != kMagic) break;
    uint32_t len = header[1];
    if (len > (1u << 30)) break;
    buf.resize(len);
    if (::fread(buf.data(), 1, len, f) != len) break;
    if (crc32(buf.data(), len) != header[2]) break;
    cb(ctx, buf.data(), len);
    count++;
  }
  ::fclose(f);
  return count;
}

// Atomically replace the log with the frames buffered since open — used
// by compaction: open a fresh store at path.tmp, append the snapshot,
// then rename over the old log.
int ucfp_wal_replace(void* h, const char* final_path) {
  Store* s = static_cast<Store*>(h);
  if (!s || s->fd < 0) return -1;
  int rc = ucfp_wal_commit(h);
  if (rc != 0) return rc;
  if (::rename(s->path.c_str(), final_path) != 0) return -4;
  // fsync the containing directory so the rename itself is durable
  std::string dir(final_path);
  size_t slash = dir.find_last_of('/');
  dir = (slash == std::string::npos) ? std::string(".") : dir.substr(0, slash);
  int dfd = ::open(dir.c_str(), O_RDONLY | O_DIRECTORY);
  if (dfd >= 0) {
    ::fsync(dfd);
    ::close(dfd);
  }
  s->path = final_path;
  return 0;
}

int ucfp_wal_close(void* h) {
  Store* s = static_cast<Store*>(h);
  if (!s) return -1;
  if (s->fd >= 0) {
    ucfp_wal_commit(h);
    ::close(s->fd);
  }
  delete s;
  return 0;
}

}  // extern "C"
