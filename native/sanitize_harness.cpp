// ASAN/UBSAN harness for the two native components (SURVEY.md §5
// sanitizer item): drives the decoder C API with missing / empty /
// garbage / truncated inputs and the rasterizer with degenerate and
// hostile geometry. Built and run by native/sanitize_check.sh; any
// sanitizer report fails the check (exit != 0).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

extern "C" {
void* vd_open(const char* path, int out_w, int out_h);
double vd_fps(void* handle);
int vd_read_frames(void* handle, uint8_t* out, int max_frames, int stride);
void vd_close(void* handle);
void raster_depth(const float* verts, int64_t n_verts, const int32_t* faces,
                  int64_t n_faces, const float* w2c, float fx, float fy,
                  float cx, float cy, int32_t W, int32_t H, float znear,
                  float zfar, float* out);
}

namespace {

int failures = 0;

void expect(bool cond, const char* what) {
  if (!cond) {
    std::fprintf(stderr, "FAIL: %s\n", what);
    ++failures;
  } else {
    std::printf("ok: %s\n", what);
  }
}

std::string write_temp(const char* name, const void* data, size_t n) {
  std::string path = std::string("/tmp/geo4d_sanitize_") + name;
  FILE* f = std::fopen(path.c_str(), "wb");
  if (n) std::fwrite(data, 1, n, f);
  std::fclose(f);
  return path;
}

void decoder_cases(const char* valid_video) {
  // nonexistent path
  expect(vd_open("/nonexistent/geo4d.mp4", 64, 64) == nullptr,
         "decoder rejects missing file");

  // empty file
  std::string empty = write_temp("empty.mp4", "", 0);
  void* h = vd_open(empty.c_str(), 64, 64);
  if (h) vd_close(h);
  expect(h == nullptr, "decoder rejects empty file");

  // pure garbage
  std::vector<uint8_t> garbage(4096);
  for (size_t i = 0; i < garbage.size(); ++i)
    garbage[i] = static_cast<uint8_t>(i * 2654435761u >> 13);
  std::string gpath = write_temp("garbage.bin", garbage.data(), garbage.size());
  h = vd_open(gpath.c_str(), 64, 64);
  if (h) {  // demuxers can mis-sniff garbage; reads must still be safe
    std::vector<uint8_t> buf(4 * 64 * 64 * 3);
    int n = vd_read_frames(h, buf.data(), 4, 1);
    expect(n >= 0 && n <= 4, "garbage file: bounded frame count");
    vd_close(h);
  } else {
    std::printf("ok: decoder rejects garbage file\n");
  }

  if (!valid_video) return;

  // full read of a valid file (baseline the truncation against)
  h = vd_open(valid_video, 48, 32);
  expect(h != nullptr, "decoder opens valid file");
  if (!h) return;
  std::vector<uint8_t> buf(64 * 48 * 32 * 3);
  int n_full = vd_read_frames(h, buf.data(), 64, 1);
  expect(n_full > 0, "valid file yields frames");
  expect(vd_fps(h) > 0, "valid file has fps");
  vd_close(h);

  // decode-correctness checksum: per-channel pixel means over the decoded
  // frames, printed for the caller (tests/test_native_sanitize.py compares
  // them against an independent cv2 decode) — a silently-broken decode
  // (wrong plane order, stride bug, all-zero output) can't pass rejection
  // cases alone, but can't fake these either.
  if (n_full > 0) {
    double sums[3] = {0, 0, 0};
    const size_t npix = static_cast<size_t>(n_full) * 48 * 32;
    for (size_t p = 0; p < npix; ++p)
      for (int c = 0; c < 3; ++c) sums[c] += buf[p * 3 + c];
    std::printf("CHECKSUM n=%d mean_rgb=%.4f,%.4f,%.4f\n", n_full,
                sums[0] / npix, sums[1] / npix, sums[2] / npix);
    // a second open must reproduce the decode bit-for-bit (determinism)
    void* h2 = vd_open(valid_video, 48, 32);
    if (h2) {
      std::vector<uint8_t> buf2(64 * 48 * 32 * 3);
      int n2 = vd_read_frames(h2, buf2.data(), 64, 1);
      expect(n2 == n_full &&
                 std::memcmp(buf.data(), buf2.data(), npix * 3) == 0,
             "valid file: repeat decode is bit-identical");
      vd_close(h2);
    } else {
      expect(false, "valid file reopens");
    }
  }

  // progressively truncated copies: must never crash, never overflow the
  // output buffer, and never return more frames than the intact file
  FILE* f = std::fopen(valid_video, "rb");
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> whole(size);
  if (std::fread(whole.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    expect(false, "read back valid video");
    return;
  }
  std::fclose(f);

  for (double frac : {0.9, 0.5, 0.1, 0.01}) {
    size_t cut = static_cast<size_t>(size * frac);
    std::string tpath = write_temp("trunc.mp4", whole.data(), cut);
    void* th = vd_open(tpath.c_str(), 48, 32);
    if (!th) {
      std::printf("ok: truncated(%.0f%%) rejected at open\n", frac * 100);
      continue;
    }
    // canary-guard the output buffer to detect overruns even without ASAN
    std::vector<uint8_t> out(64 * 48 * 32 * 3 + 64, 0xAB);
    int n = vd_read_frames(th, out.data(), 64, 1);
    bool canary_ok = true;
    for (size_t i = out.size() - 64; i < out.size(); ++i)
      canary_ok &= out[i] == 0xAB;
    expect(n >= 0 && n <= n_full && canary_ok,
           "truncated file: bounded + no overrun");
    vd_close(th);
  }

  // byte-flipped copy (bitstream corruption mid-file)
  std::vector<uint8_t> flipped = whole;
  for (size_t i = flipped.size() / 3; i < flipped.size(); i += 97)
    flipped[i] ^= 0xFF;
  std::string fpath = write_temp("flip.mp4", flipped.data(), flipped.size());
  void* fh = vd_open(fpath.c_str(), 48, 32);
  if (fh) {
    std::vector<uint8_t> out(64 * 48 * 32 * 3);
    int n = vd_read_frames(fh, out.data(), 64, 1);
    expect(n >= 0 && n <= 64, "bit-flipped file: bounded");
    vd_close(fh);
  } else {
    std::printf("ok: bit-flipped file rejected at open\n");
  }
}

void raster_cases() {
  const int W = 32, H = 24;
  std::vector<float> out(W * H);
  float w2c[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};

  // empty mesh
  raster_depth(nullptr, 0, nullptr, 0, w2c, 30, 30, 16, 12, W, H, 0.01f,
               100.0f, out.data());
  bool all_zero = true;
  for (float v : out) all_zero &= v == 0.0f;
  expect(all_zero, "raster: empty mesh -> all zeros");

  // one valid triangle in front of the camera
  std::vector<float> verts = {-1, -1, 2, 1, -1, 2, 0, 1, 2};
  std::vector<int32_t> faces = {0, 1, 2};
  raster_depth(verts.data(), 3, faces.data(), 1, w2c, 30, 30, 16, 12, W, H,
               0.01f, 100.0f, out.data());
  int nonzero = 0;
  for (float v : out) nonzero += v > 0;
  expect(nonzero > 0, "raster: triangle rasterizes");

  // hostile faces: out-of-range and negative indices must be skipped
  std::vector<int32_t> bad_faces = {0,  1,  3,   // one index past the end
                                    -1, 1,  2,   // negative
                                    5,  9,  12,  // all out of range
                                    0,  0,  0};  // degenerate
  raster_depth(verts.data(), 3, bad_faces.data(), 4, w2c, 30, 30, 16, 12, W,
               H, 0.01f, 100.0f, out.data());
  expect(true, "raster: hostile face indices survived");

  // NaN/inf vertices, vertex behind camera, zero-size image bounds
  std::vector<float> nan_verts = {
      std::numeric_limits<float>::quiet_NaN(), 0, 2,
      1, std::numeric_limits<float>::infinity(), 2,
      0, 1, -5};
  raster_depth(nan_verts.data(), 3, faces.data(), 1, w2c, 30, 30, 16, 12, W,
               H, 0.01f, 100.0f, out.data());
  expect(true, "raster: NaN/inf/behind-camera verts survived");

  // inverted clip range and huge focal (coordinate overflow path)
  raster_depth(verts.data(), 3, faces.data(), 1, w2c, 1e30f, 1e30f, 16, 12,
               W, H, 100.0f, 0.01f, out.data());
  expect(true, "raster: inverted znear/zfar + huge focal survived");
}

}  // namespace

int main(int argc, char** argv) {
  const char* valid = argc > 1 ? argv[1] : nullptr;
  decoder_cases(valid);
  raster_cases();
  if (failures) {
    std::fprintf(stderr, "%d failure(s)\n", failures);
    return 1;
  }
  std::printf("sanitize harness: all cases passed\n");
  return 0;
}
