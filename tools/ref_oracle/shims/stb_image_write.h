#pragma once
// stb_image_write-compatible shim for the offline oracle build: writes
// binary PPM (P6) bytes regardless of the requested format. PIL detects
// image type by content, so the parity harness reads these transparently.
#include <cstdio>

inline int lumice_shim_write_ppm(const char* filename, int w, int h, int comp, const void* data) {
  if (comp != 3 || !data || w <= 0 || h <= 0) return 0;
  std::FILE* f = std::fopen(filename, "wb");
  if (!f) return 0;
  std::fprintf(f, "P6\n%d %d\n255\n", w, h);
  size_t n = static_cast<size_t>(w) * h * 3;
  size_t written = std::fwrite(data, 1, n, f);
  std::fclose(f);
  return written == n ? 1 : 0;
}

inline int stbi_write_png(const char* filename, int w, int h, int comp, const void* data, int /*stride*/) {
  return lumice_shim_write_ppm(filename, w, h, comp, data);
}

inline int stbi_write_jpg(const char* filename, int w, int h, int comp, const void* data, int /*quality*/) {
  return lumice_shim_write_ppm(filename, w, h, comp, data);
}
