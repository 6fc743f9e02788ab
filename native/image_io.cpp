// Native image encoding + tonemap.
//
// The reference writes screenshots in host C++ (hand-rolled 18-byte TGA
// header, CudaTracer/CudaTracer.cu:795-813) and tonemaps on device
// (writeToPixelsKernel, CudaTracer.cu:63-104). Here the device keeps float
// radiance; this native module does the display-side conversion fast on the
// host: clamp + gamma (via a 4096-entry LUT) + quantize, and TGA encoding —
// so progressive saves never stall the accelerator stream.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// radiance [h*w*3] float -> uint8 RGB with clamp + gamma + +0.5 rounding.
// Byte-exact with the Python oracle (ops/tonemap.py: tonemap + to_uint8):
// an input-quantizing LUT loses up to ~4 gray levels where the gamma curve
// is steep near 0, so the power is computed directly. NaN radiance maps to
// 0 (the !(v > 0) form catches NaN, which passes both < and > clamps).
void ptn_tonemap_u8(const float *radiance, int n_px, float gamma,
                    uint8_t *out) {
  for (int i = 0; i < n_px * 3; i++) {
    float v = radiance[i];
    if (!(v > 0.0f)) v = 0.0f;          // negatives and NaN -> 0
    if (v > 1.0f) v = 1.0f;
    float q = 255.0f * std::pow(v, gamma) + 0.5f;
    out[i] = static_cast<uint8_t>(q > 255.0f ? 255.0f : q);
  }
}

// 18-byte uncompressed true-color TGA, BGR, bottom-up rows — the byte layout
// of the reference's saveScreenshot (CudaTracer.cu:795-813).
int ptn_write_tga(const char *path, const uint8_t *rgb, int w, int h) {
  std::FILE *f = std::fopen(path, "wb");
  if (!f) return -1;
  uint8_t header[18] = {0};
  header[2] = 2;  // uncompressed true-color
  header[12] = static_cast<uint8_t>(w & 0xff);
  header[13] = static_cast<uint8_t>((w >> 8) & 0xff);
  header[14] = static_cast<uint8_t>(h & 0xff);
  header[15] = static_cast<uint8_t>((h >> 8) & 0xff);
  header[16] = 24;
  std::fwrite(header, 1, 18, f);
  std::vector<uint8_t> row(static_cast<size_t>(w) * 3);
  for (int y = 0; y < h; y++) {
    const uint8_t *src = rgb + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; x++) {  // RGB -> BGR
      row[x * 3 + 0] = src[x * 3 + 2];
      row[x * 3 + 1] = src[x * 3 + 1];
      row[x * 3 + 2] = src[x * 3 + 0];
    }
    std::fwrite(row.data(), 1, row.size(), f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
