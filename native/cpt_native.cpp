// Native runtime components for compute_path_tracer_tpu.
//
// The reference's host runtime is native Rust (src/state.rs image export,
// src/packages/* support); the TPU build keeps the compute path in
// JAX/Pallas and implements the host-side hot paths natively here:
//
//  * HDR -> 8-bit conversion (gamma encode, quantize, y-flip) and PNG
//    encoding (the state.rs:237-303 export path, which for 4K HDR frames is
//    bandwidth-bound on the host and far too slow in pure Python),
//  * the wang_hash chain (rng.glsl:1-9) as an independent cross-check
//    oracle for the JAX implementation.
//
// Exposed as a plain C ABI consumed via ctypes (io/native.py); no Python.h
// dependency.  Build: native/build.sh (g++ -O3 -shared -fPIC, links zlib).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// HDR (H, W, 3) float32 -> RGBA8 with gamma encode and optional y-flip.
// Matches io/png.py:hdr_to_rgba8 exactly (clip, pow(1/gamma), *255 + 0.5).
// ---------------------------------------------------------------------------
void cpt_hdr_to_rgba8(const float* img, int32_t h, int32_t w, float gamma,
                      int32_t flip_y, uint8_t* out) {
  const float inv_gamma = 1.0f / gamma;
  // Precompute an 11-bit lookup ramp is not exact; do the straightforward
  // per-pixel pow, which vectorizes well enough at -O3.
  for (int32_t y = 0; y < h; ++y) {
    const float* row = img + (size_t)y * w * 3;
    uint8_t* orow = out + (size_t)(flip_y ? (h - 1 - y) : y) * w * 4;
    for (int32_t x = 0; x < w; ++x) {
      for (int32_t c = 0; c < 3; ++c) {
        float v = row[x * 3 + c];
        v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        v = powf(v, inv_gamma);
        orow[x * 4 + c] = (uint8_t)(v * 255.0f + 0.5f);
      }
      orow[x * 4 + 3] = 255;
    }
  }
}

// ---------------------------------------------------------------------------
// PNG encode of (H, W, 4) RGBA8: signature + IHDR + one zlib IDAT + IEND,
// filter 0 per scanline - the same container io/png.py emits.
// Returns a malloc'd buffer (caller frees with cpt_free); *out_len receives
// the byte count.  Returns nullptr on failure.
// ---------------------------------------------------------------------------
static void put_u32_be(uint8_t* p, uint32_t v) {
  p[0] = (uint8_t)(v >> 24);
  p[1] = (uint8_t)(v >> 16);
  p[2] = (uint8_t)(v >> 8);
  p[3] = (uint8_t)v;
}

static uint8_t* put_chunk(uint8_t* p, const char* tag, const uint8_t* payload,
                          uint32_t len) {
  put_u32_be(p, len);
  memcpy(p + 4, tag, 4);
  if (len) memcpy(p + 8, payload, len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, p + 4, len + 4);
  put_u32_be(p + 8 + len, crc);
  return p + 12 + len;
}

uint8_t* cpt_encode_png_rgba(const uint8_t* rgba, int32_t h, int32_t w,
                             int32_t compress_level, size_t* out_len) {
  const size_t stride = (size_t)w * 4;
  const size_t raw_len = (stride + 1) * h;
  uint8_t* raw = (uint8_t*)malloc(raw_len);
  if (!raw) return nullptr;
  for (int32_t y = 0; y < h; ++y) {
    uint8_t* line = raw + (size_t)y * (stride + 1);
    line[0] = 0;  // filter: None
    memcpy(line + 1, rgba + (size_t)y * stride, stride);
  }

  uLongf comp_cap = compressBound(raw_len);
  uint8_t* comp = (uint8_t*)malloc(comp_cap);
  if (!comp) {
    free(raw);
    return nullptr;
  }
  if (compress2(comp, &comp_cap, raw, raw_len, compress_level) != Z_OK) {
    free(raw);
    free(comp);
    return nullptr;
  }
  free(raw);

  // 8 sig + (12+13) IHDR + (12+comp) IDAT + 12 IEND
  size_t total = 8 + 25 + 12 + comp_cap + 12;
  uint8_t* out = (uint8_t*)malloc(total);
  if (!out) {
    free(comp);
    return nullptr;
  }
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  memcpy(out, sig, 8);
  uint8_t* p = out + 8;

  uint8_t ihdr[13];
  put_u32_be(ihdr, (uint32_t)w);
  put_u32_be(ihdr + 4, (uint32_t)h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // color type RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  p = put_chunk(p, "IHDR", ihdr, 13);
  p = put_chunk(p, "IDAT", comp, (uint32_t)comp_cap);
  p = put_chunk(p, "IEND", nullptr, 0);
  free(comp);

  *out_len = (size_t)(p - out);
  return out;
}

void cpt_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// wang_hash chain (rng.glsl:1-9): independent oracle for tests.
// ---------------------------------------------------------------------------
void cpt_wang_hash(const uint32_t* in, uint32_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    uint32_t seed = in[i];
    seed = (seed ^ 61u) ^ (seed >> 16);
    seed *= 9u;
    seed = seed ^ (seed >> 4);
    seed *= 0x27d4eb2du;
    seed = seed ^ (seed >> 15);
    out[i] = seed;
  }
}

}  // extern "C"
