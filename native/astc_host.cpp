// Native host-side runtime for astcenc_tpu.
//
// The TPU owns the codec math; this library owns the host data path around
// it — the role astcenc_image.cpp (block load/store) and the CLI's image
// plumbing play in the reference. Python/numpy handles these loops
// adequately for small images, but production batch encoding moves
// gigabytes through blockify/deblockify per second of device time, and the
// numpy fancy-indexing formulation costs several allocations and passes.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency):
//   blockify_2d_u8:   (H, W, 4) u8 image -> (ny*nx, by*bx, 4) f32 blocks
//                     scaled to [0, 65535] (LDR unorm), edge-clamped —
//                     reference load_image_block_fast_ldr
//                     (astcenc_image.cpp:278-343).
//   deblockify_2d_u8: (ny*nx, by*bx, 4) u8 texels -> (H, W, 4) u8 image —
//                     reference store_image_block (astcenc_image.cpp:345).
//
// Build: native/build.sh (g++ -O3 -shared). Python falls back to the numpy
// path when the shared object is absent.

#include <cstdint>
#include <cstddef>

extern "C" {

void blockify_2d_u8(const uint8_t* img, int H, int W,
                    int bx, int by, float* out) {
    const int nx = (W + bx - 1) / bx;
    const int ny = (H + by - 1) / by;
    const float scale = 65535.0f / 255.0f;
    // Per 256-entry LUT: u8 -> unorm16 f32 (one multiply, hoisted).
    float lut[256];
    for (int i = 0; i < 256; i++) lut[i] = (float)i * scale;

    for (int gy = 0; gy < ny; gy++) {
        for (int gx = 0; gx < nx; gx++) {
            float* dst = out + ((size_t)(gy * nx + gx)) * bx * by * 4;
            for (int ty = 0; ty < by; ty++) {
                int sy = gy * by + ty;
                if (sy >= H) sy = H - 1;
                const uint8_t* row = img + ((size_t)sy * W) * 4;
                for (int tx = 0; tx < bx; tx++) {
                    int sx = gx * bx + tx;
                    if (sx >= W) sx = W - 1;
                    const uint8_t* px = row + (size_t)sx * 4;
                    float* d = dst + ((size_t)(ty * bx + tx)) * 4;
                    d[0] = lut[px[0]];
                    d[1] = lut[px[1]];
                    d[2] = lut[px[2]];
                    d[3] = lut[px[3]];
                }
            }
        }
    }
}

void deblockify_2d_u8(const uint8_t* blocks, int H, int W,
                      int bx, int by, uint8_t* out) {
    const int nx = (W + bx - 1) / bx;
    for (int y = 0; y < H; y++) {
        const int gy = y / by;
        const int ty = y % by;
        uint8_t* orow = out + ((size_t)y * W) * 4;
        for (int x = 0; x < W; x++) {
            const int gx = x / bx;
            const int tx = x % bx;
            const uint8_t* src = blocks
                + ((size_t)(gy * nx + gx) * bx * by + ty * bx + tx) * 4;
            uint8_t* d = orow + (size_t)x * 4;
            d[0] = src[0];
            d[1] = src[1];
            d[2] = src[2];
            d[3] = src[3];
        }
    }
}

}  // extern "C"
