// Mesh -> depth-map z-buffer rasterizer (host-side, C++).
//
// Replaces the reference's pyrender OffscreenRenderer DEPTH_ONLY pass
// (datasets_preprocess/preprocess_scannetpp.py:195,290-296): ScanNet++
// ground-truth depth is rendered from the laser-scan mesh at each camera.
// pyrender needs an OpenGL context; this is a self-contained software
// rasterizer with perspective-correct depth (1/z interpolation), exposed
// via a C ABI for ctypes.
//
// Build: native/build.sh -> libgeo4d_raster.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// verts: (n_verts, 3) float32 world-space
// faces: (n_faces, 3) int32
// w2c:   (4, 4) float32 row-major world-to-camera (OpenCV convention,
//        +z forward)
// K:     fx, fy, cx, cy
// out:   (H, W) float32, 0 where no geometry (or outside [znear, zfar])
void raster_depth(const float* verts, int64_t n_verts,
                  const int32_t* faces, int64_t n_faces,
                  const float* w2c, float fx, float fy, float cx, float cy,
                  int32_t W, int32_t H, float znear, float zfar,
                  float* out) {
    std::vector<float> cam(n_verts * 3);
    for (int64_t i = 0; i < n_verts; ++i) {
        const float* v = verts + i * 3;
        for (int r = 0; r < 3; ++r) {
            cam[i * 3 + r] = w2c[r * 4 + 0] * v[0] + w2c[r * 4 + 1] * v[1] +
                             w2c[r * 4 + 2] * v[2] + w2c[r * 4 + 3];
        }
    }

    // z-buffer initialized to +inf; output written as depth at the end
    std::vector<float> zbuf(static_cast<size_t>(W) * H,
                            std::numeric_limits<float>::infinity());

    std::vector<float> sx(n_verts), sy(n_verts), iz(n_verts);
    for (int64_t i = 0; i < n_verts; ++i) {
        float z = cam[i * 3 + 2];
        if (z > 1e-9f) {
            iz[i] = 1.0f / z;
            sx[i] = fx * cam[i * 3 + 0] * iz[i] + cx;
            sy[i] = fy * cam[i * 3 + 1] * iz[i] + cy;
        } else {
            iz[i] = -1.0f;  // behind the camera
        }
    }

    for (int64_t f = 0; f < n_faces; ++f) {
        int32_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
        if (a < 0 || b < 0 || c < 0 ||
            a >= n_verts || b >= n_verts || c >= n_verts) continue;
        // skip triangles with any vertex behind the camera (clipping the
        // general case is unnecessary for closed indoor scan meshes)
        if (iz[a] <= 0 || iz[b] <= 0 || iz[c] <= 0) continue;

        float x0 = sx[a], y0 = sy[a], x1 = sx[b], y1 = sy[b], x2 = sx[c], y2 = sy[c];
        float minx = std::min({x0, x1, x2}), maxx = std::max({x0, x1, x2});
        float miny = std::min({y0, y1, y2}), maxy = std::max({y0, y1, y2});
        int ix0 = std::max(0, (int)std::floor(minx));
        int ix1 = std::min(W - 1, (int)std::ceil(maxx));
        int iy0 = std::max(0, (int)std::floor(miny));
        int iy1 = std::min(H - 1, (int)std::ceil(maxy));
        if (ix0 > ix1 || iy0 > iy1) continue;

        float area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
        if (std::fabs(area) < 1e-12f) continue;
        float inv_area = 1.0f / area;

        for (int y = iy0; y <= iy1; ++y) {
            for (int x = ix0; x <= ix1; ++x) {
                float px = x + 0.0f, py = y + 0.0f;  // pixel-center origin
                float w0 = ((x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)) * inv_area;
                float w1 = ((x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)) * inv_area;
                float w2 = 1.0f - w0 - w1;
                // epsilon absorbs f32 rounding when an edge passes exactly
                // through a pixel center (shared-diagonal dropout); slight
                // edge over-coverage is harmless under the z-buffer
                const float kEps = -1e-5f;
                if (w0 < kEps || w1 < kEps || w2 < kEps) continue;
                // perspective-correct: 1/z interpolates linearly in screen
                float inv_z = w0 * iz[a] + w1 * iz[b] + w2 * iz[c];
                if (inv_z <= 0) continue;
                float z = 1.0f / inv_z;
                if (z < znear || z > zfar) continue;
                size_t idx = static_cast<size_t>(y) * W + x;
                if (z < zbuf[idx]) zbuf[idx] = z;
            }
        }
    }

    for (size_t i = 0; i < zbuf.size(); ++i) {
        out[i] = std::isinf(zbuf[i]) ? 0.0f : zbuf[i];
    }
}

}  // extern "C"
