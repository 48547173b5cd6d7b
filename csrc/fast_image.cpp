// Fused image preprocessing for the host data path: batched uint8 HWC RGB ->
// resized + rescaled + normalized float32 HWC, multi-threaded.
//
// The reference leans on native third-party decode/aug (decord, cv2,
// albumentations; SURVEY.md §2.9 item 5).  This is our own native component
// for the hottest host op in serving/training: it fuses bilinear resize,
// 1/255 rescale and mean/std normalization into one pass per output pixel,
// avoiding the intermediate buffers a cv2+numpy pipeline materializes.
//
// Built with:  g++ -O3 -march=native -shared -fPIC -o libfastimage.so fast_image.cpp -lpthread
// Exposed via ctypes (dexbotic_tpu/data/fast_image.py).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// One image: bilinear resize (ih, iw) -> (oh, ow) with cv2/PIL half-pixel
// alignment (src = (dst + .5) * scale - .5), then normalize per channel.
// x index/weight tables are precomputed once per image; the inner loop is a
// fused gather-lerp-normalize that the compiler vectorizes.
static void preprocess_one(const uint8_t* src, int ih, int iw,
                           float* dst, int oh, int ow,
                           const float* mean, const float* inv_std) {
    const float sy = float(ih) / float(oh);
    const float sx = float(iw) / float(ow);
    const float rescale = 1.0f / 255.0f;

    std::vector<int> x0s(ow), x1s(ow);
    std::vector<float> wxs(ow);
    for (int x = 0; x < ow; ++x) {
        float fx = (x + 0.5f) * sx - 0.5f;
        if (fx < 0) fx = 0;
        int x0 = (int)fx;
        if (x0 > iw - 1) x0 = iw - 1;
        x0s[x] = x0;
        x1s[x] = std::min(x0 + 1, iw - 1);
        wxs[x] = fx - x0;
    }
    for (int y = 0; y < oh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        if (fy < 0) fy = 0;
        int y0 = (int)fy;
        if (y0 > ih - 1) y0 = ih - 1;
        const int y1 = std::min(y0 + 1, ih - 1);
        const float wy = fy - y0;
        const uint8_t* row0 = src + (size_t)y0 * iw * 3;
        const uint8_t* row1 = src + (size_t)y1 * iw * 3;
        float* out_row = dst + (size_t)y * ow * 3;
        for (int x = 0; x < ow; ++x) {
            const int x0 = x0s[x] * 3, x1 = x1s[x] * 3;
            const float wx = wxs[x];
            float* out = out_row + x * 3;
            for (int c = 0; c < 3; ++c) {
                const float v0 = row0[x0 + c] + wx * (float(row0[x1 + c]) - row0[x0 + c]);
                const float v1 = row1[x0 + c] + wx * (float(row1[x1 + c]) - row1[x0 + c]);
                const float v = v0 + wy * (v1 - v0);
                out[c] = (v * rescale - mean[c]) * inv_std[c];
            }
        }
    }
}

// Batched entry point: B images of identical input size, threaded.
void preprocess_batch(const uint8_t* src, int b, int ih, int iw,
                      float* dst, int oh, int ow,
                      const float* mean, const float* std_, int num_threads) {
    float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
    const size_t in_stride = (size_t)ih * iw * 3;
    const size_t out_stride = (size_t)oh * ow * 3;
    if (num_threads <= 1 || b == 1) {
        for (int i = 0; i < b; ++i)
            preprocess_one(src + i * in_stride, ih, iw, dst + i * out_stride,
                           oh, ow, mean, inv_std);
        return;
    }
    std::vector<std::thread> threads;
    const int nt = std::min(num_threads, b);
    for (int t = 0; t < nt; ++t) {
        threads.emplace_back([=]() {
            for (int i = t; i < b; i += nt)
                preprocess_one(src + i * in_stride, ih, iw,
                               dst + i * out_stride, oh, ow, mean, inv_std);
        });
    }
    for (auto& th : threads) th.join();
}

// Centered pad-to-square into a caller-provided buffer (uint8 HWC).
void expand2square_u8(const uint8_t* src, int h, int w,
                      uint8_t* dst, int side, const uint8_t* fill) {
    for (int y = 0; y < side; ++y)
        for (int x = 0; x < side; ++x)
            std::memcpy(dst + (y * side + x) * 3, fill, 3);
    const int top = (side - h) / 2;
    const int left = (side - w) / 2;
    for (int y = 0; y < h; ++y)
        std::memcpy(dst + ((top + y) * side + left) * 3, src + y * w * 3,
                    (size_t)w * 3);
}

}  // extern "C"
