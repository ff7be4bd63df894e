// fbt_data: native data-baking engine for the N x fixed-augmentation store.
//
// The reference delegated its pre-baked dataset path to the LMDB C library
// plus PIL-based augmentation in Python worker processes
// (/root/reference/fullbatch/data/lmdb_datasets.py). This library is the
// TPU-native framework's equivalent native component: it replays `rounds`
// augmented epochs (zero-padded random crop + horizontal flip, matching
// torchvision RandomCrop/RandomHorizontalFlip semantics) directly into the
// caller's memory-mapped uint8 output tensor at memory-bandwidth speed,
// deterministic in the seed.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfbt_data.so fbt_data.cpp
// ABI: plain C functions, consumed via ctypes (fullbatchtraining_tpu/data/native.py).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <numeric>
#include <random>
#include <vector>

extern "C" {

// Replay `rounds` augmented epochs of an (n, h, w, c) uint8 dataset.
//   pad:       zero padding before the random crop (crop size == h == w)
//   flip_p:    horizontal flip probability (in [0, 1])
//   first_round_clean: round 0 copies the raw data (strict dataset extension)
//   shuffle:   shuffle the per-round sample order while writing
//   order_out: (rounds * n) int32 buffer receiving the source index of every
//              written sample (labels are derived from it by the caller)
// Output tensor: (rounds, n, h, w, c) uint8, caller-allocated (memmap).
void bake_rounds(const uint8_t* images, int64_t n, int64_t h, int64_t w, int64_t c,
                 int64_t rounds, int64_t pad, double flip_p,
                 int first_round_clean, int shuffle, uint64_t seed,
                 uint8_t* out, int32_t* order_out) {
    const int64_t sample_bytes = h * w * c;
    const int64_t row_bytes = w * c;

    std::vector<uint8_t> padded((h + 2 * pad) * (w + 2 * pad) * c, 0);
    const int64_t pw = w + 2 * pad;

    for (int64_t r = 0; r < rounds; ++r) {
        std::mt19937_64 rng(seed + 0x9E3779B97F4A7C15ULL * (r + 1));
        std::uniform_int_distribution<int64_t> off_dist(0, 2 * pad);
        std::uniform_real_distribution<double> flip_dist(0.0, 1.0);

        std::vector<int64_t> order(n);
        std::iota(order.begin(), order.end(), 0);
        if (shuffle) {
            std::shuffle(order.begin(), order.end(), rng);
        }

        const bool clean = first_round_clean && r == 0;
        uint8_t* round_out = out + r * n * sample_bytes;
        int32_t* round_order = order_out + r * n;

        for (int64_t i = 0; i < n; ++i) {
            const int64_t src = order[i];
            round_order[i] = static_cast<int32_t>(src);
            const uint8_t* sample = images + src * sample_bytes;
            uint8_t* dst = round_out + i * sample_bytes;

            if (clean) {
                std::memcpy(dst, sample, sample_bytes);
                continue;
            }

            // zero-pad into the scratch buffer
            if (pad > 0) {
                std::fill(padded.begin(), padded.end(), 0);
                for (int64_t y = 0; y < h; ++y) {
                    std::memcpy(&padded[((y + pad) * pw + pad) * c],
                                sample + y * row_bytes, row_bytes);
                }
            }
            const uint8_t* source = pad > 0 ? padded.data() : sample;
            const int64_t source_w = pad > 0 ? pw : w;

            const int64_t oy = pad > 0 ? off_dist(rng) : 0;
            const int64_t ox = pad > 0 ? off_dist(rng) : 0;
            const bool flip = flip_dist(rng) < flip_p;

            for (int64_t y = 0; y < h; ++y) {
                const uint8_t* src_row = source + ((y + oy) * source_w + ox) * c;
                uint8_t* dst_row = dst + y * row_bytes;
                if (!flip) {
                    std::memcpy(dst_row, src_row, row_bytes);
                } else {
                    for (int64_t x = 0; x < w; ++x) {
                        std::memcpy(dst_row + x * c, src_row + (w - 1 - x) * c, c);
                    }
                }
            }
        }
    }
}

// Gather rows of an (n, sample_bytes) uint8 matrix into a contiguous output —
// the host-side shuffle/epoch-layout hot path (fraction of numpy fancy-index
// cost, no temporary copies).
void gather_rows(const uint8_t* images, const int64_t* indices, int64_t count,
                 int64_t sample_bytes, uint8_t* out) {
    for (int64_t i = 0; i < count; ++i) {
        std::memcpy(out + i * sample_bytes, images + indices[i] * sample_bytes,
                    sample_bytes);
    }
}

int fbt_abi_version() { return 1; }

}  // extern "C"
