// Native unpacker for the device->host fetch codec (runtime/fetchcodec.py).
//
// The codec ships G pixels per byte over the bandwidth-bound TPU tunnel;
// host-side decoding is a 256-entry lookup-table gather.  numpy's fancy
// indexing does that single-threaded at ~300 MB/s of output; this C++
// kernel does the same gather with a contiguous per-byte memcpy, split
// over a few threads, so decode stays off the critical path even for
// multi-hundred-MB assembles.
//
// Layout contract (mirrors FetchCodec._decode_table):
//   packed : n contiguous input bytes
//   lut    : 256 rows of `stride` bytes; row b holds the `stride` output
//            bytes (group pixels x itemsize) for packed byte value b
//   out    : n * stride bytes, row i = lut[packed[i]]
//
// Dtype-agnostic: the caller passes stride = group * itemsize and views
// everything as raw bytes.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

template <int STRIDE>
void decode_rows_fixed(const uint8_t* packed, int64_t lo, int64_t hi,
                       const uint8_t* lut, uint8_t* out) {
    uint8_t* dst = out + lo * STRIDE;
    for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(dst, lut + int64_t(packed[i]) * STRIDE, STRIDE);
        dst += STRIDE;
    }
}

void decode_rows(const uint8_t* packed, int64_t lo, int64_t hi,
                 const uint8_t* lut, int64_t stride, uint8_t* out) {
    // fixed-size memcpy compiles to straight-line stores; dispatch the
    // common strides (bool/uint8 outputs with group 2..8)
    switch (stride) {
        case 2: return decode_rows_fixed<2>(packed, lo, hi, lut, out);
        case 3: return decode_rows_fixed<3>(packed, lo, hi, lut, out);
        case 4: return decode_rows_fixed<4>(packed, lo, hi, lut, out);
        case 5: return decode_rows_fixed<5>(packed, lo, hi, lut, out);
        case 8: return decode_rows_fixed<8>(packed, lo, hi, lut, out);
    }
    uint8_t* dst = out + lo * stride;
    for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(dst, lut + int64_t(packed[i]) * stride, stride);
        dst += stride;
    }
}

}  // namespace

extern "C" void fetch_decode(const uint8_t* packed, int64_t n,
                             const uint8_t* lut, int64_t stride,
                             uint8_t* out) {
    // thread only when the split pays for itself
    const int64_t kMinPerThread = 1 << 20;
    int hw = int(std::thread::hardware_concurrency());
    int n_threads = int(std::min<int64_t>(
        std::max(1, std::min(hw, 8)), std::max<int64_t>(1, n / kMinPerThread)));
    if (n_threads <= 1) {
        decode_rows(packed, 0, n, lut, stride, out);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back(decode_rows, packed, lo, hi, lut, stride, out);
    }
    for (auto& th : threads) th.join();
}
