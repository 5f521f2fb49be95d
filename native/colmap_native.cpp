// Native COLMAP binary parsers (runtime component, SURVEY.md N15).
//
// The reference delegates COLMAP ingestion to pycolmap (a C++ library);
// this repo's fallback pure-Python reader walks points3D.bin one
// struct.unpack at a time — minutes at city scale (BASELINE.md config 5:
// multi-million-point reconstructions). This single-pass C++ reader mmaps
// the file and walks the variable-length records directly; the Python side
// binds it with ctypes (splat_trainer_tpu/data/colmap/native.py) and falls
// back to the pure-Python loop when the shared library is unavailable.
//
// Format (COLMAP src/colmap/scene/reconstruction_io.cc):
//   points3D.bin: u64 num; per point: u64 id, 3×f64 xyz, 3×u8 rgb, f64 err,
//                 u64 track_len, track_len × (i32 image_id, i32 point2d_idx)
//   images.bin:   u64 num; per image: i32 id, 4×f64 quat, 3×f64 t, i32 cam,
//                 cstring name, u64 n2d, n2d × (f64 x, f64 y, i64 p3d_id)
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no dependencies)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
    const uint8_t* data = nullptr;
    size_t size = 0;
    int fd = -1;

    bool open_file(const char* path) {
        fd = ::open(path, O_RDONLY);
        if (fd < 0) return false;
        struct stat st;
        if (fstat(fd, &st) != 0 || st.st_size <= 0) {
            ::close(fd);
            return false;
        }
        size = static_cast<size_t>(st.st_size);
        void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
        if (p == MAP_FAILED) {
            ::close(fd);
            return false;
        }
        data = static_cast<const uint8_t*>(p);
        return true;
    }

    ~Mapped() {
        if (data) munmap(const_cast<uint8_t*>(data), size);
        if (fd >= 0) ::close(fd);
    }
};

template <typename T>
inline bool read_le(const uint8_t*& p, const uint8_t* end, T* out) {
    if (p + sizeof(T) > end) return false;
    std::memcpy(out, p, sizeof(T));  // little-endian hosts only (x86/arm64)
    p += sizeof(T);
    return true;
}

}  // namespace

extern "C" {

// Parses points3D.bin: fills caller-provided arrays (capacity `cap` points)
// with xyz (3×f32) and rgb (3×f32 in [0,1]). Returns the number of points
// in the file (callers size with a first call passing cap=0), or -1 on
// parse/open failure. Points beyond cap are counted but not stored.
int64_t splat_read_points3d(const char* path, float* xyz, float* rgb,
                            int64_t cap) {
    Mapped m;
    if (!m.open_file(path)) return -1;
    const uint8_t* p = m.data;
    const uint8_t* end = m.data + m.size;

    uint64_t num = 0;
    if (!read_le(p, end, &num)) return -1;

    for (uint64_t i = 0; i < num; i++) {
        uint64_t id;
        double v[3];
        uint8_t c[3];
        double err;
        uint64_t track_len;
        if (!read_le(p, end, &id)) return -1;
        for (int k = 0; k < 3; k++)
            if (!read_le(p, end, &v[k])) return -1;
        for (int k = 0; k < 3; k++)
            if (!read_le(p, end, &c[k])) return -1;
        if (!read_le(p, end, &err)) return -1;
        if (!read_le(p, end, &track_len)) return -1;
        // compare against remaining bytes without pointer arithmetic on the
        // untrusted length: `p + 8 * track_len` overflows (UB) for corrupt
        // files with a huge track_len and can pass the check
        if (track_len > static_cast<uint64_t>(end - p) / 8) return -1;
        p += 8 * track_len;

        if (static_cast<int64_t>(i) < cap) {
            for (int k = 0; k < 3; k++) {
                xyz[3 * i + k] = static_cast<float>(v[k]);
                rgb[3 * i + k] = static_cast<float>(c[k]) / 255.0f;
            }
        }
    }
    return static_cast<int64_t>(num);
}

// Parses images.bin poses: per image (id i32, quat wxyz 4×f64, t 3×f64,
// camera_id i32, name cstring ≤255 copied into names[256*i]). 2D point
// blocks are skipped. Returns image count or -1.
int64_t splat_read_images(const char* path, int32_t* image_ids,
                          double* qvecs, double* tvecs, int32_t* camera_ids,
                          char* names, int64_t cap) {
    Mapped m;
    if (!m.open_file(path)) return -1;
    const uint8_t* p = m.data;
    const uint8_t* end = m.data + m.size;

    uint64_t num = 0;
    if (!read_le(p, end, &num)) return -1;

    for (uint64_t i = 0; i < num; i++) {
        int32_t id, cam;
        double q[4], t[3];
        if (!read_le(p, end, &id)) return -1;
        for (int k = 0; k < 4; k++)
            if (!read_le(p, end, &q[k])) return -1;
        for (int k = 0; k < 3; k++)
            if (!read_le(p, end, &t[k])) return -1;
        if (!read_le(p, end, &cam)) return -1;

        const uint8_t* name_start = p;
        while (p < end && *p != 0) p++;
        if (p >= end) return -1;
        size_t name_len = static_cast<size_t>(p - name_start);
        p++;  // NUL

        uint64_t n2d;
        if (!read_le(p, end, &n2d)) return -1;
        if (n2d > static_cast<uint64_t>(end - p) / 24) return -1;
        p += 24 * n2d;

        if (static_cast<int64_t>(i) < cap) {
            image_ids[i] = id;
            camera_ids[i] = cam;
            std::memcpy(qvecs + 4 * i, q, sizeof(q));
            std::memcpy(tvecs + 3 * i, t, sizeof(t));
            size_t n = name_len < 255 ? name_len : 255;
            std::memcpy(names + 256 * i, name_start, n);
            names[256 * i + n] = 0;
        }
    }
    return static_cast<int64_t>(num);
}

}  // extern "C"
