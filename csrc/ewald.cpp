// Native Ewald-summation tabulator.
//
// Counterpart of the reference's native layer: where the reference links
// C libraries for its host-side numerics (FFTW via fft.c, GSL splines),
// concept_tpu keeps the device path in XLA and implements the expensive
// *host-side* tabulation (Ewald correction tables, reference
// src/ewald.py:62-271) natively with OpenMP.
//
// Build: make native   (produces concept_tpu/_native.so; ctypes-loaded,
// with a NumPy fallback when absent).

#include <cmath>
#include <cstdint>

extern "C" {

// Periodic acceleration field via Ewald split (unit box, G = 1):
//   a(x) = −Σ_n x_n/|x_n|³ [erfc(αr) + 2αr/√π e^(−α²r²)]
//          −Σ_h 2h/|h|² e^(−π²|h|²/α²) sin(2π h·x)
// pts: (n_pts, 3) doubles in [−0.5, 0.5]; out: (n_pts, 3).
void ewald_acceleration(
    const double* pts, double* out, int64_t n_pts,
    double alpha, int nmax, int h2max)
{
    const double pi = 3.14159265358979323846;
    const double two_over_sqrtpi = 2.0 / std::sqrt(pi);
    const int hmax = (int)std::sqrt((double)h2max);

#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < n_pts; ++p) {
        const double x = pts[3 * p + 0];
        const double y = pts[3 * p + 1];
        const double z = pts[3 * p + 2];
        double ax = 0.0, ay = 0.0, az = 0.0;
        // real-space sum over images
        for (int nx = -nmax; nx <= nmax; ++nx)
            for (int ny = -nmax; ny <= nmax; ++ny)
                for (int nz = -nmax; nz <= nmax; ++nz) {
                    const double rx = x + nx, ry = y + ny, rz = z + nz;
                    const double r2 = rx * rx + ry * ry + rz * rz;
                    if (r2 < 1e-30) continue;
                    const double r = std::sqrt(r2);
                    const double w =
                        std::erfc(alpha * r)
                        + two_over_sqrtpi * alpha * r * std::exp(-alpha * alpha * r2);
                    const double f = w / (r2 * r);
                    ax -= rx * f;
                    ay -= ry * f;
                    az -= rz * f;
                }
        // k-space sum
        for (int hx = -hmax; hx <= hmax; ++hx)
            for (int hy = -hmax; hy <= hmax; ++hy)
                for (int hz = -hmax; hz <= hmax; ++hz) {
                    const int h2 = hx * hx + hy * hy + hz * hz;
                    if (h2 == 0 || h2 > h2max) continue;
                    const double damp =
                        2.0 / h2 * std::exp(-pi * pi * h2 / (alpha * alpha));
                    const double s =
                        std::sin(2.0 * pi * (x * hx + y * hy + z * hz));
                    ax -= damp * s * hx;
                    ay -= damp * s * hy;
                    az -= damp * s * hz;
                }
        out[3 * p + 0] = ax;
        out[3 * p + 1] = ay;
        out[3 * p + 2] = az;
    }
}

// GADGET-2 block codec helpers: f64 → f32 conversion with OpenMP
// (used by the snapshot writer for large particle counts).
void convert_f64_to_f32(const double* src, float* dst, int64_t n)
{
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)src[i];
}

void convert_f32_to_f64(const float* src, double* dst, int64_t n)
{
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) dst[i] = (double)src[i];
}

}  // extern "C"
