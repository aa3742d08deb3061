// njw_tpu native host library.
//
// OpenMP C++ implementations of the hot CPU paths — the TPU-native
// framework's counterpart of the reference's C++17 CPU cores
// (ref: src/weather-sim/cpp/src/weather_simulation.cpp:503-539 OpenMP SWE
// stencil; src/nbody_sim/cpp LJ/force loops; signal FIR CPU paths).
// Role here: a *fast CPU oracle* for large-grid validation (the NumPy
// oracle is exact but slow) and a host-side compute fallback.
//
// Exposed via extern "C" for ctypes (no pybind11 dependency in the image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Shallow-water tendencies, periodic BC, f32 (matches
// njw_tpu/weather/oracle.py swe_tendencies_np math and operation order).
// Fields are (ny, nx) row-major.
// ---------------------------------------------------------------------------
void swe_tendencies(const float* u, const float* v, const float* h,
                    float* du, float* dv, float* dh,
                    int32_t ny, int32_t nx,
                    float dx, float dy, float gravity, float coriolis_f) {
    const float cx = 0.5f / dx;
    const float cy = 0.5f / dy;
#pragma omp parallel for
    for (int32_t j = 0; j < ny; ++j) {
        const int32_t jn = (j + 1) % ny;       // south neighbor (j+1)
        const int32_t jp = (j + ny - 1) % ny;  // north neighbor (j-1)
        for (int32_t i = 0; i < nx; ++i) {
            const int32_t ie = (i + 1) % nx;
            const int32_t iw = (i + nx - 1) % nx;
            const int32_t c = j * nx + i;
            const float u_x = (u[j * nx + ie] - u[j * nx + iw]) * cx;
            const float u_y = (u[jn * nx + i] - u[jp * nx + i]) * cy;
            const float v_x = (v[j * nx + ie] - v[j * nx + iw]) * cx;
            const float v_y = (v[jn * nx + i] - v[jp * nx + i]) * cy;
            const float h_x = (h[j * nx + ie] - h[j * nx + iw]) * cx;
            const float h_y = (h[jn * nx + i] - h[jp * nx + i]) * cy;
            du[c] = -u[c] * u_x - v[c] * u_y - gravity * h_x
                    + coriolis_f * v[c];
            dv[c] = -u[c] * v_x - v[c] * v_y - gravity * h_y
                    - coriolis_f * u[c];
            dh[c] = -h[c] * (u_x + v_y) - u[c] * h_x - v[c] * h_y;
        }
    }
}

// Full RK4 step in place: s <- RK4(s). Scratch provided by the caller
// (12 field-sized buffers).
void swe_rk4_step(float* u, float* v, float* h, float* scratch,
                  int32_t ny, int32_t nx, float dx, float dy,
                  float gravity, float coriolis_f, float dt) {
    const int64_t n = (int64_t)ny * nx;
    float* k1u = scratch + 0 * n;  float* k1v = scratch + 1 * n;
    float* k1h = scratch + 2 * n;
    float* k2u = scratch + 3 * n;  float* k2v = scratch + 4 * n;
    float* k2h = scratch + 5 * n;
    float* tu = scratch + 6 * n;   float* tv = scratch + 7 * n;
    float* th = scratch + 8 * n;
    float* au = scratch + 9 * n;   float* av = scratch + 10 * n;
    float* ah = scratch + 11 * n;

    const float half = 0.5f * dt;
    // k1 = T(s); mid = s + dt/2 k1; acc = k1
    swe_tendencies(u, v, h, k1u, k1v, k1h, ny, nx, dx, dy, gravity,
                   coriolis_f);
#pragma omp parallel for
    for (int64_t c = 0; c < n; ++c) {
        au[c] = k1u[c]; av[c] = k1v[c]; ah[c] = k1h[c];
        tu[c] = u[c] + half * k1u[c];
        tv[c] = v[c] + half * k1v[c];
        th[c] = h[c] + half * k1h[c];
    }
    // k2 = T(mid); acc += 2 k2; mid = s + dt/2 k2
    swe_tendencies(tu, tv, th, k2u, k2v, k2h, ny, nx, dx, dy, gravity,
                   coriolis_f);
#pragma omp parallel for
    for (int64_t c = 0; c < n; ++c) {
        au[c] += 2.0f * k2u[c]; av[c] += 2.0f * k2v[c];
        ah[c] += 2.0f * k2h[c];
        tu[c] = u[c] + half * k2u[c];
        tv[c] = v[c] + half * k2v[c];
        th[c] = h[c] + half * k2h[c];
    }
    // k3 = T(mid); acc += 2 k3; mid = s + dt k3
    swe_tendencies(tu, tv, th, k2u, k2v, k2h, ny, nx, dx, dy, gravity,
                   coriolis_f);
#pragma omp parallel for
    for (int64_t c = 0; c < n; ++c) {
        au[c] += 2.0f * k2u[c]; av[c] += 2.0f * k2v[c];
        ah[c] += 2.0f * k2h[c];
        tu[c] = u[c] + dt * k2u[c];
        tv[c] = v[c] + dt * k2v[c];
        th[c] = h[c] + dt * k2h[c];
    }
    // k4 = T(mid); s += dt/6 (acc + k4)
    swe_tendencies(tu, tv, th, k2u, k2v, k2h, ny, nx, dx, dy, gravity,
                   coriolis_f);
    const float sixth = dt / 6.0f;
#pragma omp parallel for
    for (int64_t c = 0; c < n; ++c) {
        u[c] += sixth * (au[c] + k2u[c]);
        v[c] += sixth * (av[c] + k2v[c]);
        h[c] += sixth * (ah[c] + k2h[c]);
    }
}

// ---------------------------------------------------------------------------
// N-body / LJ forces (ref roles: nbody compute_accelerations, MD
// lj_force_kernel). O(N^2) direct summation, OpenMP over rows.
// ---------------------------------------------------------------------------
void nbody_accelerations(const float* pos, const float* mass, float* acc,
                         int32_t n, float G, float softening) {
    const float s2 = softening * softening;
#pragma omp parallel for
    for (int32_t i = 0; i < n; ++i) {
        float ax = 0.f, ay = 0.f, az = 0.f;
        const float xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
        for (int32_t j = 0; j < n; ++j) {
            const float dx0 = pos[3 * j] - xi;
            const float dy0 = pos[3 * j + 1] - yi;
            const float dz0 = pos[3 * j + 2] - zi;
            const float r2 = dx0 * dx0 + dy0 * dy0 + dz0 * dz0 + s2;
            const float inv_r = 1.0f / std::sqrt(r2);
            const float w = (i == j) ? 0.0f
                                     : mass[j] * inv_r * inv_r * inv_r;
            ax += w * dx0; ay += w * dy0; az += w * dz0;
        }
        acc[3 * i] = G * ax;
        acc[3 * i + 1] = G * ay;
        acc[3 * i + 2] = G * az;
    }
}

void lj_forces(const float* pos, float* force, int32_t n,
               float epsilon, float sigma, float cutoff,
               const float* box) {
    const float c2 = cutoff * cutoff;
    const float sig2 = sigma * sigma;
#pragma omp parallel for
    for (int32_t i = 0; i < n; ++i) {
        float fx = 0.f, fy = 0.f, fz = 0.f;
        for (int32_t j = 0; j < n; ++j) {
            if (j == i) continue;
            float d[3];
            for (int k = 0; k < 3; ++k) {
                d[k] = pos[3 * j + k] - pos[3 * i + k];
                d[k] -= box[k] * std::round(d[k] / box[k]);
            }
            const float r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
            if (r2 >= c2 || r2 < 1e-12f) continue;
            const float s2r = sig2 / r2;
            const float s6 = s2r * s2r * s2r;
            // dU/dr * 1/r = 24 eps (s6 - 2 s12) / r^2
            const float w = 24.0f * epsilon * (s6 - 2.0f * s6 * s6) / r2;
            fx += w * d[0]; fy += w * d[1]; fz += w * d[2];
        }
        force[3 * i] = fx;
        force[3 * i + 1] = fy;
        force[3 * i + 2] = fz;
    }
}

// ---------------------------------------------------------------------------
// FIR filter (causal, zero initial state) — ref: CPU FIR path,
// digital_filtering.cpp.
// ---------------------------------------------------------------------------
void fir_filter(const float* x, const float* taps, float* y,
                int64_t n, int32_t k) {
#pragma omp parallel for
    for (int64_t i = 0; i < n; ++i) {
        float acc = 0.f;
        const int32_t kmax = (i + 1 < k) ? (int32_t)(i + 1) : k;
        for (int32_t t = 0; t < kmax; ++t) {
            acc += taps[t] * x[i - t];
        }
        y[i] = acc;
    }
}

int32_t omp_thread_count() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
