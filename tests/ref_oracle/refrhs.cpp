// Serial parity oracle: the reference's whole RHS f(t, y, ydot) transcribed
// (by understanding, not copied) from the four C++ MPI monoliths into one
// parameterized function on the full global grid.
//
// Purpose: tests/test_reference_rhs.py evaluates this against the JAX RHS at
// randomized states to f64 round-off — the field-level parity check the
// reference binaries themselves can't provide here (SUNDIALS/MPI are not
// buildable in this image).
//
// Transcription sources (expression shapes kept exactly so doubles match the
// reference bit-for-bit on a single rank):
//   FHN torus  f(): /root/reference/src/FHNmodel_torus.cpp:504-667
//   FHN flat   f(): /root/reference/src/FHNmodel_flat.cpp:469-616
//   GB  torus  f(): /root/reference/src/GoldbeterModel_torus.cpp:561-721
//   GB  flat   f(): /root/reference/src/GoldbeterModel_flat.cpp:537-686
// The MPI halo exchange (e.g. FHNmodel_torus.cpp:775-950) reduces, on one
// rank of a periodic Cartesian grid, to wraparound neighbor indexing —
// Wrecv[j] == y(nx-1, j) etc. — which is how it is realized here.

#include <cmath>
#include <cstdint>

namespace {

// Reference constants (FHNmodel_torus.cpp:63,68; GoldbeterModel_torus.cpp:64-78)
const double PI_REF = 3.1415926535897932;
const double EPSILON = 0.36;
const double GB_v0 = 1.0, GB_k = 10.0, GB_kf = 1.0, GB_v1 = 7.3;
const double GB_VM2 = 65.0, GB_VM3 = 500.0;
const double GB_K2 = 1.0, GB_KR = 2.0, GB_KA = 0.9;
const double GB_m = 2.0, GB_n = 2.0, GB_p = 4.0;

struct Params {
    int64_t nx, ny;
    double dx, dy;
    double Diff;
    double R, r;            // torus radii (unused for flat)
    double beta, beta_min, beta_max;
    double ymin, ymax;
    double t_boundary;
    int vary_beta, just_diffusion;
};

inline int64_t idx(int64_t i, int64_t j, int64_t nx) {
    // interleaved NVARS=2 layout, IDX(x,y) = NVARS*x + NVARS*y*nxl
    // (FHNmodel_torus.cpp:60)
    return 2 * i + 2 * j * nx;
}

// Variable-0 diffusion term at (i, j) with periodic neighbors.
// Torus metric form: FHNmodel_torus.cpp:527-541 (identical expression in the
// face/corner regions, with halo values in place of local neighbors).
inline double diff_torus(const double* y, int64_t i, int64_t j,
                         const Params& P) {
    const int64_t nx = P.nx, ny = P.ny;
    const int64_t iW = (i == 0) ? nx - 1 : i - 1;
    const int64_t iE = (i == nx - 1) ? 0 : i + 1;
    const int64_t jS = (j == 0) ? ny - 1 : j - 1;
    const int64_t jN = (j == ny - 1) ? 0 : j + 1;
    const double xx = 0.0 + i * P.dx;  // XMIN + (is+i)*dx, XMIN=0
    const double u = y[idx(i, j, nx)];
    const double uW = y[idx(iW, j, nx)], uE = y[idx(iE, j, nx)];
    const double uS = y[idx(i, jS, nx)], uN = y[idx(i, jN, nx)];
    const double Diff = P.Diff, dx = P.dx, dy = P.dy, R = P.R, r = P.r;
    return Diff * ((-std::sin(xx) / (r * (R + r * std::cos(xx)))) * (uE - uW)) / (2 * dx)
         + Diff * ((1 / (r * r)) * (uE - 2 * u + uW)) / (dx * dx)
         + Diff * ((1 / (((R + r * std::cos(xx))) * ((R + r * std::cos(xx))))) * (uN - 2 * u + uS)) / (dy * dy);
}

// Flat 5-point form: FHNmodel_flat.cpp:489-566.
inline double diff_flat(const double* y, int64_t i, int64_t j,
                        const Params& P) {
    const int64_t nx = P.nx, ny = P.ny;
    const int64_t iW = (i == 0) ? nx - 1 : i - 1;
    const int64_t iE = (i == nx - 1) ? 0 : i + 1;
    const int64_t jS = (j == 0) ? ny - 1 : j - 1;
    const int64_t jN = (j == ny - 1) ? 0 : j + 1;
    const double cu1 = P.Diff / P.dx / P.dx;
    const double cu2 = P.Diff / P.dy / P.dy;
    const double cu3 = -2.0 * (cu1 + cu2);
    return cu1 * (y[idx(iW, j, nx)] + y[idx(iE, j, nx)])
         + cu2 * (y[idx(i, jS, nx)] + y[idx(i, jN, nx)])
         + cu3 * y[idx(i, j, nx)];
}

// b(row): constant BETA or the linear-in-y ramp
// (FHNmodel_torus.cpp:625-632).
inline double beta_at(int64_t j, const Params& P) {
    if (P.vary_beta == 0) return P.beta;
    const double yy = P.ymin + j * P.dy;
    return P.beta_min + yy * (P.beta_max - P.beta_min) / (P.ymax - P.ymin);
}

}  // namespace

extern "C" {

// model: 0 = FHN, 1 = Goldbeter. surface: 0 = flat, 1 = torus.
// y, ydot: interleaved (2 vars) length 2*nx*ny, IDX layout above.
// surface_width/length: ini values; torus geometry (r, R, dx, dy, ny's
// meaning) is derived here exactly as the mains do
// (FHNmodel_torus.cpp:188-193,233-234; FHNmodel_flat.cpp:172-175,230-231).
// Returns 0 on success, -1 on bad arguments.
int ref_rhs(int model, int surface, int64_t nx, int64_t ny, double t,
            const double* y, double* ydot,
            double diffusion, double beta,
            double surface_width, double surface_length,
            double t_boundary, int vary_beta,
            double beta_min, double beta_max, int just_diffusion) {
    if (nx < 3 || ny < 3 || !y || !ydot) return -1;
    Params P;
    P.nx = nx; P.ny = ny;
    P.Diff = diffusion;
    P.beta = beta; P.beta_min = beta_min; P.beta_max = beta_max;
    P.t_boundary = t_boundary;
    P.vary_beta = vary_beta;
    P.just_diffusion = just_diffusion;
    double xmin = 0.0, xmax, ymin = 0.0, ymax;
    if (surface == 1) {
        P.r = surface_width / (2.0 * PI_REF);
        P.R = surface_length / (2.0 * PI_REF);
        xmax = 2.0 * PI_REF;
        ymax = 2.0 * PI_REF;
    } else {
        P.r = P.R = 0.0;
        xmax = surface_width - xmin;    // FHNmodel_flat.cpp:172-175
        ymax = surface_length - ymin;
    }
    P.dx = (xmax - xmin) / (1.0 * nx - 1.0);
    P.dy = (ymax - ymin) / (1.0 * ny - 1.0);
    P.ymin = ymin; P.ymax = ymax;

    // diffusion, variable 0 only (both references zero ydot first)
    for (int64_t j = 0; j < ny; ++j) {
        for (int64_t i = 0; i < nx; ++i) {
            ydot[idx(i, j, nx)] = (surface == 1) ? diff_torus(y, i, j, P)
                                                 : diff_flat(y, i, j, P);
            ydot[idx(i, j, nx) + 1] = 0.0;
        }
    }

    // reaction + boundary freeze. Goldbeter skips this whole block
    // (including the freeze) under JUST_DIFFUSION
    // (GoldbeterModel_torus.cpp:668); FHN has no justDiffusion switch.
    if (model == 1 && just_diffusion) return 0;

    for (int64_t j = 0; j < ny; ++j) {
        const double b = beta_at(j, P);
        const bool frozen_row = (t < t_boundary) && (j == 0 || j == ny - 1);
        for (int64_t i = 0; i < nx; ++i) {
            const int64_t k = idx(i, j, nx);
            if (frozen_row) {
                // global north/south rows held at their ICs while
                // t < tBoundary (FHNmodel_torus.cpp:642-653) — overrides
                // the diffusion already written
                ydot[k] = 0.0;
                ydot[k + 1] = 0.0;
            } else if (model == 0) {
                const double u = y[k], v = y[k + 1];
                ydot[k] += 3.0 * u - (u * u * u) - v;       // :656-657
                ydot[k + 1] += EPSILON * (u + b);           // :659-660
            } else {
                const double Z = y[k], Y = y[k + 1];
                // Hill algebraics + kinetics (GoldbeterModel_torus.cpp:694-716)
                const double v2 = GB_VM2 * std::pow(Z, GB_n)
                    / (std::pow(GB_K2, GB_n) + std::pow(Z, GB_n));
                const double v3 = GB_VM3 * std::pow(Y, GB_m) * std::pow(Z, GB_p)
                    / ((std::pow(GB_KR, GB_m) + std::pow(Y, GB_m))
                       * (std::pow(GB_KA, GB_p) + std::pow(Z, GB_p)));
                ydot[k] += GB_v0 + GB_v1 * b - v2 + v3 + GB_kf * Y - GB_k * Z;
                ydot[k + 1] += v2 - v3 - GB_kf * Y;
            }
        }
    }
    return 0;
}

}  // extern "C"
