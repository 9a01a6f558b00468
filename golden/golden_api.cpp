// C ABI around the REFERENCE engine compiled from
// /root/reference/src/core (see golden/README.md): the public
// ISyncProblem surface plus hooks into the deterministic internals
// (opt_compute_problem, FrameState::Loss, ndspline eval) so the TPU
// rebuild can be checked against true reference tensors, not a
// reimplemented oracle. Ref: src/core/core_private.cpp:15-32 (P),
// :92-133 (Loss), :61-90/:205-361 (PreSync/Sync/DebugPreSync).

#include <core_private.hpp>

#include <cstdint>

// defined in the reference's core_private.cpp (external linkage, no
// declaration in the header)
arma::mat opt_compute_problem(int64_t frame, double gyro_delay, const OptData& data);

extern "C" {

void* golden_create() { return new SyncProblemPrivate(); }

void golden_destroy(void* p) { delete static_cast<SyncProblemPrivate*>(p); }

void golden_set_gyro_fixed(void* p, const double* data, size_t count,
                           double sample_rate, double first_ts) {
    static_cast<SyncProblemPrivate*>(p)->SetGyroQuaternions(data, count, sample_rate,
                                                            first_ts);
}

void golden_set_gyro_us(void* p, const int64_t* ts_us, const double* quats,
                        size_t count) {
    static_cast<SyncProblemPrivate*>(p)->SetGyroQuaternions(ts_us, quats, count);
}

void golden_set_track(void* p, int64_t frame, const double* ts_a, const double* ts_b,
                      const double* rays_a, const double* rays_b, size_t count) {
    static_cast<SyncProblemPrivate*>(p)->SetTrackResult(frame, ts_a, ts_b, rays_a,
                                                        rays_b, count);
}

void golden_presync(void* p, double initial, int64_t fb, int64_t fe, double step,
                    double radius, double* out_cost, double* out_delay) {
    auto [c, d] = static_cast<SyncProblemPrivate*>(p)->PreSync(initial, fb, fe, step,
                                                               radius);
    *out_cost = c;
    *out_delay = d;
}

void golden_sync(void* p, double initial, int64_t fb, int64_t fe, double center,
                 double radius, double* out_cost, double* out_delay) {
    auto [c, d] =
        static_cast<SyncProblemPrivate*>(p)->Sync(initial, fb, fe, center, radius);
    *out_cost = c;
    *out_delay = d;
}

void golden_debug_presync(void* p, double initial, int64_t fb, int64_t fe,
                          double radius, double* delays, double* costs, int n) {
    static_cast<SyncProblemPrivate*>(p)->DebugPreSync(initial, fb, fe, radius, delays,
                                                      costs, n);
}

// ---- deterministic internals (no RANSAC involved) -------------------------

// P matrix for one frame at one delay; out is row-major (count x 3).
// Returns the row count (= feature count of the frame).
int golden_compute_problem(void* p, int64_t frame, double delay, double* out) {
    auto& problem = static_cast<SyncProblemPrivate*>(p)->problem;
    arma::mat P = opt_compute_problem(frame, delay, problem);
    for (size_t r = 0; r < P.n_rows; ++r)
        for (size_t c = 0; c < 3; ++c) out[r * 3 + c] = P(r, c);
    return static_cast<int>(P.n_rows);
}

// Full per-frame loss + jacobians at (delay, M, var_k)
// (ref core_private.cpp:92-115). motion_jac is the 1x3 row.
void golden_frame_loss(void* p, int64_t frame, double delay, const double* M3,
                       double var_k, double* loss, double* delay_grad,
                       double* motion_jac) {
    auto& problem = static_cast<SyncProblemPrivate*>(p)->problem;
    FrameState fs(frame, &problem);
    fs.var_k = var_k;
    arma::mat gyro_delay(1, 1);
    gyro_delay[0] = delay;
    arma::mat M(3, 1);
    for (int i = 0; i < 3; ++i) M[i] = M3[i];
    arma::mat l, jd, jm;
    fs.Loss(gyro_delay, M, l, jd, jm);
    *loss = l[0];
    *delay_grad = jd[0];
    for (int i = 0; i < 3; ++i) motion_jac[i] = jm[i];
}

// Simple (loss-only) overload (ref core_private.cpp:117-123).
double golden_frame_loss_simple(void* p, int64_t frame, double delay,
                                const double* M3, double var_k) {
    auto& problem = static_cast<SyncProblemPrivate*>(p)->problem;
    FrameState fs(frame, &problem);
    fs.var_k = var_k;
    arma::mat gyro_delay(1, 1);
    gyro_delay[0] = delay;
    arma::mat M(3, 1);
    for (int i = 0; i < 3; ++i) M[i] = M3[i];
    arma::mat l;
    fs.Loss(gyro_delay, M, l);
    return l[0];
}

// Raw (unnormalized) quat-spline sample at spline index t
// (ref ndspline.cpp:21-27 / minispline.cpp:48-55).
void golden_spline_eval(void* p, double t, double* out4) {
    auto& problem = static_cast<SyncProblemPrivate*>(p)->problem;
    arma::mat q = problem.quats.eval(t);
    for (int i = 0; i < 4; ++i) out4[i] = q[i];
}

double golden_sample_rate(void* p) {
    return static_cast<SyncProblemPrivate*>(p)->problem.sample_rate;
}

double golden_quats_start(void* p) {
    return static_cast<SyncProblemPrivate*>(p)->problem.quats_start;
}

}  // extern "C"
