// Parity oracle around the REFERENCE minimal solver.
//
// Compiles /root/reference/src/minimal.cc unmodified (out-of-tree; no
// reference code is copied into this repo) against TensorFlow's bundled
// Eigen headers, with an empty ceres stub (stub/ceres/ceres.h) and a
// closed-form estimateInverseDepths below satisfying the linker.
//
// Protocol (stdin → stdout, all doubles in C99 hexfloat for exact
// round-trips):
//
//   vel <use_k:0|1> <n>            then n lines: qx qy ux uy alpha alpha_k
//     → one line: wx wy wz vx vy vz k
//       (minimal::calculateVelocities, reference src/minimal.cc:36-182)
//
//   alpha <h> <gamma> <n>          then n lines: qy uy
//     → n lines: alpha alpha_k
//       (minimal::getAlpha / getAlphaK, reference src/minimal.cc:184-198;
//        pixel-unit inputs as at the call site, src/main.cc:418-438)
//
// Commands repeat until EOF, so one process can serve many cases.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include "Eigen/Dense"

#include "minimal.h"

// minimal.cc's ransac references this ceres-backed symbol; the oracle never
// calls ransac, but the linker needs a definition.  Closed-form per-pixel
// optimum of |u − beta(A v rho + B w)|² in rho (this repo's
// rs_sfm_tpu/solver/depth.py math), declared exactly as in the reference
// header.
namespace nonlinear_refinement {
Eigen::ArrayXd estimateInverseDepths(const Eigen::Array2Xd &q,
                                     const Eigen::Array2Xd &u,
                                     const Eigen::Vector3d &v,
                                     const Eigen::Vector3d &w,
                                     const double &k,
                                     const Eigen::ArrayXd &alpha,
                                     const Eigen::ArrayXd &alpha_k,
                                     bool /*show_messages*/) {
  int n = static_cast<int>(q.cols());
  Eigen::ArrayXd rho(n);
  for (int j = 0; j < n; ++j) {
    double x = q(0, j), y = q(1, j);
    Eigen::Matrix<double, 2, 3> A, B;
    A << 1, 0, -x, 0, 1, -y;
    B << -x * y, 1 + x * x, -y, -(1 + y * y), x * y, x;
    double beta = (alpha(j) + k * alpha_k(j)) * (2.0 / (2.0 + k));
    Eigen::Vector2d a = beta * (A * v);
    Eigen::Vector2d r = Eigen::Vector2d(u(0, j), u(1, j)) - beta * (B * w);
    double d = a.squaredNorm();
    rho(j) = d > 0.0 ? a.dot(r) / d : 0.0;
  }
  return rho;
}
}  // namespace nonlinear_refinement

static double read_double() {
  char buf[64];
  if (std::scanf("%63s", buf) != 1) std::exit(2);
  return std::strtod(buf, nullptr);
}

int main() {
  char cmd[16];
  while (std::scanf("%15s", cmd) == 1) {
    if (std::strcmp(cmd, "vel") == 0) {
      int use_k = 0, n = 0;
      if (std::scanf("%d %d", &use_k, &n) != 2) return 2;
      Eigen::Array2Xd q(2, n), u(2, n);
      Eigen::ArrayXd alpha(n), alpha_k(n);
      for (int j = 0; j < n; ++j) {
        q(0, j) = read_double();
        q(1, j) = read_double();
        u(0, j) = read_double();
        u(1, j) = read_double();
        alpha(j) = read_double();
        alpha_k(j) = read_double();
      }
      Velocities vel =
          minimal::calculateVelocities(q, u, alpha, alpha_k, use_k != 0);
      std::printf("%a %a %a %a %a %a %a\n", vel.w(0), vel.w(1), vel.w(2),
                  vel.v(0), vel.v(1), vel.v(2), vel.k);
      std::fflush(stdout);
    } else if (std::strcmp(cmd, "alpha") == 0) {
      double h = read_double(), gamma = read_double();
      int n = 0;
      if (std::scanf("%d", &n) != 1) return 2;
      Eigen::Array2Xd q = Eigen::Array2Xd::Zero(2, n);
      Eigen::Array2Xd u = Eigen::Array2Xd::Zero(2, n);
      for (int j = 0; j < n; ++j) {
        q(1, j) = read_double();
        u(1, j) = read_double();
      }
      Eigen::ArrayXd a = minimal::getAlpha(u, h, gamma);
      Eigen::ArrayXd ak = minimal::getAlphaK(q, u, h, gamma);
      for (int j = 0; j < n; ++j) std::printf("%a %a\n", a(j), ak(j));
      std::fflush(stdout);
    } else {
      std::fprintf(stderr, "unknown command %s\n", cmd);
      return 2;
    }
  }
  return 0;
}
