// Serial C++ baseline: the reference's per-keyframe work on one CPU thread.
//
// A native, dependency-free re-execution of the DPG-SLAM reference's
// keyframe pipeline (1 successive + K loop-closure point-to-point ICPs run
// serially, dpg_slam.cc:262-304, followed by a full-graph Gauss-Newton
// solve standing in for the re-add-everything iSAM2 update,
// dpg_slam.cc:316-329 / SURVEY.md §3.6.2). Semantics mirror
// dpg_slam_tpu/baselines/serial_cpu.py exactly (same correspondence rule,
// Horn update, GN linearization, early exits); this settles what an
// optimized single-thread C++ implementation of the reference's work
// costs, so the TPU speedup is measured against native code rather than
// numpy dispatch overhead.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double wrap(double a) {
  a = std::fmod(a + kPi, 2.0 * kPi);
  if (a < 0) a += 2.0 * kPi;
  return a - kPi;
}

struct Edge {
  int i, j;
  double meas[3];
  double W[9];  // 3x3 sqrt-information, row-major
};

struct Prior {
  int idx;
  double val[3];
  double W[9];
};

// Point-to-point 2D ICP, one pair (mirrors serial_cpu.icp_serial).
// src/tgt: (n, 2) row-major. Returns converged; transform in t (seed in/out).
bool icp_serial(const float* src, int ns, const float* tgt, int nt,
                double* t, int max_iters, double gate, double eps,
                std::vector<int>& nn, std::vector<int>& rev,
                std::vector<double>& nn_d2) {
  nn.resize(ns);
  nn_d2.resize(ns);
  rev.resize(nt);
  std::vector<double> rev_d2(nt);
  std::vector<double> mx(ns), my(ns);
  const double gate2 = gate * gate;

  for (int it = 0; it < max_iters; ++it) {
    const double c = std::cos(t[2]), s = std::sin(t[2]);
    for (int i = 0; i < ns; ++i) {
      const double x = src[2 * i], y = src[2 * i + 1];
      mx[i] = c * x - s * y + t[0];
      my[i] = s * x + c * y + t[1];
    }
    // Nearest neighbors both ways (reciprocal filter).
    std::fill(rev_d2.begin(), rev_d2.end(), 1e30);
    for (int j = 0; j < nt; ++j) rev[j] = -1;
    for (int i = 0; i < ns; ++i) {
      double best = 1e30;
      int bj = -1;
      for (int j = 0; j < nt; ++j) {
        const double dx = mx[i] - tgt[2 * j], dy = my[i] - tgt[2 * j + 1];
        const double d2 = dx * dx + dy * dy;
        if (d2 < best) { best = d2; bj = j; }
        if (d2 < rev_d2[j]) { rev_d2[j] = d2; rev[j] = i; }
      }
      nn[i] = bj;
      nn_d2[i] = best;
    }
    // Horn update over gated reciprocal matches.
    double mpx = 0, mpy = 0, mqx = 0, mqy = 0;
    int m = 0;
    for (int i = 0; i < ns; ++i) {
      if (nn_d2[i] <= gate2 && nn[i] >= 0 && rev[nn[i]] == i) {
        mpx += mx[i]; mpy += my[i];
        mqx += tgt[2 * nn[i]]; mqy += tgt[2 * nn[i] + 1];
        ++m;
      }
    }
    if (m < 3) return false;
    mpx /= m; mpy /= m; mqx /= m; mqy /= m;
    double num = 0, den = 0;
    for (int i = 0; i < ns; ++i) {
      if (nn_d2[i] <= gate2 && nn[i] >= 0 && rev[nn[i]] == i) {
        const double px = mx[i] - mpx, py = my[i] - mpy;
        const double qx = tgt[2 * nn[i]] - mqx, qy = tgt[2 * nn[i] + 1] - mqy;
        num += px * qy - py * qx;
        den += px * qx + py * qy;
      }
    }
    const double dth = std::atan2(num, den);
    const double cd = std::cos(dth), sd = std::sin(dth);
    const double dtx = mqx - (cd * mpx - sd * mpy);
    const double dty = mqy - (sd * mpx + cd * mpy);
    const double ntx = cd * t[0] - sd * t[1] + dtx;
    const double nty = sd * t[0] + cd * t[1] + dty;
    const double nth = wrap(t[2] + dth);
    const double sx = ntx - t[0], sy = nty - t[1], sth = wrap(nth - t[2]);
    t[0] = ntx; t[1] = nty; t[2] = nth;
    if (sx * sx + sy * sy + sth * sth < eps) break;
  }
  return true;
}

// In-place Cholesky solve of the (n x n) SPD system H x = b.
bool chol_solve(std::vector<double>& H, std::vector<double>& b, int n) {
  for (int k = 0; k < n; ++k) {
    double d = H[k * n + k];
    for (int p = 0; p < k; ++p) d -= H[k * n + p] * H[k * n + p];
    if (d <= 0) return false;
    d = std::sqrt(d);
    H[k * n + k] = d;
    for (int i = k + 1; i < n; ++i) {
      double v = H[i * n + k];
      for (int p = 0; p < k; ++p) v -= H[i * n + p] * H[k * n + p];
      H[i * n + k] = v / d;
    }
  }
  for (int i = 0; i < n; ++i) {  // forward
    double v = b[i];
    for (int p = 0; p < i; ++p) v -= H[i * n + p] * b[p];
    b[i] = v / H[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {  // backward
    double v = b[i];
    for (int p = i + 1; p < n; ++p) v -= H[p * n + i] * b[p];
    b[i] = v / H[i * n + i];
  }
  return true;
}

// Full-graph Gauss-Newton (mirrors serial_cpu.solve_serial).
void solve_gn(std::vector<double>& poses, int N,
              const std::vector<Prior>& priors, const std::vector<Edge>& edges,
              int iters) {
  const int n = 3 * N;
  std::vector<double> H(n * n), b(n);
  for (int it = 0; it < iters; ++it) {
    std::fill(H.begin(), H.end(), 0.0);
    std::fill(b.begin(), b.end(), 0.0);
    for (const auto& pr : priors) {
      double r[3] = {poses[3 * pr.idx] - pr.val[0],
                     poses[3 * pr.idx + 1] - pr.val[1],
                     wrap(poses[3 * pr.idx + 2] - pr.val[2])};
      // J = W (prior Jacobian is identity, whitened by W): H += WᵀW, b += Wᵀ(W r)
      double Wr[3] = {0, 0, 0};
      for (int a = 0; a < 3; ++a)
        for (int q = 0; q < 3; ++q) Wr[a] += pr.W[3 * a + q] * r[q];
      for (int a = 0; a < 3; ++a)
        for (int q = 0; q < 3; ++q) {
          double h = 0;
          for (int p = 0; p < 3; ++p) h += pr.W[3 * p + a] * pr.W[3 * p + q];
          H[(3 * pr.idx + a) * n + (3 * pr.idx + q)] += h;
        }
      for (int a = 0; a < 3; ++a) {
        double v = 0;
        for (int p = 0; p < 3; ++p) v += pr.W[3 * p + a] * Wr[p];
        b[3 * pr.idx + a] += v;
      }
    }
    for (const auto& e : edges) {
      const double* xi = &poses[3 * e.i];
      const double* xj = &poses[3 * e.j];
      const double c = std::cos(xi[2]), s = std::sin(xi[2]);
      const double dx = xj[0] - xi[0], dy = xj[1] - xi[1];
      double r[3] = {c * dx + s * dy - e.meas[0],
                     -s * dx + c * dy - e.meas[1],
                     wrap(wrap(xj[2] - xi[2]) - e.meas[2])};
      const double Ji[9] = {-c, -s, -s * dx + c * dy,
                            s, -c, -c * dx - s * dy,
                            0, 0, -1.0};
      const double Jj[9] = {c, s, 0, -s, c, 0, 0, 0, 1.0};
      double WJi[9], WJj[9], Wr[3] = {0, 0, 0};
      for (int a = 0; a < 3; ++a)
        for (int q = 0; q < 3; ++q) {
          double vi = 0, vj = 0;
          for (int p = 0; p < 3; ++p) {
            vi += e.W[3 * a + p] * Ji[3 * p + q];
            vj += e.W[3 * a + p] * Jj[3 * p + q];
          }
          WJi[3 * a + q] = vi;
          WJj[3 * a + q] = vj;
        }
      for (int a = 0; a < 3; ++a)
        for (int p = 0; p < 3; ++p) Wr[a] += e.W[3 * a + p] * r[p];
      const int oi = 3 * e.i, oj = 3 * e.j;
      for (int a = 0; a < 3; ++a)
        for (int q = 0; q < 3; ++q) {
          double hii = 0, hjj = 0, hij = 0, hji = 0;
          for (int p = 0; p < 3; ++p) {
            hii += WJi[3 * p + a] * WJi[3 * p + q];
            hjj += WJj[3 * p + a] * WJj[3 * p + q];
            hij += WJi[3 * p + a] * WJj[3 * p + q];
            hji += WJj[3 * p + a] * WJi[3 * p + q];
          }
          H[(oi + a) * n + (oi + q)] += hii;
          H[(oj + a) * n + (oj + q)] += hjj;
          H[(oi + a) * n + (oj + q)] += hij;
          H[(oj + a) * n + (oi + q)] += hji;
        }
      for (int a = 0; a < 3; ++a) {
        double vi = 0, vj = 0;
        for (int p = 0; p < 3; ++p) {
          vi += WJi[3 * p + a] * Wr[p];
          vj += WJj[3 * p + a] * Wr[p];
        }
        b[oi + a] += vi;
        b[oj + a] += vj;
      }
    }
    for (int d = 0; d < n; ++d) H[d * n + d] += 1e-6;
    std::vector<double> rhs = b;
    std::vector<double> Hc = H;
    if (!chol_solve(Hc, rhs, n)) return;
    double step2 = 0;
    for (int d = 0; d < n; ++d) step2 += rhs[d] * rhs[d];
    for (int v = 0; v < N; ++v) {
      poses[3 * v] -= rhs[3 * v];
      poses[3 * v + 1] -= rhs[3 * v + 1];
      poses[3 * v + 2] = wrap(poses[3 * v + 2] - rhs[3 * v + 2]);
    }
    if (step2 < 1e-12) break;
  }
}

}  // namespace

extern "C" {

// Runs n_steps reference-equivalent keyframes (mirroring
// bench.bench_cpu_baseline's loop) on REAL continuation scans and
// returns the elapsed seconds.
// clouds: (n0, max_p, 2) float32 primed node clouds; sizes: (n0,);
// poses0: (n0, 3) float64; edges0: odometry chain (e0, [i, j]) int32 +
// (e0, 3) meas + (e0, 9) W; prior at node 0 with sqrt-info prior_W (9,).
// new_clouds: (n_steps, max_p, 2) float32 never-seen keyframe clouds;
// odom_deltas: (n_steps, 3) robot-frame odometry displacement per
// keyframe (the ICP seed source, dpg_slam.cc:217,364-378); odo_w: (9,)
// odometry-factor sqrt-info.
// final_poses (out, may be null): ((n0 + n_steps) * 3).
double baseline_bench(const float* clouds, const int32_t* sizes, int n0,
                      int max_p, const double* poses0,
                      const int32_t* edge_idx0, const double* edge_meas0,
                      const double* edge_w0, int e0, const double* prior_w,
                      const float* new_clouds, const int32_t* new_sizes,
                      const double* odom_deltas, const double* odo_w,
                      int K, int max_iters, double gate, double eps,
                      int n_steps, double* final_poses) {
  std::vector<double> poses(poses0, poses0 + 3 * n0);
  std::vector<Prior> priors(1);
  priors[0].idx = 0;
  priors[0].val[0] = priors[0].val[1] = priors[0].val[2] = 0.0;
  std::memcpy(priors[0].W, prior_w, 9 * sizeof(double));

  std::vector<Edge> edges(e0);
  for (int e = 0; e < e0; ++e) {
    edges[e].i = edge_idx0[2 * e];
    edges[e].j = edge_idx0[2 * e + 1];
    std::memcpy(edges[e].meas, &edge_meas0[3 * e], 3 * sizeof(double));
    std::memcpy(edges[e].W, &edge_w0[9 * e], 9 * sizeof(double));
  }

  // Fixed ICP measurement noise: diag(0.5, 0.5, 0.3) covariance ->
  // sqrt-info diag(1/sqrt(.)) (cov_func_point_to_point.h:572-575).
  double icp_W[9] = {0};
  icp_W[0] = 1.0 / std::sqrt(0.5);
  icp_W[4] = 1.0 / std::sqrt(0.5);
  icp_W[8] = 1.0 / std::sqrt(0.3);

  // All clouds (primed + appended keyframes) by node index.
  std::vector<const float*> cloud_ptr(n0);
  std::vector<int> cloud_n(n0);
  for (int i = 0; i < n0; ++i) {
    cloud_ptr[i] = &clouds[static_cast<size_t>(i) * max_p * 2];
    cloud_n[i] = sizes[i];
  }

  std::vector<int> nn, rev;
  std::vector<double> nn_d2;
  std::vector<std::pair<double, int>> cand;

  const auto t0 = std::chrono::steady_clock::now();
  for (int k = 0; k < n_steps; ++k) {
    const int nc = static_cast<int>(poses.size() / 3);
    const float* new_cloud = &new_clouds[static_cast<size_t>(k) * max_p * 2];
    const int new_n = new_sizes[k];

    // Seed = previous pose composed with the odometry displacement
    // (createRelativePositionedNode, dpg_slam.cc:222-224).
    const double* prev_pose = &poses[3 * (nc - 1)];
    const double* d = &odom_deltas[3 * k];
    const double cp = std::cos(prev_pose[2]), sp = std::sin(prev_pose[2]);
    double seed[3] = {prev_pose[0] + cp * d[0] - sp * d[1],
                      prev_pose[1] + sp * d[0] + cp * d[1],
                      wrap(prev_pose[2] + d[2])};

    // K nearest candidates by position (dpg_slam.cc:273-304 analog).
    cand.clear();
    for (int j = 0; j + 1 < nc; ++j) {
      const double dx = poses[3 * j] - seed[0], dy = poses[3 * j + 1] - seed[1];
      cand.emplace_back(dx * dx + dy * dy, j);
    }
    std::partial_sort(cand.begin(), cand.begin() + std::min<size_t>(K, cand.size()),
                      cand.end());

    // Odometry between-factor (dpg_slam.cc:227-238).
    {
      Edge e;
      e.i = nc - 1; e.j = nc;
      std::memcpy(e.meas, d, 3 * sizeof(double));
      std::memcpy(e.W, odo_w, 9 * sizeof(double));
      edges.push_back(e);
    }
    // Successive ICP vs the previous node's cloud.
    const int prev = nc - 1;
    {
      double rel[3] = {d[0], d[1], d[2]};  // seed in prev's frame = odometry delta
      icp_serial(new_cloud, new_n, cloud_ptr[prev], cloud_n[prev], rel,
                 max_iters, gate, eps, nn, rev, nn_d2);
      Edge e;
      e.i = prev; e.j = nc;
      std::memcpy(e.meas, rel, 3 * sizeof(double));
      std::memcpy(e.W, icp_W, 9 * sizeof(double));
      edges.push_back(e);
    }
    // Loop-closure ICPs, serial.
    for (int q = 0; q < K && q < static_cast<int>(cand.size()); ++q) {
      const int j = cand[q].second;
      const double c = std::cos(poses[3 * j + 2]), s = std::sin(poses[3 * j + 2]);
      const double ddx = seed[0] - poses[3 * j], ddy = seed[1] - poses[3 * j + 1];
      double rel[3] = {c * ddx + s * ddy, -s * ddx + c * ddy,
                       wrap(seed[2] - poses[3 * j + 2])};
      const bool ok = icp_serial(new_cloud, new_n, cloud_ptr[j], cloud_n[j],
                                 rel, max_iters, gate, eps, nn, rev, nn_d2);
      if (ok) {
        Edge e;
        e.i = j; e.j = nc;
        std::memcpy(e.meas, rel, 3 * sizeof(double));
        std::memcpy(e.W, icp_W, 9 * sizeof(double));
        edges.push_back(e);
      }
    }

    poses.insert(poses.end(), seed, seed + 3);
    cloud_ptr.push_back(new_cloud);
    cloud_n.push_back(new_n);
    solve_gn(poses, nc + 1, priors, edges, /*iters=*/5);
  }
  const auto t1 = std::chrono::steady_clock::now();

  if (final_poses != nullptr)
    std::memcpy(final_poses, poses.data(), poses.size() * sizeof(double));
  return std::chrono::duration<double>(t1 - t0).count();
}

// The reference's reoptimize (dpg_slam.cc:35-120): rebuild the graph from
// the odometry log (priors at pass starts + odometry factors), re-run
// EVERY successive-pair ICP and EVERY in-radius loop-closure ICP serially
// (capped at the K nearest per node for parity with the TPU path), then
// one full Gauss-Newton solve. Returns elapsed seconds; icp_pairs (out,
// may be null) gets the number of ICP alignments executed.
double baseline_reoptimize(const float* clouds, const int32_t* sizes, int n,
                           int max_p, const double* poses_in,
                           const double* odom_poses, const int32_t* pass_ids,
                           const double* prior_w, const double* odo_w,
                           double radius_within, double radius_cross,
                           int min_gap, int K, int max_iters, double gate,
                           double eps, int gn_iters, double* final_poses,
                           int32_t* icp_pairs) {
  std::vector<double> poses(poses_in, poses_in + 3 * n);
  std::vector<Prior> priors;
  std::vector<Edge> edges;
  double icp_W[9] = {0};
  icp_W[0] = 1.0 / std::sqrt(0.5);
  icp_W[4] = 1.0 / std::sqrt(0.5);
  icp_W[8] = 1.0 / std::sqrt(0.3);

  std::vector<int> nn, rev;
  std::vector<double> nn_d2;
  std::vector<std::pair<double, int>> cand;
  int pairs = 0;

  const auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < n; ++i) {
    const bool pass_first = (i == 0) || (pass_ids[i] != pass_ids[i - 1]);
    if (pass_first) {
      Prior pr;
      pr.idx = i;
      pr.val[0] = pr.val[1] = pr.val[2] = 0.0;
      std::memcpy(pr.W, prior_w, 9 * sizeof(double));
      priors.push_back(pr);
    } else {
      // Odometry factor from the stored odometry log (dpg_slam.cc:53-75).
      const double* a = &odom_poses[3 * (i - 1)];
      const double* b = &odom_poses[3 * i];
      const double c = std::cos(a[2]), s = std::sin(a[2]);
      Edge e;
      e.i = i - 1; e.j = i;
      e.meas[0] = c * (b[0] - a[0]) + s * (b[1] - a[1]);
      e.meas[1] = -s * (b[0] - a[0]) + c * (b[1] - a[1]);
      e.meas[2] = wrap(b[2] - a[2]);
      std::memcpy(e.W, odo_w, 9 * sizeof(double));
      edges.push_back(e);

      // Successive-pair ICP (dpg_slam.cc:83-89).
      double rel[3] = {e.meas[0], e.meas[1], e.meas[2]};
      {
        const double cp = std::cos(poses[3 * (i - 1) + 2]),
                     sp = std::sin(poses[3 * (i - 1) + 2]);
        const double dx = poses[3 * i] - poses[3 * (i - 1)],
                     dy = poses[3 * i + 1] - poses[3 * (i - 1) + 1];
        rel[0] = cp * dx + sp * dy;
        rel[1] = -sp * dx + cp * dy;
        rel[2] = wrap(poses[3 * i + 2] - poses[3 * (i - 1) + 2]);
      }
      icp_serial(&clouds[static_cast<size_t>(i) * max_p * 2], sizes[i],
                 &clouds[static_cast<size_t>(i - 1) * max_p * 2], sizes[i - 1],
                 rel, max_iters, gate, eps, nn, rev, nn_d2);
      ++pairs;
      Edge eo;
      eo.i = i - 1; eo.j = i;
      std::memcpy(eo.meas, rel, 3 * sizeof(double));
      std::memcpy(eo.W, icp_W, 9 * sizeof(double));
      edges.push_back(eo);
    }

    // Loop-closure sweep: in-radius j < i-1, K nearest (dpg_slam.cc:91-106).
    cand.clear();
    for (int j = 0; j + 1 < i; ++j) {
      const double dx = poses[3 * j] - poses[3 * i],
                   dy = poses[3 * j + 1] - poses[3 * i + 1];
      const double d2 = dx * dx + dy * dy;
      const bool same = pass_ids[j] == pass_ids[i];
      const double rad = same ? radius_within : radius_cross;
      if (d2 > rad * rad) continue;
      if (same && i - j < min_gap) continue;
      cand.emplace_back(d2, j);
    }
    std::partial_sort(cand.begin(),
                      cand.begin() + std::min<size_t>(K, cand.size()), cand.end());
    for (int q = 0; q < K && q < static_cast<int>(cand.size()); ++q) {
      const int j = cand[q].second;
      const double cj = std::cos(poses[3 * j + 2]), sj = std::sin(poses[3 * j + 2]);
      const double dx = poses[3 * i] - poses[3 * j],
                   dy = poses[3 * i + 1] - poses[3 * j + 1];
      double rel[3] = {cj * dx + sj * dy, -sj * dx + cj * dy,
                       wrap(poses[3 * i + 2] - poses[3 * j + 2])};
      const bool ok = icp_serial(
          &clouds[static_cast<size_t>(i) * max_p * 2], sizes[i],
          &clouds[static_cast<size_t>(j) * max_p * 2], sizes[j], rel,
          max_iters, gate, eps, nn, rev, nn_d2);
      ++pairs;
      if (ok) {
        Edge e;
        e.i = j; e.j = i;
        std::memcpy(e.meas, rel, 3 * sizeof(double));
        std::memcpy(e.W, icp_W, 9 * sizeof(double));
        edges.push_back(e);
      }
    }
  }
  solve_gn(poses, n, priors, edges, gn_iters);
  const auto t1 = std::chrono::steady_clock::now();

  if (final_poses != nullptr)
    std::memcpy(final_poses, poses.data(), poses.size() * sizeof(double));
  if (icp_pairs != nullptr) *icp_pairs = pairs;
  return std::chrono::duration<double>(t1 - t0).count();
}

}  // extern "C"
