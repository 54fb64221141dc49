// Fast RRT-Connect planner with built-in SDF collision checking.
//
// Native counterpart of mp_baselines' RRTConnect (consumed at reference
// scripts/generate_data/generate_trajectories.py:74-89). RRT is the one
// genuinely sequential, branchy hot path in the framework — the reference
// budgets up to 300 s/context for it in Python — so it lives in C++ and is
// driven from Python via ctypes (mpd_tpu/native/__init__.py). The TPU side
// (GPMP2 smoothing, diffusion, guidance) stays in JAX.
//
// Geometry is passed in, not hardcoded: obstacle sets (spheres + axis-
// aligned boxes), joint limits, and the robot collision model — either a
// point robot (config == workspace point) or a serial arm described by a
// modified-DH table whose collision spheres sit at fixed interpolation
// fractions between consecutive frame origins (mirrors
// mpd_tpu/world/robots.py exactly; parity covered by tests/test_native.py).

#include <algorithm>
#include <cmath>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct Obstacles {
  const double* sph_c;  // [n_sph, ws]
  const double* sph_r;  // [n_sph]
  int n_sph;
  const double* box_c;  // [n_box, ws]
  const double* box_h;  // [n_box, ws]
  int n_box;
  int ws;
};

// min over obstacles of signed distance at point p
inline double sdf(const Obstacles& obs, const double* p) {
  double best = 1e9;
  for (int i = 0; i < obs.n_sph; ++i) {
    if (obs.sph_r[i] < 0) continue;
    double s = 0;
    for (int d = 0; d < obs.ws; ++d) {
      double diff = p[d] - obs.sph_c[i * obs.ws + d];
      s += diff * diff;
    }
    best = std::min(best, std::sqrt(s) - obs.sph_r[i]);
  }
  for (int i = 0; i < obs.n_box; ++i) {
    if (obs.box_h[i * obs.ws] < 0) continue;
    double out_sq = 0, in_max = -1e9;
    for (int d = 0; d < obs.ws; ++d) {
      double q = std::fabs(p[d] - obs.box_c[i * obs.ws + d]) - obs.box_h[i * obs.ws + d];
      if (q > 0) out_sq += q * q;
      in_max = std::max(in_max, q);
    }
    double dist = std::sqrt(out_sq) + std::min(in_max, 0.0);
    best = std::min(best, dist);
  }
  return best;
}

struct RobotModel {
  int type;  // 0 = point robot, 1 = serial arm (modified DH)
  int q_dim;
  int ws;
  double point_radius;
  // serial arm description
  const double* dh;        // [n_frames, 3] rows (a, d, alpha); theta = q_i (0 past q_dim)
  int n_frames;            // e.g. 8 for the Panda (7 joints + flange)
  const double* fractions; // [n_fr] interpolation fractions per segment
  int n_fr;
  double arm_radius;
  double hand_radius;
};

// Configuration collision check. Returns true if in collision.
inline bool config_in_collision(const RobotModel& rm, const Obstacles& obs,
                                const double* q, const double* q_min,
                                const double* q_max, double margin) {
  for (int d = 0; d < rm.q_dim; ++d)
    if (q[d] < q_min[d] || q[d] > q_max[d]) return true;

  if (rm.type == 0) {
    return sdf(obs, q) - rm.point_radius <= margin;
  }

  // serial arm: forward kinematics over the DH chain, origins into `org`
  double R[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double p[3] = {0, 0, 0};
  // origins: base + one per frame
  std::vector<double> org((rm.n_frames + 1) * 3);
  org[0] = org[1] = org[2] = 0;
  for (int i = 0; i < rm.n_frames; ++i) {
    const double a = rm.dh[i * 3 + 0];
    const double dd = rm.dh[i * 3 + 1];
    const double al = rm.dh[i * 3 + 2];
    const double th = (i < rm.q_dim) ? q[i] : 0.0;
    const double ct = std::cos(th), st = std::sin(th);
    const double ca = std::cos(al), sa = std::sin(al);
    // local transform (modified DH): R_loc rows, t_loc
    const double Rl[9] = {ct, -st, 0, st * ca, ct * ca, -sa, st * sa, ct * sa, ca};
    const double tl[3] = {a, -dd * sa, dd * ca};
    // p += R * tl
    for (int r = 0; r < 3; ++r)
      p[r] += R[r * 3 + 0] * tl[0] + R[r * 3 + 1] * tl[1] + R[r * 3 + 2] * tl[2];
    // R = R * Rl
    double Rn[9];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c)
        Rn[r * 3 + c] = R[r * 3 + 0] * Rl[0 * 3 + c] + R[r * 3 + 1] * Rl[1 * 3 + c] +
                        R[r * 3 + 2] * Rl[2 * 3 + c];
    std::memcpy(R, Rn, sizeof(Rn));
    org[(i + 1) * 3 + 0] = p[0];
    org[(i + 1) * 3 + 1] = p[1];
    org[(i + 1) * 3 + 2] = p[2];
  }

  // collision spheres: fractions along segments between origins 1..n_frames
  // (skip base->frame1 column), plus the hand sphere at the last origin
  const int n_seg = rm.n_frames - 1;
  double c[3];
  for (int s = 0; s < n_seg; ++s) {
    const double* p0 = &org[(s + 1) * 3];
    const double* p1 = &org[(s + 2) * 3];
    for (int f = 0; f < rm.n_fr; ++f) {
      const double u = rm.fractions[f];
      for (int d = 0; d < 3; ++d) c[d] = p0[d] + u * (p1[d] - p0[d]);
      if (sdf(obs, c) - rm.arm_radius <= margin) return true;
    }
  }
  const double* ph = &org[rm.n_frames * 3];
  if (sdf(obs, ph) - rm.hand_radius <= margin) return true;
  return false;
}

inline bool edge_free(const RobotModel& rm, const Obstacles& obs, const double* q0,
                      const double* q1, int n_pts, const double* q_min,
                      const double* q_max, double margin, std::vector<double>& tmp) {
  tmp.resize(rm.q_dim);
  for (int i = 0; i < n_pts; ++i) {
    const double u = (n_pts == 1) ? 0.0 : double(i) / double(n_pts - 1);
    for (int d = 0; d < rm.q_dim; ++d) tmp[d] = q0[d] + u * (q1[d] - q0[d]);
    if (config_in_collision(rm, obs, tmp.data(), q_min, q_max, margin)) return false;
  }
  return true;
}

struct Tree {
  std::vector<double> nodes;  // [n, q]
  std::vector<int> parents;
  int q;
  explicit Tree(int q_dim) : q(q_dim) {}
  int size() const { return static_cast<int>(parents.size()); }
  void add(const double* x, int parent) {
    nodes.insert(nodes.end(), x, x + q);
    parents.push_back(parent);
  }
  const double* node(int i) const { return &nodes[size_t(i) * q]; }
  int nearest(const double* x) const {
    int best = 0;
    double best_d = 1e300;
    const int n = size();
    for (int i = 0; i < n; ++i) {
      double s = 0;
      const double* nd = node(i);
      for (int d = 0; d < q; ++d) {
        double diff = nd[d] - x[d];
        s += diff * diff;
      }
      if (s < best_d) {
        best_d = s;
        best = i;
      }
    }
    return best;
  }
};

double dist(const double* a, const double* b, int q) {
  double s = 0;
  for (int d = 0; d < q; ++d) {
    double diff = a[d] - b[d];
    s += diff * diff;
  }
  return std::sqrt(s);
}

}  // namespace

extern "C" {

// Batch configuration collision check (also exposed for Python-side use).
void collision_check_batch(
    const double* qs, int n, int q_dim,
    const double* q_min, const double* q_max,
    const double* sph_c, const double* sph_r, int n_sph,
    const double* box_c, const double* box_h, int n_box, int ws_dim,
    int robot_type, double point_radius,
    const double* dh, int n_frames,
    const double* fractions, int n_fr,
    double arm_radius, double hand_radius,
    double margin, uint8_t* out) {
  Obstacles obs{sph_c, sph_r, n_sph, box_c, box_h, n_box, ws_dim};
  RobotModel rm{robot_type, q_dim, ws_dim, point_radius,
                dh, n_frames, fractions, n_fr, arm_radius, hand_radius};
  for (int i = 0; i < n; ++i)
    out[i] = config_in_collision(rm, obs, qs + size_t(i) * q_dim, q_min, q_max, margin)
                 ? 1
                 : 0;
}

// RRT-Connect. Returns 1 on success (path written to out_path, length in
// out_len), 0 on failure.
int rrt_connect_plan(
    const double* start, const double* goal, int q_dim,
    const double* q_min, const double* q_max,
    const double* sph_c, const double* sph_r, int n_sph,
    const double* box_c, const double* box_h, int n_box, int ws_dim,
    int robot_type, double point_radius,
    const double* dh, int n_frames,
    const double* fractions, int n_fr,
    double arm_radius, double hand_radius,
    double margin, double step_size, int n_iters, double max_time,
    int n_edge_pts, unsigned seed, int shortcut_rounds,
    double* out_path, int max_out, int* out_len) {
  Obstacles obs{sph_c, sph_r, n_sph, box_c, box_h, n_box, ws_dim};
  RobotModel rm{robot_type, q_dim, ws_dim, point_radius,
                dh, n_frames, fractions, n_fr, arm_radius, hand_radius};

  if (config_in_collision(rm, obs, start, q_min, q_max, margin)) return 0;
  if (config_in_collision(rm, obs, goal, q_min, q_max, margin)) return 0;

  Tree ta(q_dim), tb(q_dim);
  ta.add(start, -1);
  tb.add(goal, -1);
  bool a_is_start = true;

  std::mt19937 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  std::vector<double> q_rand(q_dim), q_new(q_dim), q_steer(q_dim), tmp;

  const auto t0 = std::chrono::steady_clock::now();
  auto elapsed = [&]() {
    return std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
  };

  // extend `tree` one step toward target; returns node idx or -1; sets
  // *reached if target attained
  auto extend = [&](Tree& tree, const double* target, bool* reached) -> int {
    *reached = false;
    const int ni = tree.nearest(target);
    const double* qn = tree.node(ni);
    const double d = dist(qn, target, q_dim);
    if (d < 1e-9) {
      *reached = true;
      return ni;
    }
    const double scale = (d <= step_size) ? 1.0 : step_size / d;
    for (int k = 0; k < q_dim; ++k) q_steer[k] = qn[k] + scale * (target[k] - qn[k]);
    if (!edge_free(rm, obs, qn, q_steer.data(), n_edge_pts, q_min, q_max, margin, tmp))
      return -1;
    tree.add(q_steer.data(), ni);
    *reached = dist(q_steer.data(), target, q_dim) < 1e-9;
    return tree.size() - 1;
  };

  int join_a = -1, join_b = -1;
  for (int it = 0; it < n_iters; ++it) {
    if (elapsed() > max_time) return 0;
    for (int d = 0; d < q_dim; ++d)
      q_rand[d] = q_min[d] + unif(rng) * (q_max[d] - q_min[d]);

    Tree& A = a_is_start ? ta : tb;
    Tree& B = a_is_start ? tb : ta;

    bool reached;
    int idx = extend(A, q_rand.data(), &reached);
    if (idx >= 0) {
      std::vector<double> q_target(A.node(idx), A.node(idx) + q_dim);
      // greedy connect of B toward q_target
      int bi = -1;
      while (true) {
        bool r2;
        int j = extend(B, q_target.data(), &r2);
        if (j < 0) break;
        bi = j;
        if (r2) {
          join_a = a_is_start ? idx : bi;
          join_b = a_is_start ? bi : idx;
          break;
        }
      }
      if (join_a >= 0) break;
    }
    a_is_start = !a_is_start;
  }
  if (join_a < 0) return 0;

  // assemble path: start-tree root..join_a then join_b..goal-tree root
  std::vector<double> path;
  {
    std::vector<int> chain;
    for (int i = join_a; i >= 0; i = ta.parents[i]) chain.push_back(i);
    for (auto it = chain.rbegin(); it != chain.rend(); ++it)
      path.insert(path.end(), ta.node(*it), ta.node(*it) + q_dim);
    for (int i = join_b; i >= 0; i = tb.parents[i])
      path.insert(path.end(), tb.node(i), tb.node(i) + q_dim);
  }

  // randomized shortcutting (same scheme as the Python reference impl)
  int n_pts = static_cast<int>(path.size()) / q_dim;
  for (int r = 0; r < shortcut_rounds && n_pts > 2; ++r) {
    int i = static_cast<int>(unif(rng) * n_pts);
    int j = static_cast<int>(unif(rng) * n_pts);
    if (i > j) std::swap(i, j);
    if (j - i < 2 || j >= n_pts) continue;
    const double* qi = &path[size_t(i) * q_dim];
    const double* qj = &path[size_t(j) * q_dim];
    const double seg = dist(qi, qj, q_dim);
    const int pts = std::max(n_edge_pts, int(seg / step_size * n_edge_pts));
    if (edge_free(rm, obs, qi, qj, pts, q_min, q_max, margin, tmp)) {
      path.erase(path.begin() + (size_t(i) + 1) * q_dim, path.begin() + size_t(j) * q_dim);
      n_pts = static_cast<int>(path.size()) / q_dim;
    }
  }

  if (n_pts > max_out) return 0;
  std::memcpy(out_path, path.data(), path.size() * sizeof(double));
  *out_len = n_pts;
  return 1;
}

}  // extern "C"
