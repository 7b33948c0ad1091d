// Standalone native benchmark driver.
//
// Parity with the reference's self-contained C/CUDA benchmark mains
// (reluqp.cu:1817 / reluqp.c:1448): generate random feasible QPs over a
// size sweep, build the weight bank, run the CPU solve loop, print a
// solve-time table. Problem construction mirrors the KKT-point recipe of
// the Python generator (reluqp/utils.py:11-29) rather than the C driver's
// ad-hoc rand() fill, so every instance is feasible by construction.
//
// Build & run:  make -C native bench && ./native/bench_native [n_seeds]

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <vector>

extern "C" {
struct RQInfo {
  int32_t iters;
  int32_t status;
  int32_t rho_ind;
  double pri_res;
  double dua_res;
  double rho_estimate;
  double obj_val;
};
int rq_build_bank(const double*, const double*, const double*,
                  const uint8_t*, const double*, int, int, int, double,
                  double, double*, double*, double*);
int rq_solve(const double*, const double*, const double*, const double*,
             const double*, const double*, const double*, const double*,
             int, int, int, int, int, double, double, int, double, double,
             int, double*, RQInfo*);
}

namespace {

double now_ms() {
  // wall clock, not clock(): the OpenMP bank build would otherwise report
  // summed per-thread CPU time
  return 1e-6 * std::chrono::duration_cast<std::chrono::nanoseconds>(
      std::chrono::steady_clock::now().time_since_epoch()).count();
}

// Feasible QP around a known KKT point (reluqp/utils.py:11-29 recipe).
void make_qp(int nx, int n_eq, int n_ineq, unsigned seed,
             std::vector<double>& H, std::vector<double>& g,
             std::vector<double>& A, std::vector<double>& l,
             std::vector<double>& u) {
  std::mt19937 rng(seed);
  std::normal_distribution<double> N(0.0, 1.0);
  const int nc = n_eq + n_ineq;
  std::vector<double> M(nx * nx);
  for (auto& v : M) v = N(rng);
  H.assign(nx * nx, 0.0);
  for (int i = 0; i < nx; ++i)
    for (int j = 0; j < nx; ++j) {
      double s = (i == j) ? 1.0 : 0.0;
      for (int k = 0; k < nx; ++k) s += M[k * nx + i] * M[k * nx + j];
      H[i * nx + j] = s;
    }
  for (int i = 0; i < nx; ++i)          // H = H + Hᵀ (after +I)
    for (int j = i; j < nx; ++j) {
      double s = H[i * nx + j] + H[j * nx + i];
      H[i * nx + j] = H[j * nx + i] = s;
    }
  A.assign(nc * nx, 0.0);
  for (auto& v : A) v = N(rng);
  std::vector<uint8_t> active(n_ineq);
  for (auto& a : active) a = N(rng) > 0.5;
  std::vector<double> mu(n_eq), lam(n_ineq), x(nx);
  for (auto& v : mu) v = N(rng);
  for (int i = 0; i < n_ineq; ++i) lam[i] = active[i] ? N(rng) : 0.0;
  for (auto& v : x) v = N(rng);
  l.assign(nc, 0.0);
  u.assign(nc, 0.0);
  for (int i = 0; i < n_eq; ++i) {
    double b = 0.0;
    for (int j = 0; j < nx; ++j) b += A[i * nx + j] * x[j];
    l[i] = u[i] = b;
  }
  for (int i = 0; i < n_ineq; ++i) {
    double cx = 0.0;
    for (int j = 0; j < nx; ++j) cx += A[(n_eq + i) * nx + j] * x[j];
    l[n_eq + i] = cx - (active[i] ? 0.0 : std::fabs(N(rng)));
    u[n_eq + i] = 1e30;                  // +inf row (one-sided)
  }
  g.assign(nx, 0.0);
  for (int j = 0; j < nx; ++j) {
    double s = 0.0;
    for (int k = 0; k < nx; ++k) s -= H[j * nx + k] * x[k];
    for (int i = 0; i < n_eq; ++i) s -= A[i * nx + j] * mu[i];
    for (int i = 0; i < n_ineq; ++i) s -= A[(n_eq + i) * nx + j] * lam[i];
    g[j] = s;
  }
}

std::vector<double> make_ladder() {
  std::vector<double> rhos;
  for (double r = 0.1 / 5.0; r >= 1e-6; r /= 5.0) rhos.push_back(r);
  rhos.push_back(0.1);
  for (double r = 0.1 * 5.0; r <= 1e6; r *= 5.0) rhos.push_back(r);
  std::sort(rhos.begin(), rhos.end());
  return rhos;
}

}  // namespace

int main(int argc, char** argv) {
  // args: [n_seeds] [--json PATH]  — JSON mirrors the committed results/
  // artifacts; the size list is the reference protocol geomspace(10,500,10)
  // (ReLU-QP-py/benchmarks/random_qps.py:105-108; the CUDA standalone
  // hard-codes the same list, reluqp.cu:1825-1836).
  int n_seeds = 3;
  const char* json_path = nullptr;
  for (int i = 1; i < argc; ++i) {
    if (std::string(argv[i]) == "--json" && i + 1 < argc)
      json_path = argv[++i];
    else
      n_seeds = std::atoi(argv[i]);
  }
  FILE* jf = json_path ? std::fopen(json_path, "w") : nullptr;
  if (jf)
    std::fprintf(jf,
                 "{\n  \"bench\": \"native_standalone_fp64\",\n"
                 "  \"protocol\": \"nx geomspace(10,500,10), "
                 "n_eq=n_ineq=nx/4, eps_abs=1e-4, max_iter=4000, "
                 "check_interval=25\",\n  \"n_seeds\": %d,\n"
                 "  \"records\": [\n", n_seeds);
  const int sizes[] = {10, 15, 24, 37, 57, 88, 136, 210, 323, 500};
  const auto rhos = make_ladder();
  const int n_rho = static_cast<int>(rhos.size());
  std::printf("%6s %8s %10s %10s %8s\n", "nx", "iters", "setup_ms",
              "solve_ms", "status");
  for (int nx : sizes) {
    const int n_eq = std::max(nx / 4, 1), n_ineq = std::max(nx / 4, 1);
    const int nc = n_eq + n_ineq, D = nx + 2 * nc;
    double setup_ms = 0, solve_ms = 0, iters = 0;
    int solved = 0;
    for (int seed = 0; seed < n_seeds; ++seed) {
      std::vector<double> H, g, A, l, u;
      make_qp(nx, n_eq, n_ineq, seed, H, g, A, l, u);
      std::vector<uint8_t> eq(nc);
      for (int i = 0; i < nc; ++i) eq[i] = (u[i] - l[i]) <= 1e-6;
      std::vector<double> W((size_t)n_rho * D * D), B((size_t)n_rho * D * nx),
          b((size_t)n_rho * D), y(D, 0.0);
      double t0 = now_ms();
      rq_build_bank(H.data(), A.data(), g.data(), eq.data(), rhos.data(),
                    n_rho, nx, nc, 1e-6,
                    std::numeric_limits<double>::infinity(), W.data(),
                    B.data(), b.data());
      setup_ms += now_ms() - t0;
      RQInfo info{};
      t0 = now_ms();
      rq_solve(H.data(), A.data(), g.data(), l.data(), u.data(), W.data(),
               b.data(), rhos.data(), n_rho, nx, nc, 4000, 25, 1e-4, 5.0,
               1, 1e-6, 1e6, static_cast<int>(
                   std::lower_bound(rhos.begin(), rhos.end(), 0.1)
                   - rhos.begin()),
               y.data(), &info);
      solve_ms += now_ms() - t0;
      iters += info.iters;
      solved += info.status;
    }
    std::printf("%6d %8.0f %10.2f %10.3f %7d/%d\n", nx, iters / n_seeds,
                setup_ms / n_seeds, solve_ms / n_seeds, solved, n_seeds);
    if (jf)
      std::fprintf(jf,
                   "    {\"nx\": %d, \"n_eq\": %d, \"n_ineq\": %d, "
                   "\"iters_mean\": %.1f, \"setup_ms_mean\": %.3f, "
                   "\"solve_ms_mean\": %.4f, \"solved\": %d, "
                   "\"n_seeds\": %d}%s\n",
                   nx, n_eq, n_ineq, iters / n_seeds, setup_ms / n_seeds,
                   solve_ms / n_seeds, solved, n_seeds,
                   nx == sizes[sizeof(sizes) / sizeof(sizes[0]) - 1]
                       ? "" : ",");
  }
  if (jf) {
    std::fprintf(jf, "  ]\n}\n");
    std::fclose(jf);
  }
  return 0;
}
