// Golden-fixture generator: runs the REAL reference LQR recursion
// (the unmodified /root/reference/sip_optimal_control/lqr.cpp, compiled
// against the minimal Eigen shim in eigen_shim/) on seeded problems and
// dumps inputs + factor/solve outputs as a flat binary stream of f64,
// for tests/test_golden_lqr.py to pin ops/lqr.py against at 1e-10
// (BASELINE: <= 1e-6 control-trajectory parity vs the C++ reference).
//
// Stream layout per case (all doubles little-endian, matrices
// COLUMN-major as the reference stores them):
//   header: T, n, m, kind (0 = chain, 1 = star tree)
//   inputs:  Q[(T+1) n n], q[(T+1) n], c[(T+1) n], delta[(T+1) n],
//            A[T n n], B[T n m], M[T n m], R[T m m], r[T m]
//            (tree kind: same uniform dims; edge arrays in edge order)
//   topology (tree kind only): parents[T], children[T]
//   outputs: x[(T+1) n], u[T m], y[(T+1) n],
//            V[(T+1) n n], K[T m n]   (workspace factor products)
//
// Usage: lqr_fixture_gen <out.bin>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "sip_optimal_control/lqr.hpp"

using sip::optimal_control::Dimensions;
using sip::optimal_control::LQR;
using sip::optimal_control::Topology;

// deterministic xorshift64* PRNG -> uniform in [-1, 1)
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed * 2685821657736338717ULL + 1) {}
  double next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    uint64_t r = s * 2685821657736338717ULL;
    return 2.0 * ((r >> 11) * (1.0 / 9007199254740992.0)) - 1.0;
  }
};

static void spd_fill(Rng& rng, double* out, int n, double diag) {
  // out = L L^T + diag*I with random L (column-major, symmetric)
  std::vector<double> L(n * n);
  for (auto& v : L) v = 0.5 * rng.next();
  for (int j = 0; j < n; ++j)
    for (int i = 0; i < n; ++i) {
      double s = (i == j) ? diag : 0.0;
      for (int k = 0; k < n; ++k) s += L[i + k * n] * L[j + k * n];
      out[i + j * n] = s;
    }
}

struct Case {
  int T, n, m, kind;
  std::vector<int> parents, children;
};

static void run_case(const Case& cs, uint64_t seed, FILE* f) {
  const int T = cs.T, n = cs.n, m = cs.m;
  const int N = T + 1;
  Rng rng(seed);

  Topology topo;
  topo.reserve(T);
  if (cs.kind == 0) {
    topo.set_chain();
  } else {
    topo.set_tree(0, cs.parents.data(), cs.children.data());
  }
  Dimensions dims;
  dims.reserve(T);
  dims.set_uniform(T, n, m, 0, 0, 0, 0);

  // flat buffers + pointer tables
  std::vector<double> Q(N * n * n), q(N * n), c(N * n), delta(N * n);
  std::vector<double> A(T * n * n), B(T * n * m), M(T * n * m), R(T * m * m),
      r(T * m);
  for (int i = 0; i < N; ++i) spd_fill(rng, &Q[i * n * n], n, 1.0);
  for (auto& v : q) v = rng.next();
  for (auto& v : c) v = rng.next();
  for (auto& v : delta) v = 0.05 + 0.5 * (rng.next() + 1.0);
  for (auto& v : A) v = rng.next();
  for (auto& v : B) v = rng.next();
  for (auto& v : M) v = 0.3 * rng.next();
  for (int e = 0; e < T; ++e) spd_fill(rng, &R[e * m * m], m, 0.5);
  for (auto& v : r) v = rng.next();

  std::vector<double*> Qp(N), qp(N), cp(N), dp(N), Ap(T), Bp(T), Mp(T),
      Rp(T), rp(T);
  for (int i = 0; i < N; ++i) {
    Qp[i] = &Q[i * n * n];
    qp[i] = &q[i * n];
    cp[i] = &c[i * n];
    dp[i] = &delta[i * n];
  }
  for (int e = 0; e < T; ++e) {
    Ap[e] = &A[e * n * n];
    Bp[e] = &B[e * n * m];
    Mp[e] = &M[e * n * m];
    Rp[e] = &R[e * m * m];
    rp[e] = &r[e * m];
  }

  LQR::Input input{Qp.data(), Mp.data(), Rp.data(), qp.data(), rp.data(),
                   Ap.data(), Bp.data(), cp.data(), dp.data(), dims, topo};
  LQR::Workspace ws;
  ws.reserve(dims, topo);
  LQR lqr(input, ws);
  if (lqr.compile_topology() != LQR::FactorStatus::SUCCESS) {
    std::fprintf(stderr, "compile_topology failed\n");
    std::exit(2);
  }
  if (lqr.factor_with_status() != LQR::FactorStatus::SUCCESS) {
    std::fprintf(stderr, "factor failed\n");
    std::exit(3);
  }
  std::vector<double> x(N * n), u(T * m), y(N * n);
  LQR::Output out;
  out.reserve(T);
  for (int i = 0; i < N; ++i) {
    out.x[i] = &x[i * n];
    out.y[i] = &y[i * n];
  }
  for (int e = 0; e < T; ++e) out.u[e] = &u[e * m];
  lqr.solve(out);

  // ---- dump ------------------------------------------------------------
  auto wd = [&](const double* p, size_t k) { std::fwrite(p, 8, k, f); };
  double hdr[4] = {double(T), double(n), double(m), double(cs.kind)};
  wd(hdr, 4);
  wd(Q.data(), Q.size());
  wd(q.data(), q.size());
  wd(c.data(), c.size());
  wd(delta.data(), delta.size());
  wd(A.data(), A.size());
  wd(B.data(), B.size());
  wd(M.data(), M.size());
  wd(R.data(), R.size());
  wd(r.data(), r.size());
  if (cs.kind == 1) {
    std::vector<double> pc(2 * T);
    for (int e = 0; e < T; ++e) {
      pc[e] = cs.parents[e];
      pc[T + e] = cs.children[e];
    }
    wd(pc.data(), pc.size());
  }
  wd(x.data(), x.size());
  wd(u.data(), u.size());
  wd(y.data(), y.size());
  std::vector<double> V(N * n * n), K(T * m * n);
  for (int i = 0; i < N; ++i)
    std::memcpy(&V[i * n * n], ws.V[i], n * n * 8);
  for (int e = 0; e < T; ++e)
    std::memcpy(&K[e * m * n], ws.K[e], m * n * 8);
  wd(V.data(), V.size());
  wd(K.data(), K.size());
}

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <out.bin>\n", argv[0]);
    return 1;
  }
  FILE* f = std::fopen(argv[1], "wb");
  if (!f) return 1;

  std::vector<Case> cases;
  // chains matching the reference benchmark grid corners
  // (lqr_benchmark.cpp:537-545)
  const int chain_dims[4][3] = {{16, 4, 1}, {50, 4, 2}, {32, 8, 3},
                                {50, 16, 4}};
  for (const auto& d : chain_dims) {
    cases.push_back(Case{d[0], d[1], d[2], 0, {}, {}});
  }
  // shallow-wide star tree: root -> 4 chains of length 3 (T = 12)
  {
    Case cs{12, 5, 2, 1, {}, {}};
    int nxt = 1;
    for (int b = 0; b < 4; ++b) {
      int prev = 0;
      for (int k = 0; k < 3; ++k) {
        cs.parents.push_back(prev);
        cs.children.push_back(nxt);
        prev = nxt++;
      }
    }
    cases.push_back(cs);
  }
  // binary tree of depth 3 (T = 14)
  {
    Case cs{14, 3, 1, 1, {}, {}};
    for (int child = 1; child <= 14; ++child) {
      cs.parents.push_back((child - 1) / 2);
      cs.children.push_back(child);
    }
    cases.push_back(cs);
  }

  double count = cases.size();
  std::fwrite(&count, 8, 1, f);
  uint64_t seed = 1234567;
  for (const auto& cs : cases) run_case(cs, seed++, f);
  std::fclose(f);
  std::printf("wrote %zu cases\n", cases.size());
  return 0;
}
