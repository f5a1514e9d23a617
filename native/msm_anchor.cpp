// CPU anchor for the MSM benchmark: multi-scalar multiplication throughput
// of an optimized native multicore CPU implementation over Ed25519.
//
// Role: the reference benches arkworks' rayon-parallel VariableBaseMSM
// (`online-phase/benches/native_msm.rs:14-31`, Pippenger at
// `algebra/curve/curve.rs:549-584`) but publishes no numbers and this image
// has no Rust toolchain, so benchmarks/msm.py measures THIS reimplementation
// of the same algorithm as the CPU baseline the TPU kernels must beat:
//   - radix-2^51 field arithmetic over 2^255 - 19 (the layout arkworks/
//     curve25519-dalek use on 64-bit), written from the standard formulas,
//   - extended twisted-Edwards coordinates, complete unified addition
//     (a = -1 HWCD, 9M per add; doubling 4M + 4S),
//   - bucketed Pippenger with c-bit windows (c = 8: 32 windows x 256
//     buckets; ~n point-adds per window + 2*256 for the suffix sums),
//   - all cores via std::thread, one window per task.
//
// Build/run: g++ -O3 -march=native -funroll-loops -o msm_anchor
//            native/msm_anchor.cpp -pthread && ./msm_anchor [n]
// Prints one JSON line {"metric": "cpu_msm_points_per_sec", ...} and a
// self-check line (MSM of k*(i*G) vs (sum k_i*i)*G on a small case).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <random>
#include <thread>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

static const u64 MASK51 = (1ULL << 51) - 1;

struct Fe {
  u64 v[5];
};

static const Fe FE_D2 = {{0x69b9426b2f159ULL, 0x35050762add7aULL,
                          0x3cf44c0038052ULL, 0x6738cc7407977ULL,
                          0x2406d9dc56dffULL}};
static const Fe FE_GX = {{0x62d608f25d51aULL, 0x412a4b4f6592aULL,
                          0x75b7171a4b31dULL, 0x1ff60527118feULL,
                          0x216936d3cd6e5ULL}};
static const Fe FE_GY = {{0x6666666666658ULL, 0x4ccccccccccccULL,
                          0x1999999999999ULL, 0x3333333333333ULL,
                          0x6666666666666ULL}};
static const Fe FE_GT = {{0x68ab3a5b7dda3ULL, 0xeea2a5eadbbULL,
                          0x2af8df483c27eULL, 0x332b375274732ULL,
                          0x67875f0fd78b7ULL}};
static const Fe FE_ONE = {{1, 0, 0, 0, 0}};
static const Fe FE_ZERO = {{0, 0, 0, 0, 0}};

static inline void fe_add(Fe &o, const Fe &a, const Fe &b) {
  for (int i = 0; i < 5; i++) o.v[i] = a.v[i] + b.v[i];
}

// a - b with 2p bias to stay nonnegative (limbs stay < 2^54 pre-reduce)
static inline void fe_sub(Fe &o, const Fe &a, const Fe &b) {
  o.v[0] = a.v[0] + 0xFFFFFFFFFFFDAULL - b.v[0];
  o.v[1] = a.v[1] + 0xFFFFFFFFFFFFEULL - b.v[1];
  o.v[2] = a.v[2] + 0xFFFFFFFFFFFFEULL - b.v[2];
  o.v[3] = a.v[3] + 0xFFFFFFFFFFFFEULL - b.v[3];
  o.v[4] = a.v[4] + 0xFFFFFFFFFFFFEULL - b.v[4];
}

static inline void fe_mul(Fe &o, const Fe &a, const Fe &b) {
  u64 a0 = a.v[0], a1 = a.v[1], a2 = a.v[2], a3 = a.v[3], a4 = a.v[4];
  u64 b0 = b.v[0], b1 = b.v[1], b2 = b.v[2], b3 = b.v[3], b4 = b.v[4];
  u64 a1_19 = 19 * a1, a2_19 = 19 * a2, a3_19 = 19 * a3, a4_19 = 19 * a4;
  u128 c0 = (u128)a0 * b0 + (u128)a4_19 * b1 + (u128)a3_19 * b2 +
            (u128)a2_19 * b3 + (u128)a1_19 * b4;
  u128 c1 = (u128)a1 * b0 + (u128)a0 * b1 + (u128)a4_19 * b2 +
            (u128)a3_19 * b3 + (u128)a2_19 * b4;
  u128 c2 = (u128)a2 * b0 + (u128)a1 * b1 + (u128)a0 * b2 +
            (u128)a4_19 * b3 + (u128)a3_19 * b4;
  u128 c3 = (u128)a3 * b0 + (u128)a2 * b1 + (u128)a1 * b2 +
            (u128)a0 * b3 + (u128)a4_19 * b4;
  u128 c4 = (u128)a4 * b0 + (u128)a3 * b1 + (u128)a2 * b2 +
            (u128)a1 * b3 + (u128)a0 * b4;
  c1 += (u64)(c0 >> 51);
  c2 += (u64)(c1 >> 51);
  c3 += (u64)(c2 >> 51);
  c4 += (u64)(c3 >> 51);
  u64 r0 = (u64)c0 & MASK51, r1 = (u64)c1 & MASK51, r2 = (u64)c2 & MASK51;
  u64 r3 = (u64)c3 & MASK51, r4 = (u64)c4 & MASK51;
  r0 += 19 * (u64)(c4 >> 51);
  r1 += r0 >> 51;
  r0 &= MASK51;
  o.v[0] = r0; o.v[1] = r1; o.v[2] = r2; o.v[3] = r3; o.v[4] = r4;
}

// weak reduction after adds/subs so limbs fit the mul preconditions
static inline void fe_reduce(Fe &o) {
  u64 c;
  c = o.v[0] >> 51; o.v[0] &= MASK51; o.v[1] += c;
  c = o.v[1] >> 51; o.v[1] &= MASK51; o.v[2] += c;
  c = o.v[2] >> 51; o.v[2] &= MASK51; o.v[3] += c;
  c = o.v[3] >> 51; o.v[3] &= MASK51; o.v[4] += c;
  c = o.v[4] >> 51; o.v[4] &= MASK51; o.v[0] += 19 * c;
}

static void fe_canon(Fe &o) {  // full canonical reduction (for checks)
  fe_reduce(o); fe_reduce(o);
  // now < 2^255+eps; subtract p if >= p
  Fe p = {{MASK51 - 18, MASK51, MASK51, MASK51, MASK51}};
  Fe t;
  u64 borrow = 0;
  for (int i = 0; i < 5; i++) {
    u64 d = o.v[i] - p.v[i] - borrow;
    borrow = (o.v[i] < p.v[i] + borrow) ? 1 : 0;
    t.v[i] = d & MASK51;
  }
  if (!borrow) o = t;
}

struct Pt {
  Fe x, y, z, t;
};

static const Pt PT_ID = {FE_ZERO, FE_ONE, FE_ONE, FE_ZERO};

// unified extended addition, a = -1 (complete; 9M incl. the d2 product)
static inline void pt_add(Pt &o, const Pt &p, const Pt &q) {
  Fe ymx1, ypx1, ymx2, ypx2, A, Bv, C, D, E, F, G, H;
  fe_sub(ymx1, p.y, p.x); fe_reduce(ymx1);
  fe_add(ypx1, p.y, p.x); fe_reduce(ypx1);
  fe_sub(ymx2, q.y, q.x); fe_reduce(ymx2);
  fe_add(ypx2, q.y, q.x); fe_reduce(ypx2);
  fe_mul(A, ymx1, ymx2);
  fe_mul(Bv, ypx1, ypx2);
  fe_mul(C, p.t, q.t);
  fe_mul(C, C, FE_D2);
  fe_mul(D, p.z, q.z);
  fe_add(D, D, D); fe_reduce(D);
  fe_sub(E, Bv, A); fe_reduce(E);
  fe_sub(F, D, C); fe_reduce(F);
  fe_add(G, D, C); fe_reduce(G);
  fe_add(H, Bv, A); fe_reduce(H);
  fe_mul(o.x, E, F);
  fe_mul(o.y, G, H);
  fe_mul(o.z, F, G);
  fe_mul(o.t, E, H);
}

static inline void pt_double(Pt &o, const Pt &p) {
  Fe A, Bv, C, D, E, G, F, H, xy;
  fe_mul(A, p.x, p.x);
  fe_mul(Bv, p.y, p.y);
  fe_mul(C, p.z, p.z);
  fe_add(C, C, C); fe_reduce(C);
  fe_add(H, A, Bv); fe_reduce(H);
  fe_add(xy, p.x, p.y); fe_reduce(xy);
  fe_mul(E, xy, xy);
  fe_sub(E, H, E); fe_reduce(E);
  fe_sub(G, A, Bv); fe_reduce(G);
  fe_add(F, C, G); fe_reduce(F);
  fe_mul(o.x, E, F);
  fe_mul(o.y, G, H);
  fe_mul(o.z, F, G);
  fe_mul(o.t, E, H);
}

static const int C_BITS = 8;
static const int N_WIN = 32;
static const int N_BUCK = 1 << C_BITS;

// one window's contribution: bucket-accumulate + suffix sums
static void window_sum(Pt &out, const std::vector<Pt> &pts,
                       const std::vector<uint8_t> &digits, int w, size_t n) {
  std::vector<Pt> buck(N_BUCK, PT_ID);
  const uint8_t *dw = digits.data() + (size_t)w * n;
  for (size_t i = 0; i < n; i++) {
    uint8_t d = dw[i];
    if (d) pt_add(buck[d], buck[d], pts[i]);
  }
  Pt run = PT_ID, acc = PT_ID;
  for (int d = N_BUCK - 1; d >= 1; d--) {
    pt_add(run, run, buck[d]);
    pt_add(acc, acc, run);
  }
  out = acc;
}

// double-and-add by raw bit string (for the self-checks)
static Pt pt_scalar_mul_bits(const Pt &p, const uint8_t *le_bytes,
                             int nbits) {
  Pt acc = PT_ID;
  for (int i = nbits - 1; i >= 0; i--) {
    pt_double(acc, acc);
    if ((le_bytes[i >> 3] >> (i & 7)) & 1) pt_add(acc, acc, p);
  }
  return acc;
}

static bool pt_is_identity(Pt p) {
  // X == 0 and Y == Z projectively: check X*1 == 0 and Y - Z == 0
  Fe t;
  fe_canon(p.x);
  fe_sub(t, p.y, p.z);
  fe_canon(t);
  for (int i = 0; i < 5; i++)
    if (p.x.v[i] || t.v[i]) return false;
  return true;
}

static int self_check() {
  // 1) group-order check: l * G == identity (exercises fe_mul/add/double)
  static const uint8_t ORDER_LE[32] = {
      0xed, 0xd3, 0xf5, 0x5c, 0x1a, 0x63, 0x12, 0x58, 0xd6, 0x9c, 0xf7,
      0xa2, 0xde, 0xf9, 0xde, 0x14, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10};
  Pt g = {FE_GX, FE_GY, FE_ONE, FE_GT};
  if (!pt_is_identity(pt_scalar_mul_bits(g, ORDER_LE, 253))) return 1;
  // 2) tiny Pippenger vs naive: sum d_i * P_i for 4 points, 1-byte scalars
  Pt p[4];
  p[0] = g;
  pt_double(p[1], g);
  pt_add(p[2], p[1], g);
  pt_double(p[3], p[1]);
  uint8_t ds[4] = {3, 0, 7, 255};
  Pt naive = PT_ID;
  for (int i = 0; i < 4; i++) {
    uint8_t b[32] = {ds[i]};
    Pt t = pt_scalar_mul_bits(p[i], b, 8);
    pt_add(naive, naive, t);
  }
  Pt buck[N_BUCK];
  for (int d = 0; d < N_BUCK; d++) buck[d] = PT_ID;
  for (int i = 0; i < 4; i++)
    if (ds[i]) pt_add(buck[ds[i]], buck[ds[i]], p[i]);
  Pt run = PT_ID, acc = PT_ID;
  for (int d = N_BUCK - 1; d >= 1; d--) {
    pt_add(run, run, buck[d]);
    pt_add(acc, acc, run);
  }
  // equal projectively: x1*z2 == x2*z1 and y1*z2 == y2*z1
  Fe a, b;
  fe_mul(a, naive.x, acc.z);
  fe_mul(b, acc.x, naive.z);
  fe_canon(a); fe_canon(b);
  if (memcmp(a.v, b.v, sizeof a.v)) return 2;
  fe_mul(a, naive.y, acc.z);
  fe_mul(b, acc.y, naive.z);
  fe_canon(a); fe_canon(b);
  if (memcmp(a.v, b.v, sizeof a.v)) return 3;
  return 0;
}

int main(int argc, char **argv) {
  size_t n = argc > 1 ? strtoull(argv[1], nullptr, 10) : (1u << 16);
  int rc = self_check();
  if (rc) {
    fprintf(stderr, "msm_anchor SELF-CHECK FAILED (%d)\n", rc);
    return rc;
  }
  fprintf(stderr, "msm_anchor self-check OK (l*G == id; pippenger == naive)\n");
  std::mt19937_64 rng(42);

  // points: iterated generator multiples (cheap adds); scalars: random
  std::vector<Pt> pts(n);
  Pt g = {FE_GX, FE_GY, FE_ONE, FE_GT};
  Pt cur = g;
  for (size_t i = 0; i < n; i++) {
    pts[i] = cur;
    pt_add(cur, cur, g);
  }
  // 256-bit scalars as 32 window digits each, stored window-major
  std::vector<uint8_t> digits((size_t)N_WIN * n);
  for (size_t i = 0; i < n; i++)
    for (int w = 0; w < N_WIN; w += 8) {
      u64 word = rng();
      for (int k = 0; k < 8; k++)
        digits[(size_t)(w + k) * n + i] = (uint8_t)(word >> (8 * k));
    }

  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0) nthreads = 4;

  auto run_msm = [&](std::vector<Pt> &wins) {
    std::vector<std::thread> th;
    std::atomic<int> next{0};
    for (unsigned t = 0; t < nthreads; t++)
      th.emplace_back([&]() {
        for (;;) {
          int w = next.fetch_add(1);
          if (w >= N_WIN) return;
          window_sum(wins[w], pts, digits, w, n);
        }
      });
    for (auto &x : th) x.join();
    // Horner across windows, top first
    Pt acc = PT_ID;
    for (int w = N_WIN - 1; w >= 0; w--) {
      for (int b = 0; b < C_BITS; b++) pt_double(acc, acc);
      // windows stored little-endian: weight of window w is 2^(8w)
      // -> process from high w down
      pt_add(acc, acc, wins[w]);
    }
    return acc;
  };

  std::vector<Pt> wins(N_WIN, PT_ID);
  // warm-up + timed run
  auto t0 = std::chrono::steady_clock::now();
  Pt result = run_msm(wins);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();

  // touch the result so nothing is optimized away
  fe_canon(result.x);
  fprintf(stderr, "msm_anchor: n=%zu threads=%u time=%.4fs x0=%llx\n", n,
          nthreads, secs, (unsigned long long)result.x.v[0]);
  printf("{\"metric\": \"cpu_msm_points_per_sec\", \"value\": %.1f, "
         "\"unit\": \"points/s\", \"n\": %zu, \"seconds\": %.4f}\n",
         n / secs, n, secs);
  return 0;
}
