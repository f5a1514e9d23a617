// CPU anchor for the headline benchmark: authenticated Beaver-multiplication
// throughput of an optimized native CPU implementation.
//
// The reference (`ark-mpc`) publishes no absolute numbers and this image has
// no Rust toolchain to run its criterion benches
// (`online-phase/benches/circuit_mul_throughput.rs:11-44`, `batch_ops.rs`),
// so the anchor is measured from this best-effort reimplementation of the
// same per-element work ark-mpc performs for one authenticated Beaver
// multiplication, with every advantage given to the CPU:
//   - arkworks-style 4x64-bit Montgomery (CIOS) arithmetic over the
//     Curve25519 scalar field (the same field config ark-ff generates),
//   - flat arrays, no futures/executor/graph overhead (ark-mpc pays
//     per-gate scheduling on top of this),
//   - no serialization or network: the "exchange" is a local add,
//   - all cores via std::thread, contiguous chunks.
// Per element-round, both logical parties' work (matching bench.py's
// one_round): masks d,e; z = c + d*b + e*a (+ d*e party 0); mac update
// zmac = cmac + d*bmac + e*amac + key*de; open v = z0+z1; MAC-check fold
// t = key*v - zmac, fold-in r = t*coeff, acc += r.  16 field mults/elem.
//
// Build/run: g++ -O3 -march=native -funroll-loops -o cpu_anchor
//            native/cpu_anchor.cpp -pthread && ./cpu_anchor [n] [rounds]
// Prints one JSON line {"metric": "cpu_anchor_auth_mults_per_sec", ...}.

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

// Curve25519 scalar field l = 2^252 + 27742317777372353535851937790883648493
static const u64 MOD[4] = {0x5812631a5cf5d3edULL, 0x14def9dea2f79cd6ULL,
                           0x0000000000000000ULL, 0x1000000000000000ULL};
static const u64 N0INV = 0xd2b51da312547e1bULL;  // -l^-1 mod 2^64
static const u64 R2[4] = {0xa40611e3449c0f01ULL, 0xd00e1ba768859347ULL,
                          0xceec73d217f5be65ULL, 0x0399411b7c309a3dULL};

struct Fe {
  u64 v[4];
};

static inline void fe_sub(Fe &o, const Fe &a, const Fe &b) {
  u128 borrow = 0;
  u64 t[4];
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    t[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
      u128 s = (u128)t[i] + MOD[i] + carry;
      t[i] = (u64)s;
      carry = s >> 64;
    }
  }
  memcpy(o.v, t, sizeof t);
}

static inline void fe_add(Fe &o, const Fe &a, const Fe &b) {
  u128 carry = 0;
  u64 t[4];
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    t[i] = (u64)s;
    carry = s >> 64;
  }
  // conditional subtract
  u128 borrow = 0;
  u64 d[4];
  for (int i = 0; i < 4; i++) {
    u128 x = (u128)t[i] - MOD[i] - borrow;
    d[i] = (u64)x;
    borrow = (x >> 64) & 1;
  }
  bool ge = (carry != 0) || (borrow == 0);
  for (int i = 0; i < 4; i++) o.v[i] = ge ? d[i] : t[i];
}

// CIOS Montgomery multiplication: o = a*b*R^-1 mod l (R = 2^256)
static inline void fe_mul(Fe &o, const Fe &a, const Fe &b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    // t += a[i] * b
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 s = (u128)a.v[i] * b.v[j] + t[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u64 t4 = (u64)((u128)t[4] + carry);
    // reduce one limb
    u64 m = t[0] * N0INV;
    u128 s = (u128)m * MOD[0] + t[0];
    carry = s >> 64;
    for (int j = 1; j < 4; j++) {
      s = (u128)m * MOD[j] + t[j] + carry;
      t[j - 1] = (u64)s;
      carry = s >> 64;
    }
    s = (u128)t4 + carry;
    t[3] = (u64)s;
    t[4] = (u64)(s >> 64);
  }
  // conditional subtract
  u128 borrow = 0;
  u64 d[4];
  for (int i = 0; i < 4; i++) {
    u128 x = (u128)t[i] - MOD[i] - borrow;
    d[i] = (u64)x;
    borrow = (x >> 64) & 1;
  }
  bool ge = (t[4] != 0) || (borrow == 0);
  for (int i = 0; i < 4; i++) o.v[i] = ge ? d[i] : t[i];
}

struct Party {
  std::vector<Fe> x, xm;           // running share + mac (chained)
  std::vector<Fe> a, am, b, bm, c, cm;
  Fe key;
  Fe acc;                          // MAC-check fold accumulator
};

int main(int argc, char **argv) {
  size_t n = argc > 1 ? strtoull(argv[1], nullptr, 10) : (1ULL << 20);
  int rounds = argc > 2 ? atoi(argv[2]) : 16;
  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads == 0) nthreads = 1;

  std::mt19937_64 rng(42);
  auto rnd = [&](Fe &f) {
    for (int i = 0; i < 4; i++) f.v[i] = rng();
    f.v[3] &= 0x0fffffffffffffffULL;  // < 2^252 <~ l (fine for benching)
  };

  Party P[2];
  std::vector<Fe> y[2], ym[2], coeff(n);
  for (int p = 0; p < 2; p++) {
    P[p].x.resize(n); P[p].xm.resize(n);
    P[p].a.resize(n); P[p].am.resize(n);
    P[p].b.resize(n); P[p].bm.resize(n);
    P[p].c.resize(n); P[p].cm.resize(n);
    y[p].resize(n); ym[p].resize(n);
    rnd(P[p].key);
    memset(P[p].acc.v, 0, sizeof P[p].acc.v);
    for (size_t i = 0; i < n; i++) {
      rnd(P[p].x[i]); rnd(P[p].xm[i]);
      rnd(P[p].a[i]); rnd(P[p].am[i]);
      rnd(P[p].b[i]); rnd(P[p].bm[i]);
      rnd(P[p].c[i]); rnd(P[p].cm[i]);
      rnd(y[p][i]); rnd(ym[p][i]);
    }
  }
  for (size_t i = 0; i < n; i++) rnd(coeff[i]);

  auto worker = [&](size_t lo, size_t hi, Fe *acc0, Fe *acc1) {
    Fe d, e, de, t1, t2, z[2], zm[2], v, t, r;
    Fe lacc[2];
    memset(lacc, 0, sizeof lacc);
    for (int rd = 0; rd < rounds; rd++) {
      for (size_t i = lo; i < hi; i++) {
        // masks (the "exchange" is the cross-party add)
        fe_sub(t1, P[0].x[i], P[0].a[i]);
        fe_sub(t2, P[1].x[i], P[1].a[i]);
        fe_add(d, t1, t2);
        fe_sub(t1, y[0][i], P[0].b[i]);
        fe_sub(t2, y[1][i], P[1].b[i]);
        fe_add(e, t1, t2);
        fe_mul(de, d, e);
        for (int p = 0; p < 2; p++) {
          fe_mul(t1, d, P[p].b[i]);
          fe_mul(t2, e, P[p].a[i]);
          fe_add(z[p], P[p].c[i], t1);
          fe_add(z[p], z[p], t2);
          if (p == 0) fe_add(z[p], z[p], de);
          fe_mul(t1, d, P[p].bm[i]);
          fe_mul(t2, e, P[p].am[i]);
          fe_add(zm[p], P[p].cm[i], t1);
          fe_add(zm[p], zm[p], t2);
          fe_mul(t1, P[p].key, de);
          fe_add(zm[p], zm[p], t1);
        }
        fe_add(v, z[0], z[1]);  // open
        for (int p = 0; p < 2; p++) {
          fe_mul(t, P[p].key, v);
          fe_sub(t, t, zm[p]);
          fe_mul(r, t, coeff[i]);
          fe_add(lacc[p], lacc[p], r);
          P[p].x[i] = z[p];  // chain: next round multiplies this by y
          P[p].xm[i] = zm[p];
        }
      }
    }
    *acc0 = lacc[0];
    *acc1 = lacc[1];
  };

  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> threads;
  std::vector<Fe> accs(2 * nthreads);
  size_t chunk = (n + nthreads - 1) / nthreads;
  for (unsigned t = 0; t < nthreads; t++) {
    size_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi, &accs[2 * t], &accs[2 * t + 1]);
  }
  for (auto &th : threads) th.join();
  double secs = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();

  // fold accumulators (keeps the compiler honest about the fold outputs)
  Fe total;
  memset(total.v, 0, sizeof total.v);
  for (auto &a : accs) fe_add(total, total, a);

  double total_mults = (double)n * rounds;
  fprintf(stderr, "n=%zu rounds=%d threads=%u time=%.3fs (acc0=%llx)\n", n,
          rounds, nthreads, secs, (unsigned long long)total.v[0]);
  printf("{\"metric\": \"cpu_anchor_auth_mults_per_sec\", \"value\": %.1f, "
         "\"unit\": \"mults/s\", \"threads\": %u}\n",
         total_mults / secs, nthreads);
  return 0;
}
