// CPU anchor for the OFFLINE phase: dealer-free LowGear triple throughput
// of an optimized native CPU implementation of the same per-batch
// homomorphic work the TPU pipeline performs (offline/lowgear/triplets_l.py
// pair flow; reference flow `offline-phase/src/lowgear/triplets.rs:30-234`,
// which FFIs to MP-SPDZ's C++ BGV).
//
// The reference publishes no absolute offline numbers and its BGV lives in
// an unvendored MP-SPDZ submodule, so — like native/cpu_anchor.cpp for the
// online phase — this measures a best-effort native reimplementation of the
// per-slot-batch work, with every advantage given to the CPU:
//
//   - Per slot-batch PAIR (the sacrifice flow makes (a,b,c),(a,b',c') and
//     burns one): 7 homomorphic units per party = 2 cross products
//     (a*b, a*b') + 5 authentications (enc(mac) x value for a, b, b', c,
//     c'), exactly the unit count of generate_triple_pairs_batch_l.
//     Each unit = encode (1 fwd NTT) + ct x pt (2 pointwise muls) + drown
//     rerandomization (fresh noise encryption: 2 fwd NTTs + 4 pointwise)
//     + decrypt (1 pointwise + 1 inv NTT + per-coeff CRT to the 253-bit
//     field l).
//   - Ring: power-of-two negacyclic stand-in at the same dimension class
//     and RNS depth as the repo ring (the repo's odd cyclotomic in the
//     powerful basis pays PFA twiddle structure; radix-2 is strictly
//     faster per op, keeping the anchor an UPPER bound).
//   - Shoup-precomputed twiddle multiplication, all cores via std::thread,
//     no serialization, no wire, and NO ZK PROVER COST (the real protocol
//     pays an amortized V=128-row proof per enc exchange) — all generous
//     to the CPU.
//
// Build/run:
//   g++ -O3 -march=native -funroll-loops -o offline_anchor
//       native/offline_anchor.cpp -pthread
//   ./offline_anchor <N> <L> <slots> [reps]
//     medium-ring class:     ./offline_anchor 512 29 240
//     production-ring class: ./offline_anchor 65536 27 24480
// Prints one JSON line {"metric": "cpu_anchor_offline_triples_per_sec", ...}.

#include <array>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <random>
#include <thread>
#include <vector>

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;

static int NTH = (int)std::thread::hardware_concurrency();

// ---------------------------------------------------------------------------
// modular helpers
// ---------------------------------------------------------------------------
static inline u64 mulmod(u64 a, u64 b, u64 p) { return (u64)((u128)a * b % p); }

static u64 powmod(u64 a, u64 e, u64 p) {
  u64 r = 1;
  while (e) {
    if (e & 1) r = mulmod(r, a, p);
    a = mulmod(a, a, p);
    e >>= 1;
  }
  return r;
}

// Shoup multiplication by a CONSTANT w with precomputed wp = floor(w<<64 / p)
static inline u64 mul_shoup(u64 a, u64 w, u64 wp, u64 p) {
  u64 q = (u64)(((u128)a * wp) >> 64);
  u64 r = a * w - q * p;  // in [0, 2p)
  return r >= p ? r - p : r;
}

// ---------------------------------------------------------------------------
// one RNS prime's negacyclic NTT context (p = 1 mod 2N)
// ---------------------------------------------------------------------------
struct PrimeCtx {
  u64 p;
  int logn;
  u32 n;
  std::vector<u64> w, wp;        // fwd twiddles (incl. psi powers), Shoup
  std::vector<u64> iw, iwp;      // inverse
  u64 ninv, ninvp;               // N^-1 mod p, Shoup
};

static void build_ctx(PrimeCtx &c, u64 p, u32 n) {
  c.p = p;
  c.n = n;
  c.logn = 0;
  while ((1u << c.logn) < n) c.logn++;
  // find a 2n-th primitive root: g^((p-1)/2n)
  u64 g = 2;
  u64 psi = 0;
  for (;; g++) {
    psi = powmod(g, (p - 1) / (2 * n), p);
    // primitive iff psi^n == p-1
    if (powmod(psi, n, p) == p - 1) break;
  }
  // CT/GS tables with psi folded in (standard negacyclic layout):
  // fwd stage tables are psi^(bitrev) — store per-butterfly constants
  auto bitrev = [&](u32 x, int bits) {
    u32 r = 0;
    for (int i = 0; i < bits; i++) r |= ((x >> i) & 1) << (bits - 1 - i);
    return r;
  };
  c.w.resize(n);
  c.wp.resize(n);
  c.iw.resize(n);
  c.iwp.resize(n);
  u64 ipsi = powmod(psi, p - 2, p);
  for (u32 i = 0; i < n; i++) {
    c.w[i] = powmod(psi, bitrev(i, c.logn), p);
    c.iw[i] = powmod(ipsi, bitrev(i, c.logn), p);
    c.wp[i] = (u64)(((u128)c.w[i] << 64) / p);
    c.iwp[i] = (u64)(((u128)c.iw[i] << 64) / p);
  }
  c.ninv = powmod(n, p - 2, p);
  c.ninvp = (u64)(((u128)c.ninv << 64) / p);
}

// in-place forward negacyclic NTT (Cooley-Tukey, natural -> bitrev)
static void ntt_fwd(const PrimeCtx &c, u64 *a) {
  u32 n = c.n;
  for (u32 len = n >> 1, m = 1; len >= 1; len >>= 1, m <<= 1) {
    for (u32 i = 0; i < m; i++) {
      u64 w = c.w[m + i], wp = c.wp[m + i];
      u64 *lo = a + 2 * i * len, *hi = lo + len;
      for (u32 j = 0; j < len; j++) {
        u64 u = lo[j], v = mul_shoup(hi[j], w, wp, c.p);
        lo[j] = u + v >= c.p ? u + v - c.p : u + v;
        hi[j] = u >= v ? u - v : u + c.p - v;
      }
    }
  }
}

// in-place inverse (Gentleman-Sande, bitrev -> natural), scales by 1/n
static void ntt_inv(const PrimeCtx &c, u64 *a) {
  u32 n = c.n;
  for (u32 len = 1, m = n >> 1; m >= 1; len <<= 1, m >>= 1) {
    for (u32 i = 0; i < m; i++) {
      u64 w = c.iw[m + i], wp = c.iwp[m + i];
      u64 *lo = a + 2 * i * len, *hi = lo + len;
      for (u32 j = 0; j < len; j++) {
        u64 u = lo[j], v = hi[j];
        u64 s = u + v;
        lo[j] = s >= c.p ? s - c.p : s;
        u64 d = u >= v ? u - v : u + c.p - v;
        hi[j] = mul_shoup(d, w, wp, c.p);
      }
    }
  }
  for (u32 j = 0; j < n; j++) a[j] = mul_shoup(a[j], c.ninv, c.ninvp, c.p);
}

// ---------------------------------------------------------------------------
// 253-bit field l (Curve25519 order) CRT reduction for decrypt-decode
// ---------------------------------------------------------------------------
static const u64 LMOD[4] = {0x5812631a5cf5d3edULL, 0x14def9dea2f79cd6ULL, 0ULL,
                            0x1000000000000000ULL};

struct U320 {
  u64 v[5];
};

static inline void acc_mul1(U320 &acc, const u64 m[4], u64 x) {
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 t = (u128)m[i] * x + acc.v[i] + (u64)carry;
    acc.v[i] = (u64)t;
    carry = t >> 64;
  }
  acc.v[4] += (u64)carry;
}

// reduce a 320-bit accumulator mod l by repeated top-limb folding
// (2^256 mod l precomputed); inputs stay < 2^290 for L <= 32 primes
static void red_l(U320 &a, u64 out[4]) {
  static const u64 R256[4] = {  // 2^256 mod l
      0xd6ec31748d98951dULL, 0xc6ef5bf4737dcf70ULL, 0xfffffffffffffffeULL,
      0x0fffffffffffffffULL};
  // each fold replaces top*2^256 by top*(2^256 mod l) ~ top/16: the top
  // limb shrinks ~4 bits per pass, so this terminates in <= 16 passes
  while (a.v[4]) {
    u64 top = a.v[4];
    a.v[4] = 0;
    U320 t{};
    acc_mul1(t, R256, top);
    u128 carry = 0;
    for (int i = 0; i < 5; i++) {
      u128 s = (u128)a.v[i] + t.v[i] + (u64)carry;
      a.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
  // now < 2^256; subtract l*k via simple conditional loop on high bits
  // (l ~ 2^252, at most 16 subtractions of l<<4 then l)
  for (int sh = 4; sh >= 0; sh--) {
    for (;;) {
      // compare a >= l<<sh
      u64 ls[5] = {0, 0, 0, 0, 0};
      for (int i = 0; i < 4; i++) {
        ls[i] |= (LMOD[i] << sh);
        if (sh && i) ls[i] |= (LMOD[i - 1] >> (64 - sh));
      }
      if (sh) ls[4] = LMOD[3] >> (64 - sh);
      bool ge = false, done = false;
      for (int i = 4; i >= 0 && !done; i--) {
        if (a.v[i] > ls[i]) { ge = true; done = true; }
        else if (a.v[i] < ls[i]) { ge = false; done = true; }
        else if (i == 0) ge = true;
      }
      if (!ge) break;
      u128 borrow = 0;
      for (int i = 0; i < 5; i++) {
        u128 d = (u128)a.v[i] - ls[i] - (u64)borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) & 1;
      }
    }
  }
  memcpy(out, a.v, 32);
}

// ---------------------------------------------------------------------------
// the anchor workload
// ---------------------------------------------------------------------------
struct Ring {
  u32 n;
  int L;
  std::vector<PrimeCtx> ctx;
  // CRT weights: qhat_inv_i (scalar mod p_i), qhat_i mod l (4 limbs)
  std::vector<u64> qhinv;
  std::vector<std::array<u64, 4>> qh_mod_l;
};

static void par_for(int items, const std::function<void(int)> &fn) {
  int nth = NTH < items ? NTH : items;
  std::vector<std::thread> th;
  std::atomic<int> next{0};
  for (int t = 0; t < nth; t++)
    th.emplace_back([&] {
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= items) return;
        fn(i);
      }
    });
  for (auto &t : th) t.join();
}

int main(int argc, char **argv) {
  u32 N = argc > 1 ? (u32)atoi(argv[1]) : 512;
  int L = argc > 2 ? atoi(argv[2]) : 29;
  int SLOTS = argc > 3 ? atoi(argv[3]) : 240;
  int REPS = argc > 4 ? atoi(argv[4]) : (N >= 16384 ? 4 : 64);
  const int UNITS = 7;  // 2 cross products + 5 authentications per pair

  Ring R;
  R.n = N;
  R.L = L;
  R.ctx.resize(L);
  // distinct ~30-bit primes p = 1 mod 2N
  u64 base = (1ULL << 30) + 1;
  u64 step = 2 * (u64)N;
  u64 cand = base - (base % step) + 1;
  int found = 0;
  auto is_prime = [](u64 x) {
    if (x < 2) return false;
    for (u64 d = 2; d * d <= x; d++)
      if (x % d == 0) return false;
    return true;
  };
  while (found < L) {
    cand += step;
    if (is_prime(cand)) build_ctx(R.ctx[found++], cand, N);
  }
  // CRT weights (values are arbitrary but realistic; the cost is what we
  // measure): qhinv random-ish, qh mod l pseudo-random limbs < l
  R.qhinv.resize(L);
  R.qh_mod_l.resize(L);
  std::mt19937_64 seed(42);
  for (int i = 0; i < L; i++) {
    R.qhinv[i] = seed() % R.ctx[i].p;
    for (int k = 0; k < 4; k++) R.qh_mod_l[i][k] = seed();
    R.qh_mod_l[i][3] &= 0x0fffffffffffffffULL;
  }

  // self-check: NTT roundtrip + negacyclic product x * x on prime 0
  {
    PrimeCtx &c = R.ctx[0];
    std::vector<u64> a(N), b(N);
    for (u32 i = 0; i < N; i++) a[i] = i % 7 + 1;
    b = a;
    ntt_fwd(c, b.data());
    ntt_inv(c, b.data());
    for (u32 i = 0; i < N; i++)
      if (a[i] != b[i]) { fprintf(stderr, "NTT roundtrip FAIL\n"); return 1; }
    // x * 1 == x through pointwise
    std::vector<u64> one(N, 0);
    one[0] = 1;
    std::vector<u64> fa = a, fo = one;
    ntt_fwd(c, fa.data());
    ntt_fwd(c, fo.data());
    for (u32 i = 0; i < N; i++) fa[i] = mulmod(fa[i], fo[i], c.p);
    ntt_inv(c, fa.data());
    for (u32 i = 0; i < N; i++)
      if (a[i] != fa[i]) { fprintf(stderr, "NTT mul FAIL\n"); return 1; }
  }

  // state: enc(a) / enc(mac) ciphertext in NTT form (2 polys x L primes),
  // per-unit scratch
  std::vector<std::vector<u64>> ct0(L), ct1(L);
  for (int i = 0; i < L; i++) {
    ct0[i].assign(N, 0);
    ct1[i].assign(N, 0);
    std::mt19937_64 g(i);
    for (u32 j = 0; j < N; j++) {
      ct0[i][j] = g() % R.ctx[i].p;
      ct1[i][j] = g() % R.ctx[i].p;
    }
  }

  std::vector<std::vector<u64>> scratch(L * 4);
  for (auto &s : scratch) s.assign(N, 0);
  std::vector<u64> coeff_out(4 * N);

  auto t0 = std::chrono::steady_clock::now();
  for (int rep = 0; rep < REPS; rep++) {
    for (int unit = 0; unit < UNITS; unit++) {
      // encode + ct x pt + drown (per prime, parallel over primes)
      par_for(L, [&](int i) {
        PrimeCtx &c = R.ctx[i];
        u64 *pt = scratch[4 * i].data();
        u64 *d0 = scratch[4 * i + 1].data();
        u64 *d1 = scratch[4 * i + 2].data();
        u64 *ns = scratch[4 * i + 3].data();
        // plaintext sampling + encode NTT
        std::mt19937_64 g(rep * 131 + unit * 17 + i);
        for (u32 j = 0; j < N; j++) pt[j] = g() % c.p;
        ntt_fwd(c, pt);
        // ct x pt: 2 pointwise muls
        for (u32 j = 0; j < N; j++) d0[j] = mulmod(ct0[i][j], pt[j], c.p);
        for (u32 j = 0; j < N; j++) d1[j] = mulmod(ct1[i][j], pt[j], c.p);
        // drown: fresh noise encryption = 2 sampled polys + 2 fwd NTTs +
        // pointwise add into both components
        for (u32 j = 0; j < N; j++) ns[j] = g() % c.p;
        ntt_fwd(c, ns);
        for (u32 j = 0; j < N; j++) {
          u64 s = d0[j] + ns[j];
          d0[j] = s >= c.p ? s - c.p : s;
        }
        for (u32 j = 0; j < N; j++) ns[j] = g() % c.p;
        ntt_fwd(c, ns);
        for (u32 j = 0; j < N; j++) {
          u64 s = d1[j] + ns[j];
          d1[j] = s >= c.p ? s - c.p : s;
        }
        // decrypt phase: <c, s> = d0 + d1 * s (pointwise) then inv NTT
        for (u32 j = 0; j < N; j++) {
          u64 t = mulmod(d1[j], ct1[i][j], c.p) + d0[j];
          d0[j] = t >= c.p ? t - c.p : t;
        }
        ntt_inv(c, d0);
        // per-prime CRT prefactor x * qhat_inv mod p
        for (u32 j = 0; j < N; j++) d0[j] = mulmod(d0[j], R.qhinv[i], c.p);
      });
      // CRT-combine to l per coefficient (parallel over coeff chunks)
      par_for(NTH, [&](int t) {
        u32 lo = (u64)N * t / NTH, hi = (u64)N * (t + 1) / NTH;
        for (u32 j = lo; j < hi; j++) {
          U320 acc{};
          for (int i = 0; i < L; i++)
            acc_mul1(acc, R.qh_mod_l[i].data(), scratch[4 * i + 1][j]);
          red_l(acc, &coeff_out[4 * j]);
        }
      });
    }
  }
  double secs =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();
  // one pair-batch (UNITS units) yields SLOTS sacrificed triples
  double tps = (double)SLOTS * REPS / secs;
  // keep the compiler honest
  volatile u64 sink = coeff_out[0];
  (void)sink;
  printf(
      "{\"metric\": \"cpu_anchor_offline_triples_per_sec\", \"value\": %.2f, "
      "\"unit\": \"triples/s\", \"N\": %u, \"L\": %d, \"slots\": %d, "
      "\"reps\": %d, \"seconds\": %.3f, \"threads\": %d}\n",
      tps, N, L, SLOTS, REPS, secs, NTH);
  return 0;
}
