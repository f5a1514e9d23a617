"""Production general-m cyclotomic ring in the POWERFUL (tensor) basis.

The round-1 `CyclotomicRing` (cyclotomic.py) carries dense (m x phi) DFT /
reduction matrices per RNS prime — infeasible at the production index
m = 118965 (23 GB per prime).  This module is the scalable replacement,
built on the tensor decomposition of Lyubashevsky-Peikert-Regev's Ring-LWE
toolkit:

    R = Z[X]/Phi_m(X)  =~  (x)_a  Z[X_a]/Phi_{m_a}(X_a),   m = prod m_a
                                                     (pairwise coprime)

  - COEFFICIENTS live in the powerful basis: an array of shape
    (phi(m_1), ..., phi(m_k)) — total phi(m) entries, no length-m vectors.
  - EVALUATION form: values at the phi(m) primitive m-th roots, indexed by
    tuples of units (u_1, ..., u_k), u_a in U(m_a).  Ring + and x are
    POINTWISE — no reduction mod Phi_m is ever performed.
  - coeff <-> eval conversion factorizes into per-axis dense transforms of
    size at most phi(103) = 102: for each axis a, the square Vandermonde
    B_a[u, b] = zeta_a^{u*b} (u in U(m_a), b < phi(m_a)) and its inverse.
    Cost per prime: phi(m) * sum_a phi(m_a) mult-adds (~6M at production m)
    as small MATMULS — the MXU-native shape.  The same structure gives the
    slot encode/decode maps over GF(l^2) (per-axis limb-arithmetic
    transforms), replacing the round-1 dense phi x phi F_l matrix whose
    Gaussian-elimination precompute could never scale.
  - decryption avoids host-side per-coefficient CRT: an exact RNS -> F_l
    base conversion runs on device (float64 rounding of sum c_i/q_i gives
    the CRT integer k exactly because the phase is << q/2).

Replaces the role of MP-SPDZ's FHE param/ring machinery
(`/root/reference/mp-spdz-rs/src/fhe/params.rs:41-67`, FFI #35-39) at the
modulus-targeted production parameters.  See docs/security_params.md for
the (m, q, noise) security justification.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...algebra import limbs as lb
from ...algebra.fields import SCALAR_FIELD
from ...algebra.scalar import Scalar
from ...ops import modular32 as m32
from ...ops.modular32 import PrimeSpec, find_primes
from .cyclotomic import _gf2_mul, _gf2_pow, _gf2_root_of_order, _gf2_nr

U32 = jnp.uint32
L_MOD = SCALAR_FIELD.modulus


# ---------------------------------------------------------------------------
# host precompute helpers
# ---------------------------------------------------------------------------


def coprime_factors(m: int) -> list[int]:
    out, t, p = [], m, 2
    while p * p <= t:
        if t % p == 0:
            pk = 1
            while t % p == 0:
                t //= p
                pk *= p
            out.append(pk)
        p += 1
    if t > 1:
        out.append(t)
    return out


def _phi_pp(pk: int) -> int:
    """phi of a prime power."""
    p = next(d for d in range(2, pk + 1) if pk % d == 0)
    return pk - pk // p


def _units(pk: int) -> list[int]:
    return [u for u in range(1, pk) if math.gcd(u, pk) == 1]


def zk_word_counts(zk_sec: int, u_max: int, cbd_k: int) -> tuple[int, int]:
    """48-bit word counts for the ZKPoK response vectors: Wz covers the
    plaintext response bound 2^zk_sec * U * l/2, Wu the randomness/noise
    responses 2^zk_sec * U * max(1, k)."""
    log_u = max(u_max - 1, 1).bit_length()
    wz = -(-(zk_sec + 253 + log_u + 2) // 48)
    wu = -(-(zk_sec + log_u + cbd_k.bit_length() + 2) // 48)
    return wz, wu


def _inv_mat_mod_np(mat: np.ndarray, q: int) -> np.ndarray:
    """Vectorized modular Gaussian elimination (int64; q < 2^31)."""
    n = mat.shape[0]
    a = np.concatenate([mat.astype(np.int64) % q, np.eye(n, dtype=np.int64)],
                       axis=1)
    for col in range(n):
        piv = col + int(np.nonzero(a[col:, col] % q)[0][0])
        if piv != col:
            a[[col, piv]] = a[[piv, col]]
        inv = pow(int(a[col, col]), -1, q)
        a[col] = (a[col] * inv) % q
        f = a[:, col].copy()
        f[col] = 0
        a = (a - f[:, None] * a[col][None, :]) % q
    return a[:, n:].astype(np.uint32)


def _gf2_inv_mat(rows: list[list[tuple]], nr: int, p: int) -> list[list[tuple]]:
    """Gaussian elimination over GF(p^2) = F_p[i]/(i^2 - nr); entries are
    (re, im) int tuples.  Sizes <= 102, one-time per axis."""
    n = len(rows)

    def ginv(x):
        a, b = x
        d = (a * a - nr * b * b) % p
        di = pow(d, -1, p)
        return (a * di % p, (-b) * di % p)

    a = [row[:] + [(1, 0) if i == j else (0, 0) for j in range(n)]
         for i, row in enumerate(rows)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] != (0, 0))
        a[col], a[piv] = a[piv], a[col]
        iv = ginv(a[col][col])
        a[col] = [_gf2_mul(v, iv) for v in a[col]]
        for r in range(n):
            if r != col and a[r][col] != (0, 0):
                f = a[r][col]
                a[r] = [( (v[0] - fw[0]) % p, (v[1] - fw[1]) % p )
                        for v, fw in ((v, _gf2_mul(f, w))
                                      for v, w in zip(a[r], a[col]))]
    return [row[n:] for row in a]


# ---------------------------------------------------------------------------
# per-axis modular matvec (u32 residues, exact hi/lo accumulation)
# ---------------------------------------------------------------------------


def _axis_matvec_u32(spec: PrimeSpec, mat_mont, x, axis: int):
    """Apply an (out x in) modular matrix (Montgomery form) along `axis`
    of x (plain residues).  Same accumulation as `ops.pfa._axis_matvec`."""
    x = jnp.moveaxis(x, axis, -1)
    prod = m32.mont_mul32(spec, x[..., None, :],
                          jnp.broadcast_to(mat_mont,
                                           x.shape[:-1] + mat_mont.shape))
    lo = (prod & 0xFFFF).sum(axis=-1) % U32(spec.q)
    hi = (prod >> 16).sum(axis=-1) % U32(spec.q)
    hi_mont = m32.mont_mul32(spec, hi, jnp.full_like(hi, U32(spec.r2)))
    hi_r = m32.mont_mul32(spec, hi_mont, jnp.full_like(hi, U32(1 << 16)))
    out = m32.add32(spec, hi_r, lo)
    return jnp.moveaxis(out, -1, axis)


# ---------------------------------------------------------------------------
# GF(l^2) per-axis transform over limb arrays
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(4,))
def _gf2_axis_apply(mat_re, mat_im, x_re, x_im, axis: int):
    """Apply an (out x in) GF(l^2) matrix along `axis` of an F_l^2 limb
    batch.  mat_*: (16, out, in) Montgomery limbs; x_*: (16, ..., in_axis..).
    Loops over input columns with lax.fori_loop (in <= 102 steps), each step
    a fused batched limb multiply-accumulate."""
    nr_int = _gf2_nr()
    xr = Scalar(jnp.moveaxis(x_re, 1 + axis, -1))
    xi = Scalar(jnp.moveaxis(x_im, 1 + axis, -1))
    n_in = mat_re.shape[2]
    n_out = mat_re.shape[1]
    out_shape = xr.limbs.shape[:-1] + (n_out,)
    nr = Scalar.from_ints(nr_int)

    def body(k, acc):
        ar, ai = Scalar(acc[0]), Scalar(acc[1])
        cr = Scalar(jax.lax.dynamic_index_in_dim(mat_re, k, axis=2,
                                                 keepdims=False))
        ci = Scalar(jax.lax.dynamic_index_in_dim(mat_im, k, axis=2,
                                                 keepdims=False))
        vr = Scalar(jax.lax.dynamic_index_in_dim(xr.limbs, k, axis=-1,
                                                 keepdims=True))
        vi = Scalar(jax.lax.dynamic_index_in_dim(xi.limbs, k, axis=-1,
                                                 keepdims=True))
        # (vr + vi*i) * (cr + ci*i) accumulated
        ar = ar + vr * cr + nr * (vi * ci)
        ai = ai + vr * ci + vi * cr
        return (ar.limbs, ai.limbs)

    acc0 = (jnp.zeros(out_shape, U32), jnp.zeros(out_shape, U32))
    rr, ri = jax.lax.fori_loop(0, n_in, body, acc0)
    return (jnp.moveaxis(rr, -1, 1 + axis), jnp.moveaxis(ri, -1, 1 + axis))


@partial(jax.jit, static_argnums=(0, 2))
def _lift_words_eval(ring, h, w_count: int):
    """Full word lift INCLUDING the coeff->eval transform in one program:
    an eager `to_eval` is L x n_axes (~145) separate dispatches — through
    the tunneled TPU that alone cost minutes per ZK proof."""
    return ring.to_eval(_lift_words_dev.__wrapped__(ring, h, w_count))


@partial(jax.jit, static_argnums=(0, 2))
def _lift_words_dev(ring, h, w_count: int):
    """Biased 24-bit thirds (3, ..., phi, W) u32 -> per-prime COEFFICIENT
    residues (..., L, phi): value = sum_w (h0 + h1 2^24 + h2 2^48 - 2^55)
    * 2^(48 w) mod q_i, all in u32 Montgomery ops."""
    out = []
    for i, spec in enumerate(ring.q_specs):
        q = spec.q
        c24 = U32((1 << 24) * spec.r % q)        # Montgomery-form 2^24
        c48 = U32(pow(2, 48, q) * spec.r % q)
        bias = U32(pow(2, 55, q))
        acc = None
        for wdx in range(w_count):
            h0 = h[0, ..., wdx] % U32(q)
            h1 = h[1, ..., wdx]
            h2 = h[2, ..., wdx]
            t = m32.add32(spec, h0,
                          m32.mont_mul32(spec, h1, jnp.full_like(h1, c24)))
            t = m32.add32(spec, t,
                          m32.mont_mul32(spec, h2, jnp.full_like(h2, c48)))
            t = m32.sub32(spec, t, jnp.full_like(t, bias))
            wmont = U32(ring.word_weights_q[i][wdx] * spec.r % q)
            t = m32.mont_mul32(spec, t, jnp.full_like(t, wmont))
            acc = t if acc is None else m32.add32(spec, acc, t)
        out.append(acc)
    return jnp.stack(out, axis=-2)


# ---------------------------------------------------------------------------
# the ring
# ---------------------------------------------------------------------------


class PowerfulRing:
    """General-m cyclotomic ring, eval-form resident, powerful-basis
    coefficients.  Interface-compatible with `CyclotomicRing` for `bgv_l`.

    Element representation (the DOUBLE-CRT / eval form): uint32 array of
    shape (..., L, phi) — residues mod each RNS prime of the evaluations at
    the phi primitive m-th roots (C-order over the per-axis unit tuples).
    This is the canonical wire format: an R-element's primitive evaluations
    are unique, so no non-primitive components can leak.
    """

    # all ops are device-traceable -> bgv_l's `_ring_jit` wrappers compile
    # them as single programs (one dispatch instead of hundreds)
    supports_jit = True

    def __init__(self, m: int, n_q_primes: int | None = None,
                 q_bits: int = 30, cbd_k: int = 10, drown_sec: int = 128,
                 zk_sec: int = 128, u_max: int = 128):
        self.m = m
        self.zk_sec = zk_sec
        self.u_max = u_max
        self.factors = coprime_factors(m)
        self.axis_phis = [_phi_pp(f) for f in self.factors]
        self.phi = math.prod(self.axis_phis)
        self.cbd_k = cbd_k
        self.drown_sec = drown_sec
        self.t = L_MOD

        r = L_MOD % m
        if r == 1:
            self.d = 1
        elif (r * r) % m == 1:
            self.d = 2
        else:
            raise ValueError(f"ord_{m}(l) > 2 unsupported")
        self.slots = self.phi // self.d

        self.units = [_units(f) for f in self.factors]

        # --- noise budget (docs/security_params.md); independent of q -------
        # Drowning must hide the ADVERSARIAL noise admitted by the ZK proof
        # (word-rounded bounds B_z, B_u, B_e from `zk_word_counts`):
        #   pre-drown phase/t <= max(B_z/t, gamma*(B_u*k + B_e))
        #                        * gamma * (l/2) * 4,   gamma <= m.
        wz, wu = zk_word_counts(zk_sec, u_max, cbd_k)
        self.zk_wz, self.zk_wu = wz, wu
        log_gamma = (m - 1).bit_length()
        log_bu = 48 * wu - 1
        pre_over_t = max(48 * wz - 1 - 253,
                         log_gamma + log_bu + cbd_k.bit_length() + 1) \
            + log_gamma + 252 + 2
        self.drown_bits = drown_sec + pre_over_t + 8
        # decrypt correctness: q must exceed the drowned phase with >= 18
        # bits of margin (float32 CRT rounding uses 2^-16 of it)
        log2_q_needed = 253 + self.drown_bits + 18
        if n_q_primes is None:
            n_q_primes = -(-log2_q_needed // (q_bits - 1)) + 1

        self.q_primes = find_primes(n_q_primes, order=m, bits=q_bits)
        while sum(p.bit_length() for p in self.q_primes[:-1]) \
                >= log2_q_needed:
            self.q_primes = self.q_primes[:-1]
        self.q_specs = tuple(PrimeSpec(q) for q in self.q_primes)
        q = 1
        for p in self.q_primes:
            q *= p
        self.q = q
        self.q_hat = [q // p for p in self.q_primes]
        self.q_hat_inv = [pow(q // p, -1, p) for p in self.q_primes]

        # --- per-prime per-axis eval/coeff matrices -----------------------
        # B_a[u, b] = w_a^{units[u] * b}; w_a = root of order m_a derived
        # from one order-m root so the tuple indexing enumerates each
        # primitive m-th root exactly once.
        self.fwd_mats = []   # [prime][axis] (phi_a, phi_a) mont u32
        self.inv_mats = []
        for spec in self.q_specs:
            qq = spec.q
            w = m32.primitive_root_of_unity(qq, m)
            fwd_p, inv_p = [], []
            for a, f in enumerate(self.factors):
                wa = pow(w, m // f, qq)  # order m_a... see note below
                # note: need ORDER-f root; w^(m/f) has order f exactly.
                rows = np.array(
                    [[pow(wa, (u * b) % f, qq) for b in range(self.axis_phis[a])]
                     for u in self.units[a]], dtype=np.int64)
                inv = _inv_mat_mod_np(rows, qq)
                fwd_p.append(jnp.asarray(
                    (rows * spec.r % qq).astype(np.uint32)))
                inv_p.append(jnp.asarray(
                    (inv.astype(np.int64) * spec.r % qq).astype(np.uint32)))
            self.fwd_mats.append(fwd_p)
            self.inv_mats.append(inv_p)

        # plaintext lift weights 2^(16j) mod q_i
        self.limb_weights = [
            jnp.asarray(np.array(
                [pow(2, 16 * j, spec.q) for j in range(lb.NLIMBS)],
                dtype=np.uint32))
            for spec in self.q_specs
        ]
        self.t_mod_q = [self.t % spec.q for spec in self.q_specs]
        self.neg_t_mod_q = [(-self.t) % spec.q for spec in self.q_specs]
        # word lift weights 2^(48w) mod q_i (ZKPoK word-plane lifts); 16
        # words cover any response width (wz = 9 at zk_sec = 128) with
        # headroom — 8 was an off-by-the-security-upgrade trap
        self.word_weights_q = [
            [pow(2, 48 * wdx, spec.q) for wdx in range(16)]
            for spec in self.q_specs
        ]

        # --- device CRT -> F_l decryption constants ------------------------
        # m mod l = sum_i c_i * (q_hat_i mod l) - k * (q mod l), where
        # c_i = a_i * q_hat_inv_i mod q_i and k = round(sum_i c_i / q_i).
        self.qhatinv_mont = [
            U32(self.q_hat_inv[i] * spec.r % spec.q)
            for i, spec in enumerate(self.q_specs)
        ]
        self.qhat_mod_l = Scalar.from_ints(
            [qh % L_MOD for qh in self.q_hat])          # (L,)
        self.q_mod_l = Scalar.from_ints(q % L_MOD)      # ()
        self.q_float_inv = np.array([1.0 / p for p in self.q_primes])

        self.log2_q = sum(p.bit_length() for p in self.q_primes)
        self.budget_ok = self.log2_q >= log2_q_needed

        # --- GF(l^2) slot transforms ---------------------------------------
        self._slot_maps_built = False

    # -- lazily built GF(l^2) machinery (hosts a few seconds of precompute)
    def _build_slot_maps(self):
        if self._slot_maps_built:
            return
        nr = _gf2_nr()
        # one order-m root of GF(l^2); per-axis roots of order m_a from it
        zeta = _gf2_root_of_order(self.m)
        self.gf_fwd = []   # [axis] (mat_re, mat_im) mont limbs (16, f, f)
        self.gf_inv = []
        for a, f in enumerate(self.factors):
            za = _gf2_pow(zeta, self.m // f)
            rows = [[_gf2_pow(za, (u * b) % f) for b in range(self.axis_phis[a])]
                    for u in self.units[a]]
            inv = _gf2_inv_mat(rows, nr, L_MOD)

            def pack(mat):
                re = Scalar.from_ints(np.array(
                    [[v[0] for v in row] for row in mat], dtype=object))
                im = Scalar.from_ints(np.array(
                    [[v[1] for v in row] for row in mat], dtype=object))
                return re.limbs, im.limbs

            self.gf_fwd.append(pack(rows))
            self.gf_inv.append(pack(inv))

        # Frobenius orbit structure on the eval index space
        lr = L_MOD
        per_axis_perm = []
        for a, f in enumerate(self.factors):
            uidx = {u: i for i, u in enumerate(self.units[a])}
            per_axis_perm.append(
                np.array([uidx[(u * lr) % f] for u in self.units[a]],
                         dtype=np.int64))
        grid = np.arange(self.phi).reshape(self.axis_phis)
        frob = grid
        for a, perm in enumerate(per_axis_perm):
            frob = np.take(frob, perm, axis=a)
        self.frob_perm = frob.reshape(-1)  # flat: index -> frobenius index
        if self.d == 2:
            reps = np.nonzero(np.arange(self.phi)
                              <= self.frob_perm)[0]
            assert reps.size == self.slots
            # numpy, NOT jnp: this builder may first run under a jit trace
            # (via the lazily-calling encode/decode paths), and a
            # jnp.asarray created there would be stored as a leaked tracer
            self.slot_reps = np.asarray(reps)
            self.slot_partner = np.asarray(self.frob_perm[reps])
        else:
            self.slot_reps = np.arange(self.phi)
            self.slot_partner = self.slot_reps
        self._slot_maps_built = True

    def prepare_for_trace(self):
        """Materialize all lazily-built host state BEFORE entering a jit
        trace (called by bgv_l's `_ring_jit` wrappers): constants built
        during a trace would leak as tracers into the ring object."""
        self._build_slot_maps()
        self._phase_convert_fn()

    def __hash__(self):
        return hash((self.m, self.q_primes[0], len(self.q_primes)))

    def __eq__(self, other):
        return (isinstance(other, PowerfulRing) and other.m == self.m
                and other.q_primes == self.q_primes)

    # -- coeff <-> eval (per prime) -----------------------------------------
    def _apply_axes(self, spec, mats, vec):
        """vec: (..., phi) residues for ONE prime; apply per-axis mats."""
        batch = vec.shape[:-1]
        x = vec.reshape(batch + tuple(self.axis_phis))
        for a, mat in enumerate(mats):
            x = _axis_matvec_u32(spec, mat, x, len(batch) + a)
        return x.reshape(batch + (self.phi,))

    def to_eval(self, coeffs_rns):
        """Powerful-basis residues (..., L, phi) -> eval form."""
        out = []
        for i, spec in enumerate(self.q_specs):
            out.append(self._apply_axes(spec, self.fwd_mats[i],
                                        coeffs_rns[..., i, :]))
        return jnp.stack(out, axis=-2)

    def from_eval(self, ev):
        out = []
        for i, spec in enumerate(self.q_specs):
            out.append(self._apply_axes(spec, self.inv_mats[i],
                                        ev[..., i, :]))
        return jnp.stack(out, axis=-2)

    # -- ring ops (eval-form, pointwise) -------------------------------------
    def zero(self, batch: tuple = ()):
        return jnp.zeros(batch + (len(self.q_primes), self.phi), U32)

    def add(self, a, b):
        return jnp.stack(
            [m32.add32(s, a[..., i, :], b[..., i, :])
             for i, s in enumerate(self.q_specs)], axis=-2)

    def sub(self, a, b):
        return jnp.stack(
            [m32.sub32(s, a[..., i, :], b[..., i, :])
             for i, s in enumerate(self.q_specs)], axis=-2)

    def mul(self, a, b):
        """Pointwise eval-form product: 2 Montgomery muls per prime."""
        out = []
        for i, spec in enumerate(self.q_specs):
            p = m32.mont_mul32(spec, a[..., i, :], b[..., i, :])
            out.append(m32.mont_mul32(spec, p,
                                      jnp.full_like(p, U32(spec.r2))))
        return jnp.stack(out, axis=-2)

    def scalar_mul_t(self, a):
        out = []
        for i, spec in enumerate(self.q_specs):
            c = (self.t_mod_q[i] * spec.r) % spec.q
            out.append(m32.mont_mul32(spec, a[..., i, :],
                                      jnp.full_like(a[..., i, :], U32(c))))
        return jnp.stack(out, axis=-2)

    # -- lifts (all produce EVAL form) ---------------------------------------
    def lift_residues(self, coeffs_rns):
        """Per-prime COEFFICIENT residues (..., L, phi) -> canonical
        (eval) representation."""
        return self.to_eval(coeffs_rns)

    def lift_signed(self, coeffs):
        """Small signed int32 powerful-basis coefficients (..., phi) ->
        eval-form residues."""
        coeffs = jnp.asarray(coeffs, jnp.int32)
        out = []
        for spec in self.q_specs:
            rr = jnp.where(coeffs < 0, coeffs + jnp.int32(spec.q), coeffs)
            out.append(rr.astype(U32) % U32(spec.q))
        return self.to_eval(jnp.stack(out, axis=-2))

    def lift_plaintext_limbs(self, limbs):
        """Canonical limb plaintext coefficients (16, ..., phi) -> eval
        form, CENTERED mod l (same centering as `CyclotomicRing`)."""
        half_plus = lb.int_to_limbs(L_MOD // 2 + 1)
        rows = [limbs[i] for i in range(lb.NLIMBS)]
        halves = [U32(v) for v in half_plus]
        _, borrow = lb._sub_with_borrow(
            rows, [jnp.broadcast_to(h, rows[0].shape) for h in halves])
        is_high = (borrow == 0)

        out = []
        for i, spec in enumerate(self.q_specs):
            prod = m32.mont_mul32(
                spec,
                jnp.broadcast_to(
                    m32.to_mont32(spec, self.limb_weights[i]),
                    limbs.shape[1:] + (lb.NLIMBS,)),
                jnp.moveaxis(limbs, 0, -1),
            )
            lo = (prod & 0xFFFF).sum(axis=-1) % U32(spec.q)
            hi = (prod >> 16).sum(axis=-1) % U32(spec.q)
            hi_r = m32.mont_mul32(spec, m32.to_mont32(spec, hi),
                                  jnp.full_like(hi, U32(1 << 16)))
            v_mod = m32.add32(spec, hi_r, lo)
            v_neg = m32.add32(spec, v_mod,
                              jnp.full_like(v_mod, U32(self.neg_t_mod_q[i])))
            out.append(jnp.where(is_high, v_neg, v_mod))
        return self.to_eval(jnp.stack(out, axis=-2))

    def lift_words(self, words):
        """Signed 48-bit word planes (..., phi, W) int64 -> eval form
        (the ZKPoK response lift; exact).

        DEVICE path: digits are |d| < 2^55 (zkpok_words' lazy bound), so
        each is biased by 2^55 on host (3 cheap vectorized passes to
        24-bit thirds) and the per-prime weighted reduction runs as u32
        Montgomery arithmetic on device — the numpy modular loop was
        ~O(L * W) full passes over the response array per proof chunk
        (seconds per chunk at the production ring)."""
        words = np.asarray(words)
        w_count = words.shape[-1]
        biased = (words + (1 << 55)).astype(np.uint64)  # < 2^56
        m24 = np.uint64((1 << 24) - 1)
        h = np.stack([
            (biased & m24).astype(np.uint32),
            ((biased >> np.uint64(24)) & m24).astype(np.uint32),
            (biased >> np.uint64(48)).astype(np.uint32),
        ])  # (3, ..., phi, W)
        return _lift_words_eval(self, jnp.asarray(h), w_count)

    def lift_object(self, arr):
        """(..., phi) object ints (any magnitude) -> eval form."""
        out = []
        for spec in self.q_specs:
            out.append(np.asarray(np.mod(arr, spec.q), dtype=np.uint32))
        return self.to_eval(jnp.asarray(np.stack(out, axis=-2)))

    # -- decryption back-ends -------------------------------------------------
    def to_centered_ints(self, poly) -> list[list[int]]:
        """Eval form (L, phi) -> centered powerful-basis integer coeffs
        (host CRT; diagnostic / small rings)."""
        coeffs = self.from_eval(poly)
        arr = np.asarray(jax.device_get(coeffs))
        assert arr.ndim == 2
        out = []
        for j in range(self.phi):
            v = 0
            for i, p in enumerate(self.q_primes):
                v += self.q_hat[i] * (self.q_hat_inv[i] * int(arr[i, j]) % p)
            v %= self.q
            if v > self.q // 2:
                v -= self.q
            out.append(v)
        return out

    def phase_to_pt(self, phase) -> Scalar:
        """Eval-form phase (..., L, phi) -> plaintext powerful-basis
        coefficients mod l, fully on device (exact RNS base conversion;
        see class docstring).  Leading batch dims supported — the stacked
        offline pipeline decrypts whole slot-batch stacks in one dispatch."""
        coeffs = self.from_eval(phase)  # (..., L, phi) plain residues
        return Scalar(self._phase_convert_fn()(coeffs))

    def _phase_convert_fn(self):
        """Cached jitted RNS -> F_l converter.  The F_l accumulation runs as
        a `lax.scan` over the RNS primes: unrolling L=26 chained 16-limb
        multiplies sends XLA:CPU compile time superlinear (>10 min at L=26
        vs 20 s at L=20, measured), while the scan body compiles once."""
        fn = getattr(self, "_phase_fn", None)
        if fn is not None:
            return fn
        specs = self.q_specs
        qinv = self.qhatinv_mont
        qfl = np.asarray(self.q_float_inv, np.float32)
        qhat_limbs = self.qhat_mod_l.limbs      # (16, L) Montgomery limbs
        q_mod_l = self.q_mod_l

        def u32_to_scalar_limbs(x):
            z = jnp.zeros((lb.NLIMBS,) + x.shape, U32)
            z = z.at[0].set(x & 0xFFFF)
            z = z.at[1].set(x >> 16)
            return lb.to_mont(SCALAR_FIELD, z)

        @jax.jit
        def convert(coeffs):
            """(..., L, phi) plain residues -> (16, ..., phi) F_l limbs."""
            cs = [m32.mont_mul32(spec, coeffs[..., i, :],
                                 jnp.full_like(coeffs[..., i, :], qinv[i]))
                  for i, spec in enumerate(specs)]
            # float32 suffices for exact k: relative error ~ L * 2^-24 while
            # the fractional part sits within 2^-16 of an integer (parameter
            # selection guarantees noise < q * (1/2 - 2^-16); see
            # docs/security_params.md).
            c = jnp.stack(cs)                   # (L, ..., phi) c_i < q_i
            qfl_b = qfl.reshape((len(specs),) + (1,) * (c.ndim - 1))
            frac = (c.astype(jnp.float32) * qfl_b).sum(0)
            k = jnp.round(frac).astype(jnp.uint32)  # CRT integer, exact
            # sum_i c_i * (q_hat_i mod l) - k * (q mod l)  over F_l
            c_limbs = u32_to_scalar_limbs(c)    # (16, L, ..., phi)

            def body(acc, xs):
                ci, qi = xs                     # (16, ..., phi), (16,)
                qb = jnp.broadcast_to(
                    qi.reshape((lb.NLIMBS,) + (1,) * (ci.ndim - 1)),
                    ci.shape)
                return (Scalar(acc) + Scalar(ci) * Scalar(qb)).limbs, None

            acc0 = jnp.zeros((lb.NLIMBS,) + c.shape[1:], U32)
            xs = (jnp.moveaxis(c_limbs, 1, 0),
                  jnp.moveaxis(qhat_limbs, 1, 0))
            acc, _ = jax.lax.scan(body, acc0, xs)
            kk = Scalar(u32_to_scalar_limbs(k))
            return (Scalar(acc) - kk * q_mod_l).limbs

        self._phase_fn = convert
        return convert

    # -- slot maps over F_l ----------------------------------------------------
    def encode_slots(self, slots: Scalar) -> Scalar:
        """F_l slot values (..., slots) -> powerful-basis plaintext
        coefficients (..., phi) via per-axis inverse GF(l^2) transforms.
        Frobenius-consistent filling makes the coefficients land in F_l."""
        self._build_slot_maps()
        flat = slots.limbs  # (16, ..., S)
        ev_re = jnp.zeros(flat.shape[:-1] + (self.phi,), U32)
        ev_re = ev_re.at[..., self.slot_reps].set(flat)
        if self.d == 2:
            ev_re = ev_re.at[..., self.slot_partner].set(flat)
        ev_im = jnp.zeros_like(ev_re)
        re, im = ev_re, ev_im
        for a in range(len(self.factors)):
            shaped_re = re.reshape(re.shape[:1] + re.shape[1:-1]
                                   + tuple(self.axis_phis))
            shaped_im = im.reshape(shaped_re.shape)
            mr, mi = self.gf_inv[a]
            rr, ri = _gf2_axis_apply(mr, mi, shaped_re, shaped_im,
                                     len(re.shape[1:-1]) + a)
            re = rr.reshape(re.shape)
            im = ri.reshape(im.shape)
        return Scalar(re)  # imaginary part is 0 for F_l slot inputs

    def decode_slots(self, coeffs: Scalar) -> Scalar:
        """Powerful-basis plaintext coefficients -> F_l slot values."""
        self._build_slot_maps()
        re = coeffs.limbs
        im = jnp.zeros_like(re)
        for a in range(len(self.factors)):
            shaped_re = re.reshape(re.shape[:1] + re.shape[1:-1]
                                   + tuple(self.axis_phis))
            shaped_im = im.reshape(shaped_re.shape)
            mr, mi = self.gf_fwd[a]
            rr, ri = _gf2_axis_apply(mr, mi, shaped_re, shaped_im,
                                     len(re.shape[1:-1]) + a)
            re = rr.reshape(re.shape)
            im = ri.reshape(im.shape)
        return Scalar(re[..., np.asarray(self.slot_reps)])
