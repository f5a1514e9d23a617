"""BGV over non-power-of-2 cyclotomic rings — the Curve25519-order backend.

The MPC share field is l = 2^252 + ... with 2-adicity 2, so the power-of-2
negacyclic instantiation (`bgv.py`) cannot pack F_l slots.  Per
docs/bgv_design.md, slots need a cyclotomic index m with small ord_m(l);
this module implements the general-m machinery:

  - ring R_q = Z_q[X]/Phi_m(X) per RNS prime (q = 1 mod m), elements as
    coefficient arrays (L, phi(m)) uint32;
  - multiplication by length-m DFT (matmul against precomputed root
    Vandermonde matrices — the TPU-friendly transform for smooth m),
    pointwise product, inverse DFT, and a precomputed linear reduction
    X^j -> X^j mod Phi_m;
  - plaintext modulus l (253-bit): plaintext coefficients are limb-form
    field elements; lifting into RNS and slot encode/decode run through the
    limb engine (`algebra/limbs.py`) and per-prime matvecs;
  - slot packing for ord_m(l) = 1: slots = the phi(m) evaluations at
    primitive m-th roots of unity IN F_l (the d = 2 / GF(l^2) case of the
    design doc generalizes the same maps and is future work).

Instantiated prototype: m = 132 (132 | l - 1, phi = 40, 40 F_l slots).
Ring dimension 40 is a CORRECTNESS prototype — RLWE security requires the
large-m parameter sets (m = 118965 -> phi = 48960); everything here is
parameterized by m so that swap is a configuration + kernel-scaling change.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...algebra import limbs as lb
from ...algebra.fields import SCALAR_FIELD
from ...ops import modular32 as m32
from ...ops.modular32 import PrimeSpec, find_primes

U32 = jnp.uint32
L_MOD = SCALAR_FIELD.modulus


def _phi(m: int) -> int:
    out, t, d = m, m, 2
    while d * d <= t:
        if t % d == 0:
            out -= out // d
            while t % d == 0:
                t //= d
        d += 1
    if t > 1:
        out -= out // t
    return out


def _cyclotomic_poly(m: int) -> list[int]:
    """Integer coefficients of Phi_m(X) via repeated division of X^m - 1."""
    # start with X^m - 1, divide by Phi_d for all proper divisors d | m
    def poly_div(num, den):
        num = num[:]
        out = [0] * (len(num) - len(den) + 1)
        for i in range(len(out) - 1, -1, -1):
            coef = num[i + len(den) - 1] // den[-1]
            out[i] = coef
            for j, dv in enumerate(den):
                num[i + j] -= coef * dv
        assert all(v == 0 for v in num[: len(den) - 1] + num[len(den):][len(out):]), "nonzero rem"
        return out

    cache: dict[int, list[int]] = {1: [-1, 1]}

    def phi_poly(k: int) -> list[int]:
        if k in cache:
            return cache[k]
        num = [0] * (k + 1)
        num[0], num[k] = -1, 1
        res = num
        for d in range(1, k):
            if k % d == 0:
                res = poly_div(res, phi_poly(d))
        cache[k] = res
        return res

    return phi_poly(m)


class CyclotomicRing:
    """Precomputed transforms for Z_q[X]/Phi_m(X) over an RNS basis."""

    def __init__(self, m: int, n_q_primes: int = 20, q_bits: int = 30,
                 cbd_k: int = 10, drown_sec: int = 40):
        self.m = m
        self.phi = _phi(m)
        # slot structure: d = ord_m(l) determines the slot field GF(l^d);
        # F_l values embed in the subfield so component-wise products stay
        # in F_l.  d in {1, 2} implemented (the production m = 118965 has
        # d = 2).
        r = L_MOD % m
        if r == 1:
            self.d = 1
        elif (r * r) % m == 1:
            self.d = 2
        else:
            raise ValueError(f"ord_{m}(l) > 2 unsupported (got neither 1 nor 2)")
        self.cbd_k = cbd_k
        self.drown_sec = drown_sec
        self.t = L_MOD

        self.q_primes = find_primes(n_q_primes, order=m, bits=q_bits)
        self.q_specs = tuple(PrimeSpec(q) for q in self.q_primes)
        q = 1
        for p in self.q_primes:
            q *= p
        self.q = q
        self.q_hat = [q // p for p in self.q_primes]
        self.q_hat_inv = [pow(q // p, -1, p) for p in self.q_primes]

        phi_poly = _cyclotomic_poly(m)
        assert len(phi_poly) == self.phi + 1

        # --- per-prime DFT / inverse-DFT / reduction matrices -------------
        self.dft = []        # (m, phi): evaluate coeff vector at all m roots
        self.idft = []       # (m, m): values -> coefficients mod X^m - 1
        self.red = []        # (phi, m): X^j mod Phi_m reduction map
        for spec in self.q_specs:
            qq = spec.q
            w = m32.primitive_root_of_unity(qq, m)
            dft = np.zeros((m, self.phi), dtype=np.uint32)
            for i in range(m):
                wi = pow(w, i, qq)
                v = 1
                for k in range(self.phi):
                    dft[i, k] = v
                    v = v * wi % qq
            m_inv = pow(m, -1, qq)
            w_inv = pow(w, -1, qq)
            idft = np.zeros((m, m), dtype=np.uint32)
            for i in range(m):
                vi = pow(w_inv, i, qq)
                v = m_inv % qq
                for k in range(m):
                    idft[i, k] = v
                    v = v * vi % qq
            # reduction: X^j mod Phi_m as a (phi,) column for each j < m
            red = np.zeros((self.phi, m), dtype=np.uint32)
            cur = [0] * self.phi
            cur[0] = 1
            for j in range(m):
                for k in range(self.phi):
                    red[k, j] = cur[k] % qq
                # multiply cur by X mod Phi_m
                top = cur[-1]
                cur = [0] + cur[:-1]
                if top:
                    for k in range(self.phi):
                        cur[k] = (cur[k] - top * phi_poly[k]) % qq
            self.dft.append(jnp.asarray(dft))
            self.idft.append(jnp.asarray(idft))
            self.red.append(jnp.asarray(red))

        # plaintext lift weights: 2^(16*j) mod q_i for limb -> residue
        self.limb_weights = [
            jnp.asarray(np.array(
                [pow(2, 16 * j, spec.q) for j in range(lb.NLIMBS)],
                dtype=np.uint32))
            for spec in self.q_specs
        ]
        self.t_mod_q = [self.t % spec.q for spec in self.q_specs]
        # centered-lift threshold handled via (v - l) residues
        self.neg_t_mod_q = [(-self.t) % spec.q for spec in self.q_specs]

        # --- slot maps over F_l --------------------------------------------
        # d=1: slots = evaluations at the phi primitive m-th roots in F_l.
        # d=2: roots live in GF(l^2); conjugate pairs {z^j, z^(j*l)} form one
        #      slot each; an F_l-coefficient polynomial automatically takes
        #      Frobenius-consistent values, so prescribing P(z^j) = x_j in
        #      F_l for one orbit representative per pair is phi/2 GF(l^2)
        #      constraints = phi F_l constraints -> unique P of deg < phi.
        from ...algebra.scalar import Scalar

        if self.d == 1:
            w_l = _find_root_of_order(L_MOD, m)
            prim = [j for j in range(m) if math.gcd(j, m) == 1]
            assert len(prim) == self.phi
            self.prim_idx = prim
            eval_rows = [[pow(w_l, j * k, L_MOD) for k in range(self.phi)]
                         for j in prim]
            inv_rows = _invert_matrix_mod(eval_rows, L_MOD)
            self.slots = self.phi
            self.encode_mat = Scalar.from_ints(np.array(inv_rows, dtype=object))
            self.decode_mat = Scalar.from_ints(np.array(eval_rows, dtype=object))
        else:
            zeta = _gf2_root_of_order(m)
            prim = [j for j in range(m) if math.gcd(j, m) == 1]
            # orbit representatives under j -> j*l mod m
            reps, seen = [], set()
            for j in prim:
                if j in seen:
                    continue
                reps.append(j)
                seen.add(j)
                seen.add(j * (L_MOD % m) % m)
            assert len(reps) == self.phi // 2
            self.prim_idx = reps
            self.slots = self.phi // 2
            # M p = (x ; 0): rows = re/im parts of z^(j*k)
            re_rows, im_rows = [], []
            for j in reps:
                zj = _gf2_pow(zeta, j)
                re, im = [], []
                cur = (1, 0)
                for _ in range(self.phi):
                    re.append(cur[0])
                    im.append(cur[1])
                    cur = _gf2_mul(cur, zj)
                re_rows.append(re)
                im_rows.append(im)
            m_rows = re_rows + im_rows
            m_inv = _invert_matrix_mod(m_rows, L_MOD)
            # encode: coeffs = M^{-1} [x; 0]  -> (phi x slots) left block
            enc = [[m_inv[i][j] for j in range(self.slots)]
                   for i in range(self.phi)]
            self.encode_mat = Scalar.from_ints(np.array(enc, dtype=object))
            self.decode_mat = Scalar.from_ints(np.array(re_rows, dtype=object))

    def __hash__(self):
        return hash((self.m, self.q_primes[0], len(self.q_primes)))

    def __eq__(self, other):
        return (isinstance(other, CyclotomicRing) and other.m == self.m
                and other.q_primes == self.q_primes)

    # -- per-prime modular matvec (hi/lo accumulation; exact) --------------
    def _matvec(self, spec: PrimeSpec, mat, vec):
        """(R, C) x (..., C) -> (..., R) mod q."""
        prod = m32.mont_mul32(
            spec,
            jnp.broadcast_to(m32.to_mont32(spec, mat),
                             vec.shape[:-1] + mat.shape),
            vec[..., None, :],
        )  # (..., R, C), each < q < 2^31
        lo = (prod & 0xFFFF).sum(axis=-1)    # < C * 2^16
        hi = (prod >> 16).sum(axis=-1)       # < C * 2^15
        lo_r = lo % U32(spec.q)
        hi_r = m32.mont_mul32(
            spec,
            m32.to_mont32(spec, hi % U32(spec.q)),
            jnp.full_like(hi, U32(1 << 16)),
        )
        return m32.add32(spec, hi_r, lo_r)

    # -- ring operations ---------------------------------------------------
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
        """Polynomial product mod Phi_m: DFT -> pointwise -> IDFT -> reduce."""
        out = []
        for i, spec in enumerate(self.q_specs):
            fa = self._matvec(spec, self.dft[i], a[..., i, :])
            fb = self._matvec(spec, self.dft[i], b[..., i, :])
            prod = m32.mont_mul32(spec, m32.to_mont32(spec, fa), fb)
            full = self._matvec(spec, self.idft[i], prod)  # mod X^m - 1
            out.append(self._matvec(spec, self.red[i], full))
        return jnp.stack(out, axis=-2)

    def scalar_mul_t(self, a):
        """Multiply by the plaintext modulus l (per-prime constant)."""
        out = []
        for i, spec in enumerate(self.q_specs):
            c = (self.t_mod_q[i] * spec.r) % spec.q
            out.append(m32.mont_mul32(spec, a[..., i, :],
                                      jnp.full_like(a[..., i, :], U32(c))))
        return jnp.stack(out, axis=-2)

    # -- lifting -----------------------------------------------------------
    def lift_residues(self, coeffs_rns):
        """Per-prime coefficient residues are this ring's canonical rep."""
        return coeffs_rns

    def lift_signed(self, coeffs):
        """Small signed int32 coefficients (..., phi) -> RNS residues."""
        coeffs = jnp.asarray(coeffs, jnp.int32)
        out = []
        for spec in self.q_specs:
            r = jnp.where(coeffs < 0, coeffs + jnp.int32(spec.q), coeffs)
            out.append(r.astype(U32) % U32(spec.q))
        return jnp.stack(out, axis=-2)

    def lift_plaintext_limbs(self, limbs):
        """Plaintext coefficients as canonical limb arrays (16, ..., phi)
        -> RNS residues (..., L, phi), CENTERED mod l (values > l/2 lift as
        value - l)."""
        # is the value > l/2 ?  compare via canonical ints on device: use
        # the top limbs — exact test: v > l//2  <=>  (v - (l//2 + 1)) has no
        # borrow.  Compute borrow via the limb engine.
        half_plus = lb.int_to_limbs(L_MOD // 2 + 1)
        rows = [limbs[i] for i in range(lb.NLIMBS)]
        halves = [U32(v) for v in half_plus]
        _, borrow = lb._sub_with_borrow(rows, [jnp.broadcast_to(h, rows[0].shape) for h in halves])
        is_high = (borrow == 0)  # v >= l/2 + 1  => centered negative

        out = []
        for i, spec in enumerate(self.q_specs):
            # v mod q via limb weights
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
        return jnp.stack(out, axis=-2)

    # -- double-CRT (evaluation-form) pathway ------------------------------
    # HElib-style representation: a ring element is stored as its values at
    # the phi(m) primitive m-th roots, per RNS prime.  + and x are POINTWISE
    # (no reduction mod Phi_m ever needed) — the architecture that scales to
    # the production m, where the dense phi x m reduction matrix is
    # infeasible.  Conversions (coeff <-> eval) at prototype scale use dense
    # per-prime matrices; at production scale they become PFA transforms
    # restricted to primitive indices (ops/pfa.py).

    def _ensure_eval_mats(self):
        if hasattr(self, "eval_mats"):
            return
        self.eval_mats, self.eval_mats_inv = [], []
        for spec in self.q_specs:
            qq = spec.q
            w = m32.primitive_root_of_unity(qq, self.m)
            prim = [j for j in range(self.m) if math.gcd(j, self.m) == 1]
            rows = [[pow(w, (j * k) % self.m, qq) for k in range(self.phi)]
                    for j in prim]
            inv = _invert_matrix_mod(rows, qq)
            self.eval_mats.append(jnp.asarray(
                np.array(rows, dtype=np.uint32)))
            self.eval_mats_inv.append(jnp.asarray(
                np.array(inv, dtype=np.uint32)))

    def to_eval(self, a):
        """Coefficient form (..., L, phi) -> evaluation form (..., L, phi)."""
        self._ensure_eval_mats()
        out = []
        for i, spec in enumerate(self.q_specs):
            out.append(self._matvec(spec, self.eval_mats[i], a[..., i, :]))
        return jnp.stack(out, axis=-2)

    def from_eval(self, v):
        self._ensure_eval_mats()
        out = []
        for i, spec in enumerate(self.q_specs):
            out.append(self._matvec(spec, self.eval_mats_inv[i],
                                    v[..., i, :]))
        return jnp.stack(out, axis=-2)

    def mul_eval(self, u, v):
        """Pointwise product in evaluation form (the DCRT hot path)."""
        out = []
        for i, spec in enumerate(self.q_specs):
            p = m32.mont_mul32(spec, u[..., i, :], v[..., i, :])
            out.append(m32.mont_mul32(
                spec, p, jnp.full_like(p, jnp.uint32(spec.r2))))
        return jnp.stack(out, axis=-2)

    def lift_words(self, words) -> jnp.ndarray:
        """Signed 48-bit word planes (..., phi, W) int64 -> residues
        (..., L, phi) — the ZKPoK word-form lift (exact, vectorized)."""
        words = np.asarray(words)
        res = []
        for spec in self.q_specs:
            acc = np.zeros(words.shape[:-1], dtype=np.int64)
            for wdx in range(words.shape[-1]):
                acc = (acc + (words[..., wdx] % spec.q)
                       * pow(2, 48 * wdx, spec.q)) % spec.q
            res.append(acc.astype(np.uint32))
        return jnp.asarray(np.stack(res, axis=-2))

    def lift_object(self, arr) -> jnp.ndarray:
        """(..., phi) numpy object-int coefficients (any magnitude) ->
        (..., L, phi) residues (ZKPoK responses)."""
        out = []
        for spec in self.q_specs:
            out.append(np.asarray(np.mod(arr, spec.q), dtype=np.uint32))
        return jnp.asarray(np.stack(out, axis=-2))

    # -- host-side CRT (decryption) ----------------------------------------
    def to_centered_ints(self, poly) -> list[list[int]]:
        arr = np.asarray(jax.device_get(poly))
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


# --- GF(l^2) host arithmetic (slot-map precompute for d = 2) ---------------

_GF2_NR = None  # quadratic non-residue mod l (lazy)


def _gf2_nr() -> int:
    global _GF2_NR
    if _GF2_NR is None:
        nr = 2
        while pow(nr, (L_MOD - 1) // 2, L_MOD) == 1:
            nr += 1
        _GF2_NR = nr
    return _GF2_NR


def _gf2_mul(x, y):
    a, b = x
    c, d = y
    nr = _gf2_nr()
    return ((a * c + b * d % L_MOD * nr) % L_MOD, (a * d + b * c) % L_MOD)


def _gf2_pow(x, e: int):
    acc = (1, 0)
    base = x
    while e:
        if e & 1:
            acc = _gf2_mul(acc, base)
        base = _gf2_mul(base, base)
        e >>= 1
    return acc


def _gf2_root_of_order(order: int):
    """Element of GF(l^2) with multiplicative order exactly `order`."""
    assert (L_MOD * L_MOD - 1) % order == 0
    # prime factors of `order`
    fs, t, f = set(), order, 2
    while f * f <= t:
        if t % f == 0:
            fs.add(f)
            while t % f == 0:
                t //= f
        f += 1
    if t > 1:
        fs.add(t)
    cof = (L_MOD * L_MOD - 1) // order
    g = (2, 1)
    while True:
        w = _gf2_pow(g, cof)
        if w != (1, 0) and all(_gf2_pow(w, order // p) != (1, 0) for p in fs):
            return w
        g = (g[0] + 1, g[1])


def _find_root_of_order(p: int, order: int) -> int:
    assert (p - 1) % order == 0
    g = 2
    while True:
        w = pow(g, (p - 1) // order, p)
        if w != 1:
            fs = set()
            t, d = order, 2
            while d * d <= t:
                if t % d == 0:
                    fs.add(d)
                    while t % d == 0:
                        t //= d
                d += 1
            if t > 1:
                fs.add(t)
            if all(pow(w, order // f, p) != 1 for f in fs):
                return w
        g += 1


def _invert_matrix_mod(rows: list[list[int]], p: int) -> list[list[int]]:
    """Gaussian elimination over F_p (host; prototype-size matrices)."""
    n = len(rows)
    a = [row[:] + [1 if i == j else 0 for j in range(n)]
         for i, row in enumerate(rows)]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] % p)
        a[col], a[piv] = a[piv], a[col]
        inv = pow(a[col][col], -1, p)
        a[col] = [v * inv % p for v in a[col]]
        for r in range(n):
            if r != col and a[r][col] % p:
                f = a[r][col]
                a[r] = [(v - f * w) % p for v, w in zip(a[r], a[col])]
    return [row[n:] for row in a]
