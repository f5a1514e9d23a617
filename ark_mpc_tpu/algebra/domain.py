"""Evaluation domains over the scalar field (FFT/IFFT parity layer).

Analog of the reference's arkworks `Radix2EvaluationDomain` usage
(`scalar_result.rs:340-403` FFT/IFFT graph ops, `share.rs:168-191`
share-wise FFT helper, poly FFT-mul).  The Curve25519 scalar field has
2-adicity 2, so — exactly as for the reference instantiated at this curve —
only small smooth evaluation domains exist: sizes dividing the smooth part
of l - 1 (2^2 * 3 * 11 -> domains up to 132).  Domains are realized as
DFT-by-matmul on the MXU (`ops/matmul.py`), which at these sizes is faster
than any butterfly network on TPU anyway.

For large NTTs (the BGV offline phase), see `ops/ntt.py` over NTT-friendly
RNS primes.
"""

from __future__ import annotations

import numpy as np

from .fields import CURVE25519_ORDER as L
from .scalar import Scalar
from .share import ScalarShare

# smooth part of l - 1
_SMOOTH = 132  # 2^2 * 3 * 11


def _find_generator_of_order(n: int) -> int:
    assert (L - 1) % n == 0, f"no multiplicative subgroup of size {n}"
    # find a generator of the order-n subgroup
    g = 2
    while True:
        w = pow(g, (L - 1) // n, L)
        ok = w != 1
        if ok:
            # primitivity: w^(n/p) != 1 for prime p | n
            t, fs = n, set()
            d = 2
            while d * d <= t:
                if t % d == 0:
                    fs.add(d)
                    while t % d == 0:
                        t //= d
                d += 1
            if t > 1:
                fs.add(t)
            ok = all(pow(w, n // p, L) != 1 for p in fs)
        if ok:
            return w
        g += 1


class EvaluationDomain:
    """Multiplicative-subgroup evaluation domain of size n (n | 132)."""

    def __init__(self, n: int):
        if _SMOOTH % n != 0:
            raise ValueError(
                f"domain size {n} unsupported: the Curve25519 scalar field "
                f"only has smooth subgroups of size dividing {_SMOOTH}"
            )
        self.n = n
        w = _find_generator_of_order(n)
        self.group_gen = w
        # Vandermonde matrices (Montgomery-form Scalars)
        fwd = [[pow(w, i * j, L) for j in range(n)] for i in range(n)]
        n_inv = pow(n, -1, L)
        w_inv = pow(w, -1, L)
        inv = [[n_inv * pow(w_inv, i * j, L) % L for j in range(n)]
               for i in range(n)]
        self._fwd = Scalar.from_ints(np.array(fwd, dtype=object))
        self._inv = Scalar.from_ints(np.array(inv, dtype=object))

    def fft(self, coeffs: Scalar) -> Scalar:
        """Coefficients -> evaluations on the domain (one MXU matmul)."""
        assert coeffs.shape[0] == self.n
        return (self._fwd @ coeffs.reshape(self.n, 1)).reshape(self.n)

    def ifft(self, evals: Scalar) -> Scalar:
        assert evals.shape[0] == self.n
        return (self._inv @ evals.reshape(self.n, 1)).reshape(self.n)

    def fft_shares(self, x: ScalarShare, forward: bool = True) -> ScalarShare:
        """Share-wise (I)FFT: transform share and MAC vectors independently
        (`share.rs:168-191` fft_helper) — linear, so authenticated sharings
        stay valid."""
        f = self.fft if forward else self.ifft
        return ScalarShare(f(x.share), f(x.mac))
