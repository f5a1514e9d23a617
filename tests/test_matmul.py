"""Golden tests for the MXU modular matmul and shared matrix multiplication."""

import random

import numpy as np
import pytest

from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc, execute_mock_mpc_dealer
from ark_mpc_tpu.models.circuits import inner_product, poly_eval, shared_matmul

rng = random.Random(17)


def rand_mat(m, n):
    return [[rng.randrange(L) for _ in range(n)] for _ in range(m)]


def to_scalar(mat):
    return Scalar.from_ints(np.array(mat, dtype=object))


def ref_matmul(a, b):
    m, k, n = len(a), len(b), len(b[0])
    return [
        [sum(a[i][t] * b[t][j] for t in range(k)) % L for j in range(n)]
        for i in range(m)
    ]


def test_field_matmul():
    a, b = rand_mat(5, 7), rand_mat(7, 3)
    got = (to_scalar(a) @ to_scalar(b)).to_ints()
    want = [v for row in ref_matmul(a, b) for v in row]
    assert got == want


def test_field_matmul_square_larger():
    a, b = rand_mat(33, 33), rand_mat(33, 33)
    got = (to_scalar(a) @ to_scalar(b)).to_ints()
    want = [v for row in ref_matmul(a, b) for v in row]
    assert got == want


@pytest.mark.slow
def test_shared_matmul():
    m, k, n = 4, 5, 3
    a, b = rand_mat(m, k), rand_mat(k, n)
    want = [v for row in ref_matmul(a, b) for v in row]

    def prog(fabric):
        sa = fabric.share_values(
            to_scalar(a) if fabric.party_id == 0 else None, sender=0, n=m * k
        ).reshape(m, k)
        sb = fabric.share_values(
            to_scalar(b) if fabric.party_id == 1 else None, sender=1, n=k * n
        ).reshape(k, n)
        sc = shared_matmul(fabric, sa, sb)
        out = fabric.open_authenticated(sc.reshape(m * n))
        return out.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == want and r1 == want


def test_shared_matmul_partyid_source():
    """PartyIDBeaverSource matrix triples are consistent too."""
    m, k, n = 2, 3, 2
    a, b = rand_mat(m, k), rand_mat(k, n)
    want = [v for row in ref_matmul(a, b) for v in row]

    def prog(fabric):
        sa = fabric.share_values(
            to_scalar(a) if fabric.party_id == 0 else None, sender=0, n=m * k
        ).reshape(m, k)
        sb = fabric.share_values(
            to_scalar(b) if fabric.party_id == 1 else None, sender=1, n=k * n
        ).reshape(k, n)
        sc = shared_matmul(fabric, sa, sb)
        return fabric.open_authenticated(sc.reshape(m * n)).to_ints()

    r0, r1 = execute_mock_mpc(prog)
    assert r0 == want and r1 == want


def test_poly_eval_circuit():
    coeffs = [rng.randrange(L) for _ in range(6)]
    x = rng.randrange(L)
    want = sum(c * pow(x, i, L) for i, c in enumerate(coeffs)) % L

    def prog(fabric):
        sc = fabric.share_values(
            Scalar.from_ints(coeffs) if fabric.party_id == 0 else None,
            sender=0, n=len(coeffs),
        )
        res = poly_eval(fabric, sc, Scalar.from_ints(x))
        return fabric.open_authenticated(res).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [want]
