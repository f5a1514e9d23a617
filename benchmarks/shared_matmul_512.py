import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, numpy as np
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.algebra.share import ScalarShare
from ark_mpc_tpu.offline.base import TrustedDealerSource
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L

m = k = n = 512
t0 = time.time()
rng = np.random.default_rng(0)
dealer = TrustedDealerSource(0, seed=5)
key0 = dealer.get_mac_key_share(); key1 = dealer._mac_key_shares[1]
A = Scalar.random(m*k, rng).reshape(m, k)
B = Scalar.random(k*n, rng).reshape(k, n)
A0, A1 = dealer._deal(A.reshape(m*k)); B0, B1 = dealer._deal(B.reshape(k*n))
A0, A1 = A0.reshape(m,k), A1.reshape(m,k); B0, B1 = B0.reshape(k,n), B1.reshape(k,n)
P = Scalar.random(m*k, rng).reshape(m,k); Q = Scalar.random(k*n, rng).reshape(k,n)
C = P @ Q
P0, P1 = dealer._deal(P.reshape(m*k)); Q0, Q1 = dealer._deal(Q.reshape(k*n))
C0, C1 = dealer._deal(C.reshape(m*n))
P0, P1 = P0.reshape(m,k), P1.reshape(m,k); Q0, Q1 = Q0.reshape(k,n), Q1.reshape(k,n)
C0, C1 = C0.reshape(m,n), C1.reshape(m,n)
jax.block_until_ready(C1.mac.limbs)
print(f"setup {time.time()-t0:.1f}s", flush=True)

@jax.jit
def both_matmul(A0, A1, B0, B1, P0, P1, Q0, Q1, C0, C1, key0, key1):
    D = (A0 - P0).share + (A1 - P1).share   # opened mask
    E = (B0 - Q0).share + (B1 - Q1).share
    DE = D @ E
    def party(pid, Ppid, Qpid, Cpid, key):
        res = Qpid.matmul_public_left(D) + Ppid.matmul_public_right(E) + Cpid
        return res.add_public(DE, key, pid)
    Z0 = party(0, P0, Q0, C0, key0)
    Z1 = party(1, P1, Q1, C1, key1)
    V = Z0.share + Z1.share
    mac_ok_val = (key0 + key1)  # key
    return Z0, Z1, V

Z0, Z1, V = both_matmul(A0, A1, B0, B1, P0, P1, Q0, Q1, C0, C1, key0, key1)
jax.block_until_ready(V.limbs)
print("compiled", flush=True)
_ = jax.device_get(V.limbs[:, :1, :1])  # sync mode
t0 = time.time()
Z0, Z1, V = both_matmul(A0, A1, B0, B1, P0, P1, Q0, Q1, C0, C1, key0, key1)
jax.block_until_ready(V.limbs)
dt = time.time()-t0
print(f"512x512 shared matmul (both parties, matrix-Beaver): {dt*1e3:.1f} ms", flush=True)

# correctness: spot check entries + full MAC check
va = jax.device_get(V.limbs)
Vs = Scalar(va)
Ai = np.array(A.to_ints(), dtype=object).reshape(m, k)
Bi = np.array(B.to_ints(), dtype=object).reshape(k, n)
Vi = np.array(Vs.to_ints(), dtype=object).reshape(m, n)
for (i, j) in [(0,0), (3,5), (511,511), (100, 200)]:
    want = int(sum(Ai[i,t]*Bi[t,j] for t in range(k)) % L)
    assert int(Vi[i,j]) == want, (i, j)
# MAC: key*V == mac0+mac1 elementwise
key = key0 + key1
mac_want = V * key
mac_got = Z0.mac + Z1.mac
assert bool(np.asarray(jax.device_get(mac_want.equals(mac_got))).all())
print("correctness + MAC OK", flush=True)
