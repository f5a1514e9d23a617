import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from ark_mpc_tpu.algebra import limbs as lb
from ark_mpc_tpu.algebra.fields import SCALAR_FIELD as spec
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.algebra.share import ScalarShare
from ark_mpc_tpu.parallel.step import beaver_mul_step, mac_check_fold

n = 1 << 17
rng = np.random.default_rng(0)
def rnd():
    a = rng.integers(0, 1<<16, size=(16, n), dtype=np.uint32); a[15] &= 0xfff
    return jnp.asarray(a)
x, y = rnd(), rnd()

@jax.jit
def mm(x, y):
    return lb._redc(spec, lb._conv_columns(x, y))

# chained timing (defeats overlap illusions)
r = mm(x, y); r.block_until_ready()
t0 = time.time()
K = 50
for _ in range(K):
    r = mm(r, y)
r.block_until_ready()
dt = (time.time()-t0)/K
print(f"mont_mul chained: {dt*1e3:.3f} ms ({n/dt/1e6:.0f} M muls/s)")

# fused beaver round timing
def mk_share():
    return ScalarShare(Scalar(rnd()), Scalar(rnd()))
xs, ys, a, b, c = mk_share(), mk_share(), mk_share(), mk_share(), mk_share()
d, e = Scalar(rnd()), Scalar(rnd())
key = Scalar(rnd()[:, :1].reshape(16))
coeffs = Scalar(rnd())

@jax.jit
def round_fn(xs, ys, a, b, c, d, e, key, coeffs):
    z = beaver_mul_step(0, xs, ys, a, b, c, d, e, key)
    t = mac_check_fold(key, z.share, z.mac, coeffs)
    return z, t

z, t = round_fn(xs, ys, a, b, c, d, e, key, coeffs)
jax.block_until_ready((z.share.limbs, t.limbs))
t0 = time.time()
for _ in range(20):
    z, t = round_fn(xs, ys, a, b, c, d, e, key, coeffs)
jax.block_until_ready((z.share.limbs, t.limbs))
dt = (time.time()-t0)/20
print(f"beaver+fold round: {dt*1e3:.2f} ms ({n/dt/1e6:.1f} M mults/s)")

# beaver only (no fold)
@jax.jit
def round2(xs, ys, a, b, c, d, e, key):
    return beaver_mul_step(0, xs, ys, a, b, c, d, e, key)
z = round2(xs, ys, a, b, c, d, e, key); jax.block_until_ready(z.share.limbs)
t0 = time.time()
for _ in range(20):
    z = round2(xs, ys, a, b, c, d, e, key)
jax.block_until_ready(z.share.limbs)
dt = (time.time()-t0)/20
print(f"beaver only: {dt*1e3:.2f} ms ({n/dt/1e6:.1f} M mults/s)")
