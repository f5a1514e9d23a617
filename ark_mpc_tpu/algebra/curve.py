"""Batched Ed25519 group arithmetic over limb arrays.

TPU-native analog of the reference `CurvePoint<C>` wrapper
(`online-phase/src/algebra/curve/curve.rs:46-174,546-657`), instantiated for
the Curve25519 group (README north star): the twisted Edwards curve
-x^2 + y^2 = 1 + d x^2 y^2 over GF(2^255-19), prime-order subgroup of order
l (the scalar field).  A `CurvePoint` holds a *batch* of points in extended
twisted Edwards coordinates (X, Y, Z, T), each coordinate a limb array, so
group ops vectorize across the batch on the VPU.

Formulas are the complete unified add/double for a = -1 (RFC 8032 §5.1.4 /
Hisil-Wong-Carter-Dawson), valid for all prime-order-subgroup points: no
branches, so the kernels are trace-friendly.  Scalar multiplication is a
253-step double-and-select ladder under `lax.fori_loop`, fully parallel over
the batch; MSM = batched ladder + log-depth tree sum (the Pippenger
bucketing of `curve.rs:549-584` trades badly against TPU's scatter cost at
our batch sizes — measured choice, revisit with a Pallas kernel).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as lb
from .fields import BASE_FIELD, ED25519_PRIME, SCALAR_FIELD
from .limbs import NLIMBS
from .scalar import BaseFelt, Scalar

P = ED25519_PRIME
# Edwards d = -121665/121666 mod p, and 2d
ED_D = (-121665 * pow(121666, -1, P)) % P
ED_2D = (2 * ED_D) % P
# sqrt(-1) mod p (for decompression), = 2^((p-1)/4)
SQRT_M1 = pow(2, (P - 1) // 4, P)
# Standard base point
GEN_X = 15112221349535400772501151409588531511454012693041857206046113283949847762202
GEN_Y = 46316835694926478169428394003475163141307993866256225615783033603165251855960


def _const(value: int, shape):
    c = lb.to_mont(BASE_FIELD, jnp.asarray(lb.int_to_limbs(value), jnp.uint32))
    return BaseFelt(jnp.broadcast_to(
        jnp.reshape(c, (NLIMBS,) + (1,) * len(shape)), (NLIMBS,) + tuple(shape)
    ))


@dataclass
class CurvePoint:
    """Batch of Ed25519 points, extended coordinates (X, Y, Z, T), T=XY/Z."""

    X: BaseFelt
    Y: BaseFelt
    Z: BaseFelt
    T: BaseFelt

    # -- constructors ------------------------------------------------------
    @classmethod
    def identity(cls, shape=()):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return cls(
            BaseFelt.zeros(shape), BaseFelt.ones(shape),
            BaseFelt.ones(shape), BaseFelt.zeros(shape),
        )

    @classmethod
    def generator(cls, shape=()):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return cls.from_affine_ints(GEN_X, GEN_Y).broadcast_to(shape)

    @classmethod
    def random(cls, shape=(), rng=None):
        """Uniform random prime-subgroup points via hash-to-curve of
        CSPRNG bytes (the `curve.rs:143-167` `from_uniform_bytes` map),
        so discrete logs are unknown even to the sampler.  Intentionally
        STRONGER than the reference's `random_point()` (which returns
        `generator * Scalar::random()`, a known-dlog point)."""
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        n = 1
        for s in shape:
            n *= s
        if rng is None:
            import secrets

            seed = secrets.token_bytes(32)
        else:
            seed = rng.bytes(32)  # full 256-bit seed space
        pt = hash_to_curve(seed, n)
        return pt if shape == (n,) else CurvePoint(
            *(c.reshape(shape) for c in pt._coords()))

    @classmethod
    def from_affine(cls, x: BaseFelt, y: BaseFelt):
        return cls(x, y, BaseFelt.ones(x.shape), x * y)

    @classmethod
    def from_affine_ints(cls, x: int, y: int):
        return cls.from_affine(BaseFelt.from_ints(x), BaseFelt.from_ints(y))

    @classmethod
    def from_wire_affine(cls, xc, yc):
        """Rebuild points from canonical affine limb arrays off the wire
        (the Ed25519 identity is the valid affine point (0, 1) — no
        sentinel needed, unlike short-Weierstrass curves)."""
        return cls.from_affine(BaseFelt(lb.to_mont(BASE_FIELD, xc)),
                               BaseFelt(lb.to_mont(BASE_FIELD, yc)))

    @property
    def shape(self):
        return self.X.shape

    @property
    def size(self):
        return self.X.size

    def broadcast_to(self, shape):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return CurvePoint(*(c.broadcast_to(shape) for c in self._coords()))

    def _coords(self):
        return (self.X, self.Y, self.Z, self.T)

    def __getitem__(self, idx):
        return CurvePoint(*(c[idx] for c in self._coords()))

    def reshape(self, *shape):
        return CurvePoint(*(c.reshape(*shape) for c in self._coords()))

    @classmethod
    def concatenate(cls, items, axis=0):
        return cls(*(BaseFelt.concatenate([it._coords()[i] for it in items], axis)
                     for i in range(4)))

    # -- group law ---------------------------------------------------------
    # The arithmetic lives in `_add_raw`/`_double_raw`.  EAGER calls (not
    # under any trace) dispatch through jitted wrappers so a point op costs
    # ONE dispatch instead of ~15 (each eager dispatch is a full tunnel RTT
    # in sync mode).  Under an enclosing trace the raw form is inlined
    # directly — nesting a pjit per group op inside the big unrolled graphs
    # (ladders, the point-Beaver combine) blows up the XLA CPU compiler.

    def _add_raw(self, other: "CurvePoint") -> "CurvePoint":
        """Complete unified addition (RFC 8032 §5.1.4)."""
        a = (self.Y - self.X) * (other.Y - other.X)
        b = (self.Y + self.X) * (other.Y + other.X)
        c = self.T * _const(ED_2D, self.T.shape) * other.T
        d = self.Z * other.Z
        d = d + d
        e, f, g, h = b - a, d - c, d + c, b + a
        return CurvePoint(e * f, g * h, f * g, e * h)

    def _double_raw(self) -> "CurvePoint":
        a = self.X.square()
        b = self.Y.square()
        zz = self.Z.square()
        c = zz + zz
        h = a + b
        xy = self.X + self.Y
        e = h - xy.square()
        g = a - b
        f = c + g
        return CurvePoint(e * f, g * h, f * g, e * h)

    def _eager(self, other=None) -> bool:
        t = jax.core.Tracer
        return not (isinstance(self.X.limbs, t) or
                    (other is not None and isinstance(other.X.limbs, t)))

    def __add__(self, other: "CurvePoint") -> "CurvePoint":
        if self._eager(other):
            return _group_add(self, other)
        return self._add_raw(other)

    def double(self) -> "CurvePoint":
        if self._eager():
            return _group_double(self)
        return self._double_raw()

    def __neg__(self) -> "CurvePoint":
        return CurvePoint(-self.X, self.Y, self.Z, -self.T)

    def __sub__(self, other: "CurvePoint") -> "CurvePoint":
        if self._eager(other):
            return _group_sub(self, other)
        return self._add_raw(-other)

    def select(self, mask, other: "CurvePoint") -> "CurvePoint":
        """Element-wise: mask ? self : other (mask shape = batch shape)."""
        def sel(a: BaseFelt, b: BaseFelt) -> BaseFelt:
            return BaseFelt(jnp.where(mask[None], a.limbs, b.limbs))

        return CurvePoint(*(sel(a, b) for a, b in
                            zip(self._coords(), other._coords())))

    def mul(self, scalar: Scalar) -> "CurvePoint":
        """Variable-base scalar multiplication.

        TPU: the whole 256-step ladder runs inside ONE Pallas kernel with
        VMEM-resident coordinates (`ops/curve_kernels.py`) — the XLA
        ladder's ~500 dependent group ops are launch-overhead-bound and
        compile slowly at large widths.  CPU: batched XLA ladder."""
        if jax.default_backend() == "tpu":
            from ..ops.curve_kernels import scalar_mul_pallas

            return scalar_mul_pallas(self, scalar)
        return _scalar_mul(self, scalar)

    def __mul__(self, scalar: Scalar) -> "CurvePoint":
        return self.mul(scalar)

    __rmul__ = __mul__

    # Below this many points the ladder+tree-sum wins (the reference's
    # serial-MSM cutoff analog, `curve.rs:34-39`); above it, the scan-based
    # Pippenger (see `_msm_pippenger`).  Crossover measured in
    # `benchmarks/msm.py` (see BASELINE.md "MSM" table).
    MSM_PIPPENGER_CUTOFF = 128
    # TPU dispatch crossover ladder -> window-sum kernel (gather-free
    # Pippenger, `ops/curve_kernels.py:window_sums_pallas`): provisional
    # until measured in benchmarks/msm.py — set high = off.
    MSM_WINSUM_CUTOFF = 1 << 62
    # TPU: the windowed-ladder Pallas mega-kernel at EVERY size.  Measured
    # 2026-08-20 on the v5e chip (benchmarks/msm.py, BASELINE.md round-5
    # MSM table): the bucketed-Pippenger pipeline loses to the ladder at
    # every n tried (100.6 ms vs 8.4 ms at n=2^12) — its rank-grid
    # gather traffic and sequential bucket-slab grid swamp the ~5.5x
    # field-mul saving.  The bucket path stays available behind
    # ARK_MSM_FORCE=bucket for the harness; no measured n has it winning,
    # so nothing dispatches to it by default.

    @staticmethod
    def msm(scalars: Scalar, points: "CurvePoint") -> "CurvePoint":
        """Multi-scalar multiplication: sum_i scalars[i] * points[i]
        (`curve.rs:549-584` analog).

        Small batches: batched ladder + log-depth tree-sum (253 sequential
        double+add steps, fully vectorized over the batch).  Large batches:
        TPU Pippenger — sort points by windowed digit and turn bucket
        accumulation into `associative_scan` group prefix-sums (the
        sort+segmented-scan MSM of the cuZK/sppark GPU lineage), which cuts
        group-op WORK from ~506·n ladder steps to ~2·n·W scan adds.

        TPU: the windowed Pallas ladder mega-kernel + tree sum (one
        launch) at every size — measured fastest at every n tried, and
        faster than the 4-core native CPU Pippenger anchor (BASELINE.md
        round-5 MSM table).  The bucketed Pippenger pipeline
        (`ops/msm_kernels.py`) pays ~5.5x fewer base-field muls per point
        but loses end-to-end to its rank-grid gather + sequential bucket
        grid; it is reachable via ARK_MSM_FORCE=bucket (benchmark
        harness), never by default dispatch."""
        import os

        n = int(np.prod(scalars.shape)) if scalars.shape else 1
        if jax.default_backend() == "tpu":
            force = os.environ.get("ARK_MSM_FORCE", "")
            if force == "bucket":
                from ..ops.msm_kernels import msm_bucket_tpu

                return msm_bucket_tpu(points.reshape(n).broadcast_to((n,)),
                                      scalars.reshape(n))
            if force == "winsum" or (force != "ladder"
                                     and n >= CurvePoint.MSM_WINSUM_CUTOFF):
                return _msm_winsum_jit(
                    points.reshape(n).broadcast_to((n,)), scalars.reshape(n))
            # one dispatch for ladder + tree sum (eager tree levels would
            # each pay the tunnel RTT)
            return _msm_pallas_jit(points.reshape(n).broadcast_to((n,)),
                                   scalars.reshape(n))
        if n >= CurvePoint.MSM_PIPPENGER_CUTOFF:
            return _msm_pippenger(
                points.reshape(n).broadcast_to((n,)), scalars.reshape(n))
        prods = _scalar_mul(points, scalars)
        return prods.sum()

    def sum(self, axis=0) -> "CurvePoint":
        """Tree-reduction point sum along a batch axis."""
        pt = self
        n = pt.shape[axis]
        while n > 1:
            half = n // 2
            lo = pt._slice(axis, 0, half)
            hi = pt._slice(axis, half, 2 * half)
            s = lo + hi
            if n % 2:
                s = CurvePoint.concatenate([s, pt._slice(axis, 2 * half, n)], axis)
            pt = s
            n = pt.shape[axis]
        return pt._squeeze(axis)

    def _slice(self, axis, start, stop):
        idx = (slice(None),) * axis + (slice(start, stop),)
        return self[idx]

    def _squeeze(self, axis):
        return CurvePoint(*(type(c)(jnp.squeeze(c.limbs, axis + 1))
                            for c in self._coords()))

    # -- conversion / comparison ------------------------------------------
    def to_affine(self):
        """(x, y) affine coordinates; batched Fermat inversion of Z."""
        zinv = self.Z.inverse()
        return self.X * zinv, self.Y * zinv

    def normalize(self) -> "CurvePoint":
        x, y = self.to_affine()
        return CurvePoint.from_affine(x, y)

    def equals(self, other: "CurvePoint"):
        """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1."""
        return (
            (self.X * other.Z).equals(other.X * self.Z)
            & (self.Y * other.Z).equals(other.Y * self.Z)
        )

    def is_identity(self):
        return self.X.is_zero() & self.Y.equals(self.Z)

    def is_on_curve(self):
        """Projective curve membership + extended-coordinate consistency:
        (Y^2 - X^2) Z^2 == Z^4 + d X^2 Y^2  and  T Z == X Y.

        Points received off the wire MUST pass this (and the subgroup check)
        before use — the reference gets both for free from arkworks
        deserialization (`curve.rs:103-114`); skipping them enables
        invalid-curve / small-subgroup attacks on the MAC key share."""
        xx = self.X.square()
        yy = self.Y.square()
        zz = self.Z.square()
        lhs = (yy - xx) * zz
        rhs = zz.square() + _const(ED_D, self.shape) * xx * yy
        t_ok = (self.T * self.Z).equals(self.X * self.Y)
        return lhs.equals(rhs) & t_ok

    def is_in_prime_subgroup(self):
        """l * P == identity (l = the prime group order): combined with
        `is_on_curve` this is full arkworks-style validation."""
        if jax.default_backend() == "tpu":
            from ..ops.curve_kernels import mul_by_order_pallas

            return mul_by_order_pallas(self).is_identity()
        return _mul_by_order(self).is_identity()

    def compress(self) -> bytes:
        """Ed25519 compressed encoding: 32B LE y with sign bit of x
        (serialization parity with `curve.rs:103-114` compressed ser/de)."""
        x, y = self.to_affine()
        xi = np.array(x.to_ints(), dtype=object)
        yi = np.array(y.to_ints(), dtype=object)
        out = bytearray()
        for xv, yv in zip(xi.reshape(-1), yi.reshape(-1)):
            enc = int(yv) | ((int(xv) & 1) << 255)
            out += enc.to_bytes(32, "little")
        return bytes(out)

    @classmethod
    def decompress(cls, data: bytes) -> "CurvePoint":
        """Inverse of `compress` (host-side; sqrt via p = 5 mod 8 trick)."""
        pts_x, pts_y = [], []
        for off in range(0, len(data), 32):
            enc = int.from_bytes(data[off : off + 32], "little")
            sign = enc >> 255
            y = enc & ((1 << 255) - 1)
            if y >= P:
                raise ValueError("invalid y")
            y2 = y * y % P
            u = (y2 - 1) % P
            v = (ED_D * y2 + 1) % P
            x2 = u * pow(v, -1, P) % P
            x = pow(x2, (P + 3) // 8, P)
            if x * x % P != x2:
                x = x * SQRT_M1 % P
            if x * x % P != x2:
                raise ValueError("not on curve")
            if x & 1 != sign:
                x = (-x) % P
            pts_x.append(x)
            pts_y.append(y)
        return cls.from_affine(
            BaseFelt.from_ints(pts_x), BaseFelt.from_ints(pts_y)
        )

    def __repr__(self):
        return f"CurvePoint(shape={self.shape})"


jax.tree_util.register_pytree_node(
    CurvePoint,
    lambda p: ((p.X, p.Y, p.Z, p.T), None),
    lambda aux, ch: CurvePoint(*ch),
)


# single-dispatch group ops (see the group-law comment in the class)
_group_add = jax.jit(CurvePoint._add_raw)
_group_double = jax.jit(CurvePoint._double_raw)
_group_sub = jax.jit(
    lambda p, q: p._add_raw(CurvePoint(-q.X, q.Y, q.Z, -q.T)))


@jax.jit
def _msm_pallas_jit(points: CurvePoint, scalars: Scalar) -> CurvePoint:
    from ..ops.curve_kernels import scalar_mul_pallas

    return scalar_mul_pallas(points, scalars).sum()


@jax.jit
def _msm_winsum_jit(points: CurvePoint, scalars: Scalar) -> CurvePoint:
    from ..ops.curve_kernels import msm_windowsum_pallas

    return msm_windowsum_pallas(points, scalars)


def _ladder_unroll() -> int:
    """Bits per fori iteration.  TPU: 4 — each while-loop round trip costs
    ~0.4 ms at dispatch granularity, so 256 iterations -> 64 (bits above
    252 are always zero).  CPU: 1 — a 4x bigger loop body blows XLA's CPU
    compile up to ~9 min inside enclosing jits (the point-Beaver combine
    inlines three ladders)."""
    return 4 if jax.default_backend() == "tpu" else 1


@jax.jit
def _scalar_mul(point: CurvePoint, scalar: Scalar) -> CurvePoint:
    """MSB-first double-and-select ladder, `_ladder_unroll()` bits per
    `fori_loop` iteration (256 total; the canonical scalar is < 2^253)."""
    shape = jnp.broadcast_shapes(point.shape, scalar.shape)
    point = point.broadcast_to(shape)
    canon = lb.from_mont(SCALAR_FIELD, scalar.limbs)  # (16, *batch)
    canon = jnp.broadcast_to(
        canon.reshape(canon.shape[:1] + (1,) * (len(shape) - len(scalar.shape)) + canon.shape[1:]),
        (NLIMBS,) + shape,
    )

    unroll = _ladder_unroll()

    def body(j, acc: CurvePoint) -> CurvePoint:
        for t in range(unroll):
            bit_index = 255 - (unroll * j + t)
            limb = jax.lax.dynamic_index_in_dim(
                canon, bit_index >> 4, axis=0, keepdims=False)
            bit = (limb >> (bit_index.astype(jnp.uint32) & 15)) & 1
            acc = acc.double()
            added = acc + point
            acc = added.select(bit == 1, acc)
        return acc

    acc0 = CurvePoint.identity(shape)
    return jax.lax.fori_loop(0, 256 // unroll, body, acc0)


def _scalar_digits(scalar: Scalar, c: int) -> jnp.ndarray:
    """Split canonical scalars into W = 256/c unsigned c-bit window digits,
    least-significant window first: returns (W, n) with
    value = sum_w digits[w] * 2^(c*w).  c must divide 16."""
    assert 16 % c == 0
    canon = lb.from_mont(SCALAR_FIELD, scalar.limbs)  # (16, n) of 16-bit
    k = 16 // c
    mask = jnp.uint32((1 << c) - 1)
    # digit (limb i, sub j) has weight 2^(16 i + c j) -> index i*k + j
    parts = jnp.stack(
        [(canon >> jnp.uint32(c * j)) & mask for j in range(k)], axis=1
    )  # (16, k, n)
    return parts.reshape((16 * k,) + canon.shape[1:])


def _hs_prefix_scan(pt: CurvePoint, nsteps: int) -> CurvePoint:
    """Inclusive group prefix-sum along the LAST batch axis by the
    Hillis-Steele shift-and-add recurrence, UNROLLED over the log2(n)
    steps: shift amounts are static so each step is pad+slice (no gather)
    and XLA fuses the whole step into flat vector code.  `nsteps` is
    O(log n), so the traced graph stays small — `associative_scan` would
    unroll ~2n group adds (minutes of XLA compile already at n=256 for
    9-mul Edwards adds); a fori_loop would cost a per-iteration while-loop
    round trip that dominates at TPU dispatch granularity."""
    n = pt.shape[-1]
    pos = jnp.arange(n, dtype=jnp.int32)
    ident = CurvePoint.identity(pt.shape)
    x = pt
    for i in range(nsteps):
        k = 1 << i
        if k >= n:
            break
        rolled = CurvePoint(
            *(BaseFelt(jnp.roll(cc.limbs, k, axis=-1))
              for cc in x._coords()))
        shifted = rolled.select(pos >= k, ident)
        x = x + shifted
    return x


def _group_prefix_scan(pt: CurvePoint, chunk: int = 16) -> CurvePoint:
    """Work-efficient inclusive prefix-sum along the last batch axis.

    Recursive chunking: Hillis-Steele within length-`chunk` blocks (full
    vector width, log2(chunk) iterations), recurse on the m = n/chunk
    block totals, then one full-width add folds the exclusive block
    offsets back in.  Work ~ n·(log2(chunk)+1)·(1 + 1/chunk + ...) group
    adds; traced group-add instantiations ~ 2·log_chunk(n)."""
    n = pt.shape[-1]
    if n <= chunk:
        return _hs_prefix_scan(pt, max(1, (n - 1).bit_length()))
    m = -(-n // chunk)
    if m * chunk != n:
        pad = CurvePoint.identity(pt.shape[:-1] + (m * chunk - n,))
        pt = CurvePoint.concatenate([pt, pad], axis=len(pt.shape) - 1)
    blocks = pt.reshape(*pt.shape[:-1], m, chunk)
    inner = _hs_prefix_scan(blocks, chunk.bit_length() - 1)
    totals = inner[..., -1]  # (..., m) block sums
    offs = _group_prefix_scan(totals, chunk)
    # exclusive offsets: shift right by one block, first block = identity
    offs = CurvePoint.concatenate(
        [CurvePoint.identity(offs.shape[:-1] + (1,)), offs[..., :-1]],
        axis=len(offs.shape) - 1)
    out = inner + CurvePoint(
        *(BaseFelt(cc.limbs[..., None]) for cc in offs._coords()))
    out = out.reshape(*pt.shape[:-1], m * chunk)
    return out[..., :n]


def _group_suffix_scan(pt: CurvePoint, chunk: int = 16) -> CurvePoint:
    """Inclusive suffix-sum along the last batch axis (reverse, scan,
    reverse)."""
    rev = CurvePoint(
        *(BaseFelt(cc.limbs[..., ::-1]) for cc in pt._coords()))
    s = _group_prefix_scan(rev, chunk)
    return CurvePoint(
        *(BaseFelt(cc.limbs[..., ::-1]) for cc in s._coords()))


@partial(jax.jit, static_argnames=("c",))
def _msm_pippenger(points: CurvePoint, scalars: Scalar,
                   c: int = 8) -> CurvePoint:
    """Sort + segmented-scan Pippenger MSM (flat 1-D batch).

    Replaces serial bucket accumulation (`curve.rs:549-584`) — a scatter
    pattern TPUs hate — with the GPU-lineage formulation (cuZK/sppark):

      1. per window, sort point indices by their c-bit digit (`argsort` is
         a cheap u32 bitonic sort; the gather is regular memory traffic);
      2. one batched group prefix-sum over the sorted points, all W
         windows at once (`_group_prefix_scan`: ~5·n·W group adds of full
         vector width, O(log n) traced instantiations);
      3. bucket sums = prefix differences at digit boundaries
         (`searchsorted` + gather; complete Edwards formulas make the
         empty-bucket case P - P = identity branch-free);
      4. sum_d d·B_d via a suffix scan + log-depth tree sum;
      5. Horner across windows under `lax.scan`: c doubles + 1 add per
         window at width 1.

    Work: ~5nW + O(2^c W) group adds vs the ladder's ~506·n doubles+adds;
    at c=8 (W=32) that is ~3-5x fewer field muls, and the sequential
    depth collapses from 506 dependent steps to ~(log2 n)·log_16(n) wide
    steps plus the width-1 Horner tail."""
    n = points.shape[0]
    W = 256 // c
    nb = (1 << c) - 1  # buckets 1..nb

    digits = _scalar_digits(scalars, c)  # (W, n)
    perm = jnp.argsort(digits, axis=1)
    sorted_digits = jnp.take_along_axis(digits, perm, axis=1)

    def gather_win(f: BaseFelt) -> BaseFelt:
        lim = jnp.broadcast_to(f.limbs[:, None, :], (NLIMBS, W, n))
        return BaseFelt(jnp.take_along_axis(lim, perm[None], axis=2))

    pts = CurvePoint(*(gather_win(cc) for cc in points._coords()))  # (W, n)

    pref = _group_prefix_scan(pts)
    phat = CurvePoint.concatenate(
        [CurvePoint.identity((W, 1)), pref], axis=1)  # phat[:, j] = sum of first j

    # edges[w, d-1] = #elements with digit < d, for d = 1..2^c
    dvals = jnp.arange(1, (1 << c) + 1, dtype=digits.dtype)
    edges = jax.vmap(
        lambda row: jnp.searchsorted(row, dvals, side="left"))(sorted_digits)
    lo, hi = edges[:, :-1], edges[:, 1:]  # (W, nb) each

    def take_idx(f: BaseFelt, idx) -> BaseFelt:
        return BaseFelt(jnp.take_along_axis(
            f.limbs, jnp.broadcast_to(idx[None], (NLIMBS,) + idx.shape),
            axis=2))

    buckets = (
        CurvePoint(*(take_idx(cc, hi) for cc in phat._coords()))
        - CurvePoint(*(take_idx(cc, lo) for cc in phat._coords()))
    )  # (W, nb); B[w, d-1] = sum of points with digit d in window w

    suffix = _group_suffix_scan(buckets)
    # sum_d d*B_d = sum_k suffix_k: reuse the one-instantiation HS scan and
    # read its last element rather than unrolling a log-depth tree sum.
    win = _hs_prefix_scan(suffix, (nb - 1).bit_length())[..., -1]  # (W,)
    return _horner_windows(win, c)


def _horner_windows(win: CurvePoint, c: int) -> CurvePoint:
    """Combine per-window sums (W,) into sum_w 2^(c*w) * win[w]: Horner
    top-window-first under `lax.scan` so the traced graph is O(1) in W."""
    xs = jax.tree_util.tree_map(
        lambda l: jnp.moveaxis(l, 1, 0)[::-1], win)  # leaves (W, 16)

    def horner(acc: CurvePoint, w: CurvePoint):
        for _ in range(c):  # static unroll: one fused kernel per step
            acc = acc.double()
        return acc + w, None

    acc, _ = jax.lax.scan(horner, CurvePoint.identity(()), xs)
    return acc


@jax.jit
def _mul_by_order(point: CurvePoint) -> CurvePoint:
    """Multiply by the (public, constant) group order l — the subgroup
    check.  Same ladder as `_scalar_mul` but the bits are the order itself
    (which is not representable as a `Scalar`: l = 0 mod l)."""
    shape = point.shape
    canon = jnp.broadcast_to(
        jnp.asarray(lb.int_to_limbs(SCALAR_FIELD.modulus),
                    jnp.uint32).reshape((NLIMBS,) + (1,) * len(shape)),
        (NLIMBS,) + shape)

    unroll = _ladder_unroll()

    def body(j, acc: CurvePoint) -> CurvePoint:
        for t in range(unroll):
            bit_index = 255 - (unroll * j + t)
            limb = jax.lax.dynamic_index_in_dim(
                canon, bit_index >> 4, axis=0, keepdims=False)
            bit = (limb >> (bit_index.astype(jnp.uint32) & 15)) & 1
            acc = acc.double()
            added = acc + point
            acc = added.select(bit == 1, acc)
        return acc

    return jax.lax.fori_loop(0, 256 // unroll, body,
                             CurvePoint.identity(shape))


def hash_to_curve(data: bytes, n: int = 1) -> CurvePoint:
    """Map uniform bytes to curve points (Elligator2, RFC 9380 map for
    curve25519 -> Edwards), analog of `from_uniform_bytes` / SWU hash-to-curve
    at `curve.rs:143-167`.  Host-side (not a hot path)."""
    import hashlib

    pts = []
    for i in range(n):
        ctr = 0
        while True:
            h = hashlib.sha3_512(data + i.to_bytes(4, "little") +
                                 ctr.to_bytes(4, "little")).digest()
            r = int.from_bytes(h, "little") % P
            pt = _elligator2(r)
            if pt is not None:
                pts.append(pt)
                break
            ctr += 1
    xs = BaseFelt.from_ints([p[0] for p in pts])
    ys = BaseFelt.from_ints([p[1] for p in pts])
    # Clear cofactor: multiply by 8.
    pt = CurvePoint.from_affine(xs, ys)
    return pt.double().double().double()


def _elligator2(r: int):
    """Elligator2 map r -> Montgomery curve point -> Edwards (x, y) ints."""
    A = 486662
    # u = -A / (1 + 2 r^2); if u^3 + A u^2 + u is square use u, else -A - u
    rr2 = (2 * r * r) % P
    denom = (1 + rr2) % P
    if denom == 0:
        return None
    u = (-A * pow(denom, -1, P)) % P
    gu = (u * u % P * u + A * u % P * u + u) % P

    def legendre(a):
        return pow(a, (P - 1) // 2, P)

    if legendre(gu) != 1:
        u = (-A - u) % P
        gu = (u * u % P * u + A * u % P * u + u) % P
        if legendre(gu) != 1 and gu != 0:
            return None
    v = pow(gu, (P + 3) // 8, P)
    if v * v % P != gu:
        v = v * SQRT_M1 % P
    if v * v % P != gu:
        return None
    # Montgomery (u, v) -> Edwards: x = sqrt(-486664)*u/v, y = (u-1)/(u+1)
    c = pow((-486664) % P, (P + 3) // 8, P)
    if c * c % P != (-486664) % P:
        c = c * SQRT_M1 % P
    if v == 0 or (u + 1) % P == 0:
        return (0, 1)
    x = c * u % P * pow(v, -1, P) % P
    y = (u - 1) * pow(u + 1, -1, P) % P
    return (x, y)


# field -> curve link used by the generic point protocols
# (`fabric/points.py`): a fabric over Curve25519 Scalars speaks Ed25519.
Scalar.curve = CurvePoint
