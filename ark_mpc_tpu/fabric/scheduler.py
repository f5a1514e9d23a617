"""Batched circuit scheduler: trace, level, fuse, flush.

This is the TPU-native replacement for the reference's computation-graph
runtime — `MpcFabric`'s per-gate `new_gate_op` closures, the `SegQueue`
executor with dependency counting (`fabric/executor/single_threaded.rs:
150-402`), and per-result futures (`fabric/result.rs:249-338`).  The insight
(SURVEY §2 parallelism table, §7): the reference's out-of-order gate
execution exists to (a) run independent gates concurrently and (b) overlap
communication; on TPU both are better served *statically*:

  - users build circuits with operator overloading on `TracedShare` (the
    `AuthenticatedScalarResult` role) — building is pure graph construction;
  - `run()` levels the DAG by *communication depth* (number of
    open/Beaver rounds on the longest dependency path — the same quantity
    the reference's stats track as "circuit depth", `single_threaded.rs:
    33-124`);
  - per level, ALL Beaver multiplications fuse into ONE batched mul (one
    triple batch, one wire exchange), all inversions into one batched
    inversion, and all requested opens into one batched authenticated open
    with a deferred MAC check — the scheduler preserves the reference's
    4-messages-per-round property (`authenticated_scalar.rs:278-354`) at
    *program* granularity;
  - linear gates cost no rounds and evaluate as fused vectorized kernels
    between flushes.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare
from .context import MpcFabric

_ids = itertools.count()


@dataclass(eq=False)
class _Node:
    # share ops:  input | add | sub | neg | mul_pub | add_pub | mul | inv
    #             | sum | mul_pubv | add_pubv | sub_pubv | rsub_pubv
    # point ops:  pinput | padd | psub | pneg | pmul_pub | pmul | psum
    # public ops: open | pub_add | pub_sub | pub_mul | pub_neg | pub_c
    #             | pub_fn
    op: str
    deps: tuple
    payload: object = None
    shape: tuple = ()
    nid: int = field(default_factory=lambda: next(_ids))


class TracedShare:
    """Symbolic authenticated share batch inside a traced circuit."""

    def __init__(self, tracer: "Tracer", node: _Node, shape: tuple):
        self.tracer = tracer
        self.node = node
        self.shape = shape

    # -- operator surface (mirrors AuthenticatedScalarResult) --------------
    def _lift(self, other):
        if isinstance(other, TracedShare):
            return other
        if isinstance(other, ScalarShare):
            return self.tracer.wrap(other)
        return NotImplemented

    def __add__(self, other):
        if isinstance(other, Scalar):
            return self.tracer._mk("add_pub", (self,), other, self.shape)
        if isinstance(other, TracedPublic):
            return self.tracer._mk("add_pubv", (self, other), None,
                                   self.shape)
        other = self._lift(other)
        if other is NotImplemented:
            return NotImplemented
        return self.tracer._mk("add", (self, other), None, self.shape)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, Scalar):
            return self.tracer._mk("add_pub", (self,), -other, self.shape)
        if isinstance(other, TracedPublic):
            return self.tracer._mk("sub_pubv", (self, other), None,
                                   self.shape)
        other = self._lift(other)
        if other is NotImplemented:
            return NotImplemented
        return self.tracer._mk("sub", (self, other), None, self.shape)

    def __neg__(self):
        return self.tracer._mk("neg", (self,), None, self.shape)

    def __mul__(self, other):
        if isinstance(other, Scalar):
            return self.tracer._mk("mul_pub", (self,), other, self.shape)
        if isinstance(other, TracedPublic):
            return self.tracer._mk("mul_pubv", (self, other), None,
                                   self.shape)
        other = self._lift(other)
        if other is NotImplemented:
            return NotImplemented
        assert other.shape == self.shape, "traced mul requires equal shapes"
        return self.tracer._mk("mul", (self, other), None, self.shape)

    __rmul__ = __mul__

    def inverse(self):
        return self.tracer._mk("inv", (self,), None, self.shape)

    def pow(self, e: int) -> "TracedShare":
        """Public-exponent power by square-and-multiply: the mul nodes land
        on consecutive levels, so a BATCH of pows shares one Beaver round
        per squaring step (the windowed form of `context.pow`)."""
        e = int(e)
        if e == 0:
            return (self * Scalar.from_ints(0)) + Scalar.from_ints(1)
        result, base = None, self
        while e:
            if e & 1:
                result = base if result is None else result * base
            e >>= 1
            if e:
                base = base * base
        return result

    __pow__ = pow

    def sum(self):
        return self.tracer._mk("sum", (self,), None, ())

    def open(self) -> "TracedOpen":
        return self.tracer.open(self)


@dataclass(eq=False)
class TracedOpen:
    """Handle to a value that will be opened at flush time.

    `as_public()` turns the (future) opened value into a `TracedPublic`
    usable in LATER traced computation — the reference fabric's arbitrary
    dataflow through opens (`fabric.rs:820-870`).  Opens that feed later
    levels flush mid-circuit at their communication level; terminal opens
    still flush together once at the end."""

    source: TracedShare
    value: Scalar | None = None
    node: object = None  # the "open" _Node, once as_public() materializes it

    def as_public(self) -> "TracedPublic":
        if self.node is None:
            self.node = _Node("open", (self.source.node,), None,
                              self.source.node.shape)
        return TracedPublic(self.source.tracer, self.node,
                            self.source.shape)


class TracedPublic:
    """Symbolic PUBLIC value inside a trace (an opened value or a function
    of one).  All arithmetic is communication-free; `apply` lifts any
    Scalar -> Scalar function (e.g. `Scalar.inverse`, prefix scans)."""

    def __init__(self, tracer: "Tracer", node: _Node, shape: tuple):
        self.tracer = tracer
        self.node = node
        self.shape = shape

    def _lift(self, other):
        if isinstance(other, TracedPublic):
            return other
        if isinstance(other, Scalar):
            return TracedPublic(
                self.tracer, _Node("pub_c", (), other, tuple(other.shape)),
                other.shape)
        return None

    def __add__(self, other):
        if isinstance(other, TracedShare):
            return other + self
        o = self._lift(other)
        if o is None:
            return NotImplemented
        return TracedPublic(self.tracer,
                            _Node("pub_add", (self.node, o.node), None,
                                  self.node.shape), self.shape)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, TracedShare):
            return self.tracer._mk("rsub_pubv", (other, self), None,
                                   other.shape)
        o = self._lift(other)
        if o is None:
            return NotImplemented
        return TracedPublic(self.tracer,
                            _Node("pub_sub", (self.node, o.node), None,
                                  self.node.shape), self.shape)

    def __neg__(self):
        return TracedPublic(self.tracer,
                            _Node("pub_neg", (self.node,), None,
                                  self.node.shape), self.shape)

    def __mul__(self, other):
        if isinstance(other, TracedShare):
            return other * self
        o = self._lift(other)
        if o is None:
            return NotImplemented
        return TracedPublic(self.tracer,
                            _Node("pub_mul", (self.node, o.node), None,
                                  self.node.shape), self.shape)

    __rmul__ = __mul__

    def apply(self, fn, shape=None) -> "TracedPublic":
        """Arbitrary public post-processing of an opened value: `fn` maps
        the concrete `Scalar` to a `Scalar` at flush time."""
        shape = self.shape if shape is None else shape
        return TracedPublic(self.tracer,
                            _Node("pub_fn", (self.node,), fn, tuple(shape)),
                            shape)

    def inverse(self) -> "TracedPublic":
        return self.apply(lambda s: s.inverse())


class TracedPointShare:
    """Symbolic authenticated point batch inside a traced circuit
    (the `AuthenticatedPointResult` role).  Linear ops are free; scalar x
    point Beaver multiplications fuse per communication level like scalar
    muls; point opens flush together."""

    def __init__(self, tracer: "Tracer", node: _Node, shape: tuple):
        self.tracer = tracer
        self.node = node
        self.shape = shape

    def __add__(self, other: "TracedPointShare"):
        return self.tracer._mkp("padd", (self, other), None, self.shape)

    def __sub__(self, other: "TracedPointShare"):
        return self.tracer._mkp("psub", (self, other), None, self.shape)

    def __neg__(self):
        return self.tracer._mkp("pneg", (self,), None, self.shape)

    def mul_public(self, k: Scalar):
        return self.tracer._mkp("pmul_pub", (self,), k, self.shape)

    def mul(self, scalar: TracedShare):
        """[x] * [P] via the generator-trick Beaver protocol; fused with
        other level-mates into one round."""
        assert scalar.shape == self.shape
        return self.tracer._mkp("pmul", (self, scalar), None, self.shape)

    def sum(self):
        return self.tracer._mkp("psum", (self,), None, ())

    def open(self) -> "TracedPointOpen":
        handle = TracedPointOpen(self)
        self.tracer.point_opens.append(handle)
        return handle


@dataclass(eq=False)
class TracedPointOpen:
    source: TracedPointShare
    value: object | None = None  # CurvePoint after run()


class Tracer:
    """Collects a circuit, then executes it round-by-round."""

    def __init__(self, fabric: MpcFabric):
        self.fabric = fabric
        self.opens: list[TracedOpen] = []
        self.point_opens: list[TracedPointOpen] = []

    def wrap(self, share: ScalarShare) -> TracedShare:
        return TracedShare(
            self, _Node("input", (), share, tuple(share.shape)), share.shape
        )

    def wrap_points(self, share) -> TracedPointShare:
        return TracedPointShare(
            self, _Node("pinput", (), share, tuple(share.shape)), share.shape
        )

    def _mk(self, op, deps, payload, shape) -> TracedShare:
        node = _Node(op, tuple(d.node for d in deps), payload, tuple(shape))
        return TracedShare(self, node, shape)

    def _mkp(self, op, deps, payload, shape) -> TracedPointShare:
        node = _Node(op, tuple(d.node for d in deps), payload, tuple(shape))
        return TracedPointShare(self, node, shape)

    def open(self, ts: TracedShare) -> TracedOpen:
        handle = TracedOpen(ts)
        self.opens.append(handle)
        return handle

    # -- execution ---------------------------------------------------------
    def run(self, outputs: list[TracedShare] | None = None,
            verify: bool = True) -> list[ScalarShare]:
        """Evaluate the circuit: fuse per-round muls/invs, flush opens once,
        run ONE deferred MAC check at the end (when `verify`)."""
        outputs = outputs or []
        roots = ([o.node for o in outputs]
                 + [(h.node or h.source.node) for h in self.opens]
                 + [h.source.node for h in self.point_opens])

        depth: dict[int, int] = {}
        order: list[_Node] = []
        seen: set[int] = set()
        COMM = ("mul", "inv", "pmul", "open")

        # Iterative post-order traversal (the reference tests 1M-gate
        # chains, `fabric.rs:986-1002`; recursion would blow the Python
        # stack at ~1k depth).
        stack: list[tuple[_Node, bool]] = [(r, False) for r in roots]
        while stack:
            n, ready = stack.pop()
            if ready:
                dd = max((depth[d.nid] for d in n.deps), default=0)
                depth[n.nid] = dd + (1 if n.op in COMM else 0)
                order.append(n)
                continue
            if n.nid in seen:
                continue
            seen.add(n.nid)
            stack.append((n, True))
            for d in n.deps:
                if d.nid not in seen:
                    stack.append((d, False))

        values: dict[int, object] = {}
        max_depth = max(depth.values(), default=0)

        def apply_op(n: _Node, deps: list) -> object:
            if n.op in ("input", "pinput"):
                return n.payload
            if n.op in ("add", "padd"):
                return deps[0] + deps[1]
            if n.op in ("sub", "psub"):
                return deps[0] - deps[1]
            if n.op in ("neg", "pneg"):
                return -deps[0]
            if n.op in ("mul_pub", "pmul_pub"):
                return deps[0].mul_public(n.payload)
            if n.op == "add_pub":
                return deps[0].add_public(
                    n.payload, self.fabric.mac_key, self.fabric.party_id)
            if n.op in ("sum", "psum"):
                return deps[0].sum()
            # share (x) opened-public ops
            if n.op == "mul_pubv":
                return deps[0].mul_public(deps[1])
            if n.op == "add_pubv":
                return deps[0].add_public(
                    deps[1], self.fabric.mac_key, self.fabric.party_id)
            if n.op == "sub_pubv":
                return deps[0].add_public(
                    -deps[1], self.fabric.mac_key, self.fabric.party_id)
            if n.op == "rsub_pubv":
                return (-deps[0]).add_public(
                    deps[1], self.fabric.mac_key, self.fabric.party_id)
            # public-value ops (concrete Scalars at flush time)
            if n.op == "pub_c":
                return n.payload
            if n.op == "pub_add":
                return deps[0] + deps[1]
            if n.op == "pub_sub":
                return deps[0] - deps[1]
            if n.op == "pub_neg":
                return -deps[0]
            if n.op == "pub_mul":
                return deps[0] * deps[1]
            if n.op == "pub_fn":
                return n.payload(deps[0])
            # mul/inv/pmul/open are flushed by the round loop
            raise AssertionError(f"comm node {n.op} not yet flushed")

        def eval_local(n: _Node):
            """Evaluate communication-free nodes (memoized, iterative)."""
            if n.nid in values:
                return values[n.nid]
            st = [n]
            while st:
                cur = st[-1]
                if cur.nid in values:
                    st.pop()
                    continue
                pending = [d for d in cur.deps if d.nid not in values]
                if pending:
                    st.extend(pending)
                    continue
                st.pop()
                values[cur.nid] = apply_op(
                    cur, [values[d.nid] for d in cur.deps])
            return values[n.nid]

        # round-by-round: batch ALL muls (and invs) of one depth level into
        # single fused protocol calls; mid-circuit opens (materialized via
        # `TracedOpen.as_public`) flush per level as ONE authenticated open.
        # Bucket comm nodes by (level, op) once — a scan of `order` per
        # level is quadratic in circuit depth (the reference exercises
        # 10k-deep mul chains, `circuit_mul_throughput.rs:11-44`).
        by_level: dict[int, dict[str, list[_Node]]] = {}
        for n in order:
            if n.op in COMM:
                by_level.setdefault(
                    depth[n.nid], {}).setdefault(n.op, []).append(n)

        for level in range(1, max_depth + 1):
            lv = by_level.get(level, {})
            mids = lv.get("open", [])
            if mids:
                flat = [eval_local(n.deps[0]).reshape(_numel(n))
                        for n in mids]
                sizes = [s.size for s in flat]
                opened = self.fabric.open_authenticated(
                    ScalarShare.concatenate(flat), defer=True)
                off = 0
                for n, k in zip(mids, sizes):
                    values[n.nid] = opened[off: off + k].reshape(*n.shape)
                    off += k
            muls = lv.get("mul", [])
            invs = lv.get("inv", [])
            if muls:
                lhs = [eval_local(n.deps[0]).reshape(_numel(n)) for n in muls]
                rhs = [eval_local(n.deps[1]).reshape(_numel(n)) for n in muls]
                big = self.fabric.mul(
                    ScalarShare.concatenate(lhs), ScalarShare.concatenate(rhs)
                )
                off = 0
                for n in muls:
                    k = _numel(n)
                    values[n.nid] = big[off : off + k]
                    off += k
            if invs:
                xs = [eval_local(n.deps[0]).reshape(_numel(n)) for n in invs]
                big = self.fabric.inverse(
                    ScalarShare.concatenate(xs), defer_check=True
                )
                off = 0
                for n in invs:
                    k = _numel(n)
                    values[n.nid] = big[off : off + k]
                    off += k
            pmuls = lv.get("pmul", [])
            if pmuls:
                from ..algebra.point_share import PointShare

                pts = [eval_local(n.deps[0]).reshape(_numel(n))
                       for n in pmuls]
                scs = [eval_local(n.deps[1]).reshape(_numel(n))
                       for n in pmuls]
                big = self.fabric.mul_points(
                    ScalarShare.concatenate(scs), PointShare.concatenate(pts)
                )
                off = 0
                for n in pmuls:
                    k = _numel(n)
                    values[n.nid] = big[off : off + k]
                    off += k

        # one coalesced open flush for everything still unopened (handles
        # whose open node already flushed mid-circuit just read the value)
        terminal = [h for h in self.opens
                    if h.node is None or h.node.nid not in values]
        for h in self.opens:
            if h.node is not None and h.node.nid in values:
                h.value = values[h.node.nid]
        if terminal:
            flat = [
                eval_local(h.source.node).reshape(_numel(h.source.node))
                for h in terminal
            ]
            sizes = [s.size for s in flat]
            opened = self.fabric.open_authenticated(
                ScalarShare.concatenate(flat), defer=True
            )
            off = 0
            for h, k in zip(terminal, sizes):
                h.value = opened[off : off + k].reshape(*h.source.shape)
                off += k
        if self.point_opens:
            from ..algebra.point_share import PointShare

            flatp = [
                eval_local(h.source.node).reshape(_numel(h.source.node))
                for h in self.point_opens
            ]
            sizes = [p.size for p in flatp]
            opened_p = self.fabric.open_authenticated_points(
                PointShare.concatenate(flatp), defer=True
            )
            off = 0
            for h, k in zip(self.point_opens, sizes):
                h.value = opened_p[(slice(off, off + k),)].reshape(
                    *h.source.shape)
                off += k
        if verify:
            self.fabric.verify_deferred()
        return [eval_local(o.node) for o in outputs]


def _numel(n: _Node) -> int:
    size = 1
    for d in n.shape:
        size *= int(d)
    return size
