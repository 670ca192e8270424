"""GSPMD/Shardy partitioning shim for the Pallas kernels.

`pallas_call` is opaque to the SPMD partitioner: jitting a train step
whose hot op is a bare Pallas kernel over batch-sharded inputs compiles
to a full-batch all-gather plus replicated kernel compute on every
device (measured round 4: 37-46 all-gather ops in the unsup step's HLO
on an 8-device mesh vs 0 for the pure-XLA path — correctness yes,
scaling no). The serving path already sidesteps this with an explicit
`shard_map` (parallel/serving.py), but the trainers call the kernels
deep inside jitted steps where no mesh handle is in scope.

This module closes the gap transparently with
`jax.experimental.custom_partitioning`: every fused kernel is
batch-elementwise (grid dim 0 = batch; no cross-batch communication), so
the partitioning rule is trivial — shard the leading batch axis of every
batch-carrying operand/result the way the operands arrive, replicate
everything else, and run the unmodified kernel on each device's local
shard. The registered Shardy sharding rule ties all batch dims to one
factor and marks every other dim `need_replication`, so propagation
never tries to shard a lane/echo/channel axis the kernel can't split.

Design rule this enforces (docs/DESIGN.md): **no bare `pallas_call`
inside a pjit'ed step** — every kernel entry point either goes through
`dp_partitioned` (trainers; this module) or an explicit `shard_map`
(serving, parallel/serving.py).

Kernels with cross-batch accumulation outputs (the ConvLSTM backward's
dk/db) are refactored to per-batch output slots first, so that the sum
over the batch axis happens in XLA outside the kernel — GSPMD turns it
into the all-reduce, and the kernel itself stays batch-elementwise.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _batch_axis(arg_shapes, batch_args):
    """The mesh-axis name sharding the leading batch dim, from the first
    batch-carrying operand that has one (None when unsharded)."""
    for s, is_b in zip(arg_shapes, batch_args):
        if not is_b:
            continue
        spec = s.sharding.spec
        if len(spec) and spec[0] is not None:
            return s.sharding.mesh, spec[0]
    return arg_shapes[0].sharding.mesh, None


def _shardings(mesh, ax, shapes, batch_flags):
    out = []
    for s, is_b in zip(shapes, batch_flags):
        lead = ax if is_b else None
        out.append(NamedSharding(
            mesh, P(lead, *([None] * (len(s.shape) - 1)))))
    return tuple(out)


def _rule(batch_args, arg_ranks, batch_outs, out_ranks):
    """Einsum-style Shardy rule: one shared factor 'b' on every leading
    batch dim, a fresh need-replication factor everywhere else. Factors
    are emitted in first-appearance order (Shardy requires the special-
    factor set sorted by factor index)."""
    need_rep = []
    fresh = iter(f"f{i}" for i in range(256))

    def dims(rank, is_batch):
        out = []
        for d in range(rank):
            if is_batch and d == 0:
                out.append("b")
            else:
                name = next(fresh)
                need_rep.append(name)
                out.append(name)
        return " ".join(out)

    lhs = ", ".join(dims(r, b) for r, b in zip(arg_ranks, batch_args))
    rhs = ", ".join(dims(r, b) for r, b in zip(out_ranks, batch_outs))
    return f"{lhs} -> {rhs}", tuple(need_rep)


def dp_partitioned(impl: Callable, batch_args: Sequence[bool],
                   batch_outs: Sequence[bool]):
    """Wrap `impl(*arrays) -> tuple(arrays)` so GSPMD shards it along the
    leading batch axis instead of all-gathering.

    `impl` must be batch-elementwise: result row b depends only on
    operand rows b (for batch-carrying args) and the replicated args.
    Its jaxpr must be const-free (pass every array as an argument —
    custom_partitioning rejects captured constants), and it is re-traced
    with *local* shapes on each device, so any internal tiling decisions
    must be derivable from the shard shapes (batch-only sharding leaves
    every non-leading dim intact, so H/W-driven tile choices are
    unchanged).

    batch_args / batch_outs: per-operand / per-result flags saying
    whether the leading dim is the batch axis (False = replicated
    operand, e.g. shared kernel weights).
    """
    if os.environ.get("IDEAL_GAN_NO_DP_PARTITION") == "1":
        # Escape hatch / A-B measurement: run the bare launch (single
        # device identical; under DP this reverts to GSPMD's
        # gather+replicate fallback).
        return impl
    batch_args = tuple(batch_args)
    batch_outs = tuple(batch_outs)
    fp = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        mesh_, ax = _batch_axis(arg_shapes, batch_args)
        arg_sh = _shardings(mesh_, ax, arg_shapes, batch_args)
        res = jax.tree.leaves(result_shape)
        out_sh = _shardings(mesh_, ax, res, batch_outs)
        return mesh, impl, out_sh, arg_sh

    def infer(mesh, arg_shapes, result_shape):
        mesh_, ax = _batch_axis(arg_shapes, batch_args)
        res = jax.tree.leaves(result_shape)
        return _shardings(mesh_, ax, res, batch_outs)

    def rule_factory(mesh, value_types, result_types):
        # Called at lowering time with the MLIR operand/result types;
        # may return (rule_string, factor_kwargs).
        rule, need_rep = _rule(batch_args,
                               [len(t.shape) for t in value_types],
                               batch_outs,
                               [len(t.shape) for t in result_types])
        return rule, {"need_replication_factors": need_rep}

    fp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule_factory)
    return fp
