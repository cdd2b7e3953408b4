"""Whole-batch dispatch for Pallas kernels, safe under any JAX transform.

Several hot ops (CG contact solve, SPD inverse, convex/box-box narrowphase)
have two implementations: an unbatched XLA reference (single env, CPU
conformance) and a fused Pallas kernel that wants the WHOLE env batch at
once with the batch on the TPU lane axis. Earlier rounds switched between
them with `jax.custom_batching.custom_vmap`; that mechanism asserts its
staged call carries no batched closure constants, which is violated as soon
as the call sits inside a `lax.cond` branch that is itself vmapped (JAX
converts the cond to a select and the branch closure leaks batched consts).
That broke `jax.vmap(reach_env.step)` — the goal-resample branch steps the
physics inside `lax.cond` — on every backend (round-4 regression).

This module provides the same dispatch via a real `jax.extend.core.Primitive`
with a registered batching rule. Primitive batching passes every batched
value as an explicit operand, so cond→select conversion, nested vmap, and
shard_map all compose.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.extend as jex
import jax.numpy as jnp
from jax.interpreters import batching, mlir

_MADE = {}


def make_batched_dispatch(
    name: str,
    ref: Callable[..., Sequence[jax.Array]],
    batched_impl: Callable[..., Sequence[jax.Array]],
    single_output: bool = False,
) -> Callable[..., tuple]:
    """Return a function semantically equal to ``ref`` whose vmap sends the
    whole batch to ``batched_impl``.

    ``ref``          — unbatched per-env fn(*arrays) -> array or tuple.
    ``batched_impl`` — fn over the same arrays with a uniform leading batch
                       axis on EVERY operand, returning outputs with a
                       leading batch axis. Unbatched operands are broadcast
                       before the call (matching the old custom_vmap rules).

    Both callables must be const-free w.r.t. tracers (close only over
    statics), same contract as before. Callers are expected to cache the
    result (lru factories); duplicate names are tolerated — a primitive's
    name is a label, not an identity.
    """

    def _ref_tuple(*args):
        out = ref(*args)
        return tuple(out) if isinstance(out, (tuple, list)) else (out,)

    p = jex.core.Primitive(name)
    p.multiple_results = True
    p.def_impl(_ref_tuple)

    def _abstract(*avals):
        out = jax.eval_shape(
            _ref_tuple,
            *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in avals],
        )
        return tuple(jax.core.ShapedArray(o.shape, o.dtype) for o in out)

    p.def_abstract_eval(_abstract)
    mlir.register_lowering(p, mlir.lower_fun(_ref_tuple, multiple_results=True))

    def _batch(args, dims):
        size = next(
            a.shape[d]
            for a, d in zip(args, dims)
            if d is not batching.not_mapped
        )

        def to_front(a, d):
            if d is batching.not_mapped:
                return jnp.broadcast_to(a[None], (size,) + a.shape)
            return jnp.moveaxis(a, d, 0)

        args = [to_front(a, d) for a, d in zip(args, dims)]
        out = batched_impl(*args)
        out = tuple(out) if isinstance(out, (tuple, list)) else (out,)
        return out, (0,) * len(out)

    batching.primitive_batchers[p] = _batch

    def bound(*args):
        out = p.bind(*[jnp.asarray(a) for a in args])
        return out[0] if single_output else out

    _MADE[name] = bound
    return bound
