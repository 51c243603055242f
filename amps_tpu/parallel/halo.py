"""Halo exchange for overlap-save streaming over a sharded time axis.

Each time shard holds a contiguous block of samples; streaming FIRs,
channelizers, and burst correlators need the previous shard's tail
(ntaps-1, L-P, or trigger+capture samples).  The exchange is one
``jax.lax.ppermute`` hop over ICI — the ring-neighbor pattern
(SURVEY.md §2 'sequence-parallel' row).  Inside shard_map only.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _axis_size(axis_name) -> int:
    if isinstance(axis_name, (tuple, list)):
        out = 1
        for a in axis_name:
            out *= lax.axis_size(a)
        return out
    return lax.axis_size(axis_name)


def _axis_index(axis_name):
    """Linearized index over one axis name or a tuple (row-major in the
    order given — matches ppermute's linearization for tuple names)."""
    if isinstance(axis_name, (tuple, list)):
        idx = lax.axis_index(axis_name[0])
        for a in axis_name[1:]:
            idx = idx * lax.axis_size(a) + lax.axis_index(a)
        return idx
    return lax.axis_index(axis_name)


def halo_exchange_left(x, n: int, axis_name, sample_axis: int = 0):
    """Prepend each shard with the last ``n`` samples of its LEFT neighbor.

    x: the local block, samples along ``sample_axis``.
    ``axis_name`` may be a tuple of mesh axes — the shards then form one
    flattened ring (row-major in the order given).
    Shard 0 receives zeros (cold stream start).  Returns an array with
    ``n`` extra samples at the front of ``sample_axis``.
    """
    size = _axis_size(axis_name)
    tail = lax.slice_in_dim(x, x.shape[sample_axis] - n,
                            x.shape[sample_axis], axis=sample_axis)
    if size == 1:
        halo = jnp.zeros_like(tail)
    else:
        # send my tail to my right neighbor (i -> i+1); no wraparound
        perm = [(i, i + 1) for i in range(size - 1)]
        halo = lax.ppermute(tail, axis_name, perm)
        # shard 0 got nothing: ppermute leaves zeros for missing sources
    idx = _axis_index(axis_name)
    halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
    return lax.concatenate([halo, x], dimension=sample_axis)


def halo_exchange_left_carry(x, n: int, axis_name, carry,
                             sample_axis: int = 0):
    """Streaming halo: like ``halo_exchange_left`` but shard 0 receives
    ``carry`` (the previous BLOCK's global tail, replicated) instead of
    zeros — successive sharded blocks then form one continuous stream
    (the shard_map mirror of the single-device streamer's carried
    history, runtime/streamer.py)."""
    size = _axis_size(axis_name)
    carry = jnp.asarray(carry, x.dtype)
    if size == 1:
        return lax.concatenate([carry, x], dimension=sample_axis)
    tail = lax.slice_in_dim(x, x.shape[sample_axis] - n,
                            x.shape[sample_axis], axis=sample_axis)
    perm = [(i, i + 1) for i in range(size - 1)]
    halo = lax.ppermute(tail, axis_name, perm)
    idx = _axis_index(axis_name)
    halo = jnp.where(idx == 0, carry, halo)
    return lax.concatenate([halo, x], dimension=sample_axis)


def overlap_add_with_carry(x, tail, axis_name, carry, sample_axis: int = 0):
    """Streaming overlap-add: like ``add_tail_to_right`` but shard 0
    adds ``carry`` (the previous block's final tail) onto its head, and
    the caller is expected to emit the LAST shard's ``tail`` as the next
    block's carry (this function, like add_tail_to_right, drops it)."""
    size = _axis_size(axis_name)
    n = tail.shape[sample_axis]
    carry = jnp.asarray(carry, x.dtype)
    if size == 1:
        recv = carry
    else:
        perm = [(i, i + 1) for i in range(size - 1)]
        recv = lax.ppermute(tail, axis_name, perm)
        idx = _axis_index(axis_name)
        recv = jnp.where(idx == 0, carry, recv)
    head = lax.slice_in_dim(x, 0, n, axis=sample_axis) + recv
    rest = lax.slice_in_dim(x, n, x.shape[sample_axis], axis=sample_axis)
    return lax.concatenate([head, rest], dimension=sample_axis)


def add_tail_to_right(x, tail, axis_name, sample_axis: int = 0):
    """Overlap-add across shards: each shard's ``tail`` (the carry of a
    streaming overlap-add, e.g. the synthesis channelizer's last L-P
    samples) is sent to the RIGHT neighbor and added onto the head of its
    block.  Shard 0 receives nothing; the last shard's tail is dropped
    (stream is truncated there, as at any stream end)."""
    size = _axis_size(axis_name)
    n = tail.shape[sample_axis]
    if size == 1:
        return x
    perm = [(i, i + 1) for i in range(size - 1)]
    recv = lax.ppermute(tail, axis_name, perm)
    idx = _axis_index(axis_name)
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    head = lax.slice_in_dim(x, 0, n, axis=sample_axis) + recv
    rest = lax.slice_in_dim(x, n, x.shape[sample_axis], axis=sample_axis)
    return lax.concatenate([head, rest], dimension=sample_axis)
