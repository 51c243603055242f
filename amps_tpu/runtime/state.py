"""Checkpoint/resume for streaming pipeline state.

The reference has no persistence (SURVEY.md §5: state = current frame
index + queues, lost on exit).  Here every long-running streaming object
can dump its carried DSP state + queues to one .npz and resume
mid-stream: receivers keep filter history/hop parity/dedup tracking,
transmitters keep phase accumulators, synthesis carries, and undelivered
word queues.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def save_receiver(path: str, rx) -> None:
    """MultichannelReceiver -> .npz"""
    np.savez(
        path,
        kind="receiver",
        hist=np.asarray(rx._hist),
        parity=np.asarray(rx._parity),
        carry=np.asarray(rx._carry),
        prev=np.asarray(rx._prev),
        abs_base=np.int64(rx._abs_base),
        last_seen=rx._last_seen,
    )


def load_receiver(path: str, rx) -> None:
    z = np.load(path, allow_pickle=False)
    assert str(z["kind"]) == "receiver"
    rx._hist = jnp.asarray(z["hist"])
    rx._parity = jnp.asarray(z["parity"])
    rx._carry = jnp.asarray(z["carry"])
    rx._prev = jnp.asarray(z["prev"])
    rx._abs_base = int(z["abs_base"])
    rx._last_seen = z["last_seen"].copy()


def save_transmitter(path: str, tx) -> None:
    """MultichannelTransmitter -> .npz (incl. per-channel FOCC queues)."""
    payload: Dict[str, np.ndarray] = {
        "kind": np.asarray("transmitter"),
        "carry": np.asarray(tx._state.carry),
        "hop_idx": np.int64(tx._state.hop_idx),
        "channels": np.asarray(sorted(tx.focc.keys()), np.int64),
    }
    for k, st in tx.focc.items():
        payload[f"accum_{k}"] = np.int64(tx._accum[k])
        with st._lock:
            q = list(st._queue)
        payload[f"queue_{k}"] = (np.stack(q) if q
                                 else np.zeros((0, 2, 28), np.uint8))
    np.savez(path, **payload)


def load_transmitter(path: str, tx) -> None:
    from amps_tpu.dsp.channelizer import SynthesizerState

    z = np.load(path, allow_pickle=False)
    assert str(z["kind"]) == "transmitter"
    tx._state = SynthesizerState(jnp.asarray(z["carry"]),
                                 int(z["hop_idx"]))
    for k in z["channels"]:
        k = int(k)
        tx._accum[k] = int(z[f"accum_{k}"])
        st = tx.focc[k]
        with st._lock:
            st._queue.clear()
            for pair in z[f"queue_{k}"]:
                st._queue.append(pair.copy())
