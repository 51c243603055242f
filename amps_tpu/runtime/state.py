"""Checkpoint/resume for streaming pipeline state.

The reference has no persistence (SURVEY.md §5: state = current frame
index + queues, lost on exit).  Here every long-running streaming object
can dump its carried DSP state + queues to one .npz and resume
mid-stream: receivers keep filter history/hop parity/dedup tracking,
transmitters keep phase accumulators, synthesis carries, and undelivered
word queues.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp


def snapshot_receiver(rx) -> Dict[str, np.ndarray]:
    """MultichannelReceiver carried state as host arrays (the in-memory
    form save_receiver persists; also the unit of elastic recovery,
    runtime/resilient.py).

    Refuses a receiver with UNDRAINED in-flight blocks (pipeline_depth
    > 1 mid-stream): the DSP state has already advanced past them while
    the host dedup/supervision state has not, so a restore would drop
    their reports forever and resume inconsistently — drain first
    (flush()) or run the checkpointed stream at depth 1 (as
    ResilientReceiver does)."""
    if getattr(rx, "_inflight", None):
        raise ValueError(
            f"receiver has {len(rx._inflight)} undrained in-flight "
            "block(s); flush() before snapshotting (r5 review finding)")
    residue = getattr(rx, "_residue", None)
    if residue is not None and int(residue.shape[0]):
        raise ValueError(
            "receiver has a buffered sub-hop input residue; flush() "
            "before snapshotting")
    return {
        "kind": np.asarray("receiver"),
        "hist": np.asarray(rx._hist),
        "parity": np.asarray(rx._parity),
        "carry": np.asarray(rx._carry),
        "prev": np.asarray(rx._prev),
        "abs_base": np.int64(rx._abs_base),
        "last_seen": rx._last_seen.copy(),
        "pw_carry": np.asarray(rx._pw_carry),
        "sup_carry": (rx._sup_carry.copy() if rx._sup_carry is not None
                      else np.zeros((0, 0), np.float32)),
    }


def restore_receiver(snap, rx) -> None:
    assert str(snap["kind"]) == "receiver"
    rx._hist = jnp.asarray(snap["hist"])
    rx._parity = int(snap["parity"])   # host int: static jit arg
    rx._carry = jnp.asarray(snap["carry"])
    rx._prev = jnp.asarray(snap["prev"])
    rx._abs_base = int(snap["abs_base"])
    rx._last_seen = np.asarray(snap["last_seen"]).copy()
    if "pw_carry" in snap:   # older checkpoints: keep the fresh zeros
        rx._pw_carry = jnp.asarray(snap["pw_carry"])
    if "sup_carry" in snap and rx._sup_carry is not None:
        sc = np.asarray(snap["sup_carry"], np.float32)
        if sc.shape[0] == rx._sup_carry.shape[0]:
            rx._sup_carry = sc.copy()


def save_receiver(path: str, rx) -> None:
    """MultichannelReceiver -> .npz"""
    np.savez(path, **snapshot_receiver(rx))


def load_receiver(path: str, rx) -> None:
    z = np.load(path, allow_pickle=False)
    restore_receiver(z, rx)


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
            deferred = list(st._deferred)
            busy = st._busy_superframes
        payload[f"queue_{k}"] = (np.stack(q) if q
                                 else np.zeros((0, 2, 28), np.uint8))
        payload[f"busy_{k}"] = np.int64(busy)
        payload[f"deferred_n_{k}"] = np.asarray(
            [n for n, _ in deferred], np.int64)
        payload[f"deferred_{k}"] = (np.stack([p_ for _, p_ in deferred])
                                    .astype(np.uint8) if deferred
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
            st._busy_superframes = (int(z[f"busy_{k}"])
                                    if f"busy_{k}" in z else 0)
            # same missing-key policy as busy: an old checkpoint means
            # "no deferred repeats", never "keep whatever was there"
            st._deferred = ([
                (int(n), pair.copy()) for n, pair in
                zip(z[f"deferred_n_{k}"], z[f"deferred_{k}"])]
                if f"deferred_{k}" in z else [])


_SUP_STATES = ("idle", "alerting", "conversation", "released")


def save_station(path: str, bs, sources: Optional[dict] = None) -> None:
    """BaseStation -> .npz: FOCC word queue, FVC burst/timer/offset,
    mutes, and per-voice-channel supervision timers.  Together with
    save_receiver/save_transmitter this checkpoints the whole
    base station; a loaded station continues the exact symbol streams
    and supervision timeline (tests/test_state.py).  The event log is
    history, not operational state, and is not persisted.

    ``sources``: optional {slot_or_chan: VoiceFvcSlot} map — the voice
    slots' modulator continuity state (FVC FM accumulator, voice FM
    phase, SAT tone clock, and a looping WavAudioSource offset) joins
    the checkpoint so the resumed TX waveform has no FM phase step or
    SAT phase discontinuity (r5 review finding; pass the same map to
    load_station)."""
    payload: Dict[str, np.ndarray] = {
        "kind": np.asarray("station"),
        "fvc_mute": np.int64(bs.fvc_mute),
        "audio_mute": np.int64(bs.audio_mute),
    }
    if sources:
        keys = sorted(sources)
        payload["src_keys"] = np.asarray(keys, np.int64)
        for k in keys:
            s = sources[k]
            wav_off = getattr(getattr(s, "audio_source", None), "_off", -1)
            payload[f"src_{k}"] = np.asarray(
                [s._fvc_accum, s._voice_phase, s._t, wav_off], np.float64)
    with bs.focc._lock:
        q = list(bs.focc._queue)
        busy = bs.focc._busy_superframes
        deferred = list(bs.focc._deferred)
    payload["focc_queue"] = (np.stack(q).astype(np.uint8) if q
                             else np.zeros((0, 2, 28), np.uint8))
    payload["focc_busy"] = np.int64(busy)
    payload["focc_deferred_n"] = np.asarray([n for n, _ in deferred],
                                            np.int64)
    payload["focc_deferred"] = (np.stack([p_ for _, p_ in deferred])
                                .astype(np.uint8) if deferred
                                else np.zeros((0, 2, 28), np.uint8))
    with bs.fvc._lock:
        burst = bs.fvc._burst
        payload["fvc_burst"] = (np.asarray(burst, np.int8) if burst is not None
                                else np.zeros(0, np.int8))
        payload["fvc_has_burst"] = np.int64(burst is not None)
        payload["fvc_timer"] = np.int64(bs.fvc._timer)
        payload["fvc_off"] = np.int64(bs.fvc._off)
    chans = sorted(bs.supervisors)
    payload["sup_channels"] = np.asarray(chans, np.int64)
    for c in chans:
        s = bs.supervisors[c]
        payload[f"sup_{c}"] = np.asarray(
            [_SUP_STATES.index(s.state), s.t, s._sat_loss_t, s._st_run_t,
             s._alert_t, float(s._st_seen_in_alert),
             s._st_quiet_t, s._conv_run_snap], np.float64)
    # per-channel FVC streams + mute pairs (per_channel_fvc stations)
    fchans = sorted(getattr(bs, "fvc_streams", {}))
    payload["fvc_channels"] = np.asarray(fchans, np.int64)
    for c in fchans:
        st = bs.fvc_streams[c]
        with st._lock:
            burst = st._burst
            payload[f"fvcch_{c}"] = (np.asarray(burst, np.int8)
                                     if burst is not None
                                     else np.zeros(0, np.int8))
            payload[f"fvcch_meta_{c}"] = np.asarray(
                [int(burst is not None), st._timer, st._off,
                 int(bs.fvc_mutes.get(c, True)),
                 int(bs.audio_mutes.get(c, False))], np.int64)
    np.savez(path, **payload)


def load_station(path: str, bs, sources: Optional[dict] = None) -> None:
    """Restore into a freshly constructed BaseStation (same configs).
    ``sources``: the same slot map given to save_station, to restore
    voice-slot modulator continuity."""
    from amps_tpu.control.supervision import ChannelSupervisor

    z = np.load(path, allow_pickle=False)
    assert str(z["kind"]) == "station"
    if sources and "src_keys" in z:
        for k in z["src_keys"]:
            k = int(k)
            if k not in sources:
                continue
            accum, phase, t, wav_off = np.asarray(z[f"src_{k}"],
                                                  np.float64)
            s = sources[k]
            s._fvc_accum = int(accum)
            s._voice_phase = float(phase)
            s._t = float(t)
            if wav_off >= 0 and getattr(s, "audio_source", None) is not None \
                    and hasattr(s.audio_source, "_off"):
                s.audio_source._off = int(wav_off)
    bs.fvc_mute = bool(z["fvc_mute"])
    bs.audio_mute = bool(z["audio_mute"])
    with bs.focc._lock:
        bs.focc._queue.clear()
        for pair in z["focc_queue"]:
            bs.focc._queue.append(pair.copy())
        bs.focc._busy_superframes = int(z["focc_busy"]) \
            if "focc_busy" in z else 0
        bs.focc._deferred = ([
            (int(n), pair.copy()) for n, pair in
            zip(z["focc_deferred_n"], z["focc_deferred"])]
            if "focc_deferred" in z else [])
    with bs.fvc._lock:
        bs.fvc._burst = (z["fvc_burst"].copy() if bool(z["fvc_has_burst"])
                         else None)
        bs.fvc._timer = int(z["fvc_timer"])
        bs.fvc._off = int(z["fvc_off"])
    if "fvc_channels" in z and getattr(bs, "per_channel_fvc", False):
        for c in z["fvc_channels"]:
            c = int(c)
            has, timer, off, fmute, amute = (int(v)
                                             for v in z[f"fvcch_meta_{c}"])
            st = bs.fvc_for(c)
            with st._lock:
                st._burst = z[f"fvcch_{c}"].copy() if has else None
                st._timer = timer
                st._off = off
            bs.fvc_mutes[c] = bool(fmute)
            bs.audio_mutes[c] = bool(amute)
    bs.supervisors.clear()
    for c in z["sup_channels"]:
        c = int(c)
        vec = np.asarray(z[f"sup_{c}"], np.float64)
        st_i, t, loss, st_run, alert, seen = vec[:6]
        sup = ChannelSupervisor(c, bs.system.scc, bs.supervision_config,
                                on_event=bs._on_supervision_event,
                                state=_SUP_STATES[int(st_i)])
        sup.t = float(t)
        sup._sat_loss_t = float(loss)
        sup._st_run_t = float(st_run)
        sup._alert_t = float(alert)
        sup._st_seen_in_alert = bool(seen)
        # 7th field (answer drop-confirm run) added r4, 8th field
        # (conversation flash snapshot) added r5; older checkpoints
        # default them to 0
        sup._st_quiet_t = float(vec[6]) if len(vec) > 6 else 0.0
        sup._conv_run_snap = float(vec[7]) if len(vec) > 7 else 0.0
        bs.supervisors[c] = sup


def snapshot_sharded_receiver(rx) -> Dict[str, np.ndarray]:
    """parallel/stream.ShardedReceiver (or ShardedTransceiver) carried
    state as host arrays — the sharded mirror of snapshot_receiver.
    The device state dict (analyzer history, per-channel IQ halo,
    synthesis carry, hop parities) plus the host report discipline
    (consumed-sample counter, dedup tracking)."""
    snap: Dict[str, np.ndarray] = {
        "kind": np.asarray("sharded_receiver"),
        "nh_done": np.int64(rx._nh_done),
        "last_seen": rx._last_seen.copy(),
        "last_block_len": np.int64(rx._last_block_len),
        "flushed": np.int64(rx._flushed),
    }
    if getattr(rx, "_sup_carry", None) is not None:
        # sub-frame supervision leftover: without it a resume drops up
        # to one 10 ms frame and SAT/ST timers drift by that much
        snap["sup_carry"] = rx._sup_carry.copy()
    for k, v in rx._state.items():
        snap[f"st_{k}"] = np.asarray(v)
    return snap


def restore_sharded_receiver(snap, rx) -> None:
    """Restore into a freshly constructed ShardedReceiver with the same
    mesh/spec; the resumed stream is indistinguishable from an
    uninterrupted one (tests/test_state.py)."""
    assert str(snap["kind"]) == "sharded_receiver"
    rx._nh_done = int(snap["nh_done"])
    rx._last_seen = np.asarray(snap["last_seen"]).copy()
    rx._last_block_len = int(snap["last_block_len"])
    rx._flushed = bool(snap["flushed"])
    keys = snap.files if hasattr(snap, "files") else snap.keys()
    if "sup_carry" in keys and getattr(rx, "_sup_carry", None) is not None:
        sc = np.asarray(snap["sup_carry"], np.float32)
        if sc.shape[0] == rx._sup_carry.shape[0]:
            rx._sup_carry = sc.copy()
    rx._state = {k[3:]: jnp.asarray(snap[k]) for k in snap.files
                 if k.startswith("st_")} if hasattr(snap, "files") else {
        k[3:]: jnp.asarray(v) for k, v in snap.items()
        if k.startswith("st_")}


def save_sharded_receiver(path: str, rx) -> None:
    np.savez(path, **snapshot_sharded_receiver(rx))


def load_sharded_receiver(path: str, rx) -> None:
    z = np.load(path, allow_pickle=False)
    restore_sharded_receiver(z, rx)
