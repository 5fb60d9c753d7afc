"""Self-contained Standard MIDI File I/O.

The environment ships no MIDI library, so the framework owns its MIDI codec.
Semantics match the reference's use of pretty_midi (reference:
etude/data/tokenizer.py:498-525 writes note lists; evaluation reads non-drum
note onsets, etude/evaluation/metrics/base_metric.py:8-29): notes carry
absolute onset/offset seconds, tempo maps are honored on read, and writes emit
a single-instrument format-1 file at 120 BPM so event decoding is
deterministic and bit-stable.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, List, Union

TICKS_PER_QUARTER = 480
DEFAULT_USEC_PER_QUARTER = 500_000  # 120 BPM


# --------------------------------------------------------------------- write
def _varint(value: int) -> bytes:
    """Encode a MIDI variable-length quantity."""
    if value < 0:
        raise ValueError(f"negative delta time: {value}")
    chunks = [value & 0x7F]
    value >>= 7
    while value:
        chunks.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(chunks))


def write_midi(
    notes: List[Dict],
    output_path: Union[str, Path],
    program: int = 0,
) -> None:
    """Write a list of {pitch, onset, offset, velocity} dicts to a .mid file.

    Events are emitted at 480 ticks/quarter, fixed 120 BPM, sorted by
    (tick, note-off-before-note-on, pitch) so output bytes are deterministic
    for a given note list.
    """
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)

    sec_to_tick = TICKS_PER_QUARTER * 1e6 / DEFAULT_USEC_PER_QUARTER

    # (tick, order, status, data1, data2); note-offs sort before note-ons at
    # the same tick so re-struck pitches retrigger cleanly.
    events = []
    for n in notes:
        pitch = int(n["pitch"])
        vel = int(n.get("velocity", 80))
        if not (0 <= pitch < 128):
            continue
        on_tick = max(0, int(round(float(n["onset"]) * sec_to_tick)))
        off_tick = max(on_tick + 1, int(round(float(n["offset"]) * sec_to_tick)))
        events.append((on_tick, 1, 0x90, pitch, max(1, min(127, vel))))
        events.append((off_tick, 0, 0x80, pitch, 0))
    events.sort()

    track = bytearray()
    # Tempo meta event at t=0.
    track += _varint(0) + bytes([0xFF, 0x51, 0x03]) + struct.pack(
        ">I", DEFAULT_USEC_PER_QUARTER
    )[1:]
    # Program change at t=0, channel 0.
    track += _varint(0) + bytes([0xC0, program & 0x7F])

    prev_tick = 0
    for tick, _order, status, d1, d2 in events:
        track += _varint(tick - prev_tick) + bytes([status, d1, d2])
        prev_tick = tick
    # End of track.
    track += _varint(0) + bytes([0xFF, 0x2F, 0x00])

    with open(output_path, "wb") as f:
        f.write(b"MThd" + struct.pack(">IHHH", 6, 1, 1, TICKS_PER_QUARTER))
        f.write(b"MTrk" + struct.pack(">I", len(track)) + bytes(track))


# ---------------------------------------------------------------------- read
def _read_varint(data: bytes, pos: int):
    value = 0
    while True:
        byte = data[pos]
        pos += 1
        value = (value << 7) | (byte & 0x7F)
        if not (byte & 0x80):
            return value, pos


def read_midi_notes(path: Union[str, Path]) -> List[Dict]:
    """Parse a Standard MIDI File into note dicts with absolute-second times.

    Handles format 0/1, running status, tempo changes (applied globally from
    the merged tempo map, as pretty_midi does), and skips channel-10 drums.
    """
    path = Path(path)
    raw = path.read_bytes()
    if raw[:4] != b"MThd":
        raise ValueError(f"not a MIDI file: {path}")
    header_len = struct.unpack(">I", raw[4:8])[0]
    fmt, ntrks, division = struct.unpack(">HHH", raw[8:14])
    if division & 0x8000:
        raise ValueError("SMPTE time division not supported")
    pos = 8 + header_len

    # Pass 1: collect per-track events with absolute ticks.
    tracks = []
    for _ in range(ntrks):
        if raw[pos:pos + 4] != b"MTrk":
            # Skip unknown chunk.
            chunk_len = struct.unpack(">I", raw[pos + 4:pos + 8])[0]
            pos += 8 + chunk_len
            continue
        length = struct.unpack(">I", raw[pos + 4:pos + 8])[0]
        data = raw[pos + 8:pos + 8 + length]
        pos += 8 + length

        events = []
        tick = 0
        p = 0
        running = None
        while p < len(data):
            delta, p = _read_varint(data, p)
            tick += delta
            status = data[p]
            if status < 0x80:
                if running is None:
                    raise ValueError("running status without prior status byte")
                status = running
            else:
                p += 1
            if status == 0xFF:  # meta
                meta_type = data[p]
                mlen, p2 = _read_varint(data, p + 1)
                payload = data[p2:p2 + mlen]
                p = p2 + mlen
                events.append((tick, "meta", meta_type, payload))
                running = None
            elif status in (0xF0, 0xF7):  # sysex
                slen, p2 = _read_varint(data, p)
                p = p2 + slen
                running = None
            else:
                kind = status & 0xF0
                channel = status & 0x0F
                if kind in (0x80, 0x90, 0xA0, 0xB0, 0xE0):
                    d1, d2 = data[p], data[p + 1]
                    p += 2
                elif kind in (0xC0, 0xD0):
                    d1, d2 = data[p], 0
                    p += 1
                else:
                    raise ValueError(f"bad status byte 0x{status:02x}")
                running = status
                events.append((tick, "chan", kind, channel, d1, d2))
        tracks.append(events)

    # Merged global tempo map: list of (tick, usec_per_quarter).
    tempo_changes = [(0, DEFAULT_USEC_PER_QUARTER)]
    for events in tracks:
        for ev in events:
            if ev[1] == "meta" and ev[2] == 0x51 and len(ev[3]) == 3:
                usec = (ev[3][0] << 16) | (ev[3][1] << 8) | ev[3][2]
                tempo_changes.append((ev[0], usec))
    tempo_changes.sort()

    # Precompute absolute seconds at each tempo-change boundary.
    boundaries = []  # (tick, seconds_at_tick, usec_per_quarter)
    sec = 0.0
    prev_tick, prev_usec = tempo_changes[0]
    boundaries.append((prev_tick, 0.0, prev_usec))
    for tick, usec in tempo_changes[1:]:
        sec += (tick - prev_tick) * prev_usec / (division * 1e6)
        boundaries.append((tick, sec, usec))
        prev_tick, prev_usec = tick, usec

    def tick_to_sec(tick: int) -> float:
        b_tick, b_sec, b_usec = boundaries[0]
        for bt, bs, bu in boundaries:
            if bt <= tick:
                b_tick, b_sec, b_usec = bt, bs, bu
            else:
                break
        return b_sec + (tick - b_tick) * b_usec / (division * 1e6)

    # Pass 2: pair note-on/off per (track, channel, pitch).
    notes: List[Dict] = []
    for events in tracks:
        active: Dict[tuple, List[tuple]] = {}
        for ev in events:
            if ev[1] != "chan":
                continue
            tick, _, kind, channel, d1, d2 = ev
            if channel == 9:  # drums
                continue
            if kind == 0x90 and d2 > 0:
                active.setdefault((channel, d1), []).append((tick, d2))
            elif kind == 0x80 or (kind == 0x90 and d2 == 0):
                stack = active.get((channel, d1))
                if stack:
                    on_tick, vel = stack.pop(0)
                    if tick > on_tick:
                        notes.append({
                            "pitch": d1,
                            "onset": tick_to_sec(on_tick),
                            "offset": tick_to_sec(tick),
                            "velocity": vel,
                        })
    notes.sort(key=lambda n: (n["onset"], n["pitch"]))
    return notes
