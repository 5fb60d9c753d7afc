"""Simplified-REMI event codec: notes ⇄ bar-structured token events.

Behavioral contract mirrors the reference tokenizer (etude/data/tokenizer.py):
measure grid built from tempo regions with a synthetic pickup bar and trailing
bar, onsets quantized to 8 sub-beat slots, durations snapped to a fixed
16th-note menu, grace-note linking on encode, and glissando reconstruction +
volume-contour velocity synthesis on decode. The implementation is organized
around an explicit MeasureGrid value type instead of mutable tokenizer state.
"""

from __future__ import annotations

import json
from bisect import bisect_right
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from .vocab import Event
from ..utils.logger import logger
from ..utils.midi import write_midi

PAD_CLASS_ID = 0
SRC_CLASS_ID = 1
TGT_CLASS_ID = 2

# Sub-beat quantization slots: index within a beat → fractional position.
IDX_2_POS = {0: 0.0, 1: 1 / 6, 2: 1 / 4, 3: 1 / 3, 4: 1 / 2, 5: 2 / 3, 6: 3 / 4, 7: 5 / 6}
ALLOWED_DURATIONS_IN_16THS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)

# Volume contour sampling rate (Hz) used by velocity synthesis.
VOLUME_MAP_RESOLUTION = 20

_WHITE_KEYS_MOD12 = frozenset({0, 2, 4, 5, 7, 9, 11})


@dataclass
class Measure:
    bpm: float
    start: float
    end: float
    time_sig: int
    # pos_idx -> list of note dicts (filled during encode)
    chords: Dict[int, List[dict]] = field(default_factory=dict)


def build_measure_grid(tempo_data: List[dict]) -> List[Measure]:
    """Build the global measure list from tempo regions.

    Each region contributes one measure per downbeat; a measure ends at the
    next downbeat, else the next region's start, else after one nominal bar.
    A pickup measure is prepended before the first downbeat and one trailing
    measure appended after the last (reference: tokenizer._create_measures).
    """
    measures: List[Measure] = []
    if not tempo_data:
        return measures

    for region_idx, region in enumerate(tempo_data):
        downbeats = region.get("downbeats", [])
        if not downbeats:
            continue
        bpm = region["bpm"]
        time_sig = region["time_sig"]
        bar_duration = time_sig * 60.0 / bpm
        next_region_start = (
            tempo_data[region_idx + 1]["start"]
            if region_idx < len(tempo_data) - 1
            else None
        )
        for i, start in enumerate(downbeats):
            if i < len(downbeats) - 1:
                end = downbeats[i + 1]
            elif next_region_start is not None:
                end = next_region_start
            else:
                end = start + bar_duration
            measures.append(Measure(bpm=bpm, start=start, end=end, time_sig=time_sig))

    if not measures:
        return measures

    first = tempo_data[0]
    first_db = first["downbeats"][0]
    first_bar = first["time_sig"] * 60.0 / first["bpm"]
    measures.insert(
        0,
        Measure(
            bpm=first["bpm"],
            start=first_db - first_bar,
            end=first_db,
            time_sig=first["time_sig"],
        ),
    )

    last = tempo_data[-1]
    last_db = last["downbeats"][-1]
    last_bar = last["time_sig"] * 60.0 / last["bpm"]
    measures.append(
        Measure(
            bpm=last["bpm"],
            start=last_db + last_bar,
            end=last_db + 2 * last_bar,
            time_sig=last["time_sig"],
        )
    )
    return measures


def quantize_position(
    onset: float,
    measure_start: float,
    measure_end: float,
    time_sig: int,
    allow_triplet: bool = True,
) -> tuple:
    """Quantize an onset to (pos_idx, rolls_into_next_measure).

    pos_idx = beat_index * 8 + sub-slot; an onset that rounds to the measure's
    final boundary (pos_idx >= 8 * time_sig) belongs to the next measure.
    """
    pos_to_idx = {0.0: 0, 1 / 4: 2, 1 / 2: 4, 3 / 4: 6, 1.0: 8}
    if allow_triplet:
        pos_to_idx[1 / 3] = 3
        pos_to_idx[2 / 3] = 5
        if measure_end - measure_start >= 1.6:
            pos_to_idx[1 / 6] = 1
            pos_to_idx[5 / 6] = 7

    span = measure_end - measure_start
    rel = max(0.0, min(1.0, (onset - measure_start) / span))
    beat_frac = 1.0 / time_sig
    beat_idx = int(rel / beat_frac)
    within_beat = (rel % beat_frac) / beat_frac
    nearest = min(pos_to_idx, key=lambda q: abs(q - within_beat))
    pos_idx = beat_idx * 8 + pos_to_idx[nearest]
    return pos_idx, pos_idx >= 8 * time_sig


def snap_duration_to_16ths(duration_sec: float, bpm: float) -> int:
    """Snap a duration to the nearest allowed 16th-note multiple."""
    if duration_sec <= 0 or bpm <= 0:
        return ALLOWED_DURATIONS_IN_16THS[0]
    sixteenth = (60.0 / bpm) / 4.0
    n = duration_sec / sixteenth
    return min(ALLOWED_DURATIONS_IN_16THS, key=lambda d: abs(d - n))


def link_grace_notes(notes: List[dict]) -> List[dict]:
    """Fold grace notes into their main note.

    A note is a grace of a later note when their onsets differ by
    (1e-6, 0.1) s and pitches by exactly ±1 semitone; the main note gains
    grace_info = +1 (grace above) or -1 (grace below) and the grace note is
    dropped (reference: tokenizer._detect_and_link_grace_notes).
    """
    if not notes:
        return []
    ordered = sorted(notes, key=lambda n: (n["onset"], n["pitch"]))
    keep = [True] * len(ordered)
    for i in range(len(ordered) - 1):
        if not keep[i]:
            continue
        grace = ordered[i]
        for j in range(i + 1, len(ordered)):
            main = ordered[j]
            gap = main["onset"] - grace["onset"]
            if gap >= 0.1:
                break
            if 1e-6 < gap < 0.1 and abs(main["pitch"] - grace["pitch"]) == 1:
                main["grace_info"] = 1 if grace["pitch"] > main["pitch"] else -1
                keep[i] = False
                break
    return [n for i, n in enumerate(ordered) if keep[i]]


def split_sequence_into_bars(
    id_sequence: Sequence[int], bar_bos_id: int, bar_eos_id: int
) -> List[List[int]]:
    """Split a token-ID stream into complete [BOS ... EOS] bars."""
    if bar_bos_id < 0 or bar_eos_id < 0:
        logger.warn("Invalid Bar BOS/EOS ids; returning sequence unsplit.")
        return [list(id_sequence)] if len(id_sequence) else []

    bars: List[List[int]] = []
    current: List[int] = []
    in_bar = False
    for tok in id_sequence:
        if tok == bar_bos_id:
            if in_bar and current:
                bars.append(current)
            current = [tok]
            in_bar = True
        elif tok == bar_eos_id:
            if in_bar:
                current.append(tok)
                bars.append(current)
                current = []
                in_bar = False
        elif in_bar:
            current.append(tok)
    if in_bar and current:
        if current[-1] != bar_eos_id:
            current.append(bar_eos_id)
        bars.append(current)
    return [b for b in bars if len(b) > 1 and b[0] == bar_bos_id and b[-1] == bar_eos_id]


class TinyREMITokenizer:
    """Encode note lists into bar-structured events and decode them back."""

    def __init__(self, tempo_path: Optional[Union[str, Path]] = None,
                 tempo_data: Optional[List[dict]] = None):
        if tempo_data is None and tempo_path and Path(tempo_path).exists():
            with open(tempo_path, "r", encoding="utf-8") as f:
                tempo_data = json.load(f)
        self.tempo_data = tempo_data or []
        self.measures = build_measure_grid(self.tempo_data)

    # ---- encode --------------------------------------------------------
    def _assign_notes_to_measures(self, notes: List[dict]) -> None:
        starts = [m.start for m in self.measures]
        for note in notes:
            onset = note["onset"]
            # Measures are time-ordered; binary-search the candidate measure.
            m_idx = bisect_right(starts, onset) - 1
            if m_idx < 0 or onset >= self.measures[m_idx].end:
                continue
            m = self.measures[m_idx]
            pos_idx, rolls_over = quantize_position(
                onset, m.start, m.end, m.time_sig, allow_triplet=False
            )
            duration = snap_duration_to_16ths(note["offset"] - note["onset"], m.bpm)
            entry = {**note, "duration": duration}
            if rolls_over:
                if m_idx + 1 < len(self.measures):
                    self.measures[m_idx + 1].chords.setdefault(0, []).append(entry)
            else:
                m.chords.setdefault(pos_idx, []).append(entry)

    def encode(
        self,
        notes: Union[str, Path, List[dict]],
        with_grace_note: bool = False,
    ) -> List[Event]:
        """Encode notes (a list of dicts or a path to a note-JSON file) into a
        flat Event stream covering every measure of the grid."""
        if isinstance(notes, (str, Path)):
            with open(notes, "r", encoding="utf-8") as f:
                notes = json.load(f)
        if with_grace_note:
            notes = link_grace_notes(notes)
        # Reset chords in case encode() is called twice.
        for m in self.measures:
            m.chords = {}
        self._assign_notes_to_measures(notes)

        events: List[Event] = []
        for m in self.measures:
            events.append(Event("Bar", "BOS"))
            for pos_idx in sorted(m.chords):
                chord = sorted(m.chords[pos_idx], key=lambda n: -n["pitch"])
                seen_pitches = set()
                events.append(Event("Pos", pos_idx))
                for note in chord:
                    if note["pitch"] in seen_pitches:
                        continue
                    seen_pitches.add(note["pitch"])
                    if "grace_info" in note:
                        events.append(Event("Grace", note["grace_info"]))
                    events.append(Event("Note", note["pitch"]))
                    events.append(Event("Duration", note["duration"]))
            events.append(Event("Bar", "EOS"))
        return events

    # Method alias kept for the reference CLI surface.
    def split_sequence_into_bars(self, ids, bar_bos_id, bar_eos_id):
        return split_sequence_into_bars(ids, bar_bos_id, bar_eos_id)

    # ---- decode --------------------------------------------------------
    def decode_to_notes(
        self,
        events: List[Event],
        volume_map_path: Optional[Union[str, Path]] = None,
        volume_contour: Optional[np.ndarray] = None,
    ) -> List[dict]:
        """Decode an Event stream back into timed notes.

        Bar boundaries advance through the measure grid; Pos events set the
        onset cursor; Note+Duration pairs emit notes; Grace events emit a
        50 ms ornament before the main note. Glissando reconstruction and
        velocity synthesis are then applied.
        """
        if volume_contour is None and volume_map_path:
            try:
                with open(volume_map_path, "r", encoding="utf-8") as f:
                    volume_contour = np.asarray(json.load(f))
            except Exception as exc:  # pragma: no cover - IO failure path
                logger.warn(f"Could not load volume map {volume_map_path}: {exc}")

        notes: List[dict] = []
        measure_idx = 0  # index of the *next* measure to enter
        current: Optional[Measure] = None
        onset = 0.0
        pending_grace: Optional[int] = None

        i = 0
        n_events = len(events)
        while i < n_events:
            ev = events[i]
            if ev.type_ == "Bar" and ev.value == "BOS":
                current = (
                    self.measures[measure_idx]
                    if measure_idx < len(self.measures)
                    else None
                )
                measure_idx += 1
                i += 1
                continue
            if current is None:
                i += 1
                continue

            # Beat length derives from the *actual* gap to the next measure
            # when available (grid-accurate), else the nominal bpm.
            if measure_idx < len(self.measures):
                span = self.measures[measure_idx].start - current.start
            else:
                span = 0.0
            if span > 1e-6:
                seconds_per_beat = span / current.time_sig
            else:
                seconds_per_beat = 60.0 / current.bpm

            if ev.type_ == "Pos" and isinstance(ev.value, int):
                beat_idx, within = divmod(ev.value, 8)
                onset = current.start + (beat_idx + IDX_2_POS[within]) * seconds_per_beat
                i += 1
                continue
            if ev.type_ == "Grace" and isinstance(ev.value, int):
                pending_grace = ev.value
                i += 1
                continue
            if ev.type_ == "Note" and isinstance(ev.value, int):
                pitch = ev.value
                if i + 1 < n_events and events[i + 1].type_ == "Duration":
                    dur_sec = events[i + 1].value * seconds_per_beat / 4.0
                    if current.start <= onset < current.end:
                        notes.append({
                            "pitch": pitch,
                            "onset": onset,
                            "offset": onset + dur_sec,
                            "velocity": 80,
                            "is_grace_note": False,
                        })
                    if pending_grace is not None:
                        grace_onset = onset - 0.05
                        if current.start <= grace_onset:
                            notes.append({
                                "pitch": pitch + pending_grace,
                                "onset": grace_onset,
                                "offset": onset,
                                "velocity": 65,
                                "is_grace_note": True,
                                "main_note_pitch": pitch,
                            })
                        pending_grace = None
                    i += 2
                else:
                    i += 1
                continue
            i += 1

        notes = self._reconstruct_glissandos(notes)
        notes = self._synthesize_velocity(notes, volume_contour)
        notes.sort(key=lambda n: (n["onset"], n["pitch"]))
        return notes

    def _reconstruct_glissandos(self, notes: List[dict]) -> List[dict]:
        """Replace dense grace-note runs (≥3 within 1 s) with an even
        glissando sweep between the first and last main pitches.

        Note: matching the reference exactly, run direction is read from a
        'grace_info' key that decoded notes never carry, so every run compares
        None == None and the sweep is always emitted descending
        (reference: tokenizer._process_glissandos).
        """
        if len(notes) < 3:
            return notes

        grace_indices = [i for i, n in enumerate(notes) if n.get("is_grace_note")]
        to_remove: set = set()
        to_add: List[dict] = []

        i = 0
        while i < len(grace_indices):
            start_idx = grace_indices[i]
            if start_idx in to_remove:
                i += 1
                continue
            first = notes[start_idx]
            direction = first.get("grace_info")
            run = [start_idx]
            k = i + 1
            while k < len(grace_indices):
                cand = notes[grace_indices[k]]
                if cand["onset"] - first["onset"] > 1.0:
                    break
                if cand.get("grace_info") != direction:
                    break
                run.append(grace_indices[k])
                k += 1

            if len(run) >= 3:
                to_remove.update(run)
                # Each grace ends exactly at its main note's onset.
                main_onsets = {notes[idx]["offset"] for idx in run}
                for idx, n in enumerate(notes):
                    if not n.get("is_grace_note") and n["onset"] in main_onsets:
                        to_remove.add(idx)

                start_note, end_note = notes[run[0]], notes[run[-1]]
                start_time = start_note["onset"]
                end_time = end_note.get("main_note_offset", end_note["offset"])
                p0 = start_note["main_note_pitch"]
                p1 = end_note["main_note_pitch"]

                run_pitches = [notes[idx]["main_note_pitch"] for idx in run]
                white = sum(1 for p in run_pitches if p % 12 in _WHITE_KEYS_MOD12)
                use_white = white >= len(run_pitches) - white
                upward = direction == -1

                lo, hi = min(p0, p1), max(p0, p1)
                sweep = [
                    p for p in range(lo, hi + 1)
                    if (p % 12 in _WHITE_KEYS_MOD12) == use_white
                ]
                if not upward:
                    sweep.reverse()
                if len(sweep) > 1:
                    step = (end_time - start_time) / len(sweep)
                    for j, pitch in enumerate(sweep):
                        t = start_time + j * step
                        to_add.append({
                            "pitch": pitch,
                            "onset": t,
                            "offset": t + 0.1,
                            "velocity": 80,
                        })
                i = k
            else:
                i += 1

        result = [n for idx, n in enumerate(notes) if idx not in to_remove]
        result.extend(to_add)
        return result

    def _synthesize_velocity(
        self,
        notes: List[dict],
        volume_contour: Optional[np.ndarray],
        gamma: float = 0.5,
    ) -> List[dict]:
        """Assign velocities from the origin-audio loudness contour.

        Per measure: base = 60 + 40 * mean(volume)^gamma when a contour is
        available, else a note-density fallback; chords decay 2 per rank from
        the top pitch (floor base-10); pitches above 90 lose 10; grace notes
        track their main note at -15.
        """
        if not notes:
            return []

        per_measure: List[List[dict]] = [[] for _ in self.measures]
        starts = [m.start for m in self.measures]
        for note in notes:
            m_idx = bisect_right(starts, note["onset"]) - 1
            if 0 <= m_idx < len(self.measures) and note["onset"] < self.measures[m_idx].end:
                per_measure[m_idx].append(note)

        for m_idx, measure_notes in enumerate(per_measure):
            if not measure_notes:
                continue
            base = 75.0
            if volume_contour is not None:
                m = self.measures[m_idx]
                lo = int(m.start * VOLUME_MAP_RESOLUTION)
                hi = int(m.end * VOLUME_MAP_RESOLUTION)
                if hi > lo and hi <= len(volume_contour):
                    window = volume_contour[lo:hi]
                    if window.size > 0:
                        base = 60.0 + float(np.mean(window)) ** gamma * 40.0
            else:
                count = len(measure_notes)
                base = 70.0 if count < 20 else (80.0 if count < 30 else 90.0)

            by_onset: Dict[float, List[dict]] = {}
            for note in measure_notes:
                by_onset.setdefault(round(note["onset"], 4), []).append(note)
            for chord in by_onset.values():
                chord.sort(key=lambda n: -n["pitch"])
                for rank, note in enumerate(chord):
                    vel = max(base - 10, base - rank * 2)
                    if note["pitch"] > 90:
                        vel -= 10
                    note["velocity"] = int(max(0, min(127, vel)))

        for note in notes:
            if note.get("is_grace_note"):
                main = next(
                    (
                        n for n in notes
                        if abs(n["onset"] - note["offset"]) < 1e-4
                        and n["pitch"] == note.get("main_note_pitch")
                    ),
                    None,
                )
                vel = (main["velocity"] - 15) if main and "velocity" in main else 65
                if note["pitch"] > 90:
                    vel -= 10
                note["velocity"] = int(max(0, min(127, vel)))
        return notes

    # ---- MIDI ----------------------------------------------------------
    @staticmethod
    def note_to_midi(note_list: List[dict], output_path: Union[str, Path]) -> None:
        write_midi(note_list, output_path)
