"""Deterministic raw-landing-file generator (FIXTURES.md contract).

Dirty values are the point: the silver layer's job is cleaning them
(currency junk, unparseable dates, mixed-case categories, duplicate keys
across loads, malformed durations, zone-boundary heart rates).
"""

from __future__ import annotations

import csv
import json
import os
import random


def _w(path: str, header: list[str], rows: list[list]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(header)
        w.writerows(rows)


def generate_landing(dirpath: str, days: int = 10, seed: int = 7) -> None:
    os.makedirs(dirpath, exist_ok=True)
    rng = random.Random(seed)
    dates = [f"2026-02-{d:02d}" for d in range(1, days + 1)]

    # 1. transactions: dirty amounts, mixed-case types, bad dates, NULLs
    types = ["Hotel", " food ", "ACTIVITY", "Travel", "misc", "Other", ""]
    rows = []
    for i, d in enumerate(dates * 6):
        t = types[i % len(types)]
        amt = rng.uniform(5, 500)
        amt_s = f"${amt:,.2f}" if i % 3 == 0 else f"{amt:.2f}"
        date = "garbage-date" if i % 17 == 0 else d
        comment = rng.choice(["Uber", "Train ticket", "Dinner", "", "NULL"])
        rows.append(["Japan", date, f"merchant_{i}", t, amt_s, comment])
    _w(os.path.join(dirpath, "transactions_2026_02.csv"),
       ["country", "date", "name", "type", "amount", "comments"], rows)

    # 2. manual_logs: one row per date, day counter incl. 0
    rows = [
        [i, d, 1.0, "Japan", f"City{i % 3}", f"desc {i}", f"note {i}",
         "ramen", "train", "hostel"]
        for i, d in enumerate(dates)
    ]
    _w(os.path.join(dirpath, "manual_logs_2026_02.csv"),
       ["day", "date", "flag", "country", "city", "description", "comments",
        "food", "travel", "hotel"], rows)

    # 3. flight_logs: dup (date, flight_number) within file is fine;
    # >4h durations and one malformed duration
    rows = []
    for i, d in enumerate(dates[::2]):
        dur = "12:30" if i % 3 == 0 else ("bad" if i == 1 else "02:15")
        rows.append([d, f"NH{800 + i}", "NRT", "KIX", "09:00", "11:15", dur,
                     "ANA", "B789", f"JA{i:03d}A", f"{i}A", "1", "2", "0",
                     "note", "10", "20", "5", "7"])
    _w(os.path.join(dirpath, "flight_logs_2026_02.csv"),
       ["date", "flight_number", "from", "to", "dep_time", "arr_time",
        "duration", "airline", "aircraft", "registration", "seat_number",
        "seat_type", "flight_class", "flight_reason", "note", "dep_id",
        "arr_id", "airline_id", "aircraft_id"], rows)

    # 4. fitbit_steps: sub-hourly, some hours empty (scaffold fill)
    rows = []
    for d in dates[:5]:
        for h in range(6, 22, 2):  # only even hours 6..20 have data
            for m in (0, 30):
                rows.append([f"{d} {h:02d}:{m:02d}:00", rng.randint(0, 500), "fitbit"])
    _w(os.path.join(dirpath, "fitbit_steps_2026_02.csv"),
       ["timestamp", "steps", "data_source"], rows)

    # 5. fitbit_sleep_score: scores spanning the <70 / >85 branches
    rows = []
    for i, d in enumerate(dates):
        score = [65, 72, 88, 90, 55, 80][i % 6]
        rows.append([1000 + i, f"{d} 07:3{i % 6}:00", score, 20.5, 60, 21.0,
                     45 + i, 52 + (i % 5), 0.08])
    _w(os.path.join(dirpath, "fitbit_sleep_score_2026_02.csv"),
       ["sleep_log_entry_id", "timestamp", "overall_score", "composition_score",
        "revitalization_score", "duration_score", "deep_sleep_in_minutes",
        "resting_heart_rate", "restlessness"], rows)

    # 6. fitbit_heart_rate: multiple readings/minute, exact 60/100/130 values
    rows = []
    boundary = [59.0, 60.0, 99.0, 100.0, 129.0, 130.0, 131.0]
    for d in dates[:3]:
        for h in range(8, 12):
            for m in range(0, 60, 5):
                for s in (0, 20, 40):
                    bpm = boundary[(h + m + s) % len(boundary)] + rng.choice([0, 0.5])
                    rows.append([f"{d} {h:02d}:{m:02d}:{s:02d}", bpm, "fitbit"])
    _w(os.path.join(dirpath, "fitbit_heart_rate_2026_02.csv"),
       ["timestamp", "beats_per_minute", "data_source"], rows)

    # 7. google_timeline: one JSON doc; visit (dict latLng), activity,
    # and a segment with neither (dropped)
    segments = []
    for i, d in enumerate(dates[:6]):
        segments.append(
            {
                "startTime": f"{d}T09:00:00.000+09:00",
                "endTime": f"{d}T10:30:00.000+09:00",
                "visit": {
                    "probability": 0.87,
                    "topCandidate": {
                        "placeId": f"ChIJ{i:04d}",
                        "placeLocation": {"latLng": f"35.65{i}°, 139.74{i}°"},
                    },
                },
            }
        )
        segments.append(
            {
                "startTime": f"{d}T11:00:00.000+09:00",
                "endTime": f"{d}T12:00:00.000+09:00",
                "activity": {
                    "probability": 0.91,
                    "distanceMeters": 1234.5 * (i + 1),
                    "start": {"latLng": f"35.65°, 139.74°"},
                    "end": {"latLng": f"34.69°, 135.50°"},
                    "topCandidate": {"type": ["IN_TRAIN", "WALKING", "FLYING"][i % 3],
                                      "probability": 0.9},
                },
            }
        )
    segments.append({"startTime": "2026-02-09T00:00:00.000+09:00",
                     "endTime": "2026-02-09T01:00:00.000+09:00"})  # dropped
    # string-form placeLocation (dict-or-string — reset_schemas.sql:415-420)
    segments.append(
        {
            "startTime": "2026-02-07T09:00:00.000+09:00",
            "endTime": "2026-02-07T10:00:00.000+09:00",
            "visit": {
                "probability": 0.5,
                "topCandidate": {"placeId": "ChIJSTR", "placeLocation": "35.9°, 139.9°"},
            },
        }
    )
    with open(os.path.join(dirpath, "google_timeline_2026_02.json"), "w") as f:
        json.dump({"semanticSegments": segments}, f)
    # malformed document: must ingest (whole-doc string) and silently
    # yield zero segments (try_parse_json -> NULL)
    with open(os.path.join(dirpath, "google_timeline_bad.json"), "w") as f:
        f.write("{not valid json !!")
