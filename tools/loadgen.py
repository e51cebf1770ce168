#!/usr/bin/env python
"""Seeded synthetic payload generator — the analog of the reference's
load generator (`deployment/compose/scripts/load_test.py`), emitting
JSON-lines files the jsonl source streams.

    python tools/loadgen.py OUTDIR --kind geotab --rows 50000 [--seed 42]
    kinds: geotab calamp ford payment user order inventory shipment

Deterministic for a fixed seed.  A slice of rows (--malformed-pct) is
emitted malformed to exercise the drop/dead-letter path, mirroring the
reference generator's schema-mismatched payloads (SURVEY.md §0 note 4).
"""

from __future__ import annotations

import argparse
import json
import os
import random


def _iso(rng: random.Random) -> str:
    return (
        f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        f"T{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}.000Z"
    )


def gen_row(kind: str, i: int, rng: random.Random) -> dict:
    if kind == "geotab":
        return {
            "Device_ID": f"geo-dev-{i}",
            "Vehicle_ID": f"veh-{i % 997}",
            "Record_DateTime": _iso(rng),
            "Latitude": round(rng.uniform(-90, 90), 6),
            "Longitude": round(rng.uniform(-180, 180), 6),
            "Odometer_mi": round(rng.uniform(0, 300000), 1),
            "EngineSpeed_rpm": round(rng.uniform(600, 6000), 1),
            "Fuel_Level_pct": round(rng.uniform(0, 100), 1),
            "Ignition_Status": rng.choice(["ON", "OFF", "on", "ajar"]),
        }
    if kind == "calamp":
        return {
            "unit_id": f"unit-{i}",
            "vid": f"cal-veh-{i % 997}",
            "msg_ts": rng.randint(1_700_000_000, 1_760_000_000),
            "gps_lat": round(rng.uniform(-90, 90), 6),
            "gps_lon": round(rng.uniform(-180, 180), 6),
            "speed_mph": round(rng.uniform(0, 90), 1),
        }
    if kind == "ford":
        ts = rng.randint(1_700_000_000_000, 1_760_000_000_000)
        return {
            "vin": f"vin-{i % 997}",
            "esn": f"esn-{i}",
            "captureTime": ts,
            "coords": {
                "latValue": round(rng.uniform(-90, 90), 6),
                "lonValue": round(rng.uniform(-180, 180), 6),
                "ts": ts - rng.randint(0, 5000),
            },
            "rpm": rng.randint(600, 6000),
        }
    if kind == "payment":
        return {"txnId": f"t-{i}", "amount": round(rng.uniform(1, 500), 2),
                "currency": "USD", "time": _iso(rng)}
    if kind == "user":
        return {"uid": i, "name": f"user-{i}", "created": rng.randint(1_600_000_000, 1_760_000_000)}
    if kind == "order":
        return {"orderId": f"o-{i}", "items": [f"sku-{j}" for j in range(rng.randint(1, 5))],
                "placedAt": _iso(rng)}
    if kind == "inventory":
        return {"sku": f"sku-{i % 500}", "qty": rng.randint(0, 100),
                "updateTime": rng.randint(1_600_000_000, 1_760_000_000)}
    if kind == "shipment":
        return {"shipId": f"sh-{i}", "status": rng.choice(["SHIPPED", "DELIVERED", "LOST"]),
                "deliveredAt": rng.randint(1_600_000_000, 1_760_000_000)}
    raise ValueError(f"unknown kind {kind}")


def generate(outdir: str, kind: str, rows: int, seed: int = 42,
             malformed_pct: float = 1.0, files: int = 4) -> int:
    rng = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)
    # ceil-divide so the row remainder is written, not dropped
    per_file = -(-rows // files)
    written = 0
    for f in range(files):
        if f * per_file >= rows:
            break
        with open(os.path.join(outdir, f"part-{f:03d}.jsonl"), "w") as fh:
            for i in range(f * per_file, min((f + 1) * per_file, rows)):
                if rng.random() * 100 < malformed_pct:
                    fh.write('{"truncated": \n')  # unparseable
                else:
                    fh.write(json.dumps(gen_row(kind, i, rng)) + "\n")
                written += 1
    return written


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--kind", default="geotab")
    ap.add_argument("--rows", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--malformed-pct", type=float, default=1.0)
    ap.add_argument("--files", type=int, default=4)
    a = ap.parse_args()
    n = generate(a.outdir, a.kind, a.rows, a.seed, a.malformed_pct, a.files)
    print(f"wrote {n} rows → {a.outdir}")


if __name__ == "__main__":
    main()
