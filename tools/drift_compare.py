#!/usr/bin/env python3
"""Adjudication helper: compare a quiet sweep's per-gate seconds
against BENCH_PINS.json minima and a driver BENCH_r{N}.json, printing
the rows the driver flagged (>=1.5x pin) with their quiet ratios.

Usage: drift_compare.py SWEEP_JSON_LINE_FILE [DRIVER_BENCH_JSON]
"""
import json
import sys


def load_queries(path):
    with open(path) as f:
        txt = f.read()
    # the bench prints one JSON line; sweep logs may hold extra lines
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{') and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    sweep = load_queries(sys.argv[1])
    pins = json.load(open('BENCH_PINS.json'))
    pinmap = pins.get('pins', pins)
    driver = load_queries(sys.argv[2]) if len(sys.argv) > 2 else None
    rows = []
    newmins = []
    unpinned = []
    for q, sec in sorted(sweep['queries'].items()):
        pin = pinmap.get(q)
        if isinstance(pin, dict):
            pin = pin.get('min') or pin.get('sec') or pin.get('value')
        if not pin:  # new gate (or degenerate 0 pin): not a drift row
            unpinned.append((q, sec))
            continue
        r = sec / pin
        d = driver['queries'].get(q) / pin if driver and q in driver['queries'] else None
        if sec < pin:
            newmins.append((q, pin, sec))
        if r >= 1.5 or (d is not None and d >= 2.0):
            rows.append((r, q, sec, pin, d))
    print(f"sweep total={sweep.get('value')}s  gates={len(sweep['queries'])}")
    print(f"drift rows (quiet >=1.5x, or driver >=2x): {len(rows)}")
    for r, q, sec, pin, d in sorted(rows, reverse=True):
        dtxt = f" driver={d:.2f}x" if d is not None else ""
        print(f"  {q}: {sec:.3f}s {r:.2f}x pin={pin}{dtxt}")
    if unpinned:
        print(f"unpinned gates ({len(unpinned)}) — pin from a full-sweep minimum:")
        for q, sec in unpinned:
            print(f"  {q}: {sec:.3f}s")
    if newmins:
        print(f"new minima ({len(newmins)}):")
        for q, pin, sec in newmins:
            print(f"  {q}: {pin} -> {sec:.3f}")


if __name__ == '__main__':
    main()
