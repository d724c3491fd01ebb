#!/usr/bin/env python3
"""Assemble RECALL_r{N}.json from ProfileRecall JSONL outputs.

Usage: python3 scripts/assemble_recall.py <round> <header.json> <out> <jsonl...>

header.json carries the narrative fields (metric, changes_vs_prev,
gate); results are the concatenated JSONL rows in input order.

Dev-only tool (driver-side python); not part of the shipped library.
"""
import json
import sys


def main(rnd, header_path, out, files):
    with open(header_path) as f:
        header = json.load(f)
    rows = []
    for p in files:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    doc = {"round": int(rnd), "tool": "graft.tools.ProfileRecall", **header,
           "results": rows}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out} ({len(rows)} result rows)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:])
