"""Render the r5f accuracy-rig JSON rows (logs/tpu_r5f_run.log) into the
markdown tables ACCURACY.md embeds at its placeholder comments.

Usage: python scripts/r5f_report.py [logfile]  — prints markdown to
stdout (needle grid table, ruler table, train summary); `--apply`
substitutes the tables into ACCURACY.md in place (idempotent: the
placeholder comment lines are kept as anchors).
"""

from __future__ import annotations

import json
import sys


def rows_from(path: str):
    out = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(r, dict) and "rig" in r:
            out.append(r)
    return out


def fmt(v):
    return "—" if v is None else f"{v:.2f}"


def needle_table(rows):
    grid = [r for r in rows if r["rig"] == "needle"]
    # last occurrence wins (restarts re-emit completed configs)
    by_cfg = {r["config"]: r for r in grid}
    caps = sorted({r["cap"] for r in by_cfg.values() if "cap" in r})
    methods, seen = [], set()
    for r in by_cfg.values():
        key = (r.get("method", "?"), r.get("quant"))
        if key not in seen and "error" not in r:
            seen.add(key)
            methods.append(key)
    lines = ["| method | " + " | ".join(
        f"cap {c} mean / mid-depth" for c in caps) + " |",
        "|---|" + "---|" * len(caps)]
    for m, q in methods:
        name = f"fullkv+{q}" if q else m
        cells = []
        for c in caps:
            r = next((v for v in by_cfg.values()
                      if v.get("method") == m and v.get("quant") == q
                      and v.get("cap") == c), None)
            if r is None or "error" in r:
                cells.append("—")
            else:
                cells.append(f"{fmt(r['mean_score'])} / "
                             f"{fmt(r.get('mid_depth_score'))}")
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    errs = [r for r in by_cfg.values() if "error" in r]
    for r in errs:
        lines.append(f"| {r['config']} | ERROR: {r['error'][:80]} |")
    return "\n".join(lines)


def ruler_table(rows):
    rr = [r for r in rows if r["rig"] == "ruler_niah"]
    if not rr:
        return "(no ruler rows)"
    lines = ["| method | cap | string_match_all | examples |",
             "|---|---|---|---|"]
    for r in rr:
        lines.append(f"| {r['method']} | {r['cap']} | {r['score']:.1f} "
                     f"| {r['examples']} |")
    return "\n".join(lines)


def train_summary(rows):
    tr = [r for r in rows if r["rig"] == "train"]
    return "\n".join(
        f"- phase {r['phase']}: {r['steps']} steps @ seq {r['seq_len']} "
        f"(batch {r['batch']}) — loss {r['loss_first']} → {r['loss_last']} "
        f"({r['train_s']:.0f} s cumulative)" for r in tr)


def main():
    path = next((a for a in sys.argv[1:] if not a.startswith("-")),
                "logs/tpu_r5f_run.log")
    rows = rows_from(path)
    needle, ruler, train = (needle_table(rows), ruler_table(rows),
                            train_summary(rows))
    if "--apply" in sys.argv:
        src = open("ACCURACY.md").read()
        for anchor, body in (("<!-- R5F RESULTS -->", needle),
                             ("<!-- R5F RULER -->", ruler),
                             ("<!-- R5F TRAIN -->", train)):
            if anchor in src:
                head, _, tail = src.partition(anchor)
                # drop any previously rendered block up to the next header
                rest = tail.split("\n## ", 1)
                tail = ("\n\n" + body + "\n"
                        + ("\n## " + rest[1] if len(rest) > 1 else "\n"))
                src = head + anchor + tail
        open("ACCURACY.md", "w").write(src)
        print("ACCURACY.md updated")
    else:
        print(train, "\n\n", needle, "\n\n", ruler, sep="")


if __name__ == "__main__":
    main()
