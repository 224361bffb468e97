#!/usr/bin/env python3
"""Emit the per-query engine-vs-oracle pairing table (VERDICT r9 task 7).

Joins the engine's `bench_detail.json` (graft.Bench output) with the
oracle replay JSON (tools/oracle_bench.py output) and writes a markdown
table sorted by engine/oracle ratio, flagging every query whose engine
time exceeds 2x its oracle time. BASELINE.md rule: every flagged query
gets a named reason in the round notes (plan floor, streaming runtime
bring-up, measurement context) — no silent outliers.

The two inputs MUST come from sequential runs on a quiet host (never
concurrent — CPU contention skews either side; see BASELINE.md pairing
hygiene).

Usage: pair_bench.py <bench_detail.json> <oracle.json> [out.md]
"""
import sys, json

def main():
    bench = json.load(open(sys.argv[1]))
    oracle = json.load(open(sys.argv[2]))
    out = sys.argv[3] if len(sys.argv) > 3 else "PAIRED_BENCH.md"
    eq, oq = bench["queries"], oracle["queries"]
    names = sorted(set(eq) | set(oq))
    rows = []
    for n in names:
        e, o = eq.get(n, -1.0), oq.get(n, -1.0)
        if e < 0 or o < 0:
            ratio = None
        else:
            ratio = e / max(o, 1e-3)  # floor oracle at 1 ms: sub-ms
            # replays make every engine scheduling floor an "outlier"
        rows.append((n, e, o, ratio))
    flagged = [r for r in rows if r[3] is not None and r[3] > 2.0 and r[1] > 0.5]
    total_e = sum(r[1] for r in rows if r[1] >= 0)
    total_o = sum(r[2] for r in rows if r[2] >= 0)
    lines = [
        "# PAIRED_BENCH — per-query engine vs DuckDB oracle",
        "",
        f"- engine total: **{total_e:.1f} s** ({sys.argv[1]})",
        f"- oracle total: **{total_o:.1f} s** ({sys.argv[2]}, sf {oracle.get('sf')})",
        f"- ratio: **{total_e / max(total_o, 1e-9):.2f}x**",
        f"- flagged (>2x oracle AND >0.5 s engine): **{len(flagged)}** — "
        "each needs a named reason in BASELINE.md (rule from VERDICT r9 task 7)",
        "",
        "| query | engine s | oracle s | ratio | flag |",
        "| --- | --- | --- | --- | --- |",
    ]
    for n, e, o, ratio in sorted(rows, key=lambda r: -(r[3] or 0)):
        es = f"{e:.3f}" if e >= 0 else "ERR"
        os_ = f"{o:.3f}" if o >= 0 else "ERR"
        rs = f"{ratio:.2f}" if ratio is not None else "—"
        flag = "**>2x**" if (n, e, o, ratio) in flagged else ""
        lines.append(f"| {n} | {es} | {os_} | {rs} | {flag} |")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}: engine {total_e:.1f}s vs oracle {total_o:.1f}s "
          f"= {total_e / max(total_o, 1e-9):.2f}x, {len(flagged)} flagged")
    for n, e, o, r in flagged:
        print(f"  FLAG {n}: engine {e:.2f}s vs oracle {o:.2f}s ({r:.1f}x)")

if __name__ == "__main__":
    main()
