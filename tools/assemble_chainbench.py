#!/usr/bin/env python3
"""Assemble CHAIN_r{N}.json from recorded ChainBench/ChainProbe lines.

Same policy as assemble_streambench.py: every numeric claim in the
derived sections (per-stage decade ratios, totals) is COMPUTED from
the recorded JSON lines, never hand-typed.

Usage:
  python3 tools/assemble_chainbench.py <round> <out> \
      x1=<x1.json> x10=<x10.json> x100=<x100.json> [probe=<probe.json>]

Each x*.json is the one-line JSON ChainBench prints; probe= is the
ChainProbe line (the 1000x-decade probe of the super-linear stages).
Driver-side tooling only - the Scala library never imports this.
"""
import json
import sys


def main():
    rnd = int(sys.argv[1])
    out = sys.argv[2]
    runs, probe = {}, None
    for a in sys.argv[3:]:
        k, path = a.split("=", 1)
        if k == "probe":
            probe = json.load(open(path))
        else:
            runs[k] = json.load(open(path))

    # per-stage decade ratios, computed from the recorded stage blocks
    order = ["x1", "x10", "x100"]
    present = [k for k in order if k in runs]
    ratios = {}
    for a, b in zip(present, present[1:]):
        sa, sb = runs[a]["stages"], runs[b]["stages"]
        ratios[f"{a}->{b}"] = {
            name: {
                "sec_ratio": round(sb[name]["sec"] / max(1e-9, sa[name]["sec"]), 2),
                "rows_ratio": (round(sb[name]["rows"] / sa[name]["rows"], 2)
                               if sa[name].get("rows", 0) > 0 else None),
            }
            for name in sb if name in sa
        }
        ratios[f"{a}->{b}"]["_total_sec_ratio"] = round(
            runs[b]["total_sec"] / runs[a]["total_sec"], 2)

    doc = {
        "what": (f"r{rnd} genetics-lifecycle chain report: the registered "
                 "CLI step chain run end-to-end through graft.ChainBench "
                 "via spark-submit at 1x/10x/100x (1x = sf0.1), every "
                 "stage reading the previous stage's parquet, recorded "
                 "behind the MachineCanary gate. decade_ratios and the "
                 "probe section are derived from the recorded JSON lines "
                 "by tools/assemble_chainbench.py - not hand-written."),
        "command": ("/opt/spark/bin/spark-submit --class graft.ChainBench "
                    "--master local[32] --driver-memory 24g/60g/90g <jar> "
                    "<tpchDir> <workDir>"),
        "runs": runs,
        "decade_ratios": ratios,
    }
    if probe is not None:
        doc["probe_1000x"] = {
            "what": ("ChainProbe: the two super-linear stages re-run at "
                     "a 10x clone of the 100x chain inputs (= the 1000x "
                     "decade), baseline re-run JIT-warm in the same JVM "
                     "for the ratio denominator."),
            "command": ("/opt/spark/bin/spark-submit --class "
                        "graft.ChainProbe --master local[32] "
                        "--driver-memory 100g <jar> <chain100xDir> "
                        "<probeDir> 10"),
            "result": probe,
        }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
