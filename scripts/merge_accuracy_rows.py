#!/usr/bin/env python3
"""Merge freshly-run eval rows into ACCURACY.json (round-4: the aniso-1b
headline, outlier, and kv_long rows were re-run after the eval fixes in
commit 9a70a14; the other rows from the 2026-08-20T13:53 full refresh are
unchanged). Each source file's LAST line must be the eval's JSON object.
"""

import json
import sys
import time

ROOT = "/root/repo"

ROWS = {
    "int4_g128_anisotropic_HEADLINE": ".r4_aniso_1b.log",
    "outlier_int4": ".r4_outlier_1b.log",
    "kv_long_2048": ".r4_kvlong_2032.log",
}


def main():
    doc = json.load(open(f"{ROOT}/ACCURACY.json"))
    for key, path in ROWS.items():
        try:
            lines = [l for l in open(f"{ROOT}/{path}") if l.strip()]
            row = json.loads(lines[-1])
        except Exception as e:
            print(f"SKIP {key}: {path}: {e}", file=sys.stderr)
            continue
        doc["results"][key] = row
        print(f"merged {key}: gate_pass={row.get('gate_pass')}")
    doc["generated_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    doc["headline_gate_pass"] = bool(
        doc["results"]["int4_g128_anisotropic_HEADLINE"].get("gate_pass"))
    with open(f"{ROOT}/ACCURACY.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"headline_gate_pass": doc["headline_gate_pass"],
                      "all_gates": {k: v.get("gate_pass")
                                    for k, v in doc["results"].items()}}))


if __name__ == "__main__":
    main()
