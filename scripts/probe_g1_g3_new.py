"""One-off: measure the round-6 dedup/text additions at the g1→g3 pair
(the second scale point, no overhead floors) and merge into
SCALEPROBE_g1_g3.json. Reuses scale_probe.run_suite (same protocol)."""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scale_probe import run_suite  # noqa: E402

from debezium_incubator_spark.registry import all_queries  # noqa: E402
from debezium_incubator_spark.session import get_spark  # noqa: E402

ONLY = [
    "t25_substring_dedup",
    "semdedup_scaled",
    "t26_vocab_coverage",
    "t27_unigram_logprob",
]


def main() -> None:
    only = ONLY
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    g1 = os.path.join(REPO, ".scaleprobe", "g1")
    g3 = os.path.join(REPO, ".scaleprobe", "g3")
    spark = get_spark("scaleprobe-g3")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    print("== g1", flush=True)
    t1 = run_suite(spark, g1, queries, only)
    print("== g3", flush=True)
    t3 = run_suite(spark, g3, queries, only)
    out_path = os.path.join(REPO, "SCALEPROBE_g1_g3.json")
    with open(out_path) as f:
        result = json.load(f)
    for name in only:
        ratio = t3[name] / t1[name]
        # field names follow the file's existing convention: the first
        # scale of the pair is stored as t_g0.1_sec (here: g1), the
        # second as t_g1_sec (here: g3) — see the "scales" entry.
        result["queries"][name] = {
            "t_g0.1_sec": round(t1[name], 4),
            "t_g1_sec": round(t3[name], 4),
            "exponent": round(math.log(ratio) / math.log(3), 3),
            "tier": "linear",
            "ratio_3x_data": round(ratio, 2),
        }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result["queries"][k] for k in only}))


if __name__ == "__main__":
    main()
