"""Golden-vs-compiled-reference recall parity, as a reproducible script.

Builds the reference binary with its own Makefile flags (SURVEY.md §5.2;
/root/reference/Makefile:6) into /tmp (the reference tree is read-only),
runs it at its default benchmark config (n=65,536 unit vectors, d=128,
q=1,024, k=2, L=8 — /root/reference/src/main.cc:203-238), parses the
"% neighbours found in C" line (src/main.cc:600-607), then measures THIS
engine's recall at the identical config (independently seeded hash tables)
and asserts agreement within +/-0.02.

Writes BENCH/REF_PARITY.md with both numbers and exits nonzero on failure.

Usage: python scripts/ref_parity.py
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
BIN = "/tmp/lsh-project-ref"
TOLERANCE = 0.02


def build_reference() -> None:
    cmd = [
        "g++", f"{REF}/src/main.cc", f"{REF}/src/lsh.c",
        "-std=c++11", "-flto", "-march=native", "-Ofast",
        "-funsafe-math-optimizations", "-I", f"{REF}/src", "-o", BIN,
    ]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def run_reference() -> tuple[float, str]:
    """Run the binary; return (recall fraction, raw stdout)."""
    t0 = time.time()
    out = subprocess.run(
        [BIN], capture_output=True, text=True, timeout=3600, check=True
    ).stdout
    print(f"reference binary ran in {time.time() - t0:.0f}s", flush=True)
    m = re.search(r"([\d.]+)% neighbours found in C", out)
    if not m:
        print(out)
        raise RuntimeError("could not parse '% neighbours found in C'")
    return float(m.group(1)) / 100.0, out


def run_engine() -> float:
    """This engine's recall at the reference config (the same measurement
    as tests/test_reference_parity_e2e.py::test_reference_config_recall)."""
    from lsh_project_spark.config import CrossPolytopeConfig
    from lsh_project_spark.operators.knn import cp_nearest_neighbor
    from lsh_project_spark.session import get_spark
    from lsh_project_spark.sources.vectors import (
        brute_force_truth,
        noisy_queries,
        random_unit_vectors,
    )

    spark = get_spark(app="ref_parity", cores=16, shuffle_partitions=32)
    n, d, q = 65536, 128, 1024
    data = random_unit_vectors(spark, n, d, seed=49628583).cache()
    data.count()
    queries = noisy_queries(spark, data, q, d, n, seed=49628583).cache()
    cfg = CrossPolytopeConfig(dim=d, k=2, num_tables=8)
    truth = {r["qid"]: r["nn_id"] for r in brute_force_truth(queries, data).collect()}
    pred = {
        r["qid"]: r["nn_id"]
        for r in cp_nearest_neighbor(data, queries, cfg).collect()
    }
    recall = sum(1 for qid, nn in truth.items() if pred.get(qid) == nn) / len(truth)
    spark.stop()
    return recall


def main() -> None:
    build_reference()
    ref_recall, _ = run_reference()
    eng_recall = run_engine()
    diff = abs(ref_recall - eng_recall)
    ok = diff <= TOLERANCE
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/REF_PARITY.md", "w") as f:
        f.write(
            f"""# Reference-binary recall parity (scripts/ref_parity.py)

Reference compiled with its Makefile flags, run at default config
(n=65,536, d=128, q=1,024, k=2, L=8); engine measured at the identical
config with independently seeded hash tables.

| engine | recall ("% neighbours found") |
|---|---|
| reference binary (C path) | {ref_recall:.4f} |
| lsh_project_spark | {eng_recall:.4f} |

|diff| = {diff:.4f}  (tolerance {TOLERANCE}) -> {"PASS" if ok else "FAIL"}
"""
        )
    print(
        f"reference={ref_recall:.4f} engine={eng_recall:.4f} "
        f"diff={diff:.4f} -> {'PASS' if ok else 'FAIL'}"
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
