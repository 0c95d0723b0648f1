"""The reference's advanced_example (examples/advanced_example.py:1-180)
re-expressed on the Spark engine: two blueprints over two watched
roots, list fields accumulating across ticks, correlated per-entity
results files, and a live filesystem mutation between polls.

Run: python examples/advanced_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from files_kraken_spark.blueprint import Blueprint, FieldType, ParserSpec, Template
from files_kraken_spark.parsers import read_float_file
from files_kraken_spark.session import get_session
from files_kraken_spark.sources.listing import NameMatcher
from files_kraken_spark.streaming import Workflow


def make_tree(root: str, runs: int = 3, samples: int = 2) -> None:
    for r in range(1, runs + 1):
        run = f"run_{r}"
        for s in range(1, samples + 1):
            d = os.path.join(root, run)
            os.makedirs(d, exist_ok=True)
            for lane in (1, 2):
                open(os.path.join(d, f"{run}.sample_{s}.lane_{lane}.fastq.gz"), "w").write("fq")
            open(os.path.join(d, f"{run}.sample_{s}.results.txt"), "w").write(f"{r * 10 + s}")


def main() -> None:
    spark = get_session("advanced-example")
    spark.sparkContext.setLogLevel("ERROR")

    root_a = tempfile.mkdtemp(prefix="adv_a_")
    root_b = tempfile.mkdtemp(prefix="adv_b_")
    make_tree(root_a)
    make_tree(root_b, runs=1)

    # SampleRunInfo (advanced_example.py:80-100): entity per (run, sample)
    sample_run = Blueprint(
        name="SampleRunInfo",
        required={
            "run": (r"(run_\d+)\.", 1),
            "sample": (r"sample_(\d+)\.", 1),
        },
        optional={
            "fastqs": (r".+\.fastq\.gz", 0),
            "results_file": Template(r"{run}\.sample_{sample}\.results\.txt"),
        },
        types={"fastqs": FieldType.LIST_PATH, "results_file": FieldType.PATH},
        parsers={
            "result": ParserSpec(
                returns="double", dependent_fields=("results_file",), fn=read_float_file
            )
        },
    )
    # RunInfo: one entity per run, accumulating its sample ids
    run_info = Blueprint(
        name="RunInfo",
        required={"run": (r"(run_\d+)\.", 1)},
        optional={"samples": (r"sample_(\d+)\.", 1)},
        types={"samples": FieldType.LIST_STR},
    )

    wf = Workflow(spark, "advanced_example", [sample_run, run_info])
    wf.add_watcher([root_a, root_b], matcher=NameMatcher(patterns=(r"run_\d+\..+",)))
    print("tick 1:", wf.run_once(), "changes")

    # live mutation: a new sample lands in run_1 of root_a
    open(os.path.join(root_a, "run_1", "run_1.sample_9.lane_1.fastq.gz"), "w").write("fq")
    open(os.path.join(root_a, "run_1", "run_1.sample_9.results.txt"), "w").write("99")
    print("tick 2:", wf.run_once(), "changes")

    wf.state.load(spark, sample_run).orderBy("id").show(truncate=40)
    wf.state.load(spark, run_info).orderBy("id").show(truncate=60)


if __name__ == "__main__":
    main()
