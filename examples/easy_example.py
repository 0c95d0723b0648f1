"""The reference's easy_example (examples/easy_example.py:1-77)
re-expressed on the Spark engine.

Scenario: project directories appear under a watched root; each
``project_<n>`` id is extracted from file names, the correlated
``{project}_results.txt`` file is matched per entity (F8), and its
float content becomes the ``result`` field via a parser (A10).

Run: python examples/easy_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from files_kraken_spark.blueprint import Blueprint, FieldType, ParserSpec, Template
from files_kraken_spark.parsers import read_float_file
from files_kraken_spark.session import get_session
from files_kraken_spark.streaming import Workflow

PROJECTS = {"project_1": "100", "project_2": "42.5", "project_3": "7"}


def main() -> None:
    spark = get_session("easy-example")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="easy_example_")
    for proj, metric in PROJECTS.items():
        os.makedirs(os.path.join(root, proj), exist_ok=True)
        with open(os.path.join(root, proj, f"{proj}_results.txt"), "w") as f:
            f.write(metric)
        with open(os.path.join(root, proj, f"{proj}_readme.md"), "w") as f:
            f.write("decoy")

    # the reference's ProjectInfo blueprint (easy_example.py:46-67)
    project_info = Blueprint(
        name="ProjectInfo",
        required={"project": (r"(project_\d+)", 1)},
        optional={"results_file": Template(r"{project}_results\.txt")},
        types={"results_file": FieldType.PATH},
        parsers={
            "result": ParserSpec(
                returns="double", dependent_fields=("results_file",), fn=read_float_file
            )
        },
    )

    wf = Workflow(spark, "easy_example", [project_info])
    wf.add_watcher(root)
    # reference runs with exit_time=3 (one-shot); run_once is the
    # AvailableNow equivalent of that poll tick
    n = wf.run_once()
    print(f"processed {n} changed files")
    wf.state.load(spark, project_info).orderBy("id").show(truncate=False)


if __name__ == "__main__":
    main()
