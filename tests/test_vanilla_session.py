"""Driver-session independence: the verification driver calls
``entry``/``queries()`` with a SparkSession WE did not configure; the
engine must adopt the confs it needs (nanos timestamps, UTC, case
sensitivity) at read time. Runs in a subprocess so the vanilla JVM
really is vanilla."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").appName("vanilla").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
assert mod.entry(spark).count() > 0
q = mod.queries()
# the nanos-timestamp table is the conf-sensitive one
assert q["q_events_windowed"](spark, "/root/testdata/sf0.001").count() > 0
print("VANILLA-OK")
spark.stop()
"""


def test_vanilla_driver_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "VANILLA-OK" in proc.stdout, proc.stderr[-2000:]
