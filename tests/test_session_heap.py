"""Unit tests for session._warn_if_heap_undersized (no Spark session).

The probe guards a spark-submit footgun: builder-set launch-time conf
(spark.driver.memory) cannot apply to an already-running JVM, so
spark-submit jobs silently run local-mode executors on the 1g default
heap (measured: the 240k-page pipeline OOMs its 32 parquet writers).
The warning must go through the JVM logger, not python stderr —
PythonRunner merges python stderr into the job's STDOUT, which would
corrupt the jobs' one-JSON-line stdout contract.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from thesis_ner_co_tri_training_spark import session as sess  # noqa: E402


class _FakeSpark:
    """Stands in for SparkSession: a JVM handle exposing maxMemory and
    recording log4j warn() calls."""

    def __init__(self, heap_bytes):
        self.warned = []
        outer = self

        class _Runtime:
            @staticmethod
            def getRuntime():
                class _R:
                    @staticmethod
                    def maxMemory():
                        return heap_bytes
                return _R()

        class _Logger:
            def warn(self, msg):
                outer.warned.append(msg)

        class _LogManager:
            @staticmethod
            def getLogger(name):
                return _Logger()

        class _JVM:
            pass

        jvm = _JVM()
        jvm.java = type("j", (), {})()
        jvm.java.lang = type("l", (), {})()
        jvm.java.lang.Runtime = _Runtime
        jvm.org = type("o", (), {})()
        jvm.org.apache = type("a", (), {})()
        jvm.org.apache.logging = type("g", (), {})()
        jvm.org.apache.logging.log4j = type("x", (), {})()
        jvm.org.apache.logging.log4j.LogManager = _LogManager
        self._jvm = jvm


def test_undersized_heap_warns_via_jvm_logger(monkeypatch):
    monkeypatch.setenv("SPARK_DRIVER_MEM", "8g")
    spark = _FakeSpark(1 * 2**30)  # spark-submit's 1g default
    sess._warn_if_heap_undersized(spark)
    assert len(spark.warned) == 1
    assert "--driver-memory 8g" in spark.warned[0]


def test_right_sized_heap_is_silent(monkeypatch):
    monkeypatch.setenv("SPARK_DRIVER_MEM", "8g")
    # python-launched sessions report ~7.1g usable for -Xmx8g: must
    # not warn (threshold is 0.7x the intent, not equality)
    spark = _FakeSpark(int(7.1 * 2**30))
    sess._warn_if_heap_undersized(spark)
    assert spark.warned == []


def test_unparseable_intent_is_silent(monkeypatch):
    monkeypatch.setenv("SPARK_DRIVER_MEM", "whatever")
    spark = _FakeSpark(1 * 2**30)
    sess._warn_if_heap_undersized(spark)
    assert spark.warned == []


def test_no_jvm_handle_is_silent(monkeypatch):
    monkeypatch.setenv("SPARK_DRIVER_MEM", "8g")

    class _NoJvm:
        pass

    sess._warn_if_heap_undersized(_NoJvm())  # must not raise


def test_explicit_8g_against_16g_intent_is_silent(monkeypatch):
    # An operator following the documented fix (--driver-memory 8g) on
    # a 32-cpu host where get_spark's intent is 16g must NOT be warned:
    # the warning exists for the silent spark-submit 1g default only.
    monkeypatch.delenv("SPARK_DRIVER_MEM", raising=False)
    spark = _FakeSpark(int(7.1 * 2**30))
    sess._warn_if_heap_undersized(spark, "16g")
    assert spark.warned == []
    spark2 = _FakeSpark(1 * 2**30)  # the actual default still fires
    sess._warn_if_heap_undersized(spark2, "16g")
    assert len(spark2.warned) == 1


def test_bytes_and_mb_units(monkeypatch):
    monkeypatch.setenv("SPARK_DRIVER_MEM", "512m")
    spark = _FakeSpark(500 * 2**20)
    sess._warn_if_heap_undersized(spark)
    assert spark.warned == []  # 500m >= 0.7 * 512m
    spark2 = _FakeSpark(100 * 2**20)
    sess._warn_if_heap_undersized(spark2)
    assert len(spark2.warned) == 1


def test_digit_only_spec_is_mib():
    """A suffix-less SPARK_DRIVER_MEM is MiB (Spark's own reading of
    spark.driver.memory), NOT bytes — parsing '8192' as 8192 bytes
    silently suppressed the warning on the exact 1g-default footgun
    this probe exists for."""
    fake = _FakeSpark(heap_bytes=1024**3)  # the spark-submit 1g default
    sess._warn_if_heap_undersized(fake, want="8192")  # 8192 MiB = 8g
    assert fake.warned, "digit-only 8192 (MiB) vs 1g heap must warn"
    fake2 = _FakeSpark(heap_bytes=9 * 1024**3)
    sess._warn_if_heap_undersized(fake2, want="8192")
    assert not fake2.warned
