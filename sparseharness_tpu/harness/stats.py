"""Benchmark result records.

Replaces SqlStat (inc/sql_stat.h): per-launch rows with kernel time,
correctness, launch geometry, trial/iteration ids and a statistic kind
(RAW_RESULT / MULTI_ITERATION_SUM / MEDIAN_RESULT — inc/sql_stat.h:17).
Primary sink is JSONL (adds derived throughput fields); a SQL INSERT
renderer keeps drop-in parity with the reference's output format
(inc/sql_stat.h:44-79) for its MySQL post-processing pipeline
(scripts/experiments/postprocessing/*).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import platform
import statistics
from typing import Iterable, List, Optional, TextIO

from sparseharness_tpu.gold.check import Correctness


class Statistic(enum.Enum):
    RAW_RESULT = "RAW_RESULT"
    MULTI_ITERATION_SUM = "MULTI_ITERATION_SUM"
    MEDIAN_RESULT = "MEDIAN_RESULT"


@dataclasses.dataclass
class BenchRecord:
    time_ns: float
    correctness: Correctness
    kernel: str             # variant name (reference: kernel filename)
    geometry: str           # "BMxBN" (reference: global/local NDRange)
    trial: int
    iteration: int
    statistic: Statistic
    matrix: str = ""
    experiment_id: str = ""
    device: str = ""
    host: str = dataclasses.field(default_factory=platform.node)
    # derived throughput (new vs reference)
    nnz: int = 0
    gflops: float = 0.0
    gnnz_per_s: float = 0.0
    roofline_frac: float = 0.0
    # mode-specific metrics (e.g. the frontier exchange's measured bytes);
    # serialized into the JSONL row, absent from the SQL parity columns
    extra: dict = dataclasses.field(default_factory=dict)

    def finalize(self) -> "BenchRecord":
        if self.nnz and self.time_ns > 0:
            s = self.time_ns * 1e-9
            self.gnnz_per_s = self.nnz / s / 1e9
            self.gflops = 2.0 * self.nnz / s / 1e9  # ⊗ + ⊕ per nonzero
        return self


def to_jsonl(rec: BenchRecord) -> str:
    d = dataclasses.asdict(rec)
    d["correctness"] = rec.correctness.value
    d["statistic"] = rec.statistic.value
    if not d["extra"]:
        del d["extra"]
    return json.dumps(d)


_SQL_COLUMNS = (
    "time, correct, kernel, global, local, host, device, matrix, "
    "iteration, trial, statistic, experiment_id"
)


def to_sql(rec: BenchRecord, table_name: str = "table_name") -> str:
    """INSERT INTO row matching the reference's renderer: time in
    *milliseconds* (ns/1e6, inc/sql_stat.h:34), columns `global, local`
    (inc/sql_stat.h:46-48), double-quoted strings — so the rows drop into
    the reference's MySQL post-processing unchanged. The geometry split
    BMxBN stands in for the NDRange global/local sizes; non-numeric
    geometry (fixpoint rows use '-') renders as 0."""
    bm, _, bn = rec.geometry.partition("x")
    vals = ", ".join(
        [
            f"{rec.time_ns / 1e6:g}",
            f'"{rec.correctness.value}"',
            f'"{rec.kernel}"',
            bm if bm.isdigit() else "0",
            bn if bn.isdigit() else "0",
            f'"{rec.host}"',
            f'"{rec.device}"',
            f'"{rec.matrix}"',
            str(rec.iteration),
            str(rec.trial),
            f'"{rec.statistic.value}"',
            f'"{rec.experiment_id}"',
        ]
    )
    return f"INSERT INTO {table_name} ({_SQL_COLUMNS}) VALUES ({vals});"


def write_records(
    records: Iterable[BenchRecord],
    jsonl: Optional[TextIO] = None,
    sql: Optional[TextIO] = None,
    table_name: str = "table_name",
) -> None:
    for r in records:
        if jsonl is not None:
            jsonl.write(to_jsonl(r) + "\n")
        if sql is not None:
            sql.write(to_sql(r, table_name) + "\n")


def median_record(records: List[BenchRecord]) -> Optional[BenchRecord]:
    """MEDIAN_RESULT row over a trial set (app/spmv.cpp:90-95)."""
    raws = [r for r in records if r.statistic is Statistic.RAW_RESULT]
    if not raws:
        return None
    med = statistics.median(r.time_ns for r in raws)
    proto = raws[0]
    return dataclasses.replace(
        proto,
        time_ns=med,
        trial=-1,
        iteration=-1,
        statistic=Statistic.MEDIAN_RESULT,
    ).finalize()
