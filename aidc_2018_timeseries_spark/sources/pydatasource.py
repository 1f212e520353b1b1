"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
the adding-problem generator as a first-class ``spark.read.format(...)``
source.

The reference generates this dataset driver-side in NumPy
(``datasets/adding.py:17-31``: values ~ U(0,1), a mask with exactly two
1-positions, label = sum of the two masked values). The expression-based
form lives in sources/synthetic.py (S5); this module is the SOURCE-API
form of the same generator — demonstrating the engine-complete path for
plugging any external/generated format into the scan layer itself:
``partitions()`` splits the sample range so generation is
partition-parallel (each worker produces its slice independently — the
shape any custom source needs at cluster scale), and rows use the same
deterministic md5-derived scheme as S5, so the SAME DuckDB oracle
hash-checks a Python-implemented source.

Rounding parity note: Spark's ``ROUND`` on doubles is BigDecimal
HALF_UP on the exact binary value; ``decimal.Decimal(float)`` is the
same exact binary expansion, so ``Decimal(v).quantize(1e-6, HALF_UP)``
reproduces it bit-for-bit (Python's builtin ``round`` is banker's —
wrong here).
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SPACE = float(1 << 60)


def _h(s: str) -> int:
    """First 15 hex chars of md5 as int — sources/synthetic.py:hash64."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class SampleRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class AddingProblemReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seq_len = int(options.get("seq_len", 50))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self):
        step = -(-self.n // self.num_partitions)
        return [
            SampleRangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: SampleRangePartition):
        T = self.seq_len
        q = Decimal("0.000001")
        for sid in range(partition.start, partition.end):
            pos1 = _h(f"p1:{sid}") % T
            pos2_raw = _h(f"p2:{sid}") % (T - 1)
            pos2 = pos2_raw + 1 if pos2_raw >= pos1 else pos2_raw
            v1 = _h(f"v:{sid}:{pos1}") / _SPACE
            v2 = _h(f"v:{sid}:{pos2}") / _SPACE
            label = float(Decimal(v1 + v2).quantize(q, rounding=ROUND_HALF_UP))
            yield (sid, pos1, pos2, label)


class AddingProblemDataSource(DataSource):
    """``spark.read.format("adding_problem_py").option("n", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "adding_problem_py"

    def schema(self) -> str:
        return "sample_id bigint, pos1 bigint, pos2 bigint, label double"

    def reader(self, schema) -> AddingProblemReader:
        return AddingProblemReader(self.options)


def register(spark) -> None:
    """Idempotent registration of every custom Python data source."""
    spark.dataSource.register(AddingProblemDataSource)
