"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the seeded order generator exposed as a first-class *format*, so

    spark.dataSource.register(SeededOrdersDataSource)
    spark.read.format("seeded_orders").option("n", 1000).load()

plans real input partitions (parallel read, no driver materialization).

Two generators coexist on purpose:

* ``sources/generator.py`` — Column-expression generation, the FAST path
  (JVM codegen, no Python workers). Use it when the data is born inside
  Spark.
* this module — the DataSource V2 extension point, the pattern you use
  to ingest an EXTERNAL row-producing system (the reference's
  Lambda-behind-S3, a REST feed, a message queue): Spark asks the
  source for partitions, then pulls each partition's rows inside an
  executor Python worker.

Rows follow the reference generator's exact distributions and money
math (`/root/reference/ecommerce-order-generator-function.py:38-107`,
Python banker's rounding included) so generated orders pass
``validate_order`` and enrich identically. Every row is a pure function
of ``(seed, global index)``: re-reads, different partition counts, and
retried tasks all produce the identical multiset — the property that
makes a custom source safe under Spark's task-retry semantics.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Executor Python workers deserialize the reader CLASS by module
# reference; register this module for by-value pickling so the source
# works even when the repo is only on the driver's runtime sys.path
# (same rationale as operators/multimodal.py).
_sys_mod = __import__("sys").modules
try:
    from pyspark import cloudpickle as _cp
except ImportError:  # pragma: no cover
    import cloudpickle as _cp
_cp.register_pickle_by_value(_sys_mod[__name__])

from ..schemas import RAW_ORDER_SCHEMA
from .catalog import (
    CITIES,
    EMAIL_DOMAINS,
    ORDER_STATUSES,
    PAYMENT_METHODS,
    PAYMENT_WEIGHTS,
    PRODUCTS,
    STATUS_WEIGHTS,
)

# fixed epoch for deterministic timestamps (override with .option("as_of"))
_DEFAULT_AS_OF = "2026-01-01T00:00:00+00:00"
_NUM_ITEMS_W = ([1, 2, 3], [0.5, 0.3, 0.2])  # generator:49
_QTY_W = ([1, 2], [0.8, 0.2])  # generator:54
_DISCOUNTS = [0, 5, 10]  # generator:55


def _gen_order(seed: int, idx: int, as_of: datetime) -> tuple:
    """One raw order as a RAW_ORDER_SCHEMA-ordered tuple, derived only
    from (seed, idx)."""
    rng = random.Random((seed << 32) ^ idx)
    num_items = rng.choices(*_NUM_ITEMS_W)[0]
    items = []
    for p in rng.sample(PRODUCTS, num_items):
        pid, name, category, _group, price = p
        qty = rng.choices(*_QTY_W)[0]
        pct = rng.choice(_DISCOUNTS) if rng.random() < 0.2 else 0
        disc = round(price * (pct / 100), 2)
        items.append(
            (pid, name, category, qty, price, pct, round(disc * qty, 2),
             round((price - disc) * qty, 2))
        )
    subtotal = sum(i[7] for i in items)
    total_discount = sum(i[6] for i in items)
    city = rng.choice(CITIES)
    shipping = 0.0 if subtotal >= 100 else (4.99 if city in CITIES[:3] else 7.99)
    tax = round((subtotal + shipping) * 0.20, 2)
    total = round(subtotal + shipping + tax, 2)
    status = rng.choices(ORDER_STATUSES, weights=STATUS_WEIGHTS)[0]
    payment = rng.choices(PAYMENT_METHODS, weights=PAYMENT_WEIGHTS)[0]
    order_time = as_of - timedelta(days=rng.randint(0, 7))
    cust_digits = "".join(rng.choices(string.digits, k=8))
    return (
        "ORD-" + as_of.strftime("%Y%m%d") + "-"
        + "".join(rng.choices(string.ascii_uppercase + string.digits, k=8)),
        order_time.isoformat(),
        f"CUST-{cust_digits}",
        f"customer{cust_digits}@{rng.choice(EMAIL_DOMAINS)}",
        city,
        items,
        len(items),
        sum(i[3] for i in items),
        subtotal,
        total_discount,
        shipping,
        0.20,
        tax,
        total,
        payment,
        status,
        as_of.isoformat(),
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        super().__init__((start, end))
        self.start, self.end = start, end


class SeededOrdersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 100))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.as_of = datetime.fromisoformat(options.get("as_of", _DEFAULT_AS_OF))
        if self.as_of.tzinfo is None:
            self.as_of = self.as_of.replace(tzinfo=timezone.utc)

    def partitions(self):
        # contiguous index ranges: the global index — not the partition —
        # seeds each row, so any partitioning yields the same multiset
        per = -(-self.n // self.num_partitions)
        return [
            _Range(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _gen_order(self.seed, i, self.as_of)


class SeededOrdersStreamReader(SimpleDataSourceStreamReader):
    """Unbounded variant: the reference's recurring generator Lambda as
    a STREAMING source. The offset is simply the next global row index —
    ``read`` emits ``rows_per_batch`` rows per micro-batch and advances
    it; ``readBetweenOffsets`` regenerates any [start, end) slice
    bit-identically (rows are pure functions of (seed, index)), which is
    exactly what makes checkpoint replay exactly-once for this source.
    """

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 20))
        self.seed = int(options.get("seed", 42))
        self.as_of = datetime.fromisoformat(options.get("as_of", _DEFAULT_AS_OF))
        if self.as_of.tzinfo is None:
            self.as_of = self.as_of.replace(tzinfo=timezone.utc)

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _slice(self, lo: int, hi: int) -> list[tuple]:
        return [_gen_order(self.seed, i, self.as_of) for i in range(lo, hi)]

    def read(self, start: dict):
        # a concrete LIST here: the driver-side prefetcher pickles these
        # records alongside the offset (a generator cannot be pickled)
        lo = int(start["next"])
        hi = lo + self.rows_per_batch
        return self._slice(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # an ITERATOR here: this replay path runs inside the partition
        # reader, whose contract type-checks for an iterator
        return iter(self._slice(int(start["next"]), int(end["next"])))


class SeededOrdersDataSource(DataSource):
    """``spark.read.format("seeded_orders")`` (batch) or
    ``spark.readStream.format("seeded_orders")`` (unbounded) after
    registration.

    Options: ``n`` rows (batch, default 100), ``partitions`` planned
    input splits (batch, default 8), ``rows_per_batch`` (stream, default
    20), ``seed`` (default 42), ``as_of`` ISO timestamp anchoring order
    dates (defaults to a fixed instant so reads are reproducible; pass
    now() for reference-faithful wall-clock data).
    """

    @classmethod
    def name(cls) -> str:
        return "seeded_orders"

    def schema(self):
        return RAW_ORDER_SCHEMA

    def reader(self, schema) -> SeededOrdersReader:
        return SeededOrdersReader(self.options)

    def simpleStreamReader(self, schema) -> SeededOrdersStreamReader:
        return SeededOrdersStreamReader(self.options)
