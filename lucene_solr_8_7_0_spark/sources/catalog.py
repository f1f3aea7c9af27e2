"""Table catalog: one seam between the engine and the table format.

The production design (SURVEY.md §1.3, north rule) stores every index
table in Iceberg: snapshots give the commit-point semantics
(SegmentInfos analog), metadata min/max on the sorted ``term`` column
gives term-dictionary pruning (the FST .tip analog), and hidden
partitioning handles file management (compound-file analog).

This sandbox has no Iceberg runtime jar, so the default format is
plain parquet — the dataframe-level API is IDENTICAL (`spark.read` /
`df.writeTo(...)`), and on a cluster you switch by constructing
``TableCatalog(fmt="iceberg", catalog="my_cat", db="search")``:

  parquet (local)                    iceberg (cluster)
  -------------------------------   --------------------------------
  write: df.write.parquet(path)     df.writeTo(f"{cat}.{db}.{t}")
                                       .createOrReplace()
  read:  spark.read.parquet(path)   spark.read.table(f"{cat}.{db}.{t}")
  commit: _SUCCESS marker file      snapshot commit (atomic)
  resume: marker existence          snapshot existence / WAP branch
  pruning: row-group min/max        manifest-level min/max + partition
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TableCatalog:
    root: str            # directory (parquet) or namespace (iceberg)
    fmt: str = "parquet"

    def _ident(self, name: str) -> str:
        if self.fmt == "iceberg":
            return f"{self.root}.{name}"
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, sort_cols: list[str] | None = None,
              mode: str = "overwrite") -> None:
        if sort_cols:
            df = df.sortWithinPartitions(*sort_cols)
        if self.fmt == "iceberg":
            w = df.writeTo(self._ident(name))
            (w.createOrReplace() if mode == "overwrite" else w.append())
        else:
            df.write.mode(mode).format(self.fmt).save(self._ident(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.table(self._ident(name))
        return spark.read.format(self.fmt).load(self._ident(name))

    def exists(self, name: str) -> bool:
        if self.fmt == "iceberg":
            raise NotImplementedError("use catalog.tableExists on cluster")
        return os.path.exists(os.path.join(self._ident(name), "_SUCCESS"))
