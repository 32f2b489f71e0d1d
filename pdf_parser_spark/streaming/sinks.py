"""Span-table sink selection: Iceberg ``writeTo(...).append()`` when an
Iceberg catalog is configured, parquet-directory fallback otherwise
(SURVEY.md §2.1 S7 — the reference's table sink maps to
``writeTo("db.extracted_spans").append()``).

The north_star targets an Iceberg table of 10^12 documents; in that
deployment each checkpoint group commit becomes ONE Iceberg snapshot
(atomic append) carrying the bucket list as a snapshot property —
exactly the semantics streaming/checkpoint.py implements with local
JSON markers as the sandbox stand-in. This module makes the selection
real code instead of a docstring: a dotted table identifier whose
catalog is a configured Iceberg catalog routes to the DataFrameWriterV2
path; a filesystem path routes to partitioned parquet directories.

The sandbox has no Iceberg runtime jar, so the Iceberg path is
stub-tested (selection logic + recorded writeTo call chain); the
parquet path is exercised end-to-end by the checkpoint tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Spark catalog plugin classes that identify an Iceberg catalog
# (org.apache.iceberg.spark.SparkCatalog / SparkSessionCatalog); the
# match is substring-based so vendor subclasses qualify too.
_ICEBERG_MARKER = "iceberg"


def iceberg_catalogs(spark: SparkSession) -> dict[str, str]:
    """Configured Iceberg catalogs: ``spark.sql.catalog.<name>`` conf
    entries whose plugin class mentions Iceberg. Checks both the static
    SparkConf and session-level SET conf (catalogs are normally static
    — the jar must be on the classpath — but tests and notebooks set
    them at session level)."""
    entries: dict[str, str] = {}
    for k, v in spark.sparkContext.getConf().getAll():
        entries.setdefault(k, v)
    try:
        for row in spark.sql("SET").collect():
            entries.setdefault(row["key"], row["value"])
    except Exception:  # pragma: no cover - SET is core SQL; belt and braces
        pass
    out: dict[str, str] = {}
    for k, v in entries.items():
        parts = k.split(".")
        if (
            len(parts) == 4
            and parts[:3] == ["spark", "sql", "catalog"]
            and _ICEBERG_MARKER in str(v).lower()
        ):
            out[parts[3]] = v
    return out


def looks_like_path(target: str) -> bool:
    """Filesystem/object-store path vs dotted table identifier."""
    return (
        "/" in target
        or "\\" in target
        or target.startswith(".")
        or "://" in target
        or target in ("", os.curdir, os.pardir)
    )


class ParquetDirSink:
    """Partitioned parquet directories under ``root`` — the sandbox/
    filesystem deployment. One directory per checkpoint group;
    overwrite is idempotent so a replayed group never duplicates."""

    kind = "parquet"

    def __init__(self, root: str):
        self.root = root

    def group_location(self, group_name: str) -> str:
        return os.path.join(self.root, "spans", group_name)

    def write_group(self, df: DataFrame, group_name: str) -> None:
        df.write.mode("overwrite").parquet(self.group_location(group_name))

    def read_group(self, spark: SparkSession, group_name: str) -> DataFrame:
        return spark.read.parquet(self.group_location(group_name))

    def read_groups(self, spark: SparkSession, group_names: list[str]) -> DataFrame:
        dirs = [
            self.group_location(g)
            for g in group_names
            if os.path.isdir(self.group_location(g))
        ]
        if not dirs:
            raise FileNotFoundError(f"no committed span groups under {self.root}")
        return spark.read.parquet(*dirs)


class IcebergTableSink:
    """Iceberg table via DataFrameWriterV2: each group write is ONE
    atomic ``writeTo(table).append()`` (an Iceberg snapshot commit).
    Group membership travels in a ``_group`` column so a replayed group
    can be compensated (``DELETE WHERE _group = ...`` then re-append)
    and committed-group reads are a partition-pruned filter. The first
    write creates the table partitioned by ``_group`` (compensation
    deletes and group reads then partition-prune; add
    ``bucket(N, doc_id)`` by pre-creating the table for read-side
    pruning too). Existence is checked via the catalog — never by
    catching an append failure, which would mask real append errors
    (schema drift, permissions, transients) behind a confusing
    create-time message (round-3 ADVICE)."""

    kind = "iceberg"

    def __init__(self, table: str):
        self.table = table

    def group_location(self, group_name: str) -> str:
        return f"{self.table}[_group={group_name}]"

    def _with_group(self, df: DataFrame, group_name: str):
        from pyspark.sql import functions as F

        return df.withColumn("_group", F.lit(group_name))

    def write_group(self, df: DataFrame, group_name: str) -> None:
        from pyspark.sql import functions as F

        out = self._with_group(df, group_name)
        if out.sparkSession.catalog.tableExists(self.table):
            # a replayed group re-running after a crash between append
            # and marker commit is handled by the caller deleting the
            # uncommitted group first — see checkpoint._clean_uncommitted
            out.writeTo(self.table).append()
        else:
            out.writeTo(self.table).using("iceberg").partitionedBy(
                F.col("_group")
            ).create()

    def delete_group(self, spark: SparkSession, group_name: str) -> None:
        """Compensation delete for an uncommitted append; a missing
        table (nothing ever appended) is not an error."""
        if not spark.catalog.tableExists(self.table):
            return
        spark.sql(f"DELETE FROM {self.table} WHERE _group = '{group_name}'")

    def read_group(self, spark: SparkSession, group_name: str) -> DataFrame:
        from pyspark.sql import functions as F

        return (
            spark.read.table(self.table)
            .filter(F.col("_group") == group_name)
            .drop("_group")
        )

    def read_groups(self, spark: SparkSession, group_names: list[str]) -> DataFrame:
        from pyspark.sql import functions as F

        return (
            spark.read.table(self.table)
            .filter(F.col("_group").isin(list(group_names)))
            .drop("_group")
        )


def resolve_sink(spark: SparkSession, target: str):
    """Pick the sink for ``target``:

    - a filesystem path → :class:`ParquetDirSink`;
    - a dotted table identifier whose catalog (explicit
      ``cat.db.table``, or the session catalog for ``db.table``) is a
      configured Iceberg catalog → :class:`IcebergTableSink`;
    - a table identifier with NO matching Iceberg catalog raises —
      silently writing parquet where the caller named a table would
      strand the data outside the catalog.
    """
    if looks_like_path(target):
        return ParquetDirSink(target)
    parts = target.split(".")
    cats = iceberg_catalogs(spark)
    if len(parts) >= 3 and parts[0] in cats:
        return IcebergTableSink(target)
    if len(parts) == 2 and "spark_catalog" in cats:
        # Iceberg SparkSessionCatalog overlays the default session catalog
        return IcebergTableSink(target)
    raise ValueError(
        f"table target {target!r} has no configured Iceberg catalog "
        f"(found: {sorted(cats) or 'none'}); pass a filesystem path for "
        "the parquet sink or configure spark.sql.catalog.<name>"
    )
