package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.checks.Checks.{Check, NotNull, Unique}
import graft.sinks.SnapshotTable
import graft.sources.Debezium

/** Generic CDC-table ingestion: build the raw + shredded stage pair for
  * ANY Debezium-captured table from a declarative spec — the reference
  * hardcodes its two tables; at fleet scale (hundreds of captured tables)
  * the pipeline must be spec-driven.
  *
  * Per table: raw stage = tombstone-filtered envelope rows merged by PK
  * into a date-partitioned snapshot table; shredded stage = typed columns
  * from the after-image with PK uniqueness/not-null checks, WAP-audited.
  */
object CdcTablePipeline {

  final case class TableSpec(
      table: String,
      topicPath: String,
      keyField: String,
      rowSchema: StructType,
      extraChecks: Seq[Check] = Nil,
      tags: Set[String] = Set.empty)

  def rawStageName(t: TableSpec): String = s"raw_${t.table}"
  def shreddedStageName(t: TableSpec): String = s"shredded_${t.table}"

  def stagesFor(spark: SparkSession, spec: TableSpec, lakeRoot: String): Seq[Stage] = {
    val rawTable = new SnapshotTable(spark, s"$lakeRoot/raw/${spec.table}")
    val shreddedTable = new SnapshotTable(spark, s"$lakeRoot/shredded/${spec.table}")
    Seq(
      Stage(
        name = rawStageName(spec),
        tags = spec.tags + "raw" + "cdc",
        // schema is declared in the spec → single-parse typed raw model;
        // raw layer persists the reference contract (string after-image).
        // Garbage messages (unparseable payload) quarantine instead of
        // masquerading as tombstones.
        build = (s, _) => {
          val (valid, malformed) = Debezium.splitMalformed(
            Debezium.readJsonl(s, spec.topicPath))
          if (!malformed.isEmpty)
            new SnapshotTable(s, s"$lakeRoot/quarantine/${spec.table}_cdc")
              .overwrite(malformed)
          Debezium.rawModelTyped(valid, spec.keyField, spec.rowSchema)
            .drop("after")
        },
        checks = Seq(NotNull(spec.keyField), Unique(Seq(spec.keyField))),
        sink = Some(Merge(rawTable, Seq(spec.keyField),
          Seq(col("cdc_ts_ms")), partitionBy = Seq("ingestion_cdc_date")))),
      Stage(
        name = shreddedStageName(spec),
        deps = Seq(rawStageName(spec)),
        tags = spec.tags + "shredded",
        build = (_, ctx) => Debezium.shred(
          ctx(rawStageName(spec)), spec.rowSchema)
          .select(spec.rowSchema.fieldNames.toIndexedSeq.map(col) :+
            col("ingestion_cdc_date"): _*),
        checks = Seq(NotNull(spec.keyField), Unique(Seq(spec.keyField))) ++
          spec.extraChecks,
        sink = Some(Overwrite(shreddedTable))))
  }

  /** One pipeline covering a fleet of captured tables. */
  def build(spark: SparkSession, specs: Seq[TableSpec], lakeRoot: String): Pipeline =
    new Pipeline(specs.flatMap(stagesFor(spark, _, lakeRoot)))
}
