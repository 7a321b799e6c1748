package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.SnapshotTable

/** Engine catalog of materialized outputs (SURVEY.md §2.1 S4, §2.10 D1-D4):
  * the `ref()` / `spark.table` surface over [[SnapshotTable]] lake layout
  * `<lakeRoot>/<schema>/<table>/snapshot=N`.
  *
  * Views register as `<schema>__<table>` (Spark temp views are
  * single-part names), so the reference's three-part
  * `iceberg.raw.provider_postgres` becomes `raw__provider_postgres` in
  * `spark.sql` — the generic SQL executor (D4) is `sql()` below. Listing
  * discovers tables from the filesystem, so a catalog built on an existing
  * lake root sees everything previously published there (Nessie-style
  * catalog-from-storage, no separate metastore to drift).
  */
class GraftCatalog(spark: SparkSession, lakeRoot: String) {

  def table(schema: String, name: String): SnapshotTable =
    new SnapshotTable(spark, s"$lakeRoot/$schema/$name")

  def read(schema: String, name: String): DataFrame = table(schema, name).read()

  def viewName(schema: String, name: String): String = s"${schema}__$name"

  /** Register one published table as a temp view for SQL access. */
  def register(schema: String, name: String): Unit =
    read(schema, name).createOrReplaceTempView(viewName(schema, name))

  /** Time-travel view: pin `<schema>__<table>__v<N>` to snapshot N. */
  def registerVersion(schema: String, name: String, version: Long): String = {
    val v = s"${viewName(schema, name)}__v$version"
    table(schema, name).readVersion(version).createOrReplaceTempView(v)
    v
  }

  /** Discover schemas/tables from the lake layout: any directory with a
    * published pointer (`_LATEST.<seq>`, or a legacy bare `_LATEST`). */
  def listTables(): Seq[(String, String)] = {
    val fs = new org.apache.hadoop.fs.Path(lakeRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(lakeRoot)
    if (!fs.exists(root)) return Nil
    for {
      schemaDir <- fs.listStatus(root).toSeq if schemaDir.isDirectory
      tableDir <- fs.listStatus(schemaDir.getPath).toSeq if tableDir.isDirectory
      if fs.listStatus(tableDir.getPath).exists { f =>
        val n = f.getPath.getName
        n == "_LATEST" || (n.startsWith("_LATEST.") && !n.contains("tmp"))
      }
    } yield (schemaDir.getPath.getName, tableDir.getPath.getName)
  }

  /** Register every published table (idempotent; call after pipeline runs
    * or at session start to expose the whole lake to SQL). */
  def registerAll(): Seq[String] =
    listTables().map { case (s, t) => register(s, t); viewName(s, t) }

  /** Generic SQL executor over registered views (reference
    * `engine.py:46-50` equivalent). */
  def sql(query: String): DataFrame = spark.sql(query)
}
