package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Object-store / filesystem operations (SURVEY.md §2.2 K5 — the MinIO
  * adapter surface: upload/download/list/create-bucket) over the Hadoop
  * `FileSystem` API, so the same code serves `file://` in tests and
  * `s3a://` in production.
  */
class ObjectStore(spark: SparkSession, baseUri: String) {

  private def fs: FileSystem =
    new Path(baseUri).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def p(key: String) = new Path(s"$baseUri/$key")

  /** create-bucket analog. */
  def mkdirs(key: String): Boolean = fs.mkdirs(p(key))

  def exists(key: String): Boolean = fs.exists(p(key))

  def upload(key: String, bytes: Array[Byte]): Unit = {
    val out = fs.create(p(key), true)
    try out.write(bytes) finally out.close()
  }

  def download(key: String): Array[Byte] = {
    val in = fs.open(p(key))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  def list(prefix: String): Seq[String] = {
    val path = p(prefix)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toSeq.map(_.getPath.getName)
  }

  def delete(key: String, recursive: Boolean = false): Boolean =
    fs.delete(p(key), recursive)
}
