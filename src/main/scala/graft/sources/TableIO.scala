package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-semantics emulation over partitioned Parquet (SURVEY.md §1.5:
  * no Iceberg runtime jar offline, so snapshots are immutable directories
  * `snap-<id>/` plus a JSON manifest, behind this narrow facade that a
  * real Iceberg catalog could replace).
  *
  * Guarantees we keep from Iceberg: immutable snapshots, atomic commit
  * (manifest written last, via temp-file rename), snapshot listing, and
  * partition-level metadata. Readers only ever see a snapshot whose
  * manifest exists.
  */
object TableIO extends Serializable {

  final case class Snapshot(id: Long, path: String, partitions: Seq[String])

  private def manifestPath(tableDir: String, id: Long) =
    Paths.get(tableDir, s"manifest-$id.json")

  /** Directory listing with the stream CLOSED (Files.list holds an fd —
    * leaking it on repeated sync/commit loops exhausts driver fds).
    */
  private def listNames(dir: java.nio.file.Path): Seq[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toList
    finally s.close()
  }

  /** Write df as a new immutable snapshot of tableDir; returns snapshot id.
    * Atomicity: data lands under snap-<id>/ first; the manifest JSON is
    * moved into place last (rename is atomic on a local/posix fs; on a
    * real object store this is an Iceberg metadata swap).
    */
  def commitSnapshot(
      df: DataFrame,
      tableDir: String,
      partitionBy: Seq[String] = Nil
  ): Long = {
    Files.createDirectories(Paths.get(tableDir))
    val id = nextSnapshotId(tableDir)
    val dataDir = s"$tableDir/snap-$id"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dataDir)
    val parts =
      if (partitionBy.isEmpty) Nil
      else listNames(Paths.get(dataDir)).filter(_.contains("=")).sorted
    val json =
      s"""{"snapshot_id":$id,"data":"snap-$id","partition_by":[${partitionBy
          .map("\"" + _ + "\"").mkString(",")}],"partitions":[${parts
          .map("\"" + _ + "\"").mkString(",")}]}"""
    val tmp = Paths.get(tableDir, s".manifest-$id.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(tableDir, id), StandardCopyOption.ATOMIC_MOVE)
    id
  }

  private def nextSnapshotId(tableDir: String): Long = {
    val existing = snapshotIds(tableDir)
    if (existing.isEmpty) 1L else existing.max + 1L
  }

  def snapshotIds(tableDir: String): Seq[Long] = {
    val dir = Paths.get(tableDir)
    if (!Files.exists(dir)) return Nil
    listNames(dir)
      .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toLong
      }
      .sorted
  }

  /** Read the latest (or a specific) snapshot as a DataFrame. */
  def readSnapshot(
      spark: SparkSession,
      tableDir: String,
      id: Option[Long] = None
  ): DataFrame = {
    val sid = id.getOrElse {
      val ids = snapshotIds(tableDir)
      require(ids.nonEmpty, s"no snapshots in $tableDir")
      ids.max
    }
    spark.read.parquet(s"$tableDir/snap-$sid")
  }
}
