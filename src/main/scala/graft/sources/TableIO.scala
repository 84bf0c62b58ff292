package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-semantics emulation over partitioned Parquet (SURVEY.md §1.5:
  * no Iceberg runtime jar offline, so snapshots are immutable directories
  * `snap-<id>/` plus a JSON manifest, behind this narrow facade that a
  * real Iceberg catalog could replace).
  *
  * Guarantees we keep from Iceberg: immutable snapshots, atomic commit
  * (manifest written last, via temp-file rename), snapshot listing, and
  * partition-level metadata. Readers only ever see a snapshot whose
  * manifest exists. All control I/O goes through the Hadoop FileSystem
  * API ([[Fsx]]) so a table at `hdfs://…`/`s3a://…` behaves exactly like
  * a local one — data and manifests on the same filesystem.
  */
object TableIO extends Serializable {

  final case class Snapshot(id: Long, path: String, partitions: Seq[String])

  private def manifestPath(tableDir: String, id: Long) =
    s"$tableDir/manifest-$id.json"

  /** Write df as a new immutable snapshot of tableDir; returns snapshot id.
    * Atomicity: data lands under snap-<id>/ first; the manifest JSON is
    * renamed into place last (on a real object store this is an Iceberg
    * metadata swap).
    */
  def commitSnapshot(
      df: DataFrame,
      tableDir: String,
      partitionBy: Seq[String] = Nil
  ): Long = {
    Fsx.mkdirs(tableDir)
    val id = nextSnapshotId(tableDir)
    val dataDir = s"$tableDir/snap-$id"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dataDir)
    val parts =
      if (partitionBy.isEmpty) Nil
      else Fsx.listNames(dataDir).filter(_.contains("=")).sorted
    val json =
      s"""{"snapshot_id":$id,"data":"snap-$id","partition_by":[${partitionBy
          .map("\"" + _ + "\"").mkString(",")}],"partitions":[${parts
          .map("\"" + _ + "\"").mkString(",")}]}"""
    Fsx.writeUtf8Atomic(manifestPath(tableDir, id), json)
    id
  }

  private def nextSnapshotId(tableDir: String): Long = {
    val existing = snapshotIds(tableDir)
    if (existing.isEmpty) 1L else existing.max + 1L
  }

  def snapshotIds(tableDir: String): Seq[Long] =
    Fsx.listNames(tableDir)
      .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toLong
      }
      .sorted

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
