package graft.table

import java.nio.file.{Files, Paths}
import graft.util.Json

/** One data file tracked by a snapshot's manifest.
  *
  * `path` is relative to the table root so tables are relocatable.
  * Stats mirror Iceberg's per-file metrics (reference:
  * TestHelpers.java:94-98) and drive min/max file pruning
  * (reference analog: `scan.filter(expr).planTasks()`,
  * IcebergInputFormat.java:102-107).
  */
final case class DataFileEntry(
    path: String,
    recordCount: Long,
    fileSizeBytes: Long,
    stats: Map[String, ColumnStats],
    partition: Map[String, Option[String]] = Map.empty,
    blooms: Map[String, String] = Map.empty)

/** The full file list of one snapshot (Iceberg "manifest list" collapsed to
  * a single JSON document — at graft's metadata scale one level is enough,
  * and it keeps snapshot reads to one metadata file + footer-free planning).
  */
final case class Manifest(files: Seq[DataFileEntry]) {
  def totalRecords: Long = files.map(_.recordCount).sum

  def write(absPath: String): Unit = {
    val obj = Map("files" -> files.map { f =>
      val base = Map(
        "path" -> f.path,
        "record_count" -> f.recordCount,
        "file_size_bytes" -> f.fileSizeBytes,
        "stats" -> f.stats.map { case (c, st) =>
          c -> Map(
            "min" -> st.min.orNull,
            "max" -> st.max.orNull,
            "null_count" -> st.nullCount.map(Long.box).orNull,
            "value_count" -> st.valueCount.map(Long.box).orNull)
        })
      val withPart =
        if (f.partition.isEmpty) base
        else base + ("partition" -> f.partition.map { case (c, v) => c -> v.orNull })
      if (f.blooms.isEmpty) withPart
      else withPart + ("blooms" -> f.blooms)
    })
    Json.writeFileAtomic(absPath, Json.write(obj))
  }
}

object Manifest {
  val empty: Manifest = Manifest(Seq.empty)

  /** Parsed-manifest cache. Manifest files are write-once (the commit
    * claim serializes who publishes `snap-<id>.json`, and snapshot ids
    * never decrease because the current snapshot is never expired), so a
    * repeat scan of the same snapshot can skip the O(files) JSON parse on
    * the driver — at 100 TB that parse is the per-query planning floor.
    * The key carries (size, mtime) so a table DROPPED AND RECREATED at
    * the same path (tests do this; prod can) never serves the old
    * table's file list. Bounded LRU; entries are immutable case classes,
    * safe to share across threads. */
  private val CacheCap = 64
  private val cache =
    new java.util.LinkedHashMap[(String, Long, Long), Manifest](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), Manifest]): Boolean =
        size() > CacheCap
    }

  def read(absPath: String): Manifest = {
    val attrs = Files.readAttributes(Paths.get(absPath),
      classOf[java.nio.file.attribute.BasicFileAttributes])
    val key = (absPath, attrs.size(), attrs.lastModifiedTime().toMillis)
    val hit = cache.synchronized(Option(cache.get(key)))
    hit.getOrElse {
      val m = parseFile(absPath)
      cache.synchronized(cache.put(key, m))
      m
    }
  }

  private def parseFile(absPath: String): Manifest = {
    val obj = Json.parseObject(Files.readString(Paths.get(absPath)))
    val files = obj("files").asInstanceOf[Seq[Any]].map { f =>
      val m = f.asInstanceOf[Map[String, Any]]
      val stats = m.getOrElse("stats", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]]
        .map { case (c, s) =>
          val sm = s.asInstanceOf[Map[String, Any]]
          c -> ColumnStats(
            Option(sm.getOrElse("min", null)).map(_.toString),
            Option(sm.getOrElse("max", null)).map(_.toString),
            Option(sm.getOrElse("null_count", null)).map(_.asInstanceOf[Long]),
            Option(sm.getOrElse("value_count", null)).map(_.asInstanceOf[Long]))
        }
      val partition = m.getOrElse("partition", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]]
        .map { case (c, v) => c -> Option(v).map(_.toString) }
      val blooms = m.getOrElse("blooms", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]]
        .map { case (c, v) => c -> v.toString }
      DataFileEntry(
        m("path").asInstanceOf[String],
        m("record_count").asInstanceOf[Long],
        m("file_size_bytes").asInstanceOf[Long],
        stats,
        partition,
        blooms)
    }
    Manifest(files)
  }
}
