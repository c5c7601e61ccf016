package graft.state

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Storage contract behind [[StateStore]]: the four primitives the
  * micro-batch state layer needs from a table store. The upsert/CDC
  * operator semantics live entirely ABOVE this interface, so swapping
  * the backend (parquet-swap today; a transactional table format's
  * MERGE/append on an object store tomorrow) changes no query behavior
  * — the integration slot the reference's SQLite layer corresponds to
  * (/root/reference/app.py:20-52).
  */
trait StateBackend {

  /** Read table `name`, or an empty frame of `schema` if absent. */
  def read(name: String, schema: StructType): DataFrame

  /** Durably append `df`'s rows to table `name`. */
  def append(name: String, df: DataFrame): Unit

  /** Atomically replace table `name`'s contents with `df`'s rows:
    * readers see the old state or the new state, never a mix, and a
    * crash at any point must be recoverable to one of the two.
    */
  def rewrite(name: String, df: DataFrame): Unit

  /** Bring every table back to a consistent state after a crash — run
    * once before any read.
    */
  def recoverAll(): Unit
}

/** Plain-parquet [[StateBackend]]: appends are parquet part-file
  * appends; [[rewrite]] materializes into `<name>__tmp` and swaps it
  * live with two same-directory renames (live → `__old`, tmp → live) —
  * never a delete-then-move, so every crash point leaves either the old
  * state intact or a committed temp that [[recoverAll]] finishes; the
  * table is never lost. The rename starts only after the parquet commit
  * protocol has written `_SUCCESS`.
  */
class ParquetSwapBackend(spark: SparkSession, root: Path)
    extends StateBackend {

  private def sub(name: String): Path = root.resolve(name)

  override def read(name: String, schema: StructType): DataFrame = {
    val p = sub(name)
    val nonEmpty = Files.exists(p) && {
      val s = Files.list(p)
      try s.findFirst().isPresent finally s.close()
    }
    if (nonEmpty)
      spark.read.schema(schema).parquet(p.toString)
    else
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
  }

  override def append(name: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(sub(name).toString)

  override def rewrite(name: String, df: DataFrame): Unit = {
    val tmp = sub(s"${name}__tmp")
    val live = sub(name)
    val old = sub(s"${name}__old")
    deleteRecursively(tmp)
    deleteRecursively(old)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (Files.exists(live)) Files.move(live, old)
    Files.move(tmp, live)
    deleteRecursively(old)
  }

  /** Find every table with a leftover `__tmp`/`__old` sibling (no
    * hardcoded name list — any future rewritten table is covered) and
    * run its crash recovery.
    */
  override def recoverAll(): Unit = {
    val s = Files.list(root)
    val bases =
      try {
        val it = s.iterator()
        val b = Set.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.endsWith("__tmp")) b += n.stripSuffix("__tmp")
          else if (n.endsWith("__old")) b += n.stripSuffix("__old")
        }
        b.result()
      } finally s.close()
    bases.foreach(recoverSwap)
  }

  /** Crash recovery for [[rewrite]]'s rename sequence. If the live dir
    * is gone: a fully-committed temp (Spark's `_SUCCESS` marker) is the
    * newer state — finish the swap; otherwise the renamed-away `__old`
    * dir is the last good state — restore it (covers deployments where
    * success markers are disabled). Any remaining temp/old dir is stale
    * and removed.
    */
  private def recoverSwap(name: String): Unit = {
    val live = sub(name)
    val tmp = sub(s"${name}__tmp")
    val old = sub(s"${name}__old")
    if (!Files.exists(live) && Files.exists(tmp.resolve("_SUCCESS")))
      Files.move(tmp, live)
    else if (!Files.exists(live) && Files.exists(old))
      Files.move(old, live)
    if (Files.exists(live)) {
      deleteRecursively(tmp)
      deleteRecursively(old)
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
