package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Run-date file discovery (reference notebooks/bronze_arxiv.py:22-40,
  * SURVEY §2.1 S5/S6): list a landing directory, keep files whose name
  * starts with the formatted run date, and pick the latest by the
  * embedded timestamp token (`name.split('_')[-2]`).
  *
  * Uses the Hadoop FileSystem API so the same code works on local FS,
  * HDFS, or an object store; listing is a driver-side metadata op (the
  * reference does the same via dbutils.fs.ls).
  */
object Discovery {

  /** Files under `dir` whose basename starts with `runDatePrefix`
    * (arxiv uses `yyyy-MM-dd`, scholar/nyt use `yyyy_MM_dd` — the caller
    * formats; reference bronze_arxiv.py:25 vs bronze_google_scholar.py:24).
    */
  def runDateFiles(spark: SparkSession, dir: String, runDatePrefix: String): Seq[String] = {
    val p  = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .filter(_.isFile)
        .map(_.getPath)
        .filter(_.getName.startsWith(runDatePrefix))
        .map(_.toString)
        .toSeq
        .sorted
  }

  /** Latest file by the timestamp token before the final `_` segment
    * (reference bronze_arxiv.py:34-40: `f.name.split('_')[-2]`).
    * Returns None when the list is empty (the reference asserts).
    */
  def latestFile(files: Seq[String]): Option[String] = {
    def tsToken(f: String): String = {
      val name  = f.split('/').last
      val parts = name.split('_')
      if (parts.length >= 2) parts(parts.length - 2) else name
    }
    if (files.isEmpty) None else Some(files.maxBy(tsToken))
  }

  /** Discovery for one run: prefix-filter then latest-pick. */
  def latestForRunDate(spark: SparkSession, dir: String, runDatePrefix: String): Option[String] =
    latestFile(runDateFiles(spark, dir, runDatePrefix))
}
