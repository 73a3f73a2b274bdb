package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump the formatted physical plan of several queries to files in one
  * JVM (debugging/optimization-evidence aid).
  * Usage: ExplainMany <sfDir> <outDir> <query> [query ...] */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    args.drop(2).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(out.resolve(s"$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
