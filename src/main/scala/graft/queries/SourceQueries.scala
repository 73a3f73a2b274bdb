package graft.queries

import graft.Tables
import graft.sources.{TypedCsv, TypedJsonl, TypedOrc}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The documents-metadata row shape the typed-source round trips carry
  * (text itself is excluded: embedded newlines would test the formats'
  * quoting dialects, not the ingestion path under test). */
case class DocMeta(doc_id: Long, lang: String, source: String, n_chars: Long)

/** Driver wiring for the typed sources (SURVEY §2 #17/#17b): write the
  * documents metadata out through each format, re-ingest through the
  * typed reader, and hash-check the round trip against the original
  * table — upgrading both sources from spec-only to DuckDB-checked.
  */
object SourceQueries {

  private def meta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars")

  private val csvCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val jsonlCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val orcCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** #17c typed ORC: write → `TypedOrc.read[DocMeta]` → original rows
    * (name-matched columns; same memo + scratch hygiene as CSV). */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame =
    orcCache.getOrElseUpdate((s, dir), Scratch.cleaned("graft_orc") { tmp =>
      meta(s, dir).coalesce(1)
        .write.mode("overwrite").orc(tmp.toString)
      TypedOrc.read[DocMeta](s, tmp.toString).toDF().orderBy("doc_id")
    })

  private val evoCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** #17d schema evolution across snapshot generations: an old
    * snapshot (even ids, three columns) and a new one (odd ids, plus a
    * `quality` column) read together under `mergeSchema` — the lake
    * reality where the schema grew mid-corpus; old rows surface the
    * new column as null, nothing is silently dropped or reordered. */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame =
    evoCache.getOrElseUpdate((s, dir), Scratch.cleaned("graft_evo") { tmp =>
      val docs = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(tmp.resolve("gen1").toString)
      docs.filter(col("doc_id") % 2 === 1)
        .withColumn("quality", col("n_chars") * 2)
        .write.mode("overwrite").parquet(tmp.resolve("gen2").toString)
      s.read.option("mergeSchema", "true")
        .parquet(tmp.resolve("gen1").toString, tmp.resolve("gen2").toString)
        .select("doc_id", "lang", "n_chars", "quality")
        .orderBy("doc_id")
    })

  /** #17 typed CSV: write → `TypedCsv.read[DocMeta]` → original rows.
    * Memoized + scratch-cleaned: one write/read per (session, dir), no
    * leaked temp dirs across bench/validate re-runs. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame =
    csvCache.getOrElseUpdate((s, dir), Scratch.cleaned("graft_csv") { tmp =>
      meta(s, dir).coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(tmp.toString)
      TypedCsv.read[DocMeta](s, tmp.toString).toDF().orderBy("doc_id")
    })

  /** #17b typed JSONL with quarantine: two malformed lines are planted
    * (one JSON-syntax reject, one null-required-field reject — both
    * quarantine categories) and must land in the corrupt channel, not
    * the data; the good side must round-trip exactly. The quarantine
    * count rides along as a constant column so the oracle checks it. */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame =
    jsonlCache.getOrElseUpdate((s, dir), Scratch.cleaned("graft_jsonl") { tmp =>
      meta(s, dir).coalesce(1)
        .write.mode("overwrite").json(tmp.toString)
      java.nio.file.Files.writeString(tmp.resolve("part-planted-bad.json"),
        "{\"oops\": 1}\n{broken json\n")
      val (good, bad) = TypedJsonl.readWithCorrupt[DocMeta](s, tmp.toString)
      good.toDF()
        .crossJoin(broadcast(bad.agg(count(lit(1)).as("n_quarantined"))))
        .orderBy("doc_id")
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "csv_roundtrip"   -> (csvRoundtrip _),
    "jsonl_roundtrip" -> (jsonlRoundtrip _),
    "orc_roundtrip"   -> (orcRoundtrip _),
    "schema_evolution" -> (schemaEvolution _),
  )

  val oracles: Map[String, String] = Map(
    "csv_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    "jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, 2::BIGINT AS n_quarantined
        |FROM documents ORDER BY doc_id""".stripMargin,
    "orc_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    "schema_evolution" ->
      """SELECT doc_id, lang, n_chars,
        |  CASE WHEN doc_id % 2 = 1 THEN n_chars * 2 END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
