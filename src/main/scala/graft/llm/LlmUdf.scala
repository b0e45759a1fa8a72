package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Per-row LLM call surface (operator X6 in SURVEY.md §2.8) — the
  * north-star "DataFrame + UDF for OpenAI calls" directive, implemented
  * as `mapPartitions` so the transport client is constructed ONCE per
  * partition (per task), not per row, and rows within a partition share
  * a connection — the Spark analog of the reference batching rows into
  * one Batch-API file.
  *
  * The client factory is a plain serializable function so production
  * injects an HTTP-backed client while tests/offline inject
  * [[StubBatchClient]] (this environment is zero-egress).
  */
object LlmUdf {

  /** df + `outCol` string column = model response for (system, user)
    * prompt built from `textCol`. Schema-preserving append.
    */
  def withCompletions(df: DataFrame, textCol: String, outCol: String,
                      model: String, systemPrompt: String,
                      clientFactory: () => BatchClient): DataFrame = {
    val schema = df.schema.add(StructField(outCol, StringType, nullable = true))
    val enc = Encoders.row(schema)
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val client = clientFactory() // one client per task
      rows.map { r =>
        val text = if (r.isNullAt(textIdx)) null else r.getString(textIdx)
        val resp =
          if (text == null) null
          else Retry.withRetry(attempts = 3, baseDelayMs = 0, sleep = _ => ())(
            client.chat(model, systemPrompt, text))
        Row.fromSeq(r.toSeq :+ resp)
      }
    }(enc)
  }
}
