package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views of the driver tables: `Dataset[T]` with case-class
  * encoders for callers who want compile-time row shapes (the
  * DataFrame operators stay the primary surface — schemas there are
  * config-driven and dynamic by design). Encoders are Tungsten
  * codegen'd, so `.as[T]` costs a checked analysis step, not a
  * runtime conversion; typed lambdas (`.filter(e => …)`), by
  * contrast, DO opaque-box predicates out of Catalyst — keep
  * pushdown-able filters as columns and reach for the lambda only
  * when the predicate genuinely needs Scala.
  */
object Typed {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def events(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    Tables.events(s, dir).as[Event]
  }

  def documents(s: SparkSession, dir: String): Dataset[Document] = {
    import s.implicits._
    Tables.documents(s, dir).as[Document]
  }

  def embeddings(s: SparkSession, dir: String): Dataset[Embedding] = {
    import s.implicits._
    Tables.embeddings(s, dir).as[Embedding]
  }
}
