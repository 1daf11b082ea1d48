package graft.queries

import org.apache.spark.sql.functions._

/** Placeholder for the text/dedup/similarity batch (filled in M4). */
object Text {
  val all: Seq[Q] = Seq.empty
}
