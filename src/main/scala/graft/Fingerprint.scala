package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Order-independent exact result fingerprint shared by the execution-
  * invariance gates ([[ClusterCheck]] — multi-JVM, [[SpillCheck]] —
  * forced-spill): row count + bit_xor of xxhash64 over all columns.
  * Exactness is the point: the gated queries are deterministic by
  * construction (the DuckDB oracle hash-checks them), so ANY bit of
  * divergence between two execution regimes is a defect in the regime,
  * not noise. */
object Fingerprint {
  final case class Fp(n: Long, xor: Long)

  def of(df: DataFrame): Fp = {
    // Maps hash order-sensitively (Spark disallows hashing them by
    // default for exactly that reason) — normalize through to_json,
    // which renders map entries in insertion order deterministically
    // for these queries' construction paths; everything else feeds
    // xxhash64 natively.
    val cols = df.schema.fields.map { f =>
      if (f.dataType.isInstanceOf[MapType]) to_json(col(f.name))
      else col(f.name)
    }
    val r = df
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(cols.toIndexedSeq: _*)), lit(0L)).as("x"))
      .collect()(0)
    Fp(r.getLong(0), r.getLong(1))
  }
}
