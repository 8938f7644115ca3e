package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives as pure Catalyst expressions (no UDFs —
  * `zip_with`/`aggregate` stay in codegen and need no serialization).
  *
  * All math is done in double: parquet float32 embeddings are widened
  * exactly, and a sequential left-to-right `aggregate` sum makes the
  * result reproducible across engines for oracle comparison.
  */
object VectorOps {

  /** Exact float32 -> float64 widening of an embedding column. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product of two array<double> columns — the native codegen'd
    * expression (primitive loop, no per-element lambda or allocation).
    * Evaluation order is the same sequential left-to-right sum as the
    * composed form, so oracle results are unchanged. */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.vecDot(a, b)

  /** The pure-functions composed form (kept as the reference
    * implementation; see VectorExpressionsSpec for the equivalence test). */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with precomputed norms (precompute per row before a
    * pairwise join — norms are O(n), pairs are O(n^2)). Zero-norm inputs
    * yield NULL rather than an ANSI divide-by-zero job failure, so
    * threshold filters drop such pairs instead of one degenerate
    * embedding killing a 100 TB run. DuckDB's plain float division gives
    * NaN for 0/0 — which sorts ABOVE every value under ORDER BY cos DESC
    * — so every cosine oracle divides by `nullif(na * nb, 0)` to land on
    * the identical NULL (dropped by filters, last in rank) semantics; for
    * every non-zero divisor `try_divide` is the identical double
    * division. */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    try_divide(dotAB, normA * normB)

  /** Cosine similarity of two raw vectors. */
  def cosine(a: Column, b: Column): Column =
    cosinePre(dot(a, b), norm(a), norm(b))
}
