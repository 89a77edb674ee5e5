package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.expressions.{Literal, LiteralValue}
import org.apache.spark.sql.types.DataType

/** Test-only bridge: `LiteralValue` is Scala-`private[sql]` (its
  * bytecode is public — Spark itself constructs these when translating
  * runtime filters), so specs mint connector literals through this
  * in-package shim. */
object Lit {
  def apply(v: Any, dt: DataType): Literal[_] = LiteralValue(v, dt)
}
