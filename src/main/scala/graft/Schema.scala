package graft

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, Encoders}

/**
 * Implicit Spark encoders for case classes, so `Dataset[MyRow]` works without
 * `import spark.implicits._` in library code (reference core Schema.scala:26-28).
 */
object Schema {
  implicit def encoder[T <: Product: TypeTag]: Encoder[T] = Encoders.product[T]
}
