import org.apache.spark.sql._

import graft.etl.Stage
import graft.io.HdfsUrl

/**
 * Top-level implicits: HdfsUrl-aware readers/writers, column cleansing ops and
 * the name-to-stage DSL (reference core package.scala:24-81).
 */
package object graft {

  implicit class HdfsUrlReaderOps(val self: DataFrameReader) extends AnyVal {
    def csv(url: HdfsUrl*): DataFrame = self.csv(url.map(_.toString): _*)
    def json(url: HdfsUrl*): DataFrame = self.json(url.map(_.toString): _*)
    def load(url: HdfsUrl*): DataFrame = self.load(url.map(_.toString): _*)
    def orc(url: HdfsUrl*): DataFrame = self.orc(url.map(_.toString): _*)
    def parquet(url: HdfsUrl*): DataFrame = self.parquet(url.map(_.toString): _*)
    def text(url: HdfsUrl*): DataFrame = self.text(url.map(_.toString): _*)
    def textFile(url: HdfsUrl*): Dataset[String] = self.textFile(url.map(_.toString): _*)
  }

  implicit class HdfsUrlWriterOps[T](val self: DataFrameWriter[T]) extends AnyVal {
    def csv(url: HdfsUrl): Unit = self.csv(url.toString)
    def json(url: HdfsUrl): Unit = self.json(url.toString)
    def save(url: HdfsUrl): Unit = self.save(url.toString)
    def orc(url: HdfsUrl): Unit = self.orc(url.toString)
    def parquet(url: HdfsUrl): Unit = self.parquet(url.toString)
    def text(url: HdfsUrl): Unit = self.text(url.toString)
  }

  /**
   * Stage DSL on plain strings: `"CleanData".transform[Row, Clean](...)`.
   * (The reference hangs this off `scala.Symbol` literals, deprecated since
   * Scala 2.13 — reference core package.scala:46-52.)
   */
  implicit class StringToStage(val self: String) extends AnyVal {
    def stage[I, O](f: Stage.Context[I] => O): Stage[I, O] = Stage(self)(f)
    def source[O](read: Stage.Context[SparkSession] => Dataset[O]): Stage[Any, Dataset[O]] =
      Stage.source(self)(read)
    def transform[I, O](f: Stage.Context[Dataset[I]] => Dataset[O]): Stage[Dataset[I], Dataset[O]] =
      Stage.transform(self)(f)
    def sink[T](write: Stage.Context[Dataset[T]] => Unit): Stage[Dataset[T], Dataset[T]] =
      Stage.sink(self)(write)
  }

  /** Same DSL for code still using `Symbol("name")`. */
  implicit class SymbolToStage(val self: Symbol) extends AnyVal {
    def stage[I, O](f: Stage.Context[I] => O): Stage[I, O] = Stage(self.name)(f)
    def source[O](read: Stage.Context[SparkSession] => Dataset[O]): Stage[Any, Dataset[O]] =
      Stage.source(self.name)(read)
    def transform[I, O](f: Stage.Context[Dataset[I]] => Dataset[O]): Stage[Dataset[I], Dataset[O]] =
      Stage.transform(self.name)(f)
    def sink[T](write: Stage.Context[Dataset[T]] => Unit): Stage[Dataset[T], Dataset[T]] =
      Stage.sink(self.name)(write)
  }

  /** Cleansing helpers for string columns (reference core package.scala:57-81). */
  implicit class ColumnOps(val self: Column) extends AnyVal {
    import org.apache.spark.sql.functions.when

    /** True for values that are not null, not empty and not the literal string "null". */
    def isDefined: Column = self.isNotNull && !(self === "") && !(self === "null")

    /** Replace the literal string "null" with a NULL value. */
    def nullify: Column = when(self === "null", null).otherwise(self)
  }
}
