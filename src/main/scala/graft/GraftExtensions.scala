package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{RollingHash64Expr, SimHash64Expr}

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` (or `.withExtensions` in
  * code) registers graft's native expressions on the SQL surface of every
  * session — the deployment path for a cluster where users write
  * `SELECT simhash64(tokens) ...` without touching the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64Expr].getName, "rolling_hash64"),
      (children: Seq[Expression]) => RollingHash64Expr(children.head)))
  }
}
