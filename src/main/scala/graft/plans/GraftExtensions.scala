package graft.plans

import graft.functions.Md5Prefix64
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Catalyst optimizer rule: rewrite the portable SQL form of the dedup
  * hash — `cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)` — to
  * the native codegen [[Md5Prefix64]] expression. A user porting oracle
  * SQL (or any md5-prefix recipe) through `spark.sql(...)` gets the
  * fast path automatically: no 32-char hex materialization, no
  * substring copy, no radix re-parse per row. Semantics are identical
  * by construction (Md5Prefix64 is property-tested against exactly this
  * formulation in CodecSpec/LlmSpec).
  */
object RewriteMd5Prefix64 extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  /** md5(s) resolves as Md5(Cast(s, BinaryType)) for string input; both
    * shapes feed the same digest bytes
    */
  private object Md5OfString {
    def unapply(e: Expression): Option[Expression] = e match {
      case Md5(Cast(s, _, _, _)) if s.dataType == StringType => Some(s)
      case Md5(s) if s.dataType == StringType => Some(s)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Cast(
          Conv(Substring(Md5OfString(s), IntLit(1), IntLit(15)), IntLit(16), IntLit(10), _),
          LongType, _, _) =>
      Md5Prefix64(s)
  }
}

/** `spark.sql.extensions` entry point for the engine's Catalyst
  * extensions (registered by [[graft.SparkSessions.local]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteMd5Prefix64)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // the engine's SQL function surface rides the same extension entry
    // point: any session (including newSession() forks and pure-SQL
    // users who never touch the Scala API) can call simhash48,
    // md5_prefix64, cosine_similarity, zorder2, from_cbor/to_cbor, ...
    // by name
    for ((name, builder) <- graft.functions.ColumnFns.sqlFunctions)
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.ColumnFns", name),
        builder))
  }
}
