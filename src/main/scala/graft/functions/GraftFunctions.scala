package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the engine's custom Catalyst expressions — the
  * model-free ones (a model-carrying expression like NearestCells or
  * PqEncode needs a driver-built array and stays DataFrame-only). Once
  * registered, `spark.sql("SELECT simhash64(tokens) ...")` works —
  * the full SQL surface reaches every codegen'd kernel.
  *
  * Two activation paths, same builder table:
  *  - [[GraftFunctions.register]] on a live session (tests, notebooks);
  *  - `spark.sql.extensions=graft.GraftExtensions` / `.withExtensions`
  *    at session build — the [[graft.GraftExtensions]] class injects
  *    the identical builders through SparkSessionExtensions.
  */
object GraftFunctions {

  /** Cast an exact DECIMAL column to BIGINT with a LOUD overflow guard.
    * Default (non-ANSI) Spark returns NULL on a decimal→long overflow,
    * which a downstream sum would silently absorb; this raises instead.
    * For values that may legitimately exceed 2⁶³ keep the column as
    * DECIMAL(38,0) (the degreeAssortativity convention) — this guard is
    * for outputs whose contract is BIGINT.
    */
  def guardedLongCast(c: org.apache.spark.sql.Column, msg: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val dec = c.cast("decimal(38,0)")
    when(dec.isNull, lit(null).cast("long")) // NULL propagates, never raises
      .when(dec >= lit(Long.MinValue) && dec <= lit(Long.MaxValue), dec.cast("long"))
      .otherwise(raise_error(lit(msg)).cast("long"))
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  /** (name, builder) for every SQL-registerable expression. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> { args =>
      arity("simhash64", args, 1); SimHash64(args.head)
    },
    "minhash64" -> { args =>
      arity("minhash64", args, 2); MinHash64(args.head, intLit(args(1), "k"))
    },
    "shingles_fast" -> { args =>
      arity("shingles_fast", args, 2); Shingles(args.head, intLit(args(1), "n"))
    },
    "rolling_chunks" -> { args =>
      arity("rolling_chunks", args, 3)
      RollingChunks(args.head, intLit(args(1), "window"), intLit(args(2), "modulus"))
    },
    "hashed_set" -> { args =>
      arity("hashed_set", args, 1); HashedSet(args.head)
    },
    "sorted_jaccard" -> { args =>
      arity("sorted_jaccard", args, 2); SortedJaccard(args.head, args(1))
    },
    "cosine_sim" -> { args =>
      arity("cosine_sim", args, 2); CosineSim(args.head, args(1))
    },
    "gram_stats" -> { args =>
      arity("gram_stats", args, 2); GramStats(args.head, intLit(args(1), "n"))
    },
    "space_saving_top_k" -> { args =>
      arity("space_saving_top_k", args, 2)
      val k = intLit(args(1), "k")
      SpaceSavingTopK(args.head, k, math.max(8 * k, 64)).toAggregateExpression()
    },
    "group_top_k" -> { args =>
      arity("group_top_k", args, 3)
      GroupTopK(args.head, args(1), intLit(args(2), "k")).toAggregateExpression()
    },
    "cms_union" -> { args =>
      arity("cms_union", args, 1); CmsUnion(args.head).toAggregateExpression()
    },
    "cms_estimate" -> { args =>
      arity("cms_estimate", args, 2); CmsEstimate(args.head, args(1))
    },
    "kmv_sketch" -> { args =>
      arity("kmv_sketch", args, 2)
      KmvAgg(args.head, intLit(args(1), "k")).toAggregateExpression()
    },
    "kmv_union" -> { args =>
      arity("kmv_union", args, 1); KmvUnionAgg(args.head).toAggregateExpression()
    },
    "kmv_estimate" -> { args =>
      arity("kmv_estimate", args, 1); KmvEstimate(args.head)
    },
    "kmv_intersect_estimate" -> { args =>
      arity("kmv_intersect_estimate", args, 2)
      KmvIntersectEstimate(args.head, args(1))
    }
  )

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftFunctions.type].getName, name)

  /** Register every builder on a live session's function registry. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), b)
    }

  /** Inject every builder through SparkSessionExtensions (the
    * config/withExtensions path).
    */
  def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name), info(name),
        (args: Seq[Expression]) => b(args)))
    }
}
