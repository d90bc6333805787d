package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{MinhashSignature, ParseLongPrefix, PortableSimHash60, ShingleHashSorted, SimHash64, SortedLongIntersectCount, SupersonicHash64, SupersonicHashing, VectorDot}

/** SQL registration of graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - `.withExtensions(new GraftExtensions)` / `spark.sql.extensions=
  *    graft.GraftExtensions` at session build time (standard plugin path);
  *  - `GraftExtensions.register(spark)` on an already-running session
  *    (temp-function path, e.g. notebooks/tests).
  * Both share the same builders, so `spark.sql("SELECT vec_dot(a,b)")`
  * behaves identically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { children =>
      require(children.length == 2, "vec_dot(a, b) takes 2 arguments")
      VectorDot(children.head, children(1))
    },
    "simhash64" -> { children =>
      require(children.length == 1, "simhash64(tokenHashes) takes 1 argument")
      SimHash64(children.head)
    },
    "parse_long_prefix" -> { children =>
      require(children.length == 1, "parse_long_prefix(s) takes 1 argument")
      ParseLongPrefix(children.head)
    },
    "sorted_intersect_count" -> { children =>
      require(children.length == 2, "sorted_intersect_count(a, b) takes 2 arguments")
      SortedLongIntersectCount(children.head, children(1))
    },
    "minhash_signature" -> { children =>
      require(children.length == 2, "minhash_signature(hashes, k) takes 2 arguments")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"minhash_signature: k must be an int literal, got $other")
      }
      MinhashSignature(children.head, k)
    },
    "shingle_hash_sorted" -> { children =>
      require(children.length == 2, "shingle_hash_sorted(tokens, n) takes 2 arguments")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"shingle_hash_sorted: n must be an int literal, got $other")
      }
      ShingleHashSorted(children.head, n)
    },
    "supersonic_fingerprint" -> { children =>
      require(children.length == 1, "supersonic_fingerprint(e) takes 1 argument")
      SupersonicHash64(children.head,
        org.apache.spark.sql.catalyst.expressions.Literal(
          SupersonicHashing.FingerprintSeed, org.apache.spark.sql.types.LongType),
        fingerprintMode = true)
    },
    "supersonic_hash" -> { children =>
      require(children.length == 2, "supersonic_hash(e, seed) takes 2 arguments")
      SupersonicHash64(children.head, children(1))
    },
    "portable_simhash60" -> { children =>
      require(children.length == 2, "portable_simhash60(tokens, n) takes 2 arguments")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"portable_simhash60: n must be an int literal, got $other")
      }
      PortableSimHash60(children.head, n)
    },
    "hashed_linear_mills" -> { children =>
      require(children.length == 2, "hashed_linear_mills(text, dims) takes 2 arguments")
      val d = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"hashed_linear_mills: dims must be an int literal, got $other")
      }
      graft.functions.HashedLinearMills(children.head, d)
    },
    "skipgram_generate" -> { children =>
      require(children.length == 2, "skipgram_generate(tokens, window) takes 2 arguments")
      val w = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"skipgram_generate: window must be an int literal, got $other")
      }
      graft.functions.SkipgramGenerate(children.head, w)
    })

  /** Register as session-scoped temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
