package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the engine's custom expressions, so they are
  * usable from `spark.sql(...)` as well as the Column API:
  *
  *   - `stable_bucket(str, numBuckets)`       → int
  *   - `dot_product(arr, arr)`                → double
  *   - `hyperplane_buckets(arr, tables, bits, dim)` → array<int>
  *   - `minhash_sigs(arr<string>, numHashes)` → array<string>
  *   - `winnow_fps(arr<string>, k, w)`        → array<string>
  *   - `hyperplane_probes(arr, bits, dim)`    → array<int> (2 cells)
  *   - `kgram_md5_set(arr<string>, k)`        → array<string>
  *   - `bpe_tokens(text)`                     → int (learned merge table)
  *
  * Two entry points: [[GraftExtensions]] for
  * `SparkSession.builder().withExtensions(...)` (the production path),
  * and [[GraftFunctions.register]] to add them to an already-running
  * session (tests, shells).
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "stable_bucket" -> { args =>
      require(args.size == 2, "stable_bucket(str, numBuckets)")
      StableBucket(args.head, intArg(args(1), "numBuckets"))
    },
    "dot_product" -> { args =>
      require(args.size == 2, "dot_product(a, b)")
      DotProduct(args.head, args(1))
    },
    "hyperplane_buckets" -> { args =>
      require(args.size == 4, "hyperplane_buckets(arr, tables, bits, dim)")
      HyperplaneBuckets(args.head, intArg(args(1), "tables"),
        intArg(args(2), "bits"), intArg(args(3), "dim"))
    },
    "minhash_sigs" -> { args =>
      require(args.size == 2, "minhash_sigs(shingles, numHashes)")
      MinHashSigs(args.head, intArg(args(1), "numHashes"))
    },
    "winnow_fps" -> { args =>
      require(args.size == 3, "winnow_fps(words, k, w)")
      WinnowFingerprints(args.head, intArg(args(1), "k"), intArg(args(2), "w"))
    },
    "hyperplane_probes" -> { args =>
      require(args.size == 3, "hyperplane_probes(arr, bits, dim)")
      HyperplaneProbes(args.head,
        intArg(args(1), "bits"), intArg(args(2), "dim"))
    },
    "kgram_md5_set" -> { args =>
      require(args.size == 2, "kgram_md5_set(words, k)")
      KgramMd5Set(args.head, intArg(args(1), "k"))
    },
    "kgram_md5_list" -> { args =>
      require(args.size == 2, "kgram_md5_list(words, k)")
      KgramMd5Set(args.head, intArg(args(1), "k"), distinct = false)
    },
    "bpe_tokens" -> { args =>
      require(args.size == 1, "bpe_tokens(text)")
      BpeTokenCount(args.head, BpeMergesLearned.Merges)
    })

  /** Register as temp functions on a live session. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val registry = castToImpl(spark).sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — the
  * registration path for production sessions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
